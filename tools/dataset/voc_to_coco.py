"""VOC XML -> COCO JSON converter CLI (reference scripts/voc_to_coco.py)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0,
                os.path.join(os.path.dirname(__file__), "..", ".."))

from semi_detr_tpu.data.voc import convert_and_save


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-dir", required=True,
                   help="VOCdevkit/VOC2007/Annotations")
    p.add_argument("--ids-file", default=None,
                   help="ImageSets/Main/trainval.txt")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    convert_and_save(args.ann_dir, args.out, args.ids_file)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
