"""Generate COCO semi-supervised splits (reference tools/dataset/semi_coco.py).

Usage:
  python tools/dataset/semi_coco.py --ann data/coco/annotations/\
instances_train2017.json --out data/coco/annotations/semi_supervised
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0,
                os.path.join(os.path.dirname(__file__), "..", ".."))

from semi_detr_tpu.data.semi_split import generate_splits


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--percents", type=float, nargs="+",
                   default=[1, 5, 10])
    p.add_argument("--folds", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    args = p.parse_args()
    generate_splits(args.ann, args.out, args.percents, args.folds)
    print(f"splits written to {args.out}")


if __name__ == "__main__":
    main()
