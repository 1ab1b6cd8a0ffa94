"""Visualize the augmentation pipeline output (reference
tools/misc/browse_dataset.py): renders augmented images with GT boxes to
an output directory.

Usage:
  python tools/misc/browse_dataset.py --ann ANN.json --prefix IMG_DIR \
      --pipeline strong --out viz/ --num 10
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import cv2
    from semi_detr_tpu.data.augment import (make_sample, strong_augment,
                                            sup_augment, weak_augment)
    from semi_detr_tpu.data.coco import CocoDataset

    p = argparse.ArgumentParser()
    p.add_argument("--ann", required=True)
    p.add_argument("--prefix", default="")
    p.add_argument("--pipeline", default="strong",
                   choices=["weak", "strong", "sup"])
    p.add_argument("--out", default="browse_out")
    p.add_argument("--num", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    ds = CocoDataset(args.ann, args.prefix, filter_empty_gt=False,
                     test_mode=True)
    aug = {"weak": weak_augment, "strong": strong_augment,
           "sup": sup_augment}[args.pipeline]
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    for i in range(min(args.num, len(ds))):
        rec = ds[i]
        s = aug(rng, make_sample(ds.load_image(i), rec.boxes, rec.labels))
        img = cv2.cvtColor(s.img, cv2.COLOR_RGB2BGR).copy()
        for b in s.boxes:
            cv2.rectangle(img, (int(b[0]), int(b[1])),
                          (int(b[2]), int(b[3])), (0, 255, 0), 2)
        dst = os.path.join(args.out, f"{args.pipeline}_{i}.jpg")
        cv2.imwrite(dst, img)
        print(dst, img.shape, len(s.boxes), "boxes")


if __name__ == "__main__":
    main()
