"""Single/glob image inference + visualization (reference demo/image_demo.py).

Rides the high-level api (init_detector / inference_detector /
save_result — reference `detr_ssod/apis/inference.py:11-82`), so the
checkpoint may be an orbax dir from our trainers OR a converted
reference .pth.

Usage:
  python demo/image_demo.py "images/*.jpg" CONFIG --checkpoint CKPT \
      --output-dir viz/
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from semi_detr_tpu.api import (inference_detector, init_detector,
                                   save_result)
    from semi_detr_tpu.utils.config import parse_cfg_options

    p = argparse.ArgumentParser()
    p.add_argument("images", help="image path or glob")
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir or converted reference .pth")
    p.add_argument("--output-dir", default="demo_out")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    predictor = init_detector(args.config, args.checkpoint,
                              parse_cfg_options(args.cfg_options))

    import cv2
    os.makedirs(args.output_dir, exist_ok=True)
    for path in sorted(glob.glob(args.images)):
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        result = inference_detector(predictor, img,
                                    score_thr=args.score_thr)
        dst = os.path.join(args.output_dir, os.path.basename(path))
        save_result(img, result, predictor.class_names, dst,
                    score_thr=args.score_thr)
        print(f"{path} -> {dst} ({len(result[1])} dets)")


if __name__ == "__main__":
    main()
