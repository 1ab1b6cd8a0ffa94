"""Single/glob image inference + visualization (reference demo/image_demo.py).

Usage:
  python demo/image_demo.py "images/*.jpg" CONFIG --checkpoint CKPT_DIR \
      --output-dir viz/
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def draw_boxes(img, boxes, scores, labels, names, score_thr=0.3):
    import cv2
    out = img.copy()
    for b, s, l in zip(boxes, scores, labels):
        if s < score_thr:
            continue
        x0, y0, x1, y1 = map(int, b)
        cv2.rectangle(out, (x0, y0), (x1, y1), (0, 255, 0), 2)
        cv2.putText(out, f"{names[int(l)]}:{s:.2f}", (x0, max(y0 - 4, 0)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
    return out


def main():
    from common import class_names, load_cfg, ssod_config
    import jax
    import jax.numpy as jnp
    import optax
    from semi_detr_tpu.data.augment import make_sample, test_resize
    from semi_detr_tpu.data.pipeline import pack
    from semi_detr_tpu.models.dino_head import DINODetector
    from semi_detr_tpu.models.inference import make_predict_fn
    from semi_detr_tpu.models.ssod import Projector
    from semi_detr_tpu.train.checkpoint import CheckpointManager
    from semi_detr_tpu.train.ssod import init_ssod_state

    p = argparse.ArgumentParser()
    p.add_argument("images", help="image path or glob")
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output-dir", default="demo_out")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    class _A:  # adapt to load_cfg signature
        config = args.config
        cfg_options = args.cfg_options
        work_dir = None
        seed = None
    cfg = load_cfg(_A)
    names = class_names(cfg)
    scfg = ssod_config(cfg)

    detector = DINODetector(scfg.dino)
    template = init_ssod_state(
        detector, Projector(scfg.dino.d_model), optax.identity(), scfg,
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64, 64]], jnp.int32))
    state = CheckpointManager(args.checkpoint).restore(template)
    variables = {"params": state.teacher_params,
                 "batch_stats": state.batch_stats}
    predict = make_predict_fn(detector,
                              use_nms=int(state.step) < scfg.warm_up_step)

    os.makedirs(args.output_dir, exist_ok=True)
    import cv2
    for path in sorted(glob.glob(args.images)):
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        s = test_resize(make_sample(img))
        packed = pack(s, (800, 1344), 1)
        boxes, scores, labels = jax.device_get(predict(
            variables, packed.image[None], packed.hw[None]))
        boxes = boxes[0] / packed.scale_factor
        out = draw_boxes(cv2.cvtColor(img, cv2.COLOR_RGB2BGR), boxes,
                         scores[0], labels[0], names, args.score_thr)
        dst = os.path.join(args.output_dir, os.path.basename(path))
        cv2.imwrite(dst, out)
        print(f"{path} -> {dst} "
              f"({int((scores[0] > args.score_thr).sum())} dets)")


if __name__ == "__main__":
    main()
