"""Serialize the detector's inference program to portable StableHLO.

The TPU-native analog of the reference's ONNX export surface
(`detr_od/models/dino_detr.py:52-72` `onnx_export`, listed as the
deployment path in SURVEY.md §2.2): instead of tracing torch into ONNX,
we `jax.export` the jitted predict function — weights baked in or passed
as inputs — into a serialized StableHLO artifact any XLA-backed runtime
(TPU serving, IREE, PJRT plugins) can load and execute without Python or
this framework installed.

Usage:
  python tools/misc/export_model.py CONFIG --checkpoint CKPT \
      --out model.stablehlo [--batch 1] [--bucket 800,1344] [--with-nms]
  python tools/misc/export_model.py CONFIG --load model.stablehlo \
      --selftest            # deserialize + run on zeros, print shapes
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common import base_parser, load_cfg, ssod_config  # noqa: E402


def main():
    p = base_parser(__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="orbax ckpt dir or converted reference .pth; "
                        "omitted = export with random-init weights")
    p.add_argument("--out", default="model.stablehlo")
    p.add_argument("--load", default=None,
                   help="deserialize an existing artifact instead of "
                        "exporting")
    p.add_argument("--selftest", action="store_true",
                   help="run the (de)serialized program on zero images")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--bucket", default="800,1344")
    p.add_argument("--with-nms", action="store_true",
                   help="bake the NMS decode in (warm-up-stage semantics); "
                        "default is the main-stage top-k decode")
    p.add_argument("--platform", default=None,
                   help="lowering platform (tpu/cpu); default = current "
                        "jax backend")
    args = p.parse_args()
    cfg = load_cfg(args)

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    h, w = (int(v) for v in args.bucket.split(","))
    images = jnp.zeros((args.batch, h, w, 3), jnp.float32)
    img_hw = jnp.full((args.batch, 2), (h, w), jnp.int32)

    if args.load:
        exported = jexport.deserialize(open(args.load, "rb").read())
        print(f"loaded {args.load}: in_avals={exported.in_avals} "
              f"platforms={exported.platforms}")
        if args.selftest:
            boxes, scores, labels = exported.call(images, img_hw)
            print("selftest ok:", boxes.shape, scores.shape, labels.shape)
        return

    import optax
    from semi_detr_tpu.models.dino_head import DINODetector
    from semi_detr_tpu.models.inference import make_predict_fn
    from semi_detr_tpu.models.ssod import Projector
    from semi_detr_tpu.train.ssod import init_ssod_state

    scfg = ssod_config(cfg)
    detector = DINODetector(scfg.dino)
    template = init_ssod_state(
        detector, Projector(scfg.dino.d_model), optax.identity(), scfg,
        jax.random.PRNGKey(cfg.get("seed", 0)),
        jnp.zeros((1, 64, 64, 3)), jnp.asarray([[64, 64]], jnp.int32))

    if args.checkpoint and args.checkpoint.endswith((".pth", ".pt")):
        from semi_detr_tpu.train.checkpoint import (apply_warm_start,
                                                    load_warm_start)
        state = apply_warm_start(
            template, load_warm_start(args.checkpoint, scfg.dino.n_heads),
            ssod=True)
    elif args.checkpoint:
        from semi_detr_tpu.train.checkpoint import CheckpointManager
        state = CheckpointManager(args.checkpoint).restore(template)
    else:
        state = template
    # serving runs the teacher (reference tools/test.py:195-200)
    variables = {"params": state.teacher_params,
                 "batch_stats": state.batch_stats}

    predict = make_predict_fn(detector, use_nms=args.with_nms)
    # close over the weights: the artifact is self-contained (the usual
    # ONNX deployment contract); inputs are (images, img_hw) only
    fn = jax.jit(lambda im, hw: predict(variables, im, hw))
    plats = [args.platform] if args.platform else None
    exported = jexport.export(fn, platforms=plats)(images, img_hw)
    data = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"wrote {args.out}: {len(data) / 1e6:.1f} MB, "
          f"platforms={exported.platforms}, in={exported.in_avals}")
    if args.selftest:
        boxes, scores, labels = exported.call(images, img_hw)
        print("selftest ok:", boxes.shape, scores.shape, labels.shape)


if __name__ == "__main__":
    main()
