"""Evaluation CLI (reference: tools/test.py).

Evaluates a checkpoint on the val set; for SSOD checkpoints inference runs
on the TEACHER by default (reference forces inference_on='teacher',
tools/test.py:195-200), and the decode path (NMS vs top-k) follows the
checkpoint step vs warm_up_step (`:235-241`).
"""
from __future__ import annotations

import json

import optax

from common import (base_parser, build_dataset, class_names, load_cfg,
                    ssod_config)

import jax
from semi_detr_tpu.models.dino_head import DINODetector
from semi_detr_tpu.models.inference import evaluate_detector
from semi_detr_tpu.models.ssod import Projector
from semi_detr_tpu.train.checkpoint import CheckpointManager
from semi_detr_tpu.train.ssod import init_ssod_state


def main():
    p = base_parser(__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint: orbax dir (default: work_dir/ckpt) or a converted reference .pth")
    p.add_argument("--inference-on", default="teacher",
                   choices=["teacher", "student"])
    p.add_argument("--out", default=None, help="json results path")
    args = p.parse_args()
    cfg = load_cfg(args)
    names = class_names(cfg)

    scfg = ssod_config(cfg)
    val = build_dataset(cfg["data"]["val_ann"], cfg["data"]["val_prefix"],
                        names, train=False)
    detector = DINODetector(scfg.dino)
    projector = Projector(scfg.dino.d_model)

    import jax.numpy as jnp
    template = init_ssod_state(
        detector, projector, optax.identity(), scfg, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)), jnp.asarray([[64, 64]], jnp.int32))
    src = args.checkpoint or args.load_from
    if src and src.endswith((".pth", ".pt")):
        # converted reference/torch checkpoint (teacher/student layout,
        # utils.torch_weights): fully-trained -> main-stage top-k decode
        from semi_detr_tpu.train.checkpoint import (apply_warm_start,
                                                    load_warm_start)
        state = apply_warm_start(
            template, load_warm_start(src, scfg.dino.n_heads), ssod=True)
        use_nms = False
    else:
        # a specific step dir (ckpt/4000) works like the reference's
        # iter_4000.pth: restore exactly that step from the parent root.
        # Only an actual orbax step dir (marker file present) is stripped —
        # a run ROOT that happens to be named numerically is left alone.
        import os
        step = None
        root = src or cfg["work_dir"] + "/ckpt"
        base = os.path.basename(os.path.normpath(root))
        if base.isdigit() and os.path.exists(
                os.path.join(root, "_CHECKPOINT_METADATA")):
            step = int(base)
            root = os.path.dirname(os.path.normpath(root))
        ckpt = CheckpointManager(root)
        state = ckpt.restore(template, step=step)
        use_nms = int(state.step) < scfg.warm_up_step

    params = (state.teacher_params if args.inference_on == "teacher"
              else state.params["detector"])
    # data-shard eval over the slice (reference multi_gpu_test analog)
    from semi_detr_tpu.parallel import make_mesh
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    res = evaluate_detector(
        detector, {"params": params, "batch_stats": state.batch_stats},
        val, use_nms=use_nms, mesh=mesh,
        bucket=tuple(cfg.get("bucket", (800, 1344))),
        test_scale=(tuple(max(cfg["scales"])) if cfg.get("scales")
                    else None),
        num_classes=scfg.dino.num_classes,
        class_names=names)
    print(json.dumps({k: v for k, v in res.items()
                      if k != "AP_per_class"}, indent=2))
    # classwise AP table (reference prints one via prettytable,
    # submodules_evaluation.py:107-112 / mmdet classwise=True)
    per_cls = [(n, ap) for n, ap in res.get("AP_per_class", {}).items()
               if ap is not None]
    if per_cls:
        width = max(len(n) for n, _ in per_cls)
        cols = 4
        print("\nclasswise AP:")
        for i in range(0, len(per_cls), cols):
            print("  " + " | ".join(
                f"{n:<{width}} {ap:0.3f}" for n, ap in per_cls[i:i + cols]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
