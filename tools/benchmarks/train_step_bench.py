"""Flagship-scale train-step benchmark: supervised DINO step on one chip.

Measures compile + steady-state step time for the real recipe shapes
(800x1344 bucket, R50, 900 queries, CDN) with remat + bf16 compute and
the Pallas deform-attention kernels.

Usage: python tools/benchmarks/train_step_bench.py [--batch 2] [--steps 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--ssod", action="store_true",
                   help="benchmark the full SSOD step instead")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector
    from semi_detr_tpu.train import optim
    from semi_detr_tpu.train.state import TrainState
    from semi_detr_tpu.train.supervised import make_supervised_train_step

    cfg = DinoConfig(dtype=jnp.bfloat16, remat=not args.no_remat)
    model = DINODetector(cfg)
    b, h, w = args.batch, args.height, args.width
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.randn(b, h, w, 3).astype(np.float32))
    hw = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1))
    g = cfg.max_gt
    batch = {
        "images": images, "img_hw": hw,
        "gt": {
            "boxes": jnp.tile(
                jnp.asarray([[[0.5, 0.5, 0.2, 0.3]]]), (b, g, 1)),
            "labels": jnp.zeros((b, g), jnp.int32),
            "valid": jnp.tile(jnp.arange(g)[None] < 8, (b, 1)),
        },
    }

    t0 = time.time()
    variables = jax.jit(model.init)({"params": rng}, images[:1], hw[:1])
    print(f"init: {time.time() - t0:.1f}s "
          f"({sum(x.size for x in jax.tree.leaves(variables['params'])):,}"
          " params)")

    tx = optim.make_optimizer(variables["params"])
    state = TrainState.create(variables, tx, with_teacher=False)
    if args.ssod:
        raise SystemExit("use the training CLI for the SSOD step")
    step = make_supervised_train_step(model, tx, warm_up=False)

    t0 = time.time()
    state, metrics = step(state, batch, rng)
    total = float(metrics["total_loss"])
    print(f"first step (compile): {time.time() - t0:.1f}s, "
          f"loss {total:.3f}")

    ts = []
    for _ in range(args.steps):
        t0 = time.time()
        state, metrics = step(state, batch, rng)
        _ = float(metrics["total_loss"])
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"steady-state: {med * 1000:.0f} ms/step "
          f"-> {b / med:.2f} img/s/chip (bs{b}, {h}x{w})")


if __name__ == "__main__":
    main()
