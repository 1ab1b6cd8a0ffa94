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
    p.add_argument("--unroll", type=int, default=6,
                   help="layer-scan unroll factor (6 = fully unrolled, "
                        "the measured default; 1 = true rolled scan)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax.profiler trace of the timed steps")
    p.add_argument("--donate", action="store_true",
                   help="donate the train state (buffer reuse A/B; was "
                        "disabled for an axon-tunnel bug, ROADMAP P2)")
    p.add_argument("--ssod", action="store_true",
                   help="benchmark the full SSOD recipe step "
                        "(1 sup + 4 unsup, two views, warm-up stage)")
    p.add_argument("--post-warmup", action="store_true",
                   help="with --ssod: the post-warm-up stage program")
    p.add_argument("--no-tiled-tokens", action="store_true",
                   help="with --ssod: disable the tile-order token "
                        "stream (fault-bisection / r3-equivalence knob)")
    p.add_argument("--uint8-inputs", action="store_true",
                   help="with --ssod: feed raw-uint8 images + device "
                        "normalize, the real trainer's input path")
    p.add_argument("--infer", action="store_true",
                   help="serving/eval throughput: forward + top-300 "
                        "decode (models/inference.make_predict_fn) at "
                        "--batch, no grads/optimizer")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector
    from semi_detr_tpu.train import optim
    from semi_detr_tpu.train.state import TrainState
    from semi_detr_tpu.train.supervised import make_supervised_train_step

    if args.ssod:
        return ssod_bench(args)
    if args.infer:
        return infer_bench(args)

    cfg = DinoConfig(dtype=jnp.bfloat16, remat=not args.no_remat,
                     scan_unroll=args.unroll)
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
    step = make_supervised_train_step(model, tx, warm_up=False,
                                  donate=args.donate)

    # same timing harness as the SSOD branch / driver bench.py, so the
    # supervised and SSOD numbers can never drift on sync semantics
    from semi_detr_tpu.train.bench import timed_steps

    med, _, _, compile_s = timed_steps(step, state, batch, rng,
                                       iters=args.steps,
                                       profile=args.profile)
    print(f"first step (compile): {compile_s:.1f}s")
    if args.profile:
        print(f"trace written to {args.profile}")
    print(f"steady-state: {med * 1000:.0f} ms/step "
          f"-> {b / med:.2f} img/s/chip (bs{b}, {h}x{w})")


def infer_bench(args):
    """Serving/eval throughput: the exact predict program periodic eval
    and tools/test.py run (forward + top-300 decode), steady-state."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector
    from semi_detr_tpu.models.inference import make_predict_fn

    cfg = DinoConfig(dtype=jnp.bfloat16, remat=not args.no_remat,
                     scan_unroll=args.unroll)
    model = DINODetector(cfg)
    b, h, w = args.batch, args.height, args.width
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.randn(b, h, w, 3).astype(np.float32))
    hw = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1))
    t0 = time.time()
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                    images[:1], hw[:1])
    print(f"init: {time.time() - t0:.1f}s")
    predict = make_predict_fn(model, use_nms=False)

    t0 = time.time()
    out = predict(variables, images, hw)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])   # axon-safe sync
    print(f"first call (compile): {time.time() - t0:.1f}s")
    ts = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        out = predict(variables, images, hw)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"steady-state: {med * 1000:.0f} ms/batch -> "
          f"{b / med:.2f} img/s/chip (infer bs{b}, {h}x{w})")


def ssod_bench(args):
    """Full SSOD recipe step (the north-star workload, reference
    `configs/detr_ssod/detr_ssod_dino_detr_r50_coco_120k.py:3-5`):
    1 sup + `--batch` unsup images, two views each, on one chip.
    Setup + timing ride the shared harness (`semi_detr_tpu/train/bench.py`)
    so this and the driver metric (`bench.py`) measure the same thing."""
    import time

    from semi_detr_tpu.train.bench import build_ssod_step, timed_steps

    # --batch sets the unsup count; the default (2, supervised-oriented)
    # maps to the recipe's 4 unsup per sup
    n_sup, n_unsup = 1, (4 if args.batch == 2 else args.batch)
    h, w = args.height, args.width
    warm_up = not args.post_warmup

    t0 = time.time()
    step, state, batch, rng = build_ssod_step(
        n_sup, n_unsup, h, w, warm_up=warm_up,
        remat=not args.no_remat, donate=args.donate,
        scan_unroll=args.unroll,
        tiled_tokens=not args.no_tiled_tokens,
        uint8_inputs=args.uint8_inputs)
    print(f"init: {time.time() - t0:.1f}s")

    med, _, _, compile_s = timed_steps(step, state, batch, rng,
                                       iters=args.steps,
                                       profile=args.profile)
    print(f"first step (compile, warm_up={warm_up}): {compile_s:.1f}s")
    if args.profile:
        print(f"trace written to {args.profile}")
    n_img = n_sup + n_unsup
    print(f"steady-state: {med * 1000:.0f} ms/step -> "
          f"{n_img / med:.2f} img/s/chip "
          f"(SSOD {n_sup}sup+{n_unsup}unsup, {h}x{w}, warm_up={warm_up})")


if __name__ == "__main__":
    main()
