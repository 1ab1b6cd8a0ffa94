"""Shared SSOD recipe-step benchmark harness.

Single source of truth for the north-star measurement (reference recipe
`configs/detr_ssod/detr_ssod_dino_detr_r50_coco_120k.py:3-5`: bs5/GPU at
sample ratio [1,4]) so the driver metric (`bench.py`) and the on-chip
sweep (`tools/benchmarks/train_step_bench.py --ssod`) time the SAME
setup — synthetic batch, init, optimizer swap, compiled step — and can
never drift apart.
"""
from __future__ import annotations

import time


def build_ssod_step(n_sup: int = 1, n_unsup: int = 4, h: int = 800,
                    w: int = 1344, *, warm_up: bool = True,
                    remat: bool = True, donate: bool = False,
                    scan_unroll: int = 1, tiled_tokens: bool = True,
                    uint8_inputs: bool = False):
    """Build the flagship SSOD step at recipe scale.

    Returns (step, state, batch, rng). `step(state, batch, rng)` is the
    single-jit SSOD iteration (teacher pseudo-labeling + student update +
    EMA) in bf16 with per-layer remat and the Pallas deform-attn kernels.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..data.synthetic import synthetic_ssod_batch
    from ..models.dino_head import DinoConfig, DINODetector
    from ..models.ssod import Projector, SsodConfig
    from . import optim
    from .ssod import init_ssod_state, make_ssod_train_step

    cfg = SsodConfig(dino=DinoConfig(dtype=jnp.bfloat16, remat=remat,
                                     scan_unroll=scan_unroll,
                                     tiled_tokens=tiled_tokens))
    detector = DINODetector(cfg.dino)
    projector = Projector(cfg.dino.d_model)
    rng = jax.random.PRNGKey(0)
    raw = synthetic_ssod_batch(n_sup, n_unsup, h, w, cfg.dino.max_gt)
    if uint8_inputs:
        # mirror the real trainer's raw-uint8 transfer + device-side
        # normalization (data/pipeline.py pack + dino_head.prepare_images)
        import numpy as np
        for k in ("sup", "unsup"):
            for kk in list(raw[k]):
                if kk.endswith("images"):
                    raw[k][kk] = np.clip(raw[k][kk] * 40 + 120, 0,
                                         255).astype(np.uint8)
    batch = jax.tree.map(jnp.asarray, raw)
    # init with a placeholder optimizer, then swap in the real one: the
    # real AdamW is built from labeled param groups, which need the
    # initialized params first
    state = init_ssod_state(detector, projector, optax.identity(), cfg, rng,
                            batch["sup"]["images"][:1],
                            batch["sup"]["img_hw"][:1])
    tx = optim.make_optimizer(state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_ssod_train_step(detector, projector, tx, cfg,
                                warm_up=warm_up, donate=donate)
    return step, state, batch, rng


def timed_steps(step, state, batch, rng, iters: int, profile: str | None = None):
    """One warm (compile) step, then `iters` timed steps.

    Host-syncs on a scalar metric every step (axon's block_until_ready
    may not actually block). Returns (median_seconds, per_step_times,
    final_state, compile_seconds).
    """
    import jax

    t0 = time.perf_counter()
    state, metrics = step(state, batch, rng)
    _ = float(metrics["total_loss"])
    compile_s = time.perf_counter() - t0

    if profile:
        jax.profiler.start_trace(profile)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, rng)
        _ = float(metrics["total_loss"])
        ts.append(time.perf_counter() - t0)
    if profile:
        jax.profiler.stop_trace()
    return sorted(ts)[len(ts) // 2], ts, state, compile_s
