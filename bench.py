"""Benchmark: supervised train-step throughput (images/sec/chip).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

This measures the north-star metric from BASELINE.json: train images/sec
per chip on the flagship recipe shapes — DINO-DETR R50, 900 queries, CDN,
800x1344 bucket, bf16 compute + per-layer remat, Pallas deform-attention
kernels, AdamW + grad clip (the full fwd+bwd+update program the 120k
recipe runs). The reference publishes no throughput numbers (SURVEY.md
§6); BASELINE.json's target is >=2x the A100 reference images/s/chip.
`vs_baseline` is computed against an ESTIMATED A100 reference throughput
of 2.5 img/s/GPU (the reference recipe trains bs5/GPU on 8xA100,
`README.md:104-121`; typical DINO-R50 A100 training throughput is
2-4 img/s/GPU — 2.5 is the midpoint estimate used consistently across
rounds; vs_baseline >= 2.0 meets the north star).

Compiles are served by the persistent compilation cache
(JAX_COMPILATION_CACHE_DIR), so reruns skip the ~8 min flagship compile.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import subprocess
import sys

import jax
import jax.numpy as jnp

A100_REF_IMG_PER_SEC = 2.5   # estimated reference throughput (see header)


def _probe_devices(timeout_s: int = 120):
    """Device init probed in a SUBPROCESS: a wedged axon tunnel makes
    jax.devices() hang forever inside native code (uninterruptible by
    signals), so probe out-of-process and pin this process to CPU on
    failure — the bench must always emit its JSON line."""
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('PLAT', jax.devices()[0].platform)"],
            timeout=timeout_s, capture_output=True, text=True)
        for line in out.stdout.splitlines():
            if line.startswith("PLAT "):
                return line.split()[1]
    except Exception:
        pass
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return "cpu"


def main():
    import numpy as np

    from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector
    from semi_detr_tpu.train import optim
    from semi_detr_tpu.train.state import TrainState
    from semi_detr_tpu.train.supervised import make_supervised_train_step

    platform = _probe_devices()
    if platform == "tpu":
        b, h, w = 2, 800, 1344
        cfg = DinoConfig(dtype=jnp.bfloat16, remat=True)
        n_iter = 5
    else:
        # CPU fallback: tiny shapes so the bench always completes
        b, h, w = 1, 128, 160
        cfg = DinoConfig(num_classes=7, num_queries=24, d_model=64,
                         n_heads=2, num_encoder_layers=1,
                         num_decoder_layers=2, d_ffn=64, dn_single_pad=4,
                         dn_groups=2, max_gt=8)
        n_iter = 2

    model = DINODetector(cfg)
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.randn(b, h, w, 3).astype(np.float32))
    hw = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1))
    g = cfg.max_gt
    batch = {
        "images": images, "img_hw": hw,
        "gt": {
            "boxes": jnp.tile(jnp.asarray([[[0.5, 0.5, 0.2, 0.3]]]),
                              (b, g, 1)),
            "labels": jnp.zeros((b, g), jnp.int32),
            "valid": jnp.tile(jnp.arange(g)[None] < 8, (b, 1)),
        },
    }

    variables = jax.jit(model.init)({"params": rng}, images[:1], hw[:1])
    tx = optim.make_optimizer(variables["params"])
    state = TrainState.create(variables, tx, with_teacher=False)
    step = make_supervised_train_step(model, tx, warm_up=False)

    # compile + warm-up (force host sync: axon's block_until_ready may
    # not actually block)
    state, metrics = step(state, batch, rng)
    _ = float(metrics["total_loss"])

    ts = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, rng)
        _ = float(metrics["total_loss"])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    ips = b / med

    print(json.dumps({
        "metric": "train_images_per_sec_chip",
        "value": round(ips, 3),
        "unit": f"img/s/chip (supervised step, {platform}, {h}x{w}, "
                f"bs{b}, bf16+remat)" if platform == "tpu" else
                f"img/s/chip (supervised step, {platform}, tiny)",
        "vs_baseline": (round(ips / A100_REF_IMG_PER_SEC, 3)
                        if platform == "tpu" else None),
    }))


if __name__ == "__main__":
    main()
