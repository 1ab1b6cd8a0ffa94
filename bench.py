"""Benchmark: flagship DINO-DETR forward throughput on the available device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline context: the reference publishes no throughput numbers
(SURVEY.md §6); BASELINE.json's north star is images/sec/chip for the
SSOD recipe. This bench measures the supervised forward+loss step (the
dominant FLOPs path) at the 120k-recipe batch size scaled to one chip.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector

    platform = jax.devices()[0].platform
    # on CPU fall back to a tiny shape so the bench always completes
    if platform == "tpu":
        bsz, h, w = 4, 800, 1216
        dtype = jnp.bfloat16
    else:
        bsz, h, w = 1, 256, 256
        dtype = jnp.float32

    cfg = DinoConfig(dtype=dtype)
    model = DINODetector(cfg)
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((bsz, h, w, 3), dtype)
    img_hw = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (bsz, 1))
    variables = jax.jit(model.init)({"params": rng}, images, img_hw)

    @jax.jit
    def fwd(images, img_hw):
        out = model.apply(variables, images, img_hw)
        return out["cls"][-1].sum() + out["coord"][-1].sum()

    # warm-up / compile
    fwd(images, img_hw).block_until_ready()

    n_iter = 10 if platform == "tpu" else 2
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = fwd(images, img_hw)
    r.block_until_ready()
    dt = time.perf_counter() - t0
    ips = bsz * n_iter / dt

    print(json.dumps({
        "metric": "dino_forward_images_per_sec",
        "value": round(ips, 3),
        "unit": f"img/s ({platform}, {h}x{w}, bs{bsz})",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
