"""Compile-time scaling probe for the scanned encoder (ROADMAP weak #3).

The round-2 weak spot was flagship compile time (~8.6 min/stage on
chip). Round 3 moved the 6 identical encoder layers into ONE nn.scan
body (models/transformer.py), so whole-model compile time should be
near-FLAT in encoder depth, while the (unrolled, refinement-threaded)
decoder still compiles per layer. This probe measures jit lower+compile
wall time of the detector forward at several depths and prints a JSON
summary — runnable on CPU (relative claim; same XLA frontend) or chip.

Usage: python tools/benchmarks/compile_time_probe.py [--d-model 256]
       [--hw 256 448]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def compile_once(n_enc: int, n_dec: int, d_model: int, hw, fresh: bool):
    """Wall time of jit trace+lower+compile for the detector forward.

    fresh: run in a subprocess with the persistent compile cache OFF so
    each measurement is a cold XLA compile.
    """
    import subprocess
    # pin the platform ONLY when the caller pinned it (the axon
    # sitecustomize otherwise overrides JAX_PLATFORMS); unset -> jax
    # auto-detects (TPU on a chip VM), and the child prints the backend
    pin = (f'jax.config.update("jax_platforms", '
           f'{os.environ["JAX_PLATFORMS"]!r})'
           if os.environ.get("JAX_PLATFORMS") else "pass")
    code = f"""
import time, jax, jax.numpy as jnp
{pin}
import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))!r})
print("BACKEND", jax.default_backend())
from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector
cfg = DinoConfig(num_classes=80, num_queries=100, d_model={d_model},
                 n_heads=8, num_encoder_layers={n_enc},
                 num_decoder_layers={n_dec}, d_ffn={4 * d_model},
                 dn_single_pad=4, dn_groups=2, max_gt=8)
model = DINODetector(cfg)
imgs = jnp.zeros((1, {hw[0]}, {hw[1]}, 3), jnp.float32)
img_hw = jnp.asarray([[{hw[0]}, {hw[1]}]], jnp.int32)
variables = jax.jit(model.init)({{"params": jax.random.PRNGKey(0)}}, imgs, img_hw)
fn = jax.jit(lambda v, i, h: model.apply(v, i, h))
t0 = time.perf_counter()
fn.lower(variables, imgs, img_hw).compile()
print("COMPILE_S", time.perf_counter() - t0)
"""
    env = dict(os.environ)
    if fresh:
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
    # serialize with other TPU clients (bench.py / sweep_on_chip.sh):
    # two concurrent axon clients can wedge the loopback relay
    import fcntl
    with open("/tmp/sdt_tpu.lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=3600)
    backend = None
    t = None
    for line in out.stdout.splitlines():
        if line.startswith("BACKEND"):
            backend = line.split()[1]
        if line.startswith("COMPILE_S"):
            t = float(line.split()[1])
    if t is None:
        raise RuntimeError(out.stdout[-1000:] + out.stderr[-1000:])
    compile_once.backend = backend
    return t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--hw", type=int, nargs=2, default=(256, 448))
    p.add_argument("--cached", action="store_true",
                   help="keep the persistent compile cache (measures "
                        "cache hits, not cold compiles)")
    args = p.parse_args()

    results = {}
    # encoder depth sweep (scanned: expect ~flat) at fixed dec=2
    for n_enc in (1, 6):
        t = compile_once(n_enc, 2, args.d_model, args.hw,
                         fresh=not args.cached)
        results[f"enc{n_enc}_dec2"] = round(t, 1)
        print(f"enc={n_enc} dec=2: {t:.1f}s", flush=True)
    # decoder depth sweep (unrolled: expect ~linear) at fixed enc=1
    for n_dec in (2, 6):
        key = f"enc1_dec{n_dec}"
        if key in results:
            continue
        t = compile_once(1, n_dec, args.d_model, args.hw,
                         fresh=not args.cached)
        results[key] = round(t, 1)
        print(f"enc=1 dec={n_dec}: {t:.1f}s", flush=True)
    results["enc_depth_ratio_6v1"] = round(
        results["enc6_dec2"] / results["enc1_dec2"], 2)
    results["dec_depth_ratio_6v2"] = round(
        results["enc1_dec6"] / results["enc1_dec2"], 2)
    results["backend"] = getattr(compile_once, "backend", None)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
