"""Benchmark: SSOD recipe train-step throughput (images/sec/chip).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

This measures the north-star workload from BASELINE.json: the Semi-DETR
recipe step — 1 supervised + 4 unsupervised images per chip, two views
of each unsup image (reference `detr_ssod_dino_detr_r50_coco_120k.py:3-5`
trains bs5/GPU at ratio [1,4]), warm-up stage (all machinery live:
teacher pseudo-labeling + NMS + GMM filter, CDN, RoIAlign+Projector
consistency queries, teacher consistency forward, EMA), DINO-DETR R50,
900 queries, 800x1344 bucket, bf16 compute + per-layer remat, Pallas
deform-attention kernels, AdamW + grad clip.

The reference publishes no throughput numbers (SURVEY.md §6);
`vs_baseline` is computed against an ESTIMATED A100 reference recipe
throughput of 2.5 img/s/GPU (typical Semi-DETR/DINO-R50 A100 iteration
is ~1.5-2.5 s at bs5 -> 2-3.3 img/s; 2.5 is the midpoint estimate used
consistently across rounds; vs_baseline >= 2.0 meets the north star).

Compiles are served by the persistent compilation cache
(JAX_COMPILATION_CACHE_DIR), so reruns skip the ~10 min flagship compile.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import contextlib
import subprocess
import sys

import jax
import jax.numpy as jnp

A100_REF_IMG_PER_SEC = 2.5   # estimated reference throughput (see header)
# Sensitivity bounds on the estimate: the reference publishes NO
# throughput (SURVEY.md §6); typical Semi-DETR/DINO-R50 A100 recipe
# iterations are ~1.5-2.5 s at bs5 -> 2.0-3.3 img/s. Every vs_baseline
# is therefore also reported as a [vs 3.3, vs 2.0] range.
A100_REF_BOUNDS = (2.0, 3.3)

# Two concurrent axon clients can wedge the loopback relay, so every
# cooperating TPU client here (this bench, sweep_on_chip.sh, ad-hoc
# probes) serializes on one flock file.
_TPU_LOCK = "/tmp/sdt_tpu.lock"


@contextlib.contextmanager
def _tpu_lock(max_wait_s: int = 3000):
    """Bounded-wait exclusive lock; proceeds anyway after max_wait_s
    (the bench must always emit its line, even if a sweep run hangs).
    The bound exceeds a sweep step's 2700 s timeout so a legitimately
    held lock is always outwaited, never raced."""
    import fcntl
    f = open(_TPU_LOCK, "w")
    deadline = time.monotonic() + max_wait_s
    got = False
    while time.monotonic() < deadline:
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
            got = True
            break
        except OSError:
            time.sleep(10)
    if not got:
        print("bench: TPU lock busy after wait; proceeding", file=sys.stderr)
    try:
        yield
    finally:
        if got:
            fcntl.flock(f, fcntl.LOCK_UN)
        f.close()


def _probe_devices(timeout_s: int = 120, retries: int = None,
                   retry_wait_s: int = 90):
    """Device init probed in a SUBPROCESS: a wedged axon tunnel makes
    jax.devices() hang forever inside native code (uninterruptible by
    signals), so probe out-of-process and pin this process to CPU on
    failure — the bench must always emit its JSON line.

    A wedged tunnel is sometimes restored by the sandbox infra within
    minutes, and a CPU-fallback point is worthless to the tracked
    series, so retry a few times (bounded: ~3x(120+90)s ~= 10 min worst
    case) before giving up. SDT_BENCH_PROBE_RETRIES overrides."""
    if retries is None:
        retries = int(os.environ.get("SDT_BENCH_PROBE_RETRIES", "3"))
    for attempt in range(max(retries, 1)):
        if attempt:
            time.sleep(retry_wait_s)
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
        print(f"bench: device probe {attempt + 1}/{retries} failed",
              file=sys.stderr)
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return "cpu"


def _bench_ssod_tpu():
    """Flagship SSOD recipe step on the chip (shared harness — the same
    setup+timing path as `train_step_bench.py --ssod`)."""
    from semi_detr_tpu.train.bench import build_ssod_step, timed_steps

    n_sup, n_unsup, h, w = 1, 4, 800, 1344
    step, state, batch, rng = build_ssod_step(n_sup, n_unsup, h, w)
    med, _, _, _ = timed_steps(step, state, batch, rng, iters=5)
    ips = (n_sup + n_unsup) / med
    return {
        "metric": "train_images_per_sec_chip",
        "value": round(ips, 3),
        "unit": f"img/s/chip (SSOD recipe step 1sup+4unsup, tpu, {h}x{w}, "
                "warm-up stage, bf16+remat)",
        "vs_baseline": round(ips / A100_REF_IMG_PER_SEC, 3),
        # sensitivity range of the estimated A100 denominator (2.0-3.3
        # img/s): [conservative vs 3.3, optimistic vs 2.0]
        "vs_baseline_range": [round(ips / A100_REF_BOUNDS[1], 3),
                              round(ips / A100_REF_BOUNDS[0], 3)],
    }


def _bench_supervised_cpu():
    """CPU fallback: tiny supervised step so the bench always completes."""
    import numpy as np

    from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector
    from semi_detr_tpu.train import optim
    from semi_detr_tpu.train.state import TrainState
    from semi_detr_tpu.train.supervised import make_supervised_train_step

    b, h, w = 1, 128, 160
    cfg = DinoConfig(num_classes=7, num_queries=24, d_model=64,
                     n_heads=2, num_encoder_layers=1,
                     num_decoder_layers=2, d_ffn=64, dn_single_pad=4,
                     dn_groups=2, max_gt=8)
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
    state, metrics = step(state, batch, rng)
    _ = float(metrics["total_loss"])
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, rng)
        _ = float(metrics["total_loss"])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    return {
        "metric": "train_images_per_sec_chip",
        "value": round(b / med, 3),
        "unit": "img/s/chip (supervised step, cpu, tiny)",
        "vs_baseline": None,
    }


def main():
    with _tpu_lock():
        platform = _probe_devices()
        if platform == "tpu":
            out = _bench_ssod_tpu()
        else:
            out = _bench_supervised_cpu()
    print(json.dumps(out))


def _supervise():
    """Crash-resilient wrapper: the axon TPU worker intermittently dies
    mid-run ('TPU worker process crashed or restarted', 3x on
    2026-08-19), which kills the whole in-process bench. Run the real
    bench as a child and retry up to 3 times — a fresh process gets a
    fresh TPU client; the persistent compilation cache makes retries
    cheap. The child's LAST stdout line is the tracked JSON line."""
    env = dict(os.environ, SDT_BENCH_CHILD="1")
    last_line = None
    for attempt in range(3):
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True)
        lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
        if r.returncode == 0 and lines:
            print(lines[-1])
            return
        last_line = lines[-1] if lines else None
        print(f"bench: child attempt {attempt + 1}/3 failed "
              f"(rc={r.returncode})", file=sys.stderr)
        sys.stderr.write(r.stderr[-2000:] + "\n")
        time.sleep(60)
    # all attempts failed: emit an explicit failure record (never an
    # inherited stale number)
    print(json.dumps({
        "metric": "train_images_per_sec_chip", "value": None,
        "unit": "FAILED: TPU worker crashed on all 3 bench attempts",
        "vs_baseline": None, "partial_stdout": last_line}))


if __name__ == "__main__":
    if os.environ.get("SDT_BENCH_CHILD") == "1":
        main()
    else:
        _supervise()
