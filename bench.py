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

Crash resilience (round-5 redesign after BENCH_r04 died rc=124 with all
three child attempts kernel-faulting at the landed defaults): the retry
ladder now DEGRADES instead of retrying the identical configuration —
attempt 1 = landed defaults, attempt 2 = safe-kernel knobs
(SDT_PACKED_GATHER=0, scan_unroll=1, tiled_tokens off), attempt 3 =
safe knobs + fewer iters — and the whole run is bounded by a wall-clock
budget (SDT_BENCH_BUDGET_S, default 3000 s) so a JSON line always lands
inside the driver's timeout. A degraded measurement records its knobs in
the "unit" string so the tracked series stays honest.

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

_T0 = time.monotonic()
# total wall budget for the supervisor (probe + all attempts); the
# driver killed r4 at its own timeout before even the failure JSON
# printed, so stay comfortably inside it
_BUDGET_S = float(os.environ.get("SDT_BENCH_BUDGET_S", "3000"))

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


def _remaining():
    return _BUDGET_S - (time.monotonic() - _T0)


@contextlib.contextmanager
def _tpu_lock(max_wait_s: int = 2400):
    """Bounded-wait exclusive lock; proceeds anyway after max_wait_s
    (the bench must always emit its line, even if a sweep run hangs).

    SDT_TPU_LOCK_HELD=1 skips the lock entirely: a queue wrapper that
    already holds the flock around `python bench.py` would otherwise
    self-deadlock for the whole wait window (this is exactly how the
    r5 main-queue bench attempt burned its 2700 s and died rc=124)."""
    import fcntl
    if os.environ.get("SDT_TPU_LOCK_HELD") == "1":
        yield
        return
    f = open(_TPU_LOCK, "w")
    deadline = time.monotonic() + min(max_wait_s, max(_remaining() - 300, 60))
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
    failure — the bench must always emit its JSON line."""
    import jax
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
    setup+timing path as `train_step_bench.py --ssod`).

    Child-process knobs (set by the supervisor's degrading ladder):
    SDT_BENCH_UNROLL, SDT_BENCH_TILED, SDT_BENCH_ITERS, plus
    SDT_PACKED_GATHER consumed inside the Pallas kernel module."""
    from semi_detr_tpu.train.bench import build_ssod_step, timed_steps

    unroll = int(os.environ.get("SDT_BENCH_UNROLL", "6"))
    tiled = os.environ.get("SDT_BENCH_TILED", "1") == "1"
    iters = int(os.environ.get("SDT_BENCH_ITERS", "5"))
    packed = os.environ.get("SDT_PACKED_GATHER", "0") == "1"
    degraded = not (unroll == 6 and tiled and not packed and iters >= 5)
    knobs = (f" [degraded: unroll={unroll} tiled={int(tiled)} "
             f"packed={int(packed)} iters={iters}]" if degraded else "")

    n_sup, n_unsup, h, w = 1, 4, 800, 1344
    step, state, batch, rng = build_ssod_step(
        n_sup, n_unsup, h, w, scan_unroll=unroll, tiled_tokens=tiled)
    med, _, state, _ = timed_steps(step, state, batch, rng, iters=iters)
    ips = (n_sup + n_unsup) / med
    out = {
        "metric": "train_images_per_sec_chip",
        "value": round(ips, 3),
        "unit": f"img/s/chip (SSOD recipe step 1sup+4unsup, tpu, {h}x{w}, "
                f"warm-up stage, bf16+remat){knobs}",
        "vs_baseline": round(ips / A100_REF_IMG_PER_SEC, 3),
        # sensitivity range of the estimated A100 denominator (2.0-3.3
        # img/s): [conservative vs 3.3, optimistic vs 2.0]
        "vs_baseline_range": [round(ips / A100_REF_BOUNDS[1], 3),
                              round(ips / A100_REF_BOUNDS[0], 3)],
    }

    # best-effort sibling metric: the post-warm-up stage program (the
    # 120k recipe spends its second half there; round-4 verdict #4).
    # Separate program -> separate compile; skip when the budget or an
    # env opt-out says so. Failure here never loses the main number.
    if os.environ.get("SDT_BENCH_POST_WARMUP", "1") == "1":
        try:
            del step, state, batch
            step2, state2, batch2, rng2 = build_ssod_step(
                n_sup, n_unsup, h, w, warm_up=False,
                scan_unroll=unroll, tiled_tokens=tiled)
            med2, _, _, _ = timed_steps(step2, state2, batch2, rng2,
                                        iters=iters)
            out["post_warmup_value"] = round((n_sup + n_unsup) / med2, 3)
            out["post_warmup_unit"] = "img/s/chip (post-warm-up stage)"
        except Exception as e:  # noqa: BLE001
            out["post_warmup_value"] = None
            out["post_warmup_unit"] = f"FAILED: {type(e).__name__}"
    return out


def _bench_supervised_cpu():
    """CPU fallback: tiny supervised step so the bench always completes."""
    import jax
    import jax.numpy as jnp
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
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # explicit CPU run: never touch the chip OR the TPU lock (a CPU
        # bench holding the lock starves cooperating TPU queues)
        out = _bench_supervised_cpu()
    else:
        with _tpu_lock():
            platform = _probe_devices()
            if platform == "tpu":
                out = _bench_ssod_tpu()
            else:
                out = _bench_supervised_cpu()
    print(json.dumps(out))


# the degrading ladder: each attempt is (env overrides, label). A fresh
# child process per attempt = a fresh TPU client after a worker crash.
_LADDER = [
    ({}, "landed defaults"),
    ({"SDT_PACKED_GATHER": "0", "SDT_FWD_MXU": "0", "SDT_BENCH_UNROLL": "1",
      "SDT_BENCH_TILED": "0"}, "safe kernel knobs"),
    ({"SDT_PACKED_GATHER": "0", "SDT_FWD_MXU": "0", "SDT_BENCH_UNROLL": "1",
      "SDT_BENCH_TILED": "0", "SDT_BENCH_ITERS": "3",
      "SDT_BENCH_POST_WARMUP": "0"}, "safe knobs, short"),
]


def _supervise():
    """Crash-resilient wrapper (see module docstring): degrade through
    _LADDER inside the wall budget; always print a JSON line."""
    last_line = None
    for i, (overrides, label) in enumerate(_LADDER):
        child_budget = _remaining() - 120   # keep slack to print
        if child_budget < 300:
            print(f"bench: budget exhausted before attempt {i + 1}",
                  file=sys.stderr)
            break
        env = dict(os.environ, SDT_BENCH_CHILD="1", **overrides)
        print(f"bench: attempt {i + 1}/{len(_LADDER)} ({label}), "
              f"budget {child_budget:.0f}s", file=sys.stderr)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=child_budget)
        except subprocess.TimeoutExpired:
            print(f"bench: attempt {i + 1} timed out", file=sys.stderr)
            continue
        lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
        if r.returncode == 0 and lines:
            print(lines[-1])
            return
        last_line = lines[-1] if lines else None
        print(f"bench: attempt {i + 1} ({label}) failed "
              f"(rc={r.returncode})", file=sys.stderr)
        sys.stderr.write(r.stderr[-2000:] + "\n")
        if "TPU worker process crashed" in r.stderr:
            # the axon worker can take many minutes to restart after a
            # kernel fault (75 min observed 2026-08-19); retrying
            # immediately makes the probe pin CPU and records a
            # meaningless CPU number. Wait as long as the budget allows.
            wait = min(900.0, max(_remaining() - 900, 0))
            print(f"bench: worker crash detected, waiting {wait:.0f}s "
                  "for restart", file=sys.stderr)
            time.sleep(wait)
        elif _remaining() > 360:
            time.sleep(30)
    # all attempts failed: emit an explicit failure record (never an
    # inherited stale number)
    print(json.dumps({
        "metric": "train_images_per_sec_chip", "value": None,
        "unit": "FAILED: no bench attempt completed (see stderr)",
        "vs_baseline": None, "partial_stdout": last_line}))


if __name__ == "__main__":
    if os.environ.get("SDT_BENCH_CHILD") == "1":
        main()
    else:
        _supervise()
