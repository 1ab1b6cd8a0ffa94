"""Two-PROCESS multi-host simulation (real jax.distributed over CPU).

Validates the actual multi-host plumbing end-to-end — what the 8-device
single-process mesh test cannot: `maybe_initialize_distributed` forming
the runtime from the launch env (tools/launch_tpu.sh contract),
`shard_batch` assembling global arrays via
`jax.make_array_from_process_local_data`, a cross-process collective,
and SemiBalanceSampler handing each process a disjoint slice of the
same global step (reference rank sharding, semi_sampler.py:185-187).
Model math equivalence on a mesh is covered separately by
tests/test_multidevice_and_e2e.py (kept single-process so its compile
cache is shared); this test keeps compiles trivial.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np
sys.path.insert(0, os.environ["SDT_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from semi_detr_tpu.parallel import (make_mesh, maybe_initialize_distributed,
                                    shard_batch)
from semi_detr_tpu.data.sampler import SemiBalanceSampler

assert maybe_initialize_distributed(), "coordinator env not honored"
pid, nproc = jax.process_index(), jax.process_count()
assert nproc == 2, nproc
assert len(jax.devices()) == 8, len(jax.devices())   # 4 local x 2

mesh = make_mesh()
# each process contributes ITS 4 rows of the global batch
local = np.arange(4, dtype=np.float32) + 4 * pid
batch = {"x": local[:, None] * np.ones((4, 3), np.float32)}
gb = shard_batch(batch, mesh)
assert gb["x"].shape == (8, 3), gb["x"].shape

# global-view reduction == collective across processes
total = float(jax.jit(lambda b: b["x"].sum())(gb))
expect = float(np.arange(8, dtype=np.float32).sum() * 3)
assert abs(total - expect) < 1e-5, (total, expect)

# sampler: same step, disjoint per-process shards
s = SemiBalanceSampler(40, 80, np.ones(40, np.int64), np.ones(80, np.int64),
                      samples_per_batch=3, sample_ratio=(1, 2),
                      epoch_length=5, seed=7, num_shards=nproc,
                      shard_id=pid)
draws = [(sup.tolist(), unsup.tolist(), f) for sup, unsup, f in s.epoch(0)]

# rank-sliced eval (reference multi_gpu_test): each process infers a
# disjoint batch slice, gather_results unions them on every host
from semi_detr_tpu.data.coco import CocoDataset
from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector
from semi_detr_tpu.models.inference import evaluate_detector

tiny = DinoConfig(num_classes=1, num_queries=12, d_model=32, n_heads=2,
                  num_encoder_layers=1, num_decoder_layers=1, d_ffn=32,
                  dn_single_pad=2, dn_groups=1, max_gt=4)
det = DINODetector(tiny)
variables = det.init({"params": jax.random.PRNGKey(0)},
                     np.zeros((1, 64, 64, 3), np.float32),
                     np.asarray([[64, 64]], np.int32))
val = CocoDataset(os.environ["SDT_EVAL_ANN"], os.environ["SDT_EVAL_IMG"],
                  classes=("person",), test_mode=True,
                  filter_empty_gt=False)
res = evaluate_detector(det, variables, val, batch_size=2, use_nms=False,
                        bucket=(64, 64), test_scale=(56, 56), num_classes=1)
print("EVAL", res["mAP"], res["AR_100"], flush=True)
print("RESULT", total, repr(draws), flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_cpu(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    # tiny val set for the rank-sliced eval leg (6 images -> 3 batches
    # of 2: process 0 gets batches {0, 2}, process 1 gets {1})
    from semi_detr_tpu.data.synthetic import write_synthetic_coco
    ann, img_dir = write_synthetic_coco(str(tmp_path / "data"), n=6,
                                        hw=(64, 64), seed=3)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "SDT_REPO": repo,
            "SDT_EVAL_ANN": ann,
            "SDT_EVAL_IMG": img_dir,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    # both processes computed the SAME eval metrics over the union of
    # their disjoint slices — and they match a single-process eval of
    # the same random-init model (PRNGKey(0) is process-independent)
    evals = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("EVAL")][0]
        evals.append(tuple(float(x) for x in line.split()[1:]))
    assert evals[0] == evals[1], evals

    from semi_detr_tpu.data.coco import CocoDataset
    from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector
    from semi_detr_tpu.models.inference import evaluate_detector
    import jax

    tiny = DinoConfig(num_classes=1, num_queries=12, d_model=32,
                      n_heads=2, num_encoder_layers=1,
                      num_decoder_layers=1, d_ffn=32, dn_single_pad=2,
                      dn_groups=1, max_gt=4)
    det = DINODetector(tiny)
    variables = det.init({"params": jax.random.PRNGKey(0)},
                         np.zeros((1, 64, 64, 3), np.float32),
                         np.asarray([[64, 64]], np.int32))
    val = CocoDataset(ann, img_dir, classes=("person",), test_mode=True,
                      filter_empty_gt=False)
    res = evaluate_detector(det, variables, val, batch_size=2,
                            use_nms=False, bucket=(64, 64),
                            test_scale=(56, 56), num_classes=1)
    # loose tol: parent/workers are different XLA processes (device
    # count 8 vs 4) — tie-break jitter only; a dropped/duplicated image
    # moves these metrics at the 1e-2 level
    np.testing.assert_allclose(evals[0][0], res["mAP"], atol=1e-3)
    np.testing.assert_allclose(evals[0][1], res["AR_100"], atol=1e-3)

    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        _, total, draws = line.split(" ", 2)
        results.append((float(total), eval(draws)))

    # both processes computed the same global reduction
    assert results[0][0] == results[1][0]
    # per-step flags agree; index shards are disjoint, union covers the
    # global draw
    for (s0, u0, f0), (s1, u1, f1) in zip(results[0][1], results[1][1]):
        assert f0 == f1
        assert not (set(s0) & set(s1)) and not (set(u0) & set(u1))
        assert len(s0) == len(s1) == 1 and len(u0) == len(u1) == 2
