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
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "SDT_REPO": repo,
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
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

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
