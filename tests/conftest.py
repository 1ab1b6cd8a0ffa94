"""Test env: run on CPU with an 8-device virtual mesh (TPU-free CI).

Mirrors the survey's test plan (SURVEY.md §4): multi-chip sharding is
validated on a host-platform virtual mesh via
--xla_force_host_platform_device_count, the TPU-native analog of testing
multi-node code without a cluster.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in flags:
    # 8 virtual devices share ONE sandbox vCPU: under load a collective
    # participant thread can starve past XLA's default stuck-call
    # terminate timeout, which hard-aborts the process mid-test
    # ("Fatal Python error: Aborted" in the mesh-equivalence test).
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compilation cache: the sandbox has 1 vCPU, compiles dominate
# test wall-time; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

# the axon sitecustomize force-registers the TPU tunnel and overwrites
# jax_platforms at import time (axon/register/pjrt.py:112) — pin CPU at
# the config level so the suite really runs on the virtual 8-device mesh
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute compile-heavy tests")
    config.addinivalue_line(
        "markers", "fast: sub-5-minute CI gate subset (auto-applied to "
        "every test not marked slow; run with `pytest -m fast`)")


def pytest_collection_modifyitems(config, items):
    """Tier the suite: everything not explicitly `slow` is `fast`, so
    `pytest -m fast` is the quick gate and `pytest -m slow` the heavy
    parity/e2e/soak set (the full 145+-test suite no longer fits a
    10-minute window on a 1-vCPU host)."""
    import pytest as _pytest
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(_pytest.mark.fast)
