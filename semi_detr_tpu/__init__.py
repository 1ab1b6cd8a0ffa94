"""semi_detr_tpu — TPU-native Semi-DETR framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
JCZ404/Semi-DETR (CVPR'23): DINO detection transformer training
(supervised + semi-supervised teacher/student) built TPU-first:

- static shapes everywhere (padded GT, fixed CDN layout, masked moments)
- one jitted train step (EMA update, pseudo-labeling, NMS, GMM filter,
  CDN construction, fwd/bwd, AdamW) under a `jax.sharding.Mesh`
- in-graph Hungarian (Jonker-Volgenant), in-graph 2-component GMM EM
- multi-scale deformable attention as a fused-gather XLA op with a
  Pallas kernel path

Reference behavior documented per-module with file:line citations into
the upstream repo (mounted read-only at /root/reference).
"""

__version__ = "0.1.0"

# Honor an explicit JAX_PLATFORMS=cpu: some TPU-terminal site hooks
# (axon) force jax_platforms at interpreter start, silently moving
# CPU-intended runs onto the shared chip. Restoring the user's explicit
# choice here covers every entry point (CLIs, demo, api, tests).
import os as _os

if _os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
