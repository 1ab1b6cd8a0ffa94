"""Scheduled attribute values + loss-weight ramps.

Capability parity with the reference `Weighter` hook
(`detr_ssod/utils/hooks/weight_adjust.py:7-35`: sets named attributes,
e.g. `unsup_weight`, to scheduled values at given steps) and the
`weighted_loss` warm-up ramp (`detr_ssod/utils/structure_utils.py:127-153`:
optional linear ramp of loss weights over the first `warmup` steps).

TPU-native shape: schedules are pure functions of the step, evaluated
in-graph (jnp.where chains) or host-side — no hook objects.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def step_schedule(values: Sequence[float], boundaries: Sequence[int]):
    """values[i] applies from boundaries[i-1] (0 for i=0) to
    boundaries[i]. len(values) == len(boundaries) + 1."""
    assert len(values) == len(boundaries) + 1

    def fn(step):
        out = jnp.float32(values[0])
        for v, b in zip(values[1:], boundaries):
            out = jnp.where(step >= b, jnp.float32(v), out)
        return out

    return fn


def linear_warmup(target: float, warmup_steps: int):
    """weighted_loss(warmup=N) semantics: weight ramps 0 -> target over
    the first N steps, then stays at target."""
    def fn(step):
        if warmup_steps <= 0:
            return jnp.float32(target)
        frac = jnp.clip(step.astype(jnp.float32) / warmup_steps, 0.0, 1.0)
        return jnp.float32(target) * frac

    return fn


def constant(value: float):
    return lambda step: jnp.float32(value)
