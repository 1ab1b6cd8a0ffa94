"""Train state: student params, EMA teacher params, optimizer state, step.

Capability parity with the reference's training-state surface:
* the teacher is an EMA copy of the student updated before every train
  iteration (`detr_ssod/utils/hooks/mean_teacher.py:37-64`) with momentum
  ramp-in  m_eff = min(momentum, 1 - (1+warm)/(step+1+warm));
* at iteration 0 the teacher is initialized as an exact clone
  (`mean_teacher.py:26-35`);
* checkpoints hold {student, teacher, optimizer, step} in one tree, and a
  plain (supervised) detector checkpoint loads into BOTH copies — the
  reference's key-duplication rule (`dino_detr_ssod.py:953-978`).

TPU-first: the whole state is a pytree of global jax.Arrays; under a
`jax.sharding.Mesh` the params are replicated and the optimizer update is
sharded by XLA — no DDP wrapper object exists.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


def copy_tree(tree):
    """Deep-copy a param tree into DISTINCT device buffers. Teacher
    duplication must not alias student buffers: under buffer donation
    (`donate=True`) an aliased state is an XLA error ('attempt to donate
    the same buffer twice')."""
    return jax.tree.map(jnp.copy, tree)


@flax.struct.dataclass
class TrainState:
    step: jax.Array                 # () int32 — curr_step of the reference
    params: Any                     # student trainable params
    batch_stats: Any                # frozen BN stats (never updated)
    teacher_params: Optional[Any]   # EMA copy; None in supervised-only runs
    opt_state: Any

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation,
               with_teacher: bool = True):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            teacher_params=copy_tree(params) if with_teacher else None,
            opt_state=tx.init(params),
        )


def ema_momentum(step: jax.Array, momentum: float = 0.999,
                 warm_up: int = 0, decay_intervals=(),
                 decay_factor: float = 0.1) -> jax.Array:
    """Reference `MeanTeacher.before_train_iter` ramp
    (`mean_teacher.py:46-50`): min(momentum, 1 - (1+warm)/(step+1+warm)).

    `decay_intervals`/`decay_factor` reproduce `after_train_iter`
    (`mean_teacher.py:52-57`), which mutates self.momentum CUMULATIVELY
    every iteration:  1-m  <-  (1-m) / f^bisect_right(intervals, step).
    Unrolled to the closed form used here:
        1 - m(t) = (1 - m0) / f^E(t),  E(t) = sum_i max(0, t - intervals_i).
    (With the default f=0.1 this makes 1-m GROW 10x per iteration past the
    first interval — the reference's literal behavior, reproduced
    faithfully; its active configs leave decay_intervals=None.)"""
    stepf = step.astype(jnp.float32)
    m0 = jnp.float32(momentum)
    if decay_intervals:
        iv = jnp.asarray(decay_intervals, jnp.float32)
        exponent = jnp.maximum(stepf[..., None] - iv, 0.0).sum(-1)
        m0 = 1.0 - (1.0 - m0) * jnp.float32(decay_factor) ** (-exponent)
    ramp = 1.0 - (1.0 + warm_up) / (stepf + 1.0 + warm_up)
    return jnp.minimum(m0, ramp)


def ema_update(teacher_params, student_params, step: jax.Array,
               momentum: float = 0.999, warm_up: int = 0,
               decay_intervals=(), decay_factor: float = 0.1):
    """teacher <- m*teacher + (1-m)*student (`mean_teacher.py:60-64`)."""
    m = ema_momentum(step, momentum, warm_up, decay_intervals, decay_factor)
    return jax.tree.map(
        lambda t, s: t * m + s.astype(t.dtype) * (1.0 - m),
        teacher_params, student_params)
