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
                 warm_up: int = 0) -> jax.Array:
    """Reference `MeanTeacher.before_train_iter` ramp
    (`mean_teacher.py:46-50`): min(momentum, 1 - (1+warm)/(step+1+warm))."""
    ramp = 1.0 - (1.0 + warm_up) / (step.astype(jnp.float32) + 1.0 + warm_up)
    return jnp.minimum(jnp.float32(momentum), ramp)


def ema_update(teacher_params, student_params, step: jax.Array,
               momentum: float = 0.999, warm_up: int = 0):
    """teacher <- m*teacher + (1-m)*student (`mean_teacher.py:60-64`)."""
    m = ema_momentum(step, momentum, warm_up)
    return jax.tree.map(
        lambda t, s: t * m + s.astype(t.dtype) * (1.0 - m),
        teacher_params, student_params)
