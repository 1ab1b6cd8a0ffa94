"""Supervised DINO train step — one jitted global-view step.

Reproduces the per-iteration semantics of the supervised path
(`tools/train_detr_od.py` → `DINODETRHead.forward_train` → CDN + forward +
Hungarian loss → grad clip 0.1 → AdamW; SURVEY.md §3.2) as a single jitted
function: CDN noise, forward, loss, backward, clip, AdamW update all under
one XLA program. Under a mesh the batch is sharded on 'data' and XLA
inserts the gradient all-reduce.

`warm_up` (hybrid O2M matching stage) is a static bool — the step is
compiled once per stage, matching the reference's `in_warm_up` switch
(`dino_detr_ssod_head.py:238-241`) without a traced branch.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from ..models.criterion import detection_loss
from ..models.dino_head import DINODetector
from .state import TrainState, ema_update


def make_supervised_train_step(model: DINODetector,
                               tx: optax.GradientTransformation,
                               warm_up: bool = False,
                               ema_momentum: float = 0.999,
                               ema_warm: int = 0,
                               mesh=None,
                               donate: bool = False,
                               state_sharding=None,
                               cls_avg_group=None):
    """Returns step(state, batch, rng) -> (state, metrics).

    batch: {images (B,H,W,3) f32, img_hw (B,2) i32,
            gt: {boxes (B,G,4) cxcywh-norm, labels (B,G) i32, valid (B,G)}}

    cls_avg_group: opt-in reference-exact per-GPU cls avg factor —
    images per reference GPU (its samples_per_gpu, e.g. 2); None (the
    default) keeps the global sync-semantics factor.
    """
    cfg = model.cfg

    def step_fn(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        # fresh DN noise every iteration (the caller passes one key for
        # the whole run; without the fold-in the CDN box jitter/label
        # flips would repeat the same pattern every step)
        rng = jax.random.fold_in(rng, state.step)
        if state.teacher_params is not None:
            # reference updates the EMA BEFORE the train iter
            # (`mean_teacher.py:37-50`)
            teacher = ema_update(state.teacher_params, state.params,
                                 state.step, ema_momentum, ema_warm)
        else:
            teacher = None

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"], batch["img_hw"], gt=batch["gt"],
                dn_rng=rng)
            losses = detection_loss(out, batch["gt"], cfg.num_classes,
                                    warm_up, cls_group=cls_avg_group)
            return losses["total"], losses

        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = metrics.pop("total")
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=params,
                                  teacher_params=teacher,
                                  opt_state=opt_state)
        return new_state, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        # state_sharding: replicated by default, or the per-leaf FSDP
        # tree from parallel.fsdp_sharding (params/opt/teacher sharded)
        st = state_sharding if state_sharding is not None else repl
        return jax.jit(
            step_fn,
            in_shardings=(st, data, repl),
            out_shardings=(st, repl),
            donate_argnums=(0,) if donate else ())
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
