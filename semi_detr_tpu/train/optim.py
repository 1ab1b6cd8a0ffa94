"""Optimizer: AdamW with the reference's param-group rules.

Matches `configs/dino_detr/dino_detr_ssod_r50_coco_120k.py:130-139`:
AdamW lr 1e-4, weight_decay 1e-4, backbone lr x0.1
(paramwise custom_keys {'backbone': lr_mult 0.1}), global-norm grad clip
max_norm 0.1; plus mmdet `frozen_stages=1`/`norm_eval` freezing (stem +
stage-1 parameters receive no updates; BN statistics live in a separate
non-trainable collection).

Step LR schedule: x0.1 at the configured boundaries
(`base_dino_detr_ssod_coco.py:251`: steps [120k, 160k] for the 180k SSOD
recipe; [11 epochs] for supervised 12e).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def is_frozen(path_str: str) -> bool:
    """mmdet frozen_stages=1: ResNet stem + layer1 are frozen."""
    return ("backbone" in path_str and
            ("stem_" in path_str or "/layer1_" in path_str))


def is_backbone(path_str: str) -> bool:
    return "backbone" in path_str


def step_lr(base_lr: float, boundaries: Sequence[int], gamma: float = 0.1):
    def sched(count):
        factor = jnp.float32(1.0)
        for b in boundaries:
            factor = factor * jnp.where(count >= b, gamma, 1.0)
        return base_lr * factor
    return sched


def make_optimizer(params, base_lr: float = 1e-4,
                   weight_decay: float = 1e-4,
                   backbone_lr_mult: float = 0.1,
                   clip_norm: float = 0.1,
                   lr_boundaries: Sequence[int] = ()):
    """Returns an optax GradientTransformation with per-group lr mults."""
    labels = jax.tree_util.tree_map_with_path(
        lambda p, _: ("frozen" if is_frozen(_path_str(p))
                      else "backbone" if is_backbone(_path_str(p))
                      else "head"), params)

    sched = step_lr(base_lr, lr_boundaries)

    def adamw(mult):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(
                lambda c: sched(c) * mult, flip_sign=True),
        )

    # frozen grads are zeroed BEFORE the global-norm clip: mmdet's
    # OptimizerHook.clip_grads filters to requires_grad params, so the
    # frozen stem/layer1 gradients (nonzero — they're on the forward
    # path) must not inflate the norm and over-clip trainable updates
    return optax.chain(
        optax.multi_transform(
            {"head": optax.identity(), "backbone": optax.identity(),
             "frozen": optax.set_to_zero()},
            labels),
        optax.clip_by_global_norm(clip_norm),
        optax.multi_transform(
            {"head": adamw(1.0), "backbone": adamw(backbone_lr_mult),
             "frozen": optax.set_to_zero()},
            labels),
    )
