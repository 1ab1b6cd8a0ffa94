"""Losses: sigmoid focal, task-aligned focal (QFL-style), L1, GIoU.

Semantics match the reference's active losses:
* FocalLoss (mmdet sigmoid focal, alpha=.25 gamma=2, loss_weight 2) —
  `loss_cls2` in `dino_detr_ssod_head.py:107-113`.
* TaskAlignedFocalLoss (reference
  `detr_od/models/losses/task_aligned_focal_loss.py:35-65`):
  |soft - p|^gamma * BCE(p, soft) with soft = metric * onehot, no alpha —
  `loss_cls1`.
* L1 on normalized cxcywh (weight 5) and GIoU (weight 2) — note the
  reference ALSO logs loss_bbox_xy/loss_bbox_hw as separate loss keys that
  mmcv's parse_losses sums into the total, so the effective L1 term is
  doubled; `l1_terms` reproduces that.

All functions are mask/weight based (static shapes); `avg_factor` follows
mmdet weight_reduce_loss: sum(loss * weight) / avg_factor.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import boxes as box_ops


def sigmoid_focal_loss(logits, labels, weight, avg_factor,
                       num_classes: int, alpha: float = 0.25,
                       gamma: float = 2.0):
    """logits: (..., K); labels: (...,) int with num_classes = background;
    weight: (...,) per-element; returns scalar sum/avg_factor."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = (jnp.logaddexp(0.0, -logits) * onehot
          + jnp.logaddexp(0.0, logits) * (1 - onehot))
    pt = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    loss = alpha_t * ((1 - pt) ** gamma) * ce
    return (loss.sum(-1) * weight).sum() / jnp.maximum(avg_factor, 1.0)


def task_aligned_focal_loss(logits, labels, metrics, weight, avg_factor,
                            num_classes: int, gamma: float = 2.0):
    """logits: (..., K) raw class logits; labels int (bg=num_classes);
    metrics: (...,) soft targets.

    BCE is computed from LOGITS via logaddexp (same as
    sigmoid_focal_loss): clipping sigmoid output cannot work in float32 —
    float32(1 - 1e-12) == 1.0, so saturated logits (>= ~17) made
    log(1 - p) = -inf and one confident query NaN'd the whole warm-up
    loss."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    soft = metrics[..., None] * onehot
    p = jax.nn.sigmoid(logits)
    # -log(p) = softplus(-x); -log(1-p) = softplus(x)
    ce = (soft * jnp.logaddexp(0.0, -logits)
          + (1 - soft) * jnp.logaddexp(0.0, logits))
    loss = (jnp.abs(soft - p) ** gamma) * ce
    return (loss.sum(-1) * weight).sum() / jnp.maximum(avg_factor, 1.0)


def l1_loss(pred, target, weight, avg_factor):
    """pred/target (..., D), weight (..., D) per-coordinate."""
    return (jnp.abs(pred - target) * weight).sum() / jnp.maximum(
        avg_factor, 1.0)


def giou_loss(pred_xyxy, target_xyxy, weight, avg_factor):
    """weight: (...,) per-box (mmdet reduces (n,4) weights by mean(-1))."""
    g = box_ops.elementwise_giou(pred_xyxy, target_xyxy)
    return ((1.0 - g) * weight).sum() / jnp.maximum(avg_factor, 1.0)


def l1_terms(pred, target, weight4, avg_factor):
    """Returns (full, xy, hw) L1 terms — all three enter the total loss in
    the reference (mmcv sums every 'loss' key). full == xy + hw by
    construction (same weights/avg over disjoint coordinate slices)."""
    xy = l1_loss(pred[..., :2], target[..., :2], weight4[..., :2],
                 avg_factor)
    hw = l1_loss(pred[..., 2:], target[..., 2:], weight4[..., 2:],
                 avg_factor)
    return xy + hw, xy, hw


def focal_cost(logits, gt_labels, alpha: float = 0.25, gamma: float = 2.0,
               eps: float = 1e-12):
    """mmdet FocalLossCost: (Nq, G) matching cost.
    logits (Nq, K); gt_labels (G,)."""
    p = jax.nn.sigmoid(logits)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * (p ** gamma)
    pos = -jnp.log(p + eps) * alpha * ((1 - p) ** gamma)
    return (pos - neg)[:, gt_labels]


def pair_l1_cost(pred_cxcywh, gt_cxcywh):
    """mmdet BBoxL1Cost (xywh): cdist p=1 -> (Nq, G)."""
    return jnp.abs(pred_cxcywh[:, None] - gt_cxcywh[None]).sum(-1)


def giou_cost(pred_xyxy, gt_xyxy):
    return -box_ops.pairwise_giou(pred_xyxy, gt_xyxy)


# ---------------------------------------------------------------------------
# Registered-but-unused reference losses, ported for API completeness.
# No live Semi-DETR config selects these (SURVEY.md §7 marks them dead on
# the reference's active path); they are available for custom configs and
# are torch-parity tested in tests/test_losses_registered.py.
# ---------------------------------------------------------------------------

def softmax_focal_loss(logits, labels, gamma: float = 1.5,
                       class_weight=None, reduction: str = "sum"):
    """Multi-class focal loss over softmax CE
    (`detr_od/models/losses/softmax_focal_loss.py:9-76`):
    loss = (1 - exp(-CE))**gamma * CE, CE = cross_entropy(logits, labels).

    logits (N, K) f32; labels (N,) int. reduction: none|sum|mean."""
    logp = jax.nn.log_softmax(logits, -1)
    ce = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
    if class_weight is not None:
        ce = ce * jnp.asarray(class_weight)[labels]
    loss = (1.0 - jnp.exp(-ce)) ** gamma * ce
    if reduction == "none":
        return loss
    if reduction == "mean":
        return loss.mean()
    return loss.sum()


def binary_kl_div_loss(logits, target, binary: bool = False,
                       eps: float = 1e-12):
    """Per-box (un-reduced) KL/JS divergence between sigmoid scores and a
    soft target (`detr_od/models/losses/binary_kl_div_loss.py:14-82`).

    binary=False: sum_k target_k * (log target_k - log(sigmoid(logit)_k))
    (torch F.kl_div semantics; target log term contributes 0 where
    target==0). binary=True: symmetric JS over the per-class Bernoulli
    {p, 1-p}. Returns (N,)."""
    p = jax.nn.sigmoid(logits)

    def _kl(log_q, t):
        # t * (log t - log_q), with 0 log 0 = 0
        return jnp.where(t > 0, t * (jnp.log(jnp.maximum(t, eps)) - log_q),
                         0.0)

    if not binary:
        return _kl(jnp.log(p + eps), target).sum(-1)
    pb = jnp.stack([p, 1.0 - p], -1)                # (N, K, 2)
    tb = jnp.stack([target, 1.0 - target], -1)
    m = 0.5 * (pb + tb)
    loss = _kl(jnp.log(pb + eps), m) + _kl(jnp.log(tb + eps), m)
    return 0.5 * loss.sum(-1).sum(-1)


def focal_kl_loss(logits, target, gamma: float = 0.5,
                  weight=None, avg_factor=None):
    """Focal-modulated symmetric binary KL
    (`detr_od/models/losses/soft_label_focal_loss.py:27-105`, use_sigmoid):
    KL(target||sigmoid) + KL(1-target||1-sigmoid), per class, scaled by
    ((target - sigmoid)^2 + 1e-6)**(gamma/2); mean-reduced (optionally by
    avg_factor) with optional per-box weight."""
    logp = jax.nn.log_sigmoid(logits)
    logn = -logits + logp                            # log(1 - sigmoid)
    eps = 1e-12

    def _kl(log_q, t):
        # torch F.kl_div(log_q, t) = t*(log t - log_q), xlogy semantics
        # (0 log 0 = 0)
        return jnp.where(t > 0, t * (jnp.log(jnp.maximum(t, eps)) - log_q),
                         0.0)

    loss = _kl(logp, target) + _kl(logn, 1.0 - target)
    p = jax.nn.sigmoid(logits)
    focal = ((target - p) ** 2 + 1e-6) ** (0.5 * gamma)
    loss = focal * loss
    if weight is not None:
        loss = loss * weight.reshape(-1, 1)
    if avg_factor is not None:
        return loss.sum() / avg_factor
    return loss.mean()
