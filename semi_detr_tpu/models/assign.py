"""Target assignment — Hungarian one-to-one and TOOD-style one-to-many.

Vectorized static-shape re-designs of:
* mmdet HungarianAssigner with FocalLossCost(2.0) + BBoxL1Cost(5.0, xywh)
  + IoUCost(giou, 2.0) as configured in
  `configs/dino_detr/dino_detr_ssod_r50_coco_120k.py:47-52`, consumed by
  `_get_target_single` post-warm-up branch
  (`dino_detr_ssod_head.py:1188-1207`).
* `O2MAssigner` (`detr_od/core/bbox/assigners/o2m_assigner.py:17-170`):
  alignment metric score^alpha * IoU^beta (alpha=1, beta=6), top-13
  candidates per GT, conflicts resolved by max IoU, plus the per-GT
  instance normalization of metrics from the warm-up branch of
  `_get_target_single` (`dino_detr_ssod_head.py:1148-1162`), vectorized
  with masked segment max instead of a loop over unique GT indices.

All boxes are cxcywh normalized to the per-image valid extent. IoU/GIoU are
invariant under the anisotropic (1/w, 1/h) scaling, so matching in
normalized coordinates is exactly equivalent to the reference's
absolute-pixel computation.

Per-image functions; vmap over the batch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import boxes as box_ops
from ..ops import hungarian
from . import losses

INF = 1e8


class Targets(NamedTuple):
    labels: jax.Array          # (Nq,) int32, num_classes = background
    label_weights: jax.Array   # (Nq,)
    bbox_targets: jax.Array    # (Nq, 4) normalized cxcywh
    bbox_weights: jax.Array    # (Nq, 4)
    norm_metrics: jax.Array    # (Nq,) TOOD normalized alignment metrics
    num_pos: jax.Array         # () float


def one_to_one_targets(cls_logits, bbox_pred, gt_boxes, gt_labels, gt_valid,
                       num_classes: int,
                       cls_w: float = 2.0, l1_w: float = 5.0,
                       giou_w: float = 2.0) -> Targets:
    """Hungarian matching targets for one image (static shapes)."""
    nq = cls_logits.shape[0]
    safe_labels = jnp.where(gt_valid, gt_labels, 0)
    c_cls = losses.focal_cost(cls_logits, safe_labels)           # (Nq, G)
    c_l1 = losses.pair_l1_cost(bbox_pred, gt_boxes)
    pred_xyxy = box_ops.cxcywh_to_xyxy(bbox_pred)
    gt_xyxy = box_ops.cxcywh_to_xyxy(gt_boxes)
    c_giou = losses.giou_cost(pred_xyxy, gt_xyxy)
    cost = (cls_w * c_cls + l1_w * c_l1 + giou_w * c_giou).T     # (G, Nq)
    cols = hungarian.solve(cost, gt_valid)                       # (G,)
    # invalid rows return -1: route them to the (out-of-bounds) column nq
    # and scatter with mode='drop' so they write nothing
    cols = jnp.where(gt_valid, cols, nq)

    labels = jnp.full((nq,), num_classes, jnp.int32)
    labels = labels.at[cols].set(gt_labels, mode="drop")
    bbox_targets = jnp.zeros((nq, 4), bbox_pred.dtype)
    bbox_targets = bbox_targets.at[cols].set(gt_boxes, mode="drop")
    bbox_weights = jnp.zeros((nq, 4), bbox_pred.dtype)
    bbox_weights = bbox_weights.at[cols].set(1.0, mode="drop")
    num_pos = gt_valid.sum().astype(jnp.float32)
    return Targets(labels, jnp.ones((nq,)), bbox_targets, bbox_weights,
                   jnp.zeros((nq,)), num_pos)


def o2m_targets(cls_logits, bbox_pred, gt_boxes, gt_labels, gt_valid,
                num_classes: int, topk: int = 13, alpha: float = 1.0,
                beta: float = 6.0) -> Targets:
    """TOOD one-to-many targets (warm-up stage) for one image."""
    nq = cls_logits.shape[0]
    g = gt_boxes.shape[0]
    topk = min(topk, nq)
    score = jax.nn.sigmoid(cls_logits)                           # (Nq, K)
    safe_labels = jnp.where(gt_valid, gt_labels, 0)
    pred_xyxy = box_ops.cxcywh_to_xyxy(bbox_pred)
    gt_xyxy = box_ops.cxcywh_to_xyxy(gt_boxes)
    iou = jax.lax.stop_gradient(
        box_ops.pairwise_iou(pred_xyxy, gt_xyxy))                # (Nq, G)
    bbox_scores = jax.lax.stop_gradient(score[:, safe_labels])
    align = (bbox_scores ** alpha) * (iou ** beta)               # (Nq, G)
    align = jnp.where(gt_valid[None], align, 0.0)

    # top-k candidate queries per gt
    _, cand_idx = jax.lax.top_k(align.T, topk)           # (G, k)
    cand_mask = jnp.zeros((nq, g), bool)
    cand_mask = cand_mask.at[cand_idx.reshape(-1),
                             jnp.repeat(jnp.arange(g), topk)].set(True)
    is_pos = cand_mask & (align > 0) & gt_valid[None]

    # conflict resolution: a query keeps the candidate gt with max IoU
    iou_masked = jnp.where(is_pos, iou, -INF)
    assigned_gt = jnp.argmax(iou_masked, axis=1)                 # (Nq,)
    has = jnp.max(iou_masked, axis=1) > -INF

    q = jnp.arange(nq)
    a_metric = jnp.where(has, align[q, assigned_gt], 0.0)
    a_iou = jnp.where(has, iou[q, assigned_gt], 0.0)

    # per-gt instance normalization (segment max over assigned queries)
    assign_1hot = (jax.nn.one_hot(assigned_gt, g, dtype=jnp.float32)
                   * has[:, None])                               # (Nq, G)
    m_max = jnp.max(jnp.where(assign_1hot > 0, align, -INF), axis=0)
    i_max = jnp.max(jnp.where(assign_1hot > 0, iou, -INF), axis=0)
    norm = a_metric / (m_max[assigned_gt] + 1e-7) * i_max[assigned_gt]
    norm = jnp.where(has, norm, 0.0)

    labels = jnp.where(has, gt_labels[assigned_gt], num_classes)
    labels = labels.astype(jnp.int32)
    bbox_targets = jnp.where(has[:, None], gt_boxes[assigned_gt], 0.0)
    bbox_weights = jnp.where(has[:, None],
                             jnp.broadcast_to(norm[:, None], (nq, 4)), 0.0)
    num_pos = has.sum().astype(jnp.float32)
    return Targets(labels, jnp.ones((nq,)), bbox_targets, bbox_weights,
                   norm, num_pos)
