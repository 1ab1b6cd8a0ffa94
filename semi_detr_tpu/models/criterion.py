"""Detection criterion — per-layer matching, DN, and encoder losses.

Reproduces `DINODETRSSODHead.loss / loss_single / loss_single_dn`
(`detr_od/models/dense_heads/dino_detr_ssod_head.py:508-884`):

* matching block: per decoder layer, Hungarian(+FocalLoss) after warm-up or
  O2M(+TaskAlignedFocal) during warm-up; encoder interim outputs get the
  same loss with class-agnostic (all-zero) labels (`:568-579`).
* dn block: targets by construction (positive chunks reconstruct their GT,
  negative chunks are background — `_get_target_single_dn :885-957`);
  zeroed when `in_warm_up and is_pseudo_label` (`:550-556`); images with no
  real GT contribute no dn loss (`:941-946` + fake-GT pad_mask).
* avg-factor semantics ported exactly, incl. which factors are
  cross-device reduce_mean'd (`reduce_mean` call sites `:686-703, 757-760,
  840-853`) — here `lax.pmean` over `axis_name` when provided.
* the reference returns loss_bbox / loss_bbox_xy / loss_bbox_hw as separate
  dict entries that mmcv sums, doubling the effective L1 weight; `l1_terms`
  reproduces this faithfully.

`warm_up` is a STATIC python bool: the train step is compiled per stage
(one recompile at the stage boundary instead of a traced branch).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..core import boxes as box_ops
from . import assign, losses
from .dn import CdnBatch

CLS_W, L1_W, GIOU_W = 2.0, 5.0, 2.0


def _pmean(x, axis_name):
    return jax.lax.pmean(x, axis_name) if axis_name else x


def _grouped_cls_weights(num_pos_per_img, cls_group: Optional[int]):
    """Per-image loss scales reproducing the reference's UNSYNCED cls
    avg factor (sync_cls_avg_factor=False, dino_detr_ssod_head.py:86,
    :763-770): each consecutive group of `cls_group` images stands in
    for one reference GPU, its cls loss is normalized by the group's own
    positive count, and DDP's gradient averaging then means the per-GPU
    losses. Returns w (B,) with sum_i(l_i * w_i) ==
    mean_g(sum_{i in g} l_i / max(pos_g, 1)), or None for cls_group in
    (None, 0) / non-divisible batches -> caller keeps the global
    (sync-semantics) factor, the repo default."""
    if not cls_group:
        return None
    b = num_pos_per_img.shape[0]
    if b % cls_group != 0:
        return None
    n = b // cls_group
    chunk = jnp.maximum(
        num_pos_per_img.reshape(n, cls_group).sum(1), 1.0)   # (n,)
    return jnp.repeat(1.0 / (chunk * n), cls_group, total_repeat_length=b)


def _layer_loss(cls_scores, bbox_preds, gt, warm_up: bool, num_classes: int,
                axis_name: Optional[str], prefix: str,
                cls_group: Optional[int] = None) -> Dict[str, Any]:
    """Loss for one decoder layer's matching block across the batch.
    cls_scores (B, Nq, K); bbox_preds (B, Nq, 4); gt dict of
    boxes (B,G,4) cxcywh-normalized / labels (B,G) / valid (B,G)."""
    fn = assign.o2m_targets if warm_up else assign.one_to_one_targets
    tg = jax.vmap(lambda c, b, gb, gl, gv: fn(
        c, b, gb, gl, gv, num_classes))(
        cls_scores, bbox_preds, gt["boxes"], gt["labels"], gt["valid"])

    num_total_pos = tg.num_pos.sum()
    pred_xyxy = box_ops.cxcywh_to_xyxy(bbox_preds)
    tgt_xyxy = box_ops.cxcywh_to_xyxy(tg.bbox_targets)

    out = {}
    if warm_up:
        sum_metrics = jnp.maximum(_pmean(tg.norm_metrics.sum(), axis_name),
                                  1.0)
        out[f"{prefix}loss_cls"] = CLS_W * losses.task_aligned_focal_loss(
            cls_scores, tg.labels, tg.norm_metrics,
            tg.label_weights, sum_metrics, num_classes)
        reg_avg = jnp.maximum(
            _pmean(tg.bbox_weights[..., 0].sum(), axis_name), 1.0)
    else:
        # avg-factor semantics: the reference defaults
        # sync_cls_avg_factor=False (dino_detr_head.py:83,122 — cls
        # normalized by the PER-GPU positive count, a DDP artifact that
        # ties the cls scale to device count) but always reduce_means the
        # regression factor (:700-704). Default here: num_total_pos is
        # the GLOBAL positive count for BOTH factors — i.e.
        # sync_cls_avg_factor=True / official-DETR semantics, a
        # deliberate device-count-invariant deviation. `cls_group` opts
        # into the reference-exact per-GPU artifact mesh-independently:
        # each group of cls_group consecutive images = one reference GPU
        # (see _grouped_cls_weights). Under shard_map (axis_name set)
        # the un-pmean'd cls_avg also reproduces the per-shard artifact.
        gw = _grouped_cls_weights(tg.num_pos.astype(jnp.float32), cls_group)
        if gw is not None:
            out[f"{prefix}loss_cls"] = CLS_W * losses.sigmoid_focal_loss(
                cls_scores, tg.labels, tg.label_weights * gw[:, None],
                1.0, num_classes)
        else:
            cls_avg = jnp.maximum(num_total_pos, 1.0)
            out[f"{prefix}loss_cls"] = CLS_W * losses.sigmoid_focal_loss(
                cls_scores, tg.labels, tg.label_weights, cls_avg,
                num_classes)
        reg_avg = jnp.maximum(_pmean(num_total_pos, axis_name), 1.0)

    out[f"{prefix}loss_iou"] = GIOU_W * losses.giou_loss(
        pred_xyxy, tgt_xyxy, tg.bbox_weights[..., 0], reg_avg)
    full, xy, hw = losses.l1_terms(bbox_preds, tg.bbox_targets,
                                   tg.bbox_weights, reg_avg)
    out[f"{prefix}loss_bbox"] = L1_W * full
    out[f"{prefix}loss_bbox_xy"] = L1_W * xy
    out[f"{prefix}loss_bbox_hw"] = L1_W * hw
    return out


def _dn_layer_loss(cls_scores, bbox_preds, gt, cdn: CdnBatch,
                   num_classes: int,
                   axis_name: Optional[str], prefix: str,
                   cls_group: Optional[int] = None) -> Dict[str, Any]:
    """DN loss for one decoder layer. Targets by construction from the
    static CDN layout."""
    B, pad, _ = cls_scores.shape
    gt_idx = cdn.gt_idx                                   # (pad,)
    is_pos = cdn.is_positive                              # (pad,)
    # real (non-fake) gt at this slot?
    slot_real = jnp.take(gt["valid"], gt_idx, axis=1)     # (B, pad)
    slot_real = slot_real & ~cdn.pad_mask[:, None]

    labels = jnp.take(gt["labels"], gt_idx, axis=1)
    labels = jnp.where(is_pos[None] & slot_real, labels, num_classes)
    labels = labels.astype(jnp.int32)

    has_real = ~cdn.pad_mask                              # (B,)
    # The reference pads every image's DN chunk to the BATCH max GT count
    # and trains all those slots (background where unfilled) with label
    # weight 1 (dino_detr_head.py:800-802). In the adaptive layout
    # (models/dn.py) the active slots ARE exactly those reference slots
    # (single_pad_dyn == batch max); inactive remainder slots get weight 0.
    active = (jnp.ones_like(gt_idx, bool) if cdn.slot_active is None
              else cdn.slot_active)
    label_weights = (has_real[:, None] & active[None]).astype(jnp.float32)

    bbox_targets = jnp.take(gt["boxes"], gt_idx, axis=1)  # (B, pad, 4)
    pos_mask = (is_pos[None] & slot_real).astype(jnp.float32)
    bbox_weights = jnp.broadcast_to(pos_mask[..., None], (B, pad, 4))
    bbox_targets = bbox_targets * pos_mask[..., None]

    num_total_pos = pos_mask.sum()
    reg_avg = jnp.maximum(_pmean(num_total_pos, axis_name), 1.0)

    # same per-GPU-vs-global cls factor semantics as _layer_loss
    # (reference dn cls factor at dino_detr_ssod_head.py:835-848)
    gw = _grouped_cls_weights(pos_mask.sum(1), cls_group)
    if gw is not None:
        dn_cls = CLS_W * losses.sigmoid_focal_loss(
            cls_scores, labels, label_weights * gw[:, None], 1.0,
            num_classes)
    else:
        dn_cls = CLS_W * losses.sigmoid_focal_loss(
            cls_scores, labels, label_weights,
            jnp.maximum(num_total_pos, 1.0), num_classes)

    out = {
        f"{prefix}dn_loss_cls": dn_cls,
        f"{prefix}dn_loss_iou": GIOU_W * losses.giou_loss(
            box_ops.cxcywh_to_xyxy(bbox_preds),
            box_ops.cxcywh_to_xyxy(bbox_targets),
            bbox_weights[..., 0], reg_avg),
    }
    full, xy, hw = losses.l1_terms(bbox_preds, bbox_targets, bbox_weights,
                                   reg_avg)
    out[f"{prefix}dn_loss_bbox"] = L1_W * full
    out[f"{prefix}dn_loss_bbox_xy"] = L1_W * xy
    out[f"{prefix}dn_loss_bbox_hw"] = L1_W * hw
    return out


def detection_loss(outputs: Dict[str, Any], gt: Dict[str, Any],
                   num_classes: int, warm_up: bool,
                   axis_name: Optional[str] = None,
                   is_pseudo_label: bool = False,
                   cls_group: Optional[int] = None) -> Dict[str, Any]:
    """Full DINO loss. `outputs` from DINODetector.__call__ (training mode
    with CDN). Returns dict of named losses + 'total'.

    cls_group: opt-in reference-exact per-GPU cls avg factor — images per
    reference GPU for this branch (see _grouped_cls_weights); None (the
    default) keeps the global sync-semantics factor."""
    n_dec = outputs["cls"].shape[0]
    out: Dict[str, Any] = {}

    for lid in range(n_dec):
        prefix = "" if lid == n_dec - 1 else f"d{lid}."
        out.update(_layer_loss(outputs["cls"][lid], outputs["coord"][lid],
                               gt, warm_up, num_classes, axis_name, prefix,
                               cls_group))

    # encoder interim loss with class-agnostic labels (reference :568-571)
    bin_gt = dict(gt, labels=jnp.zeros_like(gt["labels"]))
    out.update(_layer_loss(outputs["enc_cls"], outputs["enc_coord"], bin_gt,
                           warm_up, num_classes, axis_name, "enc_",
                           cls_group))

    if "front_cls" in outputs and "cdn" in outputs:
        if warm_up and is_pseudo_label:
            for lid in range(n_dec):
                prefix = "" if lid == n_dec - 1 else f"d{lid}."
                for k in ("dn_loss_cls", "dn_loss_bbox", "dn_loss_iou",
                          "dn_loss_bbox_xy", "dn_loss_bbox_hw"):
                    out[f"{prefix}{k}"] = jnp.float32(0.0)
        else:
            for lid in range(n_dec):
                prefix = "" if lid == n_dec - 1 else f"d{lid}."
                out.update(_dn_layer_loss(
                    outputs["front_cls"][lid], outputs["front_coord"][lid],
                    gt, outputs["cdn"], num_classes, axis_name,
                    prefix, cls_group))

    out["total"] = sum(v for k, v in out.items() if "loss" in k)
    return out
