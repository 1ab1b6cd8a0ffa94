"""Static-shape batched class-wise NMS for TPU.

Reproduces mmdet `multiclass_nms` as used by the reference pseudo-label /
warm-up decode path (`detr_od/models/dense_heads/dino_detr_ssod_head.py:
1368-1399`): sigmoid scores per class, score_thr=0.01, class-wise greedy NMS
at iou 0.6, keep top `max_out` by score. Class separation uses the standard
coordinate-offset trick so a single greedy pass handles all classes.

TPU-first: all shapes static. Candidates = top-`pre_topk` of the flattened
(num_boxes * num_classes) score matrix (the reference processes every
score>0.01 candidate; with 900 queries x 80 classes the top 1500 candidates
dominate — anything past that is far below any usable pseudo-label/mAP
threshold). Output is fixed (max_out,) with a validity mask.

Suppression is the exact GREEDY result computed by fixpoint iteration
instead of a k-step sequential loop: with candidates in descending score
order, greedy keep is the unique fixpoint of

    keep[j] = alive[j] and not any(i < j and keep[i] and iou[i,j] > thr)

(uniqueness by induction over the score order; iterating stabilizes the
prefix whose suppression-chain depth <= t after t sweeps, so a
while_loop-until-unchanged terminates in the max chain depth — single
digits on real detections — each sweep one vectorized (k,k) masked
reduction, vs k=1500 sequential fori steps before).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import boxes as box_ops


@partial(jax.jit, static_argnames=("pre_topk", "max_out", "iou_thr",
                                   "score_thr"))
def multiclass_nms(boxes_xyxy: jax.Array, scores: jax.Array,
                   score_thr: float = 0.01, iou_thr: float = 0.6,
                   max_out: int = 300, pre_topk: int = 1500):
    """Args:
      boxes_xyxy: (N, 4) shared boxes across classes (DETR decode).
      scores: (N, C) per-class sigmoid scores.

    Returns dict with static shapes (max_out,):
      boxes (max_out, 4), scores (max_out,), labels (max_out,) int32,
      box_idx (max_out,) int32 (index into the input boxes row),
      valid (max_out,) bool — sorted by descending score.
    """
    n, c = scores.shape
    k = min(pre_topk, n * c)
    flat = scores.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, k)
    box_idx = top_idx // c
    labels = (top_idx % c).astype(jnp.int32)
    cand = boxes_xyxy[box_idx]                        # (k, 4)
    alive = top_scores > score_thr

    # class-offset trick: disjoint coordinate ranges per class. Extent
    # spans max - min (+1 margin) and boxes are shifted by -min so
    # negative coordinates (unclipped decode) can't leak into the
    # previous class's band.
    lo = jnp.minimum(boxes_xyxy.min(), 0.0)
    extent = boxes_xyxy.max() - lo + 1.0
    off = labels.astype(cand.dtype)[:, None] * extent - lo
    cand_off = cand + off

    iou = box_ops.pairwise_iou(cand_off, cand_off)    # (k, k)
    # overlap[j, i] = "higher-scored i would suppress j if kept"
    idx = jnp.arange(k)
    overlap = (iou > iou_thr) & (idx[None, :] < idx[:, None])

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def sweep(state):
        keep, _, it = state
        suppressed = jnp.any(overlap & keep[None, :], axis=1)
        return alive & ~suppressed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, sweep, (alive, jnp.zeros_like(alive), jnp.int32(0)))

    # pack survivors to the front, sorted by score (stable: already sorted)
    sel_scores = jnp.where(keep, top_scores, -1.0)
    order = jnp.argsort(-sel_scores)[:max_out]
    return {
        "boxes": cand[order],
        "scores": jnp.clip(sel_scores[order], 0.0),
        "labels": labels[order],
        "box_idx": box_idx[order].astype(jnp.int32),
        "valid": keep[order] & (sel_scores[order] > 0),
    }
