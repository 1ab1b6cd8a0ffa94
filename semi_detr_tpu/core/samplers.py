"""Pseudo-sampler equivalents (static-shape, mask-based).

The reference registers two "samplers that do not sample"
(`detr_od/core/bbox/samplers/`): `IgnorePseudoSampler`
(`ignore_sampler.py:10-46`) partitions predictions into
positive / negative / ignored index sets from an assigner's
`gt_inds` (>0 pos, ==0 neg, <0 ignore), and `DoubleSampler`
(`double_sampler.py:10-49`) does the same for a dual assignment
(`gt_inds_1` / `gt_inds_2`). Their SamplingResult objects
(`ignore_sampling_result.py:27-55`, `double_sampling_result.py:26-60`)
carry gathered views (pos_bboxes, pos_gt_bboxes,
pos_assigned_gt_inds = gt_inds[pos] - 1, pos_gt_labels).

The live Semi-DETR configs use mmdet's plain `PseudoSampler`
(`dino_detr_ssod_head.py:175-177`), so the repo's loss path never
routes through these — they exist for inventory parity and for
experiments that need pos/neg/ignore bookkeeping.

TPU-native shape discipline: `torch.nonzero(...)` produces
data-dependent lengths, which cannot exist under `jit`. The
equivalents below return BOOLEAN MASKS over the static prediction
axis plus gathered-and-masked target views; any downstream reduction
is a masked sum, never a ragged gather. All functions are
jit/vmap-safe.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class SamplingMasks(NamedTuple):
    """Static-shape analog of the reference IgnoreSamplingResult.

    pos/neg/ign: (N,) bool, a disjoint partition of the prediction
    axis. pos_assigned_gt_inds: (N,) int, gt row per positive
    (0 where not positive). pos_gt_bboxes: (N, 4), the matched gt box
    per positive (0 where not positive). pos_gt_labels: (N,) int or
    None, mirroring `assign_result.labels`.
    """
    pos: jnp.ndarray
    neg: jnp.ndarray
    ign: jnp.ndarray
    pos_assigned_gt_inds: jnp.ndarray
    pos_gt_bboxes: jnp.ndarray
    pos_gt_labels: Optional[jnp.ndarray]

    @property
    def num_pos(self):
        return self.pos.sum()


class DoubleSamplingMasks(NamedTuple):
    """Static-shape analog of the reference DoubleSamplingResult:
    two independent partitions over one prediction set; gathered gt
    views follow assignment 1 (`double_sampling_result.py:34-53`)."""
    pos_1: jnp.ndarray
    neg_1: jnp.ndarray
    pos_2: jnp.ndarray
    neg_2: jnp.ndarray
    pos_assigned_gt_inds_1: jnp.ndarray
    pos_assigned_gt_inds_2: jnp.ndarray
    pos_gt_bboxes: jnp.ndarray
    pos_gt_labels_1: Optional[jnp.ndarray]
    pos_gt_labels_2: Optional[jnp.ndarray]


def _gathered_gt(gt_inds, gt_bboxes, pos):
    """gt_bboxes rows for each positive prediction, zeros elsewhere.

    `gt_inds` uses the mmdet convention: value g>0 means matched to gt
    row g-1. Clamp keeps the gather in-bounds for neg/ignored rows;
    the mask zeroes them afterwards (reference does a ragged
    `gt_bboxes[pos_assigned_gt_inds]`, `ignore_sampling_result.py:50`).
    """
    assigned = jnp.maximum(gt_inds - 1, 0)
    g = jnp.clip(assigned, 0, max(gt_bboxes.shape[0] - 1, 0))
    boxes = gt_bboxes[g] * pos[:, None].astype(gt_bboxes.dtype)
    return assigned * pos.astype(assigned.dtype), boxes


def ignore_sampling_masks(gt_inds, gt_bboxes,
                          labels: Optional[jnp.ndarray] = None
                          ) -> SamplingMasks:
    """`IgnorePseudoSampler.sample` (`ignore_sampler.py:24-46`):
    gt_inds (N,) int — >0 positive (gt row +1), 0 negative,
    <0 ignored. gt_bboxes (G, 4); labels (N,) optional per-prediction
    assigned labels."""
    pos = gt_inds > 0
    neg = gt_inds == 0
    ign = gt_inds < 0
    assigned, boxes = _gathered_gt(gt_inds, gt_bboxes, pos)
    pos_labels = None if labels is None else jnp.where(pos, labels, -1)
    return SamplingMasks(pos, neg, ign, assigned, boxes, pos_labels)


def double_sampling_masks(gt_inds_1, gt_inds_2, gt_bboxes,
                          labels_1: Optional[jnp.ndarray] = None,
                          labels_2: Optional[jnp.ndarray] = None
                          ) -> DoubleSamplingMasks:
    """`DoubleSampler.sample` (`double_sampler.py:24-49`): two
    assignments over the same N predictions (e.g. o2o + o2m)."""
    pos_1, pos_2 = gt_inds_1 > 0, gt_inds_2 > 0
    a1, boxes = _gathered_gt(gt_inds_1, gt_bboxes, pos_1)
    a2 = jnp.maximum(gt_inds_2 - 1, 0) * pos_2.astype(gt_inds_2.dtype)
    return DoubleSamplingMasks(
        pos_1, gt_inds_1 == 0, pos_2, gt_inds_2 == 0, a1, a2, boxes,
        None if labels_1 is None else jnp.where(pos_1, labels_1, -1),
        None if labels_2 is None else jnp.where(pos_2, labels_2, -1))
