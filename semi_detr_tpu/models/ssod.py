"""Semi-DETR teacher–student SSOD — static-shape, single-jit TPU design.

Capability parity with the reference `DinoDetrSSOD`
(`detr_ssod/models/dino_detr_ssod.py:75-978`), redesigned so the ENTIRE
per-iteration pipeline (EMA update, teacher pseudo-labeling with NMS +
per-image mean+std filtering, cross-view box transform, Hungarian matching
costs, GMM threshold fit on the global cost pool, dual pseudo-label
filtering, consistency/CDN query construction, student forward/backward,
teacher consistency forward, AdamW) is ONE compiled XLA program:

* every per-image Python loop of the reference becomes a vmapped,
  fixed-capacity masked computation (max_pseudo slots per image);
* scipy `linear_sum_assignment` (`:279`) -> in-graph JV solver
  (`ops/hungarian.py`); sklearn GMM (`:832-890`) -> in-graph EM
  (`ops/gmm.py`); the NCCL `concat_all_gather` of costs (`:300-303`) is
  unnecessary in global view — the batch-sharded cost pool IS global;
* the teacher encoder runs ONCE per step: pseudo-label decode and the
  consistency forward share `memory` (the reference recomputes
  `extract_feat`, `:364,598`); likewise the student encoder runs once for
  the no-grad matching pass and the training pass;
* post-warm-up, consistency-query compute is skipped entirely: the
  reference zeroes `loss_weights` (`:469-470`) but still runs the teacher
  pass — the attention mask guarantees consistency queries never influence
  matching/dn outputs, so skipping is bitwise behavior-preserving.

The empty-image consistency fallback box ([w/4,h/4,3w/4,3h/4] with loss
weight 0, `:516,577`) is reproduced exactly (`inject_fake_consistency_roi`):
it joins the Projector's BatchNorm batch statistics and occupies a known
slot per group; the BN statistics are otherwise masked to real RoIs —
matching the reference, whose BN sees exactly the known (real + fake) set.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import boxes as box_ops
from ..ops import hungarian
from ..ops.nms import multiclass_nms
from . import losses
from .dino_head import DinoConfig
from .transformer import inverse_sigmoid, xavier_uniform


@dataclass(frozen=True)
class SsodConfig:
    dino: DinoConfig = field(default_factory=DinoConfig)
    # pseudo-label pipeline (reference train_cfg + head test_cfg)
    max_pseudo: int = 32            # per-image pseudo/consistency capacity
    nms_max_out: int = 300          # reference multiclass_nms max_num
    nms_iou: float = 0.6
    nms_score_thr: float = 0.01
    nms_pre_topk: int = 2000
    score_thr: float = 0.4          # pseudo_label_initial_score_thr
    unsup_weight: float = 4.0
    warm_up_step: int = 60000
    cons_groups: int = 5            # dn_number_1 (`dino_detr_ssod.py:533`)
    consistency_weight: float = 10.0
    ema_momentum: float = 0.999
    # reference MeanTeacher hook decay schedule (`mean_teacher.py:52-57`);
    # unused (None) in every active reference config
    ema_decay_intervals: tuple = ()
    ema_decay_factor: float = 0.1
    # opt-in reference-exact per-GPU cls avg factor (the reference runs
    # sync_cls_avg_factor=False): images per reference GPU for the
    # (sup, unsup) branches — the recipe's sample_ratio, e.g. (1, 4).
    # None keeps the global device-count-invariant factor (default).
    cls_avg_groups: Optional[tuple] = None

    @property
    def cons_pad(self) -> int:
        return self.cons_groups * self.max_pseudo


class PseudoLabels(NamedTuple):
    """Fixed-capacity per-image pseudo boxes in BOTH frames."""
    boxes_t: jax.Array     # (B, P, 4) xyxy abs, teacher (weak) frame
    boxes_s: jax.Array     # (B, P, 4) xyxy abs, student (strong) frame
    labels: jax.Array      # (B, P) int32
    scores: jax.Array      # (B, P)
    valid: jax.Array       # (B, P) bool


class Projector(nn.Module):
    """RoI feature -> query-space adaptor (reference Projector,
    `dino_detr_ssod.py:33-72`): [conv3x3-BN-ReLU]x2, flatten 7x7x256=12544,
    fc 1024 + BN + ReLU, fc 256 + ReLU. BatchNorms use (masked) batch
    statistics — the module only ever runs in training mode."""
    features: int = 256

    @nn.compact
    def __call__(self, x, mask):
        """x: (R, 7, 7, C); mask: (R,) bool — real RoIs for BN stats."""
        w = mask.astype(jnp.float32)
        denom = jnp.maximum(w.sum(), 1.0)

        def masked_bn(h, name):
            ax = tuple(range(h.ndim - 1))
            wb = w.reshape((-1,) + (1,) * (h.ndim - 1))
            mean = (h * wb).sum(ax) / (denom * np.prod(h.shape[1:-1]))
            var = (((h - mean) ** 2) * wb).sum(ax) / (
                denom * np.prod(h.shape[1:-1]))
            gamma = self.param(f"{name}_scale", nn.initializers.ones,
                               (h.shape[-1],))
            beta = self.param(f"{name}_bias", nn.initializers.zeros,
                              (h.shape[-1],))
            return (h - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta

        h = nn.Conv(self.features, (3, 3), use_bias=False,
                    kernel_init=xavier_uniform, name="conv1")(x)
        h = nn.relu(masked_bn(h, "bn1"))
        h = nn.Conv(self.features, (3, 3), use_bias=False,
                    kernel_init=xavier_uniform, name="conv2")(h)
        h = nn.relu(masked_bn(h, "bn2"))
        h = h.reshape(h.shape[0], -1)                       # (R, 12544)
        h = nn.Dense(1024, name="fc1")(h)
        h = nn.relu(masked_bn(h, "fc_bn"))
        h = nn.Dense(self.features, name="fc2")(h)
        return nn.relu(h)


# --------------------------------------------------------------------------
# pseudo-label extraction (reference extract_teacher_info, :893-951)
# --------------------------------------------------------------------------

def decode_pseudo_labels(cls_logits, coords, img_hw, cfg: SsodConfig):
    """NMS decode + per-image mean+std score filter, fixed capacity.

    cls_logits: (B, nq, K) last decoder layer; coords: (B, nq, 4) normalized
    cxcywh; img_hw: (B, 2) valid extents. Returns PseudoLabels fields in the
    TEACHER frame (boxes_s left as a copy; caller transforms).
    """

    def per_image(logits, coord, hw):
        scores = jax.nn.sigmoid(logits)
        wh = jnp.asarray([hw[1], hw[0], hw[1], hw[0]], jnp.float32)
        boxes = jnp.clip(box_ops.cxcywh_to_xyxy(coord), 0.0, 1.0)
        nms = multiclass_nms(boxes, scores, cfg.nms_score_thr, cfg.nms_iou,
                             cfg.nms_max_out, cfg.nms_pre_topk)
        v = nms["valid"]
        n = jnp.maximum(v.sum(), 1)
        s = nms["scores"]
        mean = jnp.where(v, s, 0.0).sum() / n
        # torch.std: unbiased (n-1); NaN for n==1 -> no survivors then
        var = jnp.where(v, (s - mean) ** 2, 0.0).sum() / jnp.maximum(
            n - 1, 1)
        thr = mean + jnp.sqrt(var)
        keep = v & (s >= thr) & (v.sum() > 1)
        # degenerate-box filter (zero width/height after scaling)
        bx = nms["boxes"] * wh
        keep = keep & ((bx[:, 2] - bx[:, 0]) > 0) & ((bx[:, 3] - bx[:, 1])
                                                     > 0)
        # compact to max_pseudo slots by score
        sel = jnp.where(keep, s, -1.0)
        top_s, top_i = jax.lax.top_k(sel, cfg.max_pseudo)
        return (bx[top_i], nms["labels"][top_i], jnp.clip(top_s, 0.0),
                top_s > 0)

    boxes, labels, scores, valid = jax.vmap(per_image)(
        cls_logits, coords, img_hw)
    return PseudoLabels(boxes, boxes, labels, scores, valid)


def transform_pseudo_to_student(pl: PseudoLabels, tmat_teacher,
                                tmat_student, student_hw) -> PseudoLabels:
    """M = T_student @ inv(T_teacher); transform + clip (reference
    `_get_trans_mat`/`_transform_bbox`, :804-811).

    Boxes whose student-view projection clips to zero area pass through
    unfiltered — reference parity: dino_detr_ssod.py feeds the clipped
    `pseudo_bboxes` straight into unsup_loss with no min-size filter
    (its `filter_invalid` helper is never called there), and our
    IoU/GIoU are eps-guarded against zero areas."""
    m = jnp.einsum("bij,bjk->bik", tmat_student,
                   jnp.linalg.inv(tmat_teacher))
    boxes_s = box_ops.transform_boxes(pl.boxes_t, m)
    w = student_hw[:, 1:2].astype(jnp.float32)
    h = student_hw[:, 0:1].astype(jnp.float32)
    boxes_s = jnp.stack([
        jnp.clip(boxes_s[..., 0], 0.0, w), jnp.clip(boxes_s[..., 1], 0.0, h),
        jnp.clip(boxes_s[..., 2], 0.0, w), jnp.clip(boxes_s[..., 3], 0.0, h),
    ], -1)
    return pl._replace(boxes_s=boxes_s)


def normalize_boxes(boxes_xyxy, img_hw):
    """abs xyxy -> normalized cxcywh by the per-image valid extent."""
    w = img_hw[:, None, 1].astype(jnp.float32)
    h = img_hw[:, None, 0].astype(jnp.float32)
    cxcywh = box_ops.xyxy_to_cxcywh(boxes_xyxy)
    return cxcywh / jnp.stack([w, h, w, h], -1)


# --------------------------------------------------------------------------
# matching costs + GMM dual filter (reference unsup_loss, :229-353)
# --------------------------------------------------------------------------

def pseudo_matching_costs(cls_logits, bbox_preds, pl_boxes_norm, pl_labels,
                          pl_valid):
    """Per-pseudo-box matched Hungarian cost (student no-grad preds).

    Costs are FocalLossCost + L1(normalized cxcywh) + GIoU with the
    assigner2 weights (all 1.0 relative — reference sums the three
    `assigner2.*_cost` outputs directly, :265-274, which carry weights
    cls 2, reg 5, iou 2 from the config). Returns (B, P) matched costs.
    """
    def per_image(logits, preds, gt_boxes, gt_labels, gt_valid):
        safe_labels = jnp.where(gt_valid, gt_labels, 0)
        c_cls = losses.focal_cost(logits, safe_labels)          # (nq, P)
        c_l1 = losses.pair_l1_cost(preds, gt_boxes)
        c_giou = losses.giou_cost(box_ops.cxcywh_to_xyxy(preds),
                                  box_ops.cxcywh_to_xyxy(gt_boxes))
        cost = 2.0 * c_cls + 5.0 * c_l1 + 2.0 * c_giou          # (nq, P)
        cols = hungarian.solve(cost.T, gt_valid)                # (P,)
        cols = jnp.where(gt_valid, cols, 0)     # invalid rows return -1
        return cost.T[jnp.arange(gt_boxes.shape[0]), cols]

    costs = jax.vmap(per_image)(
        jax.lax.stop_gradient(cls_logits), jax.lax.stop_gradient(bbox_preds),
        pl_boxes_norm, pl_labels, pl_valid)
    return jnp.where(pl_valid, costs, 0.0)


def dual_filter(costs, scores, valid, gmm_thr, score_thr: float):
    """keep_sup = score filter (supervision/DN set, :336-343);
    keep_cons = GMM-cost ∪ score filter (consistency set, :332-348)."""
    keep_sup = valid & (scores >= score_thr)
    keep_cons = keep_sup | (valid & (costs <= gmm_thr))
    return keep_sup, keep_cons


# --------------------------------------------------------------------------
# consistency query construction (reference prepare_unsup_cdn, :484-760)
# --------------------------------------------------------------------------

def inject_fake_consistency_roi(keep_cons, boxes_t, boxes_s,
                                teacher_hw, student_hw):
    """Reference dino_detr_ssod.py:516-521, :575-581: an unlabeled image
    whose dual filter kept ZERO pseudo boxes still contributes one fake
    center RoI [w/4, h/4, 3w/4, 3h/4] — its projector features enter
    the BatchNorm batch statistics and it occupies a known slot in
    every consistency group with loss weight 0. Its normalized cxcywh
    is exactly (.5,.5,.5,.5) = sigmoid(0), the padding box, so query
    positions are unchanged by construction.

    Returns (keep_known (B,P) = keep_cons | fake-slot, boxes_t', boxes_s'
    with slot 0 of empty images replaced by the per-frame fake box)."""
    b, p = keep_cons.shape
    empty = ~keep_cons.any(-1)                              # (B,)
    fake = empty[:, None] & (jnp.arange(p)[None, :] == 0)

    def fake_box(hw):
        h, w = hw[:, 0].astype(jnp.float32), hw[:, 1].astype(jnp.float32)
        return jnp.stack([w / 4, h / 4, 3 * w / 4, 3 * h / 4], -1)

    boxes_t = jnp.where(fake[..., None], fake_box(teacher_hw)[:, None],
                        boxes_t)
    boxes_s = jnp.where(fake[..., None], fake_box(student_hw)[:, None],
                        boxes_s)
    return keep_cons | fake, boxes_t, boxes_s


def consistency_partition(packed_valid, cons_groups: int, capacity: int):
    """Adaptive consistency-group size inside the static slot budget,
    mirroring the reference's `single_pad_1 = int(max(known_num))`
    (dino_detr_ssod.py:537) the same way `dn.build_cdn_queries` treats
    the CDN partition: group size is the batch max kept count (traced),
    group COUNT stays `cons_groups` (the reference's fixed
    dn_number_1=5), and slots past `cons_groups * single_pad_dyn` are
    inactive. This keeps the padded-slot attention exposure of real
    queries at the reference level (<= single_pad_dyn - count_i zero
    slots per group) instead of the full static capacity.

    packed_valid: (B, P) PREFIX-PACKED kept mask (see `dn.compact_gt`).
    Returns (single_pad_dyn (), slot_idx (capacity,) slot -> packed
    pseudo index, slot_weights (B, capacity) bool)."""
    counts = packed_valid.sum(axis=1)
    sp_dyn = jnp.clip(jnp.max(counts), 1, capacity // cons_groups)
    s = jnp.arange(capacity)
    slot_idx = s % sp_dyn
    active = s < cons_groups * sp_dyn
    slot_w = jnp.take(packed_valid, slot_idx, axis=1) & active[None]
    return sp_dyn, slot_idx, slot_w


def scatter_to_slots(packed, slot_idx, slot_weights):
    """Lay out packed per-pseudo rows (B, P, ...) into the adaptive
    consistency slot layout (B, capacity, ...): slot s takes packed row
    `slot_idx[s]`, weight-0 slots zero. The ONE place the slot layout is
    materialized — positions and content both go through it."""
    slots = jnp.take(packed, slot_idx, axis=1)
    w = slot_weights.reshape(slot_weights.shape
                             + (1,) * (packed.ndim - 2))
    return jnp.where(w, slots, 0.0)


def consistency_positions(packed_boxes_xyxy_abs, img_hw, slot_weights,
                          slot_idx):
    """(B, P, 4) PACKED abs boxes -> (B, cons_pad, 4) unsigmoided
    positions laid out by the adaptive partition; weight-0 slots zero
    (= the reference's zero padding_bbox, sigmoid -> center box)."""
    norm = jnp.clip(normalize_boxes(packed_boxes_xyxy_abs, img_hw),
                    0.0, 1.0)
    return scatter_to_slots(inverse_sigmoid(norm), slot_idx, slot_weights)


def combined_attn_mask(cons_pad: int, cons_groups: int, dn_single_pad,
                       dn_groups, num_queries: int,
                       dn_capacity: int = None, cons_single_pad=None):
    """[consistency | dn | matching] self-attention mask, True = BLOCKED
    (reference :722-743): each consistency group and each dn pos/neg
    group sees only itself among the front blocks; matching sees only
    matching.

    The consistency block layout is static (cons_pad, cons_groups python
    ints); the dn block rides `dn.dn_slot_groups` — the SAME partition
    the supervised/dn mask uses — shifted past the consistency group ids.
    `dn_single_pad`/`dn_groups` may be traced scalars, with `dn_capacity`
    the static dn slot count (defaults to 2*dn_single_pad*dn_groups for
    int args); inactive dn slots get unique group ids (isolated).

    `cons_single_pad`: traced adaptive consistency group size from
    `consistency_partition`; slots past cons_groups*cons_single_pad get
    unique isolated ids. None = the static cons_pad//cons_groups layout."""
    from .dn import dn_slot_groups, front_attn_mask
    if dn_capacity is None:
        dn_capacity = 2 * int(dn_single_pad) * int(dn_groups)
    if cons_single_pad is None:
        # a non-divisible cons_pad would give the trailing consistency
        # slots group id == cons_groups — dn group 0's shifted id (leak)
        assert cons_pad % cons_groups == 0, (cons_pad, cons_groups)
        cons_group = jnp.arange(cons_pad) // (cons_pad // cons_groups)
    else:
        s = jnp.arange(cons_pad)
        chunk = s // cons_single_pad
        # inactive ids start past every possible shifted dn id
        # (dn ids < groups_dyn + dn_capacity <= 1.5 * dn_capacity)
        iso = cons_groups + 2 * dn_capacity + s
        cons_group = jnp.where(chunk < cons_groups, chunk, iso)
    dn_group = cons_groups + dn_slot_groups(dn_single_pad, dn_groups,
                                            dn_capacity)
    return front_attn_mask(jnp.concatenate([cons_group, dn_group]),
                           num_queries)


def consistency_loss(hs_student, hs_teacher, cons_weights, cons_counts,
                     cfg: SsodConfig, weight: float):
    """Per-decoder-layer MSE of L2-normalized consistency embeddings,
    teacher detached, x10 (reference :472-481).

    hs_*: (n_dec, B, cons_pad, C); cons_weights: (B, cons_pad) per-slot
    weights (from `consistency_partition`); cons_counts: (B,) number of
    'known' slots per image (>=1 — the reference injects a weight-0
    fallback slot into empty images, which enters the loss denominator).
    """
    n_dec, b, _, c = hs_student.shape
    # f32 weights promote the squared error + its full-tensor sum to f32
    # even when hs is bf16 (loss-facing outputs stay f32 repo-wide)
    w = cons_weights.astype(jnp.float32)                  # (B, cons_pad)
    denom = (cons_counts.sum() * cfg.cons_groups * c).astype(jnp.float32)
    denom = jnp.maximum(denom, 1.0)

    h1 = hs_student / jnp.maximum(
        jnp.linalg.norm(hs_student, axis=-1, keepdims=True), 1e-12)
    h2 = jax.lax.stop_gradient(hs_teacher / jnp.maximum(
        jnp.linalg.norm(hs_teacher, axis=-1, keepdims=True), 1e-12))
    se = ((h1 - h2) ** 2) * w[None, :, :, None]           # (n_dec,B,pad,C)
    out = {}
    for lid in range(n_dec):
        out[f"consis_loss.d{lid}"] = weight * se[lid].sum() / denom
    return out
