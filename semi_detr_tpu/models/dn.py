"""Contrastive denoising (CDN) query construction — static-shape TPU
layout with the reference's ADAPTIVE group structure as dynamic content.

Reference `prepare_for_cdn_plus`
(`detr_od/models/dense_heads/dn_components.py:128-275`): single_pad =
max GT count in the batch, groups = (2*dn_number) // (2*single_pad),
pad_size = 2*single_pad*groups (<= 2*dn_number ~= 200). Both quantities
are data-dependent — a direct port would recompile per batch.

TPU design: the query COUNT is a compile-time constant
(`capacity = 2*dn_single_pad*dn_groups`, the 2*dn_number budget), while
the partition of those slots into (single_pad, groups) is traced
CONTENT computed from the batch's max GT count:

    single_pad_dyn = min(max_gt_in_batch, capacity // 2)
    groups_dyn     = capacity // (2 * single_pad_dyn)
    slot s -> chunk = s // single_pad_dyn, gt = s % single_pad_dyn
    active slots: chunk < 2 * groups_dyn (the reference's pad_size)

so every GT (up to capacity//2 = dn_number per image) gets DN
supervision AND small-GT batches get the reference's many noise groups
(e.g. 7 GTs -> 14 groups at the default capacity 200), with ONE compiled
program. Inactive remainder slots are zero-content, attention-isolated,
and loss-masked.

Layout within the active prefix matches the reference (`:199-205`):
chunks (2g, 2g+1) = (positives, negatives) of group g; slot j of a chunk
holds GT j. Images with no GT get the reference's fake box
[.5,.5,.5,.5] + random label in slot 0, masked out of the loss via
`pad_mask` (reference `:141-160, 259-266`).

Noise (reference `:193-223`): labels flipped to uniform with prob
0.5*label_noise_ratio; boxes perturbed in corner coords by
sign*rand*half_extent*box_noise_scale, rand in [0,1) for positives and
[1,2) for negatives (pushes negatives outside the box), clamped to [0,1].
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .transformer import inverse_sigmoid


class CdnBatch(NamedTuple):
    query_label: jax.Array   # (B, capacity, C) content queries
    query_bbox: jax.Array    # (B, capacity, 4) unsigmoided positions
    gt_idx: jax.Array        # (capacity,) slot -> gt index (traced)
    is_positive: jax.Array   # (capacity,) True in ACTIVE positive chunks
    slot_valid: jax.Array    # (B, capacity) slot holds a (real/fake) gt
    pad_mask: jax.Array      # (B,) True = image had NO real gt (fake dn)
    slot_active: Optional[jax.Array] = None  # (capacity,) in the dyn layout
    single_pad: Optional[jax.Array] = None   # () traced single_pad_dyn
    groups: Optional[jax.Array] = None       # () traced groups_dyn


def dn_slot_groups(single_pad, groups, capacity: int):
    """Slot -> dn group id under the adaptive partition (the single
    source of truth — `combined_attn_mask` reuses it so the SSOD warm-up
    mask can never disagree with the supervised/dn mask).

    `single_pad`/`groups` may be python ints or traced scalars. Active
    slots (chunk < 2*groups) map pos/neg chunk pairs to group chunk//2;
    inactive slots get UNIQUE ids >= groups (fully isolated)."""
    s = jnp.arange(capacity)
    chunk = s // single_pad
    active = chunk < 2 * groups
    return jnp.where(active, chunk // 2, groups + s)


def front_attn_mask(front_group: jax.Array, num_queries: int):
    """Assemble the [front | matching] self-attn mask, True = BLOCKED:
    front slot i may see front slot j iff group[i] == group[j]; matching
    sees only matching; front additionally sees all of matching."""
    front = front_group.shape[0]
    block = front_group[:, None] != front_group[None, :]
    top = jnp.concatenate(
        [block, jnp.zeros((front, num_queries), bool)], axis=1)
    bottom = jnp.concatenate(
        [jnp.ones((num_queries, front), bool),
         jnp.zeros((num_queries, num_queries), bool)], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def cdn_attn_mask(single_pad, groups, num_queries: int,
                  capacity: Optional[int] = None):
    """Self-attention mask over [dn | matching], True = BLOCKED
    (reference `:246-257`): matching queries cannot see dn; dn group g
    sees only itself (plus the matching block).

    `single_pad`/`groups` may be python ints (static layout) or traced
    scalars (adaptive layout); `capacity` is the static dn slot count and
    defaults to 2*single_pad*groups (only valid for int args).
    """
    if capacity is None:
        capacity = 2 * int(single_pad) * int(groups)
    return front_attn_mask(dn_slot_groups(single_pad, groups, capacity),
                           num_queries)


def pack_order(valid: jax.Array) -> jax.Array:
    """Stable valid-first permutation — THE packing order used everywhere
    a scattered mask must become prefix-packed (compact_gt here, the
    consistency payloads in `train/ssod.py`)."""
    return jnp.argsort(~valid, axis=1, stable=True)


def compact_gt(boxes: jax.Array, labels: jax.Array, valid: jax.Array,
               order: Optional[jax.Array] = None):
    """Prefix-pack a scattered GT set: valid entries move to the front
    (stable order), invalid slots are zeroed.

    `build_cdn_queries` maps dn slots to gt indices as `s % single_pad_dyn`
    with `single_pad_dyn = max(valid.sum(1))`, i.e. it assumes validity is
    prefix-packed (dataset GT always is, `data/pipeline.py`). Filtered
    pseudo-label sets (`dual_filter` keep masks) are scattered — compact
    them first, or kept boxes at slot index >= single_pad_dyn silently
    lose their dn slots (the reference compacts implicitly by rebuilding
    dense per-image tensors, `dn_components.py:141-175`).

    `order`: optional precomputed `pack_order(valid)` (callers that also
    pack other payloads by the same mask can share one argsort)."""
    if order is None:
        order = pack_order(valid)
    v = jnp.take_along_axis(valid, order, axis=1)
    b = jnp.where(v[..., None],
                  jnp.take_along_axis(boxes, order[..., None], axis=1), 0.0)
    l = jnp.where(v, jnp.take_along_axis(labels, order, axis=1), 0)
    return b, l, v


def build_cdn_queries(rng: jax.Array, gt_boxes: jax.Array,
                      gt_labels: jax.Array, gt_valid: jax.Array,
                      label_enc: jax.Array, num_classes: int,
                      single_pad: int, groups: int,
                      label_noise_ratio: float = 0.5,
                      box_noise_scale: float = 0.4) -> CdnBatch:
    """Args:
      gt_boxes: (B, G, 4) normalized cxcywh.
      gt_labels: (B, G) int32 in [0, num_classes).
      gt_valid: (B, G) bool — must be PREFIX-PACKED (see `compact_gt`).
      label_enc: (dn_labelbook_size+1, C) embedding table.
      single_pad, groups: STATIC capacity spec — the slot budget is
        2*single_pad*groups (= the reference's 2*dn_number); the actual
        partition is computed per batch (module docstring).
    """
    B, G = gt_valid.shape
    capacity = 2 * single_pad * groups

    k_fake, k_label, k_newl, k_sign, k_part = jax.random.split(rng, 5)

    # fake gt for images with no gt (reference `:141-160`)
    no_gt = ~gt_valid.any(axis=1)                               # (B,)
    fake_label = jax.random.randint(k_fake, (B,), 0, num_classes)
    fake_box = jnp.asarray([0.5, 0.5, 0.5, 0.5])
    inject = no_gt[:, None] & (jnp.arange(G) == 0)[None]
    boxes = jnp.where(inject[..., None], fake_box, gt_boxes)
    labels = jnp.where(inject, fake_label[:, None], gt_labels)
    valid = gt_valid | inject

    # adaptive partition (reference `:164-180`: single_pad = batch max
    # known_num, dn groups = budget // (2*single_pad))
    counts = valid.sum(axis=1)                                  # >= 1
    sp_dyn = jnp.clip(jnp.max(counts), 1, min(capacity // 2, G))
    groups_dyn = capacity // (2 * sp_dyn)                       # >= 1

    s = jnp.arange(capacity)
    chunk = s // sp_dyn
    gt_idx = s % sp_dyn                                         # (cap,)
    active = chunk < 2 * groups_dyn
    is_neg = (chunk % 2 == 1)
    is_positive = ~is_neg & active

    boxes_s = jnp.take(boxes, gt_idx, axis=1)                   # (B,cap,4)
    labels_s = jnp.take(labels, gt_idx, axis=1)
    slot_valid = jnp.take(valid, gt_idx, axis=1) & active[None]

    # label noise (same for pos+neg chunks, applied element-wise)
    p = jax.random.uniform(k_label, (B, capacity))
    new_label = jax.random.randint(k_newl, (B, capacity), 0, num_classes)
    labels_s = jnp.where(p < label_noise_ratio * 0.5, new_label, labels_s)

    # box noise in corner coordinates (reference `:206-223`)
    xy, wh = boxes_s[..., :2], boxes_s[..., 2:]
    corners = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
    diff = jnp.concatenate([wh / 2, wh / 2], -1)
    sign = (jax.random.randint(k_sign, (B, capacity, 4), 0, 2)
            .astype(jnp.float32) * 2.0 - 1.0)
    part = jax.random.uniform(k_part, (B, capacity, 4))
    part = part + is_neg[None, :, None].astype(jnp.float32)
    noised = jnp.clip(corners + sign * part * diff * box_noise_scale,
                      0.0, 1.0)
    lo, hi = noised[..., :2], noised[..., 2:]
    noised_cxcywh = jnp.concatenate([(lo + hi) / 2, hi - lo], -1)

    content = label_enc[labels_s]                               # (B,cap,C)
    position = inverse_sigmoid(noised_cxcywh)

    content = jnp.where(slot_valid[..., None], content, 0.0)
    position = jnp.where(slot_valid[..., None], position, 0.0)

    return CdnBatch(
        query_label=content,
        query_bbox=position,
        gt_idx=gt_idx.astype(jnp.int32),
        is_positive=is_positive,
        slot_valid=slot_valid,
        pad_mask=no_gt,
        slot_active=active,
        single_pad=sp_dyn,
        groups=groups_dyn,
    )
