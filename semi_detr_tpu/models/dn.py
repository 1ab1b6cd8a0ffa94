"""Contrastive denoising (CDN) query construction — static TPU layout.

Re-design of the reference `prepare_for_cdn_plus`
(`detr_od/models/dense_heads/dn_components.py:128-275`) with a fixed query
layout so the whole construction jits:

Reference (dynamic): single_pad = max GT count in batch, groups =
(2*dn_number) // (2*single_pad), pad_size = 2*single_pad*groups (~200).
Ours (static): `single_pad` and `groups` are config constants chosen so
single_pad matches the dataset's typical max-GT and
2*single_pad*groups ~= 2*dn_number — identical query budget, but the
layout (and hence the self-attention mask) is compile-time constant.

Layout: [chunk_0 | chunk_1 | ... | chunk_{2G-1} | matching queries],
chunk size = single_pad, chunks (2g, 2g+1) = (positives, negatives) of dn
group g (reference `:199-205`). Slot j of every chunk holds GT j of the
image; slots >= num_gt are zero-content with loss weight 0. Images with no
GT get the reference's fake box [.5,.5,.5,.5] + random label in slot 0,
masked out of the loss via `pad_mask` (reference `:141-160, 259-266`).

Noise (reference `:193-223`): labels flipped to uniform with prob
0.5*label_noise_ratio; boxes perturbed in corner coords by
sign*rand*half_extent*box_noise_scale, rand in [0,1) for positives and
[1,2) for negatives (pushes negatives outside the box), clamped to [0,1].
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .transformer import inverse_sigmoid


class CdnBatch(NamedTuple):
    query_label: jax.Array   # (B, pad_size, C) content queries
    query_bbox: jax.Array    # (B, pad_size, 4) unsigmoided positions
    gt_idx: jax.Array        # (pad_size,) static slot -> gt index
    is_positive: jax.Array   # (pad_size,) static: True in positive chunks
    slot_valid: jax.Array    # (B, pad_size) slot has a (real or fake) gt
    pad_mask: jax.Array      # (B,) True = image had NO real gt (fake dn)


def cdn_attn_mask(single_pad: int, groups: int, num_queries: int):
    """Static self-attention mask, True = BLOCKED (reference `:246-257`):
    matching queries cannot see dn; dn group g sees only itself (plus the
    matching block)."""
    pad = 2 * single_pad * groups
    t = pad + num_queries
    m = np.zeros((t, t), bool)
    m[pad:, :pad] = True
    for g in range(groups):
        s, e = 2 * single_pad * g, 2 * single_pad * (g + 1)
        m[s:e, :s] = True
        m[s:e, e:pad] = True
    return jnp.asarray(m)


def build_cdn_queries(rng: jax.Array, gt_boxes: jax.Array,
                      gt_labels: jax.Array, gt_valid: jax.Array,
                      label_enc: jax.Array, num_classes: int,
                      single_pad: int, groups: int,
                      label_noise_ratio: float = 0.5,
                      box_noise_scale: float = 0.4) -> CdnBatch:
    """Args:
      gt_boxes: (B, G, 4) normalized cxcywh (G >= single_pad uses first
        single_pad GTs per image).
      gt_labels: (B, G) int32 in [0, num_classes).
      gt_valid: (B, G) bool.
      label_enc: (dn_labelbook_size+1, C) embedding table.
    """
    B = gt_boxes.shape[0]
    sp = single_pad
    n_chunks = 2 * groups
    pad_size = sp * n_chunks
    # surface the static-layout coupling at build time: callers size the
    # GT arrays by max_gt (supervised) or max_pseudo (SSOD); fewer slots
    # than single_pad would crash deep inside jit with a broadcast error,
    # and more silently drops GTs >= single_pad from DN supervision
    # (documented deviation from the reference's dynamic batch-max pad).
    assert gt_boxes.shape[1] >= sp, (
        f"gt capacity {gt_boxes.shape[1]} < dn_single_pad {sp}: set "
        f"dn_single_pad <= max_gt / ssod.max_pseudo")

    k_fake, k_label, k_newl, k_sign, k_part = jax.random.split(rng, 5)

    boxes = gt_boxes[:, :sp]
    labels = gt_labels[:, :sp]
    valid = gt_valid[:, :sp]

    # fake gt for images with no gt (reference `:141-160`)
    no_gt = ~valid.any(axis=1)                                  # (B,)
    fake_label = jax.random.randint(k_fake, (B,), 0, num_classes)
    fake_box = jnp.asarray([0.5, 0.5, 0.5, 0.5])
    inject = no_gt[:, None] & (jnp.arange(sp) == 0)[None]
    boxes = jnp.where(inject[..., None], fake_box, boxes)
    labels = jnp.where(inject, fake_label[:, None], labels)
    valid = valid | inject

    # tile to chunks: (B, n_chunks, sp, ...)
    boxes = jnp.broadcast_to(boxes[:, None], (B, n_chunks, sp, 4))
    labels = jnp.broadcast_to(labels[:, None], (B, n_chunks, sp))

    # label noise (same for pos+neg chunks, applied element-wise)
    p = jax.random.uniform(k_label, labels.shape)
    new_label = jax.random.randint(k_newl, labels.shape, 0, num_classes)
    labels = jnp.where(p < label_noise_ratio * 0.5, new_label, labels)

    # box noise in corner coordinates (reference `:206-223`)
    is_neg_np = np.arange(n_chunks) % 2 == 1                    # (n_chunks,)
    is_neg_chunk = jnp.asarray(is_neg_np)
    xy, wh = boxes[..., :2], boxes[..., 2:]
    corners = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
    diff = jnp.concatenate([wh / 2, wh / 2], -1)
    sign = (jax.random.randint(k_sign, boxes.shape, 0, 2)
            .astype(jnp.float32) * 2.0 - 1.0)
    part = jax.random.uniform(k_part, boxes.shape)
    part = part + is_neg_chunk[None, :, None, None].astype(jnp.float32)
    noised = jnp.clip(corners + sign * part * diff * box_noise_scale,
                      0.0, 1.0)
    lo, hi = noised[..., :2], noised[..., 2:]
    noised_cxcywh = jnp.concatenate([(lo + hi) / 2, hi - lo], -1)

    content = label_enc[labels]                                 # (B,2G,sp,C)
    position = inverse_sigmoid(noised_cxcywh)

    slot_valid = jnp.broadcast_to(valid[:, None], (B, n_chunks, sp))
    content = jnp.where(slot_valid[..., None], content, 0.0)
    position = jnp.where(slot_valid[..., None], position, 0.0)

    gt_idx = np.tile(np.arange(sp), n_chunks)
    is_positive = np.repeat(~is_neg_np, sp)

    return CdnBatch(
        query_label=content.reshape(B, pad_size, -1),
        query_bbox=position.reshape(B, pad_size, 4),
        gt_idx=jnp.asarray(gt_idx, jnp.int32),
        is_positive=jnp.asarray(is_positive),
        slot_valid=slot_valid.reshape(B, pad_size),
        pad_mask=no_gt,
    )
