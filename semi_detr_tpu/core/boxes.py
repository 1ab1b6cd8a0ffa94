"""Box geometry ops (cxcywh/xyxy, IoU, GIoU) — fully vectorized, static-shape.

Semantics match the reference's mmdet `bbox_overlaps` / DETR `bbox_cxcywh_to_xyxy`
/ GIoU loss conventions (reference: thirdparty mmdet bbox ops; GIoU as used by
`detr_od/models/dense_heads/dino_detr_head.py` loss_bbox/loss_iou).

All functions accept arbitrary leading batch dims. Degenerate/padded boxes are
handled by clamping widths/heights at 0 and by eps-guarded denominators so that
masked entries never produce NaNs that could poison gradients.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def xyxy_to_cxcywh(b):
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1)


def box_area(b):
    """Area of xyxy boxes; negative extents clamp to 0."""
    w = jnp.clip(b[..., 2] - b[..., 0], 0)
    h = jnp.clip(b[..., 3] - b[..., 1], 0)
    return w * h


def pairwise_iou(a, b, eps: float = EPS):
    """IoU matrix between xyxy boxes a[..., M, 4] and b[..., N, 4] -> [..., M, N]."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return inter / jnp.maximum(union, eps)


def pairwise_giou(a, b, eps: float = EPS):
    """Generalized IoU matrix between xyxy boxes -> [..., M, N]."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    iou = inter / jnp.maximum(union, eps)
    # smallest enclosing box
    lt_c = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    rb_c = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / jnp.maximum(area_c, eps)


def elementwise_iou(a, b, eps: float = EPS):
    """IoU between aligned xyxy boxes a[..., 4], b[..., 4] -> [...]."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    return inter / jnp.maximum(union, eps)


def elementwise_giou(a, b, eps: float = EPS):
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    iou = inter / jnp.maximum(union, eps)
    lt_c = jnp.minimum(a[..., :2], b[..., :2])
    rb_c = jnp.maximum(a[..., 2:], b[..., 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / jnp.maximum(area_c, eps)


def transform_boxes(boxes_xyxy, matrix, out_w=None, out_h=None):
    """Apply a 3x3 homography to xyxy boxes (corner-point transform + re-AABB).

    Mirrors `Transform2D.transform_bboxes` (reference
    detr_ssod/models/utils/bbox_utils.py:165-190): transform the 4 corners,
    take min/max to re-form an axis-aligned box, optionally clip to
    [0, out_w] x [0, out_h].

    boxes_xyxy: [..., N, 4]; matrix: [..., 3, 3].
    """
    x0, y0, x1, y1 = (boxes_xyxy[..., i] for i in range(4))
    # corners: [..., N, 4pts]
    xs = jnp.stack([x0, x1, x0, x1], axis=-1)
    ys = jnp.stack([y0, y1, y1, y0], axis=-1)
    ones = jnp.ones_like(xs)
    pts = jnp.stack([xs, ys, ones], axis=-2)  # [..., N, 3, 4]
    out = jnp.einsum('...ij,...njk->...nik', matrix, pts)
    w = jnp.where(jnp.abs(out[..., 2, :]) < EPS, EPS, out[..., 2, :])
    px, py = out[..., 0, :] / w, out[..., 1, :] / w
    nb = jnp.stack([px.min(-1), py.min(-1), px.max(-1), py.max(-1)], axis=-1)
    if out_w is not None:
        nb = jnp.stack([
            jnp.clip(nb[..., 0], 0, out_w), jnp.clip(nb[..., 1], 0, out_h),
            jnp.clip(nb[..., 2], 0, out_w), jnp.clip(nb[..., 3], 0, out_h)
        ], axis=-1)
    return nb
