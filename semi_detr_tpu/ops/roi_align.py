"""RoIAlign + multi-level RoI extraction — XLA gather formulation.

Replaces mmcv's CUDA RoIAlign consumed by the reference consistency-query
projector (`detr_ssod/models/dino_detr_ssod.py:97-101`: SingleRoIExtractor,
output 7x7, featmap strides [8,16,32,64]). `aligned=True` semantics
(mmcv default): continuous coordinates are used directly with a half-pixel
shift, bilinear sampled with `sampling_ratio` taps per bin axis.

`sampling_ratio=0` (the reference/mmcv default) means ADAPTIVE taps:
per-RoI grid = ceil(roi_extent_in_cells / out_size) per axis, with the
average divided by the true tap count (mmcv `roi_align_kernel` /
torchvision `roi_align` semantics). That is a dynamic shape, so here it
is realized as a static `max_taps`-wide tap grid with per-RoI masking:
taps beyond the adaptive count carry zero weight and the divisor is the
true (unclipped-within-budget) count. Exact vs mmcv whenever the
adaptive count <= max_taps. The adaptive count is PER AXIS
(ceil(axis_extent_in_cells / out_size)) while SingleRoIExtractor
routes by sqrt(area), so for near-square RoIs the routed level keeps
the count <= ~3 and max_taps=4 is exact; a high-aspect-ratio RoI can
exceed the cap on its long axis (e.g. a 1333x20 px box routes to
stride 16 and would want ceil(83/7)=12 taps there). Such RoIs fall
back to a uniform 4-tap-per-bin average over the same bin — a
coarser quadrature of the identical integrand, not a different
quantity; raise `max_taps` (cost grows ~t^2) if exactness for
elongated pseudo-boxes ever matters. Degenerate (zero-extent) RoIs
produce 0 with divisor 1, as in mmcv.

Level assignment follows mmdet SingleRoIExtractor.map_roi_levels:
lvl = clamp(floor(log2(sqrt(area)/finest_scale + 1e-6)), 0, L-1),
finest_scale=56.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear(feat: jax.Array, x: jax.Array, y: jax.Array):
    """Sample feat (H, W, C) at continuous (x, y) points (...,) -> (..., C).

    Matches torchvision/mmcv roi_align interpolation: points outside
    [-1, H/W] return 0; coords below 0 are clamped to 0 (see mmcv
    roi_align bilinear_interpolate)."""
    h, w, _ = feat.shape
    oob = (x < -1.0) | (x > w) | (y < -1.0) | (y > h)
    x = jnp.clip(x, 0.0, None)
    y = jnp.clip(y, 0.0, None)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    # replicate the CUDA kernel's high-index clamp: x_high = x_low = W-1
    x0 = jnp.minimum(x0, w - 1)
    y0 = jnp.minimum(y0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)

    flat = feat.reshape(h * w, -1)

    def g(yy, xx):
        return flat[yy * w + xx]

    v = (g(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
         + g(y0, x1) * (fx * (1 - fy))[..., None]
         + g(y1, x0) * ((1 - fx) * fy)[..., None]
         + g(y1, x1) * (fx * fy)[..., None])
    return jnp.where(oob[..., None], 0.0, v)


def roi_align_level(feat: jax.Array, rois_xyxy: jax.Array, stride: float,
                    out_size: int = 7, sampling_ratio: int = 2,
                    max_taps: int = 4):
    """RoIAlign on one level. feat: (H, W, C); rois: (R, 4) in image coords.
    Returns (R, out_size, out_size, C).

    sampling_ratio > 0: fixed taps per bin axis (torchvision semantics).
    sampling_ratio == 0: adaptive mmcv semantics — per-RoI grid =
    ceil(extent_cells / out_size) per axis, realized on a static
    `max_taps` grid with masking (see module docstring)."""
    r = rois_xyxy.shape[0]
    scale = 1.0 / stride
    x0 = rois_xyxy[:, 0] * scale - 0.5
    y0 = rois_xyxy[:, 1] * scale - 0.5
    x1 = rois_xyxy[:, 2] * scale - 0.5
    y1 = rois_xyxy[:, 3] * scale - 0.5
    rw = x1 - x0
    rh = y1 - y0
    bin_w = rw / out_size
    bin_h = rh / out_size

    if sampling_ratio > 0:
        t = sampling_ratio
        nx = jnp.full((r,), t, jnp.int32)
        ny = jnp.full((r,), t, jnp.int32)
    else:
        t = max_taps
        # adaptive grid, capped at the static budget; the cap only binds
        # for RoIs whose extent exceeds max_taps*out_size feature cells
        nx = jnp.minimum(jnp.ceil(rw / out_size), t).astype(jnp.int32)
        ny = jnp.minimum(jnp.ceil(rh / out_size), t).astype(jnp.int32)

    it = jnp.arange(t)
    # per-bin tap offsets in [0,1): (R, t); divisor >=1 avoids div-by-0
    # for degenerate RoIs (their taps are all masked anyway)
    offx = (it[None, :] + 0.5) / jnp.maximum(nx, 1)[:, None]
    offy = (it[None, :] + 0.5) / jnp.maximum(ny, 1)[:, None]
    mx = it[None, :] < nx[:, None]                  # (R, t)
    my = it[None, :] < ny[:, None]
    ob = jnp.arange(out_size)
    # sample coords: (R, out, t)
    sx = x0[:, None, None] + bin_w[:, None, None] * (ob[None, :, None]
                                                     + offx[:, None, :])
    sy = y0[:, None, None] + bin_h[:, None, None] * (ob[None, :, None]
                                                     + offy[:, None, :])
    # full grid (R, out, t, out, t)
    gx = jnp.broadcast_to(sx[:, None, None, :, :],
                          (r, out_size, t, out_size, t))
    gy = jnp.broadcast_to(sy[:, :, :, None, None],
                          (r, out_size, t, out_size, t))
    v = _bilinear(feat, gx, gy)                     # (R, oh, t, ow, t, C)
    w = (my[:, None, :, None, None] & mx[:, None, None, None, :])
    count = jnp.maximum(ny * nx, 1).astype(v.dtype)  # mmcv count semantics
    v = jnp.where(w[..., None], v, 0.0).sum(axis=(2, 4))
    return v / count[:, None, None, None]


@partial(jax.jit, static_argnames=("strides", "out_size", "sampling_ratio",
                                   "finest_scale"))
def multi_level_roi_align(feats: Sequence[jax.Array], rois_xyxy: jax.Array,
                          strides=(8, 16, 32, 64), out_size: int = 7,
                          sampling_ratio: int = 0, finest_scale: int = 56):
    """SingleRoIExtractor: route each RoI to one pyramid level by scale.

    Default sampling_ratio=0 = adaptive taps, matching the reference's
    mmcv RoIAlign default (`detr_ssod/models/dino_detr_ssod.py:97-101`).

    feats: list of (H_l, W_l, C) for each stride. rois: (R, 4) image coords.
    Returns (R, out_size, out_size, C).
    """
    areas = jnp.clip((rois_xyxy[:, 2] - rois_xyxy[:, 0])
                     * (rois_xyxy[:, 3] - rois_xyxy[:, 1]), 0)
    lvl = jnp.floor(jnp.log2(jnp.sqrt(areas) / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, len(strides) - 1).astype(jnp.int32)
    outs = jnp.stack([
        roi_align_level(f, rois_xyxy, s, out_size, sampling_ratio)
        for f, s in zip(feats, strides)
    ])                                              # (L, R, oh, ow, C)
    return jnp.take_along_axis(
        outs, lvl[None, :, None, None, None], axis=0)[0]
