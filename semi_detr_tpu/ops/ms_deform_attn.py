"""Multi-scale deformable attention — TPU-native.

Reproduces the semantics of the reference CUDA op
(`detr_od/models/utils/ops/src/cuda/ms_deform_im2col_cuda.cuh:238-300`) whose
numerical oracle is the pure-PyTorch `ms_deform_attn_core_pytorch`
(`detr_od/models/utils/ops/functions/ms_deform_attn_func.py:41-61`):

  for each (batch n, query q, head m): out = sum over levels l, points p of
    attn_weight[n,q,m,l,p] * bilinear_sample(value_l[n,:,:,m,:], loc[n,q,m,l,p])

where `loc` is normalized to [0,1] over the level's (W,H) INCLUDING padding,
and bilinear sampling follows torch `grid_sample(align_corners=False,
padding_mode='zeros')`: pixel = loc * extent - 0.5, out-of-bounds taps read 0.

TPU-first design notes
----------------------
* Spatial shapes are STATIC (python tuple of (H, W)) — one compiled program
  per resolution bucket; no dynamic shapes reach XLA.
* The 4 bilinear corner taps of every (level, point) are fused into ONE
  gather per (batch, head) along the flattened token axis S, so XLA emits a
  single large gather instead of L*P*4 small ones. Corner validity is folded
  into the interpolation weight (zero-padding semantics), so clamped indices
  never contribute and gradients w.r.t. locations stay correct.
* Gradients come from XLA autodiff: grad_value is the scatter-add transpose
  of the gather; grad_location flows through the bilinear weights — exactly
  the quantities the reference's hand-written col2im backward kernels compute
  (`ms_deform_im2col_cuda.cuh:302-1005`).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def level_start_index(spatial_shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    sizes = [h * w for h, w in spatial_shapes]
    return np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)


@partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn(value: jax.Array,
                   spatial_shapes: Tuple[Tuple[int, int], ...],
                   sampling_locations: jax.Array,
                   attention_weights: jax.Array) -> jax.Array:
    """Fused-gather multi-scale deformable attention.

    Args:
      value: (N, S, M, D) flattened multi-level features, S = sum(H*W).
      spatial_shapes: static ((H0, W0), ..., (H_{L-1}, W_{L-1})).
      sampling_locations: (N, Lq, M, L, P, 2), (x, y) normalized to [0, 1].
      attention_weights: (N, Lq, M, L, P), softmaxed over the L*P axis.

    Returns:
      (N, Lq, M*D) attention output (dtype of `value`).
    """
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), (L, spatial_shapes)
    assert sum(h * w for h, w in spatial_shapes) == S

    compute_dtype = jnp.promote_types(sampling_locations.dtype, jnp.float32)
    loc = sampling_locations.astype(compute_dtype)

    hw = np.array(spatial_shapes, dtype=np.float32)  # (L, 2) as (H, W)
    Hs = jnp.asarray(hw[:, 0], compute_dtype)
    Ws = jnp.asarray(hw[:, 1], compute_dtype)
    starts = jnp.asarray(level_start_index(spatial_shapes))  # (L,)

    # grid_sample(align_corners=False): pixel = loc * extent - 0.5
    px = loc[..., 0] * Ws[None, None, None, :, None] - 0.5  # (N,Lq,M,L,P)
    py = loc[..., 1] * Hs[None, None, None, :, None] - 0.5

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    Wi = Ws.astype(jnp.int32)[None, None, None, :, None]
    Hi = Hs.astype(jnp.int32)[None, None, None, :, None]

    def corner(xi, yi, w):
        valid = ((xi >= 0) & (xi < Wi) & (yi >= 0) & (yi < Hi))
        idx = (starts[None, None, None, :, None]
               + jnp.clip(yi, 0, Hi - 1) * Wi + jnp.clip(xi, 0, Wi - 1))
        return idx, jnp.where(valid, w, 0.0)

    i00, w00 = corner(x0i, y0i, (1 - fx) * (1 - fy))
    i01, w01 = corner(x0i + 1, y0i, fx * (1 - fy))
    i10, w10 = corner(x0i, y0i + 1, (1 - fx) * fy)
    i11, w11 = corner(x0i + 1, y0i + 1, fx * fy)

    aw = attention_weights.astype(compute_dtype)
    # (N, Lq, M, L, P, 4) -> fold attention weight into corner weights.
    idx = jnp.stack([i00, i01, i10, i11], axis=-1)
    cw = jnp.stack([w00, w01, w10, w11], axis=-1) * aw[..., None]

    # One gather per (batch, head): value (N, M, S, D), flat idx (N, M, K).
    K = Lq * L * P * 4
    v = value.transpose(0, 2, 1, 3)  # (N, M, S, D)
    flat_idx = idx.transpose(0, 2, 1, 3, 4, 5).reshape(N, M, K)
    sampled = jnp.take_along_axis(v, flat_idx[..., None], axis=2)  # (N,M,K,D)

    flat_w = cw.transpose(0, 2, 1, 3, 4, 5).reshape(N, M, K)
    out = (sampled.astype(compute_dtype)
           * flat_w[..., None]).reshape(N, M, Lq, L * P * 4, D).sum(axis=3)
    return out.transpose(0, 2, 1, 3).reshape(N, Lq, M * D).astype(value.dtype)


def sampling_offsets_init_bias(n_heads: int, n_levels: int,
                               n_points: int) -> np.ndarray:
    """Directional grid init for the sampling-offset bias.

    Matches `MSDeformAttn._reset_parameters` (reference
    detr_od/models/utils/ops/modules/ms_deform_attn.py:62-70): head h points
    along angle 2*pi*h/H normalized to the unit Linf ball, point p scaled by
    (p+1), identical across levels.
    """
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for p in range(n_points):
        grid[:, :, p, :] *= p + 1
    return grid.reshape(-1).astype(np.float32)
