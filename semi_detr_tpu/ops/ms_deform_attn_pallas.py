"""Pallas TPU kernel for multi-scale deformable attention.

Same semantics as `ops/ms_deform_attn.py` (the XLA oracle, matching the
reference CUDA op `ms_deform_im2col_cuda.cuh:238-300` /
`ms_deform_attn_core_pytorch`). XLA's HLO gather runs ~row-at-a-time on
TPU (measured ~100x slower than memory-bound), and Mosaic's
`dynamic_gather` is a single-vreg shuffle — so this kernel restructures
the problem around both constraints:

* 128 queries ride the LANE axis per grid step; the value slab is
  pre-tiled into 128-token windows (NW, D, 128) and stays VMEM-resident
  per (batch, head);
* each of the L*P*4 taps computes its row indices in-kernel ((1, 128)
  vectors — no HBM index materialization), then loops only over the
  window span [min, max] that its 128 queries actually touch: one
  dynamic window pick + one within-vreg lane `dynamic_gather` + masked
  FMA per window;
* spatial locality makes the span tiny for the dominant encoder
  self-attention case (consecutive tokens sample consecutive windows);
  the loop bound is data-dependent (`lax.fori_loop`), so arbitrary
  offsets stay CORRECT — they just cost more iterations.

Training uses `ms_deform_attn_fused`: this forward under
`jax.custom_vjp`, backward = XLA autodiff of the oracle (the exact
scatter-add / bilinear gradients the reference hand-writes in its col2im
kernels, `ms_deform_im2col_cuda.cuh:302-1005`).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ms_deform_attn import level_start_index
from .ms_deform_attn import ms_deform_attn as ms_deform_attn_xla

_BQ = 128   # queries per grid step == lane width == window size


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(locx_ref, locy_ref, attn_ref, value_ref, out_ref, *,
            spatial_shapes: Tuple[Tuple[int, int], ...], n_points: int):
    """locx/locy/attn (1,1,L*P,BQ) f32; value (1,1,NW,D,BQ);
    out (1,1,D,BQ)."""
    P = n_points
    D = out_ref.shape[2]
    starts = level_start_index(spatial_shapes)
    acc = jnp.zeros((D, _BQ), jnp.float32)

    for l, (h, w) in enumerate(spatial_shapes):
        for p in range(P):
            r = l * P + p
            px = locx_ref[0, 0, r:r + 1, :] * w - 0.5      # (1, BQ)
            py = locy_ref[0, 0, r:r + 1, :] * h - 0.5
            a = attn_ref[0, 0, r:r + 1, :]
            x0 = jnp.floor(px)
            y0 = jnp.floor(py)
            fx = px - x0
            fy = py - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            for dy in (0, 1):
                for dx in (0, 1):
                    xi = x0i + dx
                    yi = y0i + dy
                    wx = fx if dx else 1 - fx
                    wy = fy if dy else 1 - fy
                    valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
                    idx = (int(starts[l])
                           + jnp.clip(yi, 0, h - 1) * w
                           + jnp.clip(xi, 0, w - 1))        # (1, BQ)
                    wgt = jnp.where(valid, wx * wy, 0.0) * a
                    win = idx // _BQ                        # (1, BQ)
                    wmin = jnp.min(win)
                    wmax = jnp.max(win)

                    def body(k, acc, win=win, idx=idx, wgt=wgt, wmin=wmin):
                        wnd = wmin + k
                        tile = value_ref[0, 0, wnd]         # (D, BQ)
                        lane = jnp.clip(idx - wnd * _BQ, 0, _BQ - 1)
                        g = jnp.take_along_axis(
                            tile, jnp.broadcast_to(lane, (D, _BQ)),
                            axis=1, mode="promise_in_bounds")
                        m = jnp.where(win == wnd, wgt, 0.0)  # (1, BQ)
                        return acc + g.astype(jnp.float32) * m
                    acc = jax.lax.fori_loop(0, wmax - wmin + 1, body, acc)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("spatial_shapes", "interpret"))
def ms_deform_attn_pallas(value: jax.Array,
                          spatial_shapes: Tuple[Tuple[int, int], ...],
                          sampling_locations: jax.Array,
                          attention_weights: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Same signature/semantics as ops.ms_deform_attn.ms_deform_attn.

    value (N, S, M, D); sampling_locations (N, Lq, M, L, P, 2) in [0,1];
    attention_weights (N, Lq, M, L, P). Returns (N, Lq, M*D).
    """
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert sum(h * w for h, w in spatial_shapes) == S

    s_pad = _round_up(S, _BQ)
    nw = s_pad // _BQ
    lq_pad = _round_up(Lq, _BQ)

    loc = sampling_locations.astype(jnp.float32)
    attn = attention_weights.astype(jnp.float32)
    if lq_pad != Lq:
        loc = jnp.pad(loc, ((0, 0), (0, lq_pad - Lq)) + ((0, 0),) * 4)
        attn = jnp.pad(attn, ((0, 0), (0, lq_pad - Lq)) + ((0, 0),) * 3)
    v = value.transpose(0, 2, 1, 3)                       # (N, M, S, D)
    if s_pad != S:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    # window tiling: (N, M, NW, D, 128)
    v = v.reshape(N, M, nw, _BQ, D).transpose(0, 1, 2, 4, 3)

    # (N, M, L*P, lq) per-coordinate layouts (taps on sublanes,
    # queries on lanes)
    locx = loc[..., 0].transpose(0, 2, 3, 4, 1).reshape(N, M, L * P,
                                                        lq_pad)
    locy = loc[..., 1].transpose(0, 2, 3, 4, 1).reshape(N, M, L * P,
                                                        lq_pad)
    attn = attn.transpose(0, 2, 3, 4, 1).reshape(N, M, L * P, lq_pad)

    grid = (N, M, lq_pad // _BQ)
    kernel = functools.partial(_kernel, spatial_shapes=spatial_shapes,
                               n_points=P)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, L * P, _BQ),
                         lambda n, m, q: (n, m, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L * P, _BQ),
                         lambda n, m, q: (n, m, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L * P, _BQ),
                         lambda n, m, q: (n, m, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nw, D, _BQ),
                         lambda n, m, q: (n, m, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D, _BQ),
                               lambda n, m, q: (n, m, 0, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, M, D, lq_pad), value.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * N * M * lq_pad * L * P * D,
            bytes_accessed=(N * M * s_pad * D * 4
                            + 3 * N * M * lq_pad * L * P * 4),
            transcendentals=0,
        ),
    )(locx, locy, attn, v)

    out = out.transpose(0, 3, 1, 2).reshape(N, lq_pad, M * D)
    return out[:, :Lq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_fused(value, spatial_shapes, sampling_locations,
                         attention_weights):
    """Pallas forward + XLA backward (custom_vjp)."""
    return ms_deform_attn_pallas(value, spatial_shapes,
                                 sampling_locations, attention_weights)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                                attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, res, g):
    value, loc, attn = res
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_xla(v, spatial_shapes, l, a),
        value, loc, attn)
    return vjp(g)


ms_deform_attn_fused.defvjp(_fwd, _bwd)
