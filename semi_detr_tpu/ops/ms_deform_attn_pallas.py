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
_STATIC_SPAN = 3       # fwd: unconditionally visited windows per tap
_STATIC_SPAN_BWD = 1   # bwd visits are heavy (scatter matmul): overshoot
                       # costs more than while-loop carries save


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(locx_ref, locy_ref, attn_ref, value_ref, out_ref, *,
            spatial_shapes: Tuple[Tuple[int, int], ...], n_points: int):
    """locx/locy/attn (1,1,L*P,BQ) f32; value (1,1,NW,D,BQ);
    out (1,1,D,BQ)."""
    P = n_points
    D = out_ref.shape[2]
    LP = locx_ref.shape[2]
    starts = level_start_index(spatial_shapes)

    # per-tap sublane constants from iota-where chains (full-tile math:
    # (LP, BQ) tiles keep the VPU at 8x the efficiency of (1, BQ) rows)
    row = jax.lax.broadcasted_iota(jnp.int32, (LP, 1), 0)
    wsv = jnp.zeros((LP, 1), jnp.float32)
    hsv = jnp.zeros((LP, 1), jnp.float32)
    stv = jnp.zeros((LP, 1), jnp.float32)
    for l, (h, w) in enumerate(spatial_shapes):
        in_l = (row >= l * P) & (row < (l + 1) * P)
        wsv = jnp.where(in_l, float(w), wsv)
        hsv = jnp.where(in_l, float(h), hsv)
        stv = jnp.where(in_l, float(starts[l]), stv)

    px = locx_ref[0, 0] * wsv - 0.5               # (LP, BQ)
    py = locy_ref[0, 0] * hsv - 0.5
    attn = attn_ref[0, 0]
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0

    acc = jnp.zeros((D, _BQ), jnp.float32)
    big = jnp.int32(2 ** 30)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wx = fx if dx else 1 - fx
            wy = fy if dy else 1 - fy
            valid = ((xi >= 0) & (xi < wsv) & (yi >= 0) & (yi < hsv))
            idx_all = (stv + jnp.clip(yi, 0, hsv - 1) * wsv
                       + jnp.clip(xi, 0, wsv - 1)).astype(jnp.int32)
            wgt_all = jnp.where(valid, wx * wy, 0.0) * attn   # (LP, BQ)
            win_all = idx_all // _BQ
            # valid-aware spans: invalid taps must not widen the sweep
            win_lo = jnp.where(valid, win_all, big)
            win_hi = jnp.where(valid, win_all, -big)
            for r in range(LP):
                idx = idx_all[r:r + 1, :]                     # (1, BQ)
                wgt = wgt_all[r:r + 1, :]
                win = win_all[r:r + 1, :]
                wmin = jnp.min(win_lo[r:r + 1, :])
                wmax = jnp.max(win_hi[r:r + 1, :])

                def visit(wnd, acc, live=None, win=win, idx=idx, wgt=wgt):
                    nw = value_ref.shape[2]
                    safe = jnp.clip(wnd, 0, nw - 1)
                    tile = value_ref[0, 0, safe]              # (D, BQ)
                    lane = jnp.clip(idx - wnd * _BQ, 0, _BQ - 1)
                    g = jnp.take_along_axis(
                        tile, jnp.broadcast_to(lane, (D, _BQ)),
                        axis=1, mode="promise_in_bounds")
                    hit = win == wnd
                    if live is not None:
                        hit = hit & live                      # scalar guard
                    m = jnp.where(hit, wgt, 0.0)              # (1, BQ)
                    return acc + g.astype(jnp.float32) * m

                # hybrid sweep: the median span is <= _STATIC_SPAN; those
                # visits run unconditionally (masked past the true span),
                # the tail runs in a dynamic loop
                span = wmax - wmin + 1
                for k in range(_STATIC_SPAN):
                    acc = visit(wmin + k, acc, live=(k < span))
                acc = jax.lax.fori_loop(
                    _STATIC_SPAN, span,
                    lambda k, a: visit(wmin + k, a), acc)
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
    # Mosaic's dynamic_gather is 32-bit-only: keep the slab f32 in-kernel
    v = value.transpose(0, 2, 1, 3).astype(jnp.float32)   # (N, M, S, D)
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
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=8 * N * M * lq_pad * L * P * D,
            bytes_accessed=(N * M * s_pad * D * 4
                            + 3 * N * M * lq_pad * L * P * 4),
            transcendentals=0,
        ),
    )(locx, locy, attn, v)

    out = out.transpose(0, 3, 1, 2).reshape(N, lq_pad, M * D)
    return out[:, :Lq]


def _bwd_kernel(locx_ref, locy_ref, attn_ref, locxT_ref, locyT_ref,
                attnT_ref, g_ref, gT_ref, value_ref,
                dv_ref, dlx_ref, dly_ref, da_ref, *,
                spatial_shapes: Tuple[Tuple[int, int], ...],
                n_points: int):
    """Windowed backward: gradients w.r.t. value (windowed one-hot-MXU
    scatter), sampling locations and attention weights (shared gathers).

    Math matches XLA autodiff of the oracle exactly: for corner c with
    bilinear weight w_c = wx*wy and validity v_c,
      d_attn   = sum_c v_c * w_c * <g, V_c>
      d_px     = attn * sum_c v_c * (sx_c * wy_c) * <g, V_c>   (sx = +-1)
      d_locx   = d_px * W_level  (px = locx * W - 0.5)
      dV[s]   += sum_{taps with idx=s} v*w*attn * g
    Layout notes: tap math runs in BOTH (LP, 128q) (for gathers/dots) and
    (128q, LP) (for the scatter's per-query weight columns) so no in-kernel
    transposes are needed; the one-hot scatter is an MXU matmul
    S(tok,q) @ (gT * w)(q, D) accumulated into the revisited dv block.
    """
    P = n_points
    D = g_ref.shape[2]
    LP = locx_ref.shape[2]
    starts = level_start_index(spatial_shapes)
    q_id = pl.program_id(2)

    @pl.when(q_id == 0)
    def _init():
        dv_ref[0, 0] = jnp.zeros(dv_ref.shape[2:], jnp.float32)

    # per-tap constants, lane layout (LP, 1) and sublane layout (1, LP)
    row = jax.lax.broadcasted_iota(jnp.int32, (LP, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, LP), 1)
    wsv = jnp.zeros((LP, 1), jnp.float32)
    hsv = jnp.zeros((LP, 1), jnp.float32)
    stv = jnp.zeros((LP, 1), jnp.float32)
    wsh = jnp.zeros((1, LP), jnp.float32)
    hsh = jnp.zeros((1, LP), jnp.float32)
    sth = jnp.zeros((1, LP), jnp.float32)
    for l, (h, w) in enumerate(spatial_shapes):
        in_r = (row >= l * P) & (row < (l + 1) * P)
        in_c = (col >= l * P) & (col < (l + 1) * P)
        wsv = jnp.where(in_r, float(w), wsv)
        hsv = jnp.where(in_r, float(h), hsv)
        stv = jnp.where(in_r, float(starts[l]), stv)
        wsh = jnp.where(in_c, float(w), wsh)
        hsh = jnp.where(in_c, float(h), hsh)
        sth = jnp.where(in_c, float(starts[l]), sth)

    g = g_ref[0, 0]                                    # (D, 128)
    gT = gT_ref[0, 0]                                  # (128, D)
    attn = attn_ref[0, 0]                              # (LP, 128)
    px = locx_ref[0, 0] * wsv - 0.5
    py = locy_ref[0, 0] * hsv - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    attnT = attnT_ref[0, 0]                            # (128, LP)
    pxT = locxT_ref[0, 0] * wsh - 0.5
    pyT = locyT_ref[0, 0] * hsh - 0.5
    x0T = jnp.floor(pxT)
    y0T = jnp.floor(pyT)
    fxT = pxT - x0T
    fyT = pyT - y0T

    iota_tok = jax.lax.broadcasted_iota(jnp.int32, (_BQ, _BQ), 0)
    big = jnp.int32(2 ** 30)

    corners = []
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wx = fx if dx else 1 - fx
            wy = fy if dy else 1 - fy
            valid = ((xi >= 0) & (xi < wsv) & (yi >= 0) & (yi < hsv))
            idx = (stv + jnp.clip(yi, 0, hsv - 1) * wsv
                   + jnp.clip(xi, 0, wsv - 1)).astype(jnp.int32)
            bw = jnp.where(valid, wx * wy, 0.0)
            dwx = jnp.where(valid, (1.0 if dx else -1.0) * wy, 0.0) * attn
            dwy = jnp.where(valid, (1.0 if dy else -1.0) * wx, 0.0) * attn
            win = idx // _BQ
            win_lo = jnp.where(valid, win, big)
            win_hi = jnp.where(valid, win, -big)
            # sublane-layout weight for the scatter
            xiT = x0T + dx
            yiT = y0T + dy
            wxT = fxT if dx else 1 - fxT
            wyT = fyT if dy else 1 - fyT
            validT = ((xiT >= 0) & (xiT < wsh) & (yiT >= 0) & (yiT < hsh))
            idxT = (sth + jnp.clip(yiT, 0, hsh - 1) * wsh
                    + jnp.clip(xiT, 0, wsh - 1)).astype(jnp.int32)
            wgtT = jnp.where(validT, wxT * wyT, 0.0) * attnT
            winT = idxT // _BQ
            corners.append((idx, bw, dwx, dwy, win, win_lo, win_hi,
                            wgtT, winT))

    for r in range(LP):
        da_row = jnp.zeros((1, _BQ), jnp.float32)
        dpx_row = jnp.zeros((1, _BQ), jnp.float32)
        dpy_row = jnp.zeros((1, _BQ), jnp.float32)
        for (idx, bw, dwx, dwy, win, win_lo, win_hi, wgtT,
             winT) in corners:
            idx_r = idx[r:r + 1, :]
            bw_r = bw[r:r + 1, :]
            dwx_r = dwx[r:r + 1, :]
            dwy_r = dwy[r:r + 1, :]
            win_r = win[r:r + 1, :]
            wgtT_c = wgtT[:, r:r + 1]                   # (128, 1)
            winT_c = winT[:, r:r + 1]
            wmin = jnp.min(win_lo[r:r + 1, :])
            wmax = jnp.max(win_hi[r:r + 1, :])

            def visit(wnd, carry, idx_r=idx_r, bw_r=bw_r, dwx_r=dwx_r,
                      dwy_r=dwy_r, win_r=win_r, wgtT_c=wgtT_c,
                      winT_c=winT_c, live=None):
                da_row, dpx_row, dpy_row = carry
                nw = value_ref.shape[2]
                safe = jnp.clip(wnd, 0, nw - 1)
                tile = value_ref[0, 0, safe]            # (D, 128)
                lane = jnp.clip(idx_r - wnd * _BQ, 0, _BQ - 1)
                hit = win_r == wnd
                if live is not None:
                    hit = hit & live
                gathered = jnp.take_along_axis(
                    tile, jnp.broadcast_to(lane, (D, _BQ)),
                    axis=1, mode="promise_in_bounds")
                dot = jnp.sum(g * gathered, axis=0, keepdims=True)
                dot = jnp.where(hit, dot, 0.0)          # (1, BQ)
                da_row = da_row + bw_r * dot
                dpx_row = dpx_row + dwx_r * dot
                dpy_row = dpy_row + dwy_r * dot
                # scatter into the window: dv[tok] += S(tok,q) @ gw(q,D)
                hitT = winT_c == wnd
                if live is not None:
                    hitT = hitT & live
                gw = gT * jnp.where(hitT, wgtT_c, 0.0)   # (128, D)
                s = (iota_tok == jnp.broadcast_to(lane, (_BQ, _BQ))
                     ).astype(jnp.float32)
                # HIGHEST: the MXU's default bf16 passes would round gw
                # (s is exact 0/1); grad_value must match f32 scatter-add
                delta = jax.lax.dot_general(
                    s, gw, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                dv_ref[0, 0, safe] = dv_ref[0, 0, safe] + jnp.where(
                    jnp.logical_and(wnd >= 0, wnd <= nw - 1), delta, 0.0)
                return da_row, dpx_row, dpy_row

            carry = (da_row, dpx_row, dpy_row)
            span = wmax - wmin + 1
            for k in range(_STATIC_SPAN_BWD):
                carry = visit(wmin + k, carry, live=(k < span))
            carry = jax.lax.fori_loop(
                _STATIC_SPAN_BWD, span,
                lambda k, c: visit(wmin + k, c), carry)
            da_row, dpx_row, dpy_row = carry
        da_ref[0, 0, r:r + 1, :] = da_row
        dlx_ref[0, 0, r:r + 1, :] = dpx_row * wsv[r, 0]
        dly_ref[0, 0, r:r + 1, :] = dpy_row * hsv[r, 0]


@functools.partial(jax.jit,
                   static_argnames=("spatial_shapes", "interpret"))
def ms_deform_attn_bwd_pallas(value, spatial_shapes, sampling_locations,
                              attention_weights, cotangent,
                              interpret: bool = False):
    """Backward of ms_deform_attn: returns (d_value, d_locations,
    d_attention_weights) given the output cotangent (N, Lq, M*D)."""
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    taps = L * P

    s_pad = _round_up(S, _BQ)
    nw = s_pad // _BQ
    lq_pad = _round_up(Lq, _BQ)

    loc = sampling_locations.astype(jnp.float32)
    attn = attention_weights.astype(jnp.float32)
    g = cotangent.astype(jnp.float32).reshape(N, Lq, M, D)
    if lq_pad != Lq:
        loc = jnp.pad(loc, ((0, 0), (0, lq_pad - Lq)) + ((0, 0),) * 4)
        attn = jnp.pad(attn, ((0, 0), (0, lq_pad - Lq)) + ((0, 0),) * 3)
        g = jnp.pad(g, ((0, 0), (0, lq_pad - Lq), (0, 0), (0, 0)))
    v = value.transpose(0, 2, 1, 3).astype(jnp.float32)
    if s_pad != S:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    vwin = v.reshape(N, M, nw, _BQ, D).transpose(0, 1, 2, 4, 3)

    locx = loc[..., 0].transpose(0, 2, 1, 3, 4).reshape(N, M, lq_pad, taps)
    locy = loc[..., 1].transpose(0, 2, 1, 3, 4).reshape(N, M, lq_pad, taps)
    attn_t = attn.transpose(0, 2, 1, 3, 4).reshape(N, M, lq_pad, taps)
    locx_l = locx.transpose(0, 1, 3, 2)
    locy_l = locy.transpose(0, 1, 3, 2)
    attn_l = attn_t.transpose(0, 1, 3, 2)
    gT = g.transpose(0, 2, 1, 3)                         # (N, M, lq, D)
    g_l = gT.transpose(0, 1, 3, 2)                       # (N, M, D, lq)

    grid = (N, M, lq_pad // _BQ)
    kernel = functools.partial(_bwd_kernel, spatial_shapes=spatial_shapes,
                               n_points=P)

    def spec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    dv, dlx, dly, da = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec((1, 1, taps, _BQ), lambda n, m, q: (n, m, 0, q)),
            spec((1, 1, taps, _BQ), lambda n, m, q: (n, m, 0, q)),
            spec((1, 1, taps, _BQ), lambda n, m, q: (n, m, 0, q)),
            spec((1, 1, _BQ, taps), lambda n, m, q: (n, m, q, 0)),
            spec((1, 1, _BQ, taps), lambda n, m, q: (n, m, q, 0)),
            spec((1, 1, _BQ, taps), lambda n, m, q: (n, m, q, 0)),
            spec((1, 1, D, _BQ), lambda n, m, q: (n, m, 0, q)),
            spec((1, 1, _BQ, D), lambda n, m, q: (n, m, q, 0)),
            spec((1, 1, nw, D, _BQ), lambda n, m, q: (n, m, 0, 0, 0)),
        ],
        out_specs=[
            spec((1, 1, nw, _BQ, D), lambda n, m, q: (n, m, 0, 0, 0)),
            spec((1, 1, taps, _BQ), lambda n, m, q: (n, m, 0, q)),
            spec((1, 1, taps, _BQ), lambda n, m, q: (n, m, 0, q)),
            spec((1, 1, taps, _BQ), lambda n, m, q: (n, m, 0, q)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, M, nw, _BQ, D), jnp.float32),
            jax.ShapeDtypeStruct((N, M, taps, lq_pad), jnp.float32),
            jax.ShapeDtypeStruct((N, M, taps, lq_pad), jnp.float32),
            jax.ShapeDtypeStruct((N, M, taps, lq_pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(locx_l, locy_l, attn_l, locx, locy, attn_t, g_l, gT, vwin)

    d_value = dv.reshape(N, M, s_pad, D)[:, :, :S].transpose(
        0, 2, 1, 3).astype(value.dtype)
    dlx = dlx[..., :Lq].transpose(0, 3, 1, 2).reshape(N, Lq, M, L, P)
    dly = dly[..., :Lq].transpose(0, 3, 1, 2).reshape(N, Lq, M, L, P)
    d_loc = jnp.stack([dlx, dly], -1).astype(sampling_locations.dtype)
    d_attn = da[..., :Lq].transpose(0, 3, 1, 2).reshape(
        N, Lq, M, L, P).astype(attention_weights.dtype)
    return d_value, d_loc, d_attn


def ms_deform_attn_auto(value, spatial_shapes, sampling_locations,
                        attention_weights, prefer_pallas: bool = True):
    """Backend dispatch: the Pallas kernel on TPU when the sampling
    pattern is local (encoder self-attention: one query per token), the
    XLA oracle otherwise (CPU, interpret-free tests, decoder
    cross-attention whose box-conditioned sampling defeats window
    locality)."""
    on_tpu = jax.default_backend() == "tpu"
    local = sampling_locations.shape[1] == value.shape[1]  # Lq == S
    if prefer_pallas and on_tpu and local:
        return ms_deform_attn_fused(value, spatial_shapes,
                                    sampling_locations, attention_weights)
    return ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                              attention_weights)


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
    if jax.default_backend() == "tpu":
        return ms_deform_attn_bwd_pallas(value, spatial_shapes, loc, attn,
                                         g)
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_xla(v, spatial_shapes, l, a),
        value, loc, attn)
    return vjp(g)


ms_deform_attn_fused.defvjp(_fwd, _bwd)
