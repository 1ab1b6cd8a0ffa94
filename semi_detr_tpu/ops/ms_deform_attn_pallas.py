"""Pallas TPU kernels for multi-scale deformable attention (v2).

Same semantics as `ops/ms_deform_attn.py` (the XLA oracle, matching the
reference CUDA op `ms_deform_im2col_cuda.cuh:238-300` /
`ms_deform_attn_core_pytorch`). The v1 kernel (git history) swept
row-major 128-token windows with one data-dependent loop per
(tap, corner) — 64 scalar min/max reductions + 64 `fori_loop`s per grid
step dominated the runtime. v2 restructures for 2-D locality and
near-zero scalar traffic:

* value is retiled into 8x16-PIXEL tiles (= 128 tokens = one lane-window)
  per level, so a spatial neighborhood spans O(1) windows in BOTH axes
  (row-major windows made every 8px of vertical offset cost W/128 extra
  windows);
* when the queries are the tokens themselves (encoder self-attention,
  Lq == S), the query axis is permuted into the same tile order, making
  each 128-query grid step an 8x16px patch whose taps cluster into a
  small window rectangle;
* per (grid step, level) the kernel reduces ONE bounding rectangle
  [rmin..rmax]x[cmin..cmax] in tile space (4 cross-lane reductions
  instead of 128) and sweeps it with a single `fori_loop` whose body
  visits all 16 (point, corner) pairs per window: dynamic window pick +
  within-vreg lane `dynamic_gather` + masked FMA;
* arbitrary (non-local) sampling stays CORRECT — the rectangle just
  grows. The decoder's box-conditioned cross-attention uses the XLA
  oracle path (`ms_deform_attn_auto`).

The backward kernel shares the layout; grad_value accumulates a combined
per-window weight matrix C[token, query] over all 16 pairs and applies
ONE MXU matmul per window (C @ g) — v1 paid one matmul per (pair,
window). grad_loc / grad_attn reuse the forward gathers (the exact
bilinear gradients the reference hand-writes in its col2im kernels,
`ms_deform_im2col_cuda.cuh:302-1005`).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ms_deform_attn import ms_deform_attn as ms_deform_attn_xla

_BQ = 128        # queries per grid step == lane width == window tokens
_TH, _TW = 8, 16  # window tile: 8x16 pixels = 128 tokens

# grad_value scatter-matmul precision: HIGHEST = 6-pass (bit-matches the
# f32 scatter-add reference), HIGH = 3-pass (~2x MXU throughput, ~1e-6
# relative error — still far above bf16 training noise). Env knob for
# on-chip A/B; tests assert at 1e-4 so both settings pass.
_BWD_MM_PRECISION = (jax.lax.Precision.HIGH
                     if os.environ.get("SDT_BWD_MM_PRECISION",
                                        "highest").lower() == "high"
                     else jax.lax.Precision.HIGHEST)

# Profiling-only knobs (WRONG OUTPUTS when set — never set in training):
# ablate kernel stages to attribute time in attn_kernel_bench.py.
_SKIP_DLOC = os.environ.get("SDT_BWD_SKIP_DLOC") == "1"   # no da/dloc dots
_SKIP_DV = os.environ.get("SDT_BWD_SKIP_DV") == "1"       # no C/matmul/dv
_FWD_NO_GATHER = os.environ.get("SDT_FWD_NO_GATHER") == "1"

# Packed-bf16 gathers (DEFAULT OFF since round 5): two bf16 channels
# ride each 32-bit lane, halving gather vreg traffic — wins the ISOLATED
# kernel microbench (r4 A/B, encoder scale N=2: fwd 51.0 -> 38.7 ms) but
# LOSES at whole-step level under the tile-order streams (r5 step A/B:
# packed 1450-1453 ms/step x3 runs vs unpacked 1387 ms = +4.5% img/s
# unpacked): the per-layer slab-packing pass ((odd<<16)|even over the
# value stream) plus the bwd unpack ops cost more than the gather
# savings. EXACT either way for bf16 values. SDT_PACKED_GATHER=1
# re-enables (e.g. for VMEM-limited variants where the half-size slab
# matters more than the packing pass).
_PACKED_GATHER = os.environ.get("SDT_PACKED_GATHER", "0") == "1"

# Forward one-hot-MXU accumulate (EXPERIMENT, default off): replace the
# 16 per-window lane gathers (the measured fwd hot spot: gathers are
# ~30 ms of the 51 ms encoder-scale layer call; ablation row
# 'fwd gathers ablated') with the backward's C-matrix trick — build
# C[token, query] = sum of weighted one-hots over all 16 (point,
# corner) pairs, then ONE f32 MXU matmul tile @ C per window. The bwd
# ablations price C build + matmul at ~5 ms/layer-call, so this should
# roughly halve the fwd kernel. Forces an unpacked slab (the MXU can't
# consume pair-packed i32 lanes). Modes: 1 = f32 slab + f32 C + 6-pass
# HIGHEST matmul (exact up to f32 summation order); 2 = bf16 slab +
# bf16 C + ONE native MXU pass (f32 accumulate) — value AND weight
# rounded to bf16, the same error class as the accepted packed-gather
# bf16 sampling and the kernel's own bf16 output cast, so only
# meaningful for bf16 value tensors (the flagship). A/B before
# defaulting.
_FWD_MXU = int(os.environ.get("SDT_FWD_MXU", "0") or "0")

# bf16 scatter matrix C in the backward (EXPERIMENT, default off): the
# offline vreg model (ROADMAP P0.6) says building the (128,128) one-hot
# C dominates the bwd per-window cost at D=32/P=4 — 16 f32 vregs per
# select x 16 taps. A bf16 C halves the select traffic (8 vregs) and
# the C @ g matmul becomes one native MXU pass (g cast to bf16 too).
# d_value error ~1e-3 relative (weights + cotangent rounded to bf16;
# accumulation stays f32 via preferred_element_type) — below bf16
# training noise. d_loc / d_attn are untouched (separate dot path).
# A/B as SDT_BWD_C_BF16=1 in sweep_on_chip.sh before defaulting.
_BWD_C_BF16 = os.environ.get("SDT_BWD_C_BF16") == "1"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _tile_geom(spatial_shapes: Tuple[Tuple[int, int], ...]):
    """Static per-level tiling geometry.

    Returns (geom, NT): geom[l] = (H, W, Hp, Wp, ntr, ntc, start, tstart)
    with Hp/Wp the 8/16-padded dims, ntr x ntc the tile grid, `start` the
    row-major token offset and `tstart` the tile offset; NT total tiles.
    """
    geom = []
    start = 0
    tstart = 0
    for (h, w) in spatial_shapes:
        hp = _round_up(h, _TH)
        wp = _round_up(w, _TW)
        ntr, ntc = hp // _TH, wp // _TW
        geom.append((h, w, hp, wp, ntr, ntc, start, tstart))
        start += h * w
        tstart += ntr * ntc
    return tuple(geom), tstart


def _tile_tokens(x: jax.Array,
                 spatial_shapes: Tuple[Tuple[int, int], ...]) -> jax.Array:
    """Permute a row-major token axis into tile order (zero padding).

    (N, S, ...) -> (N, NT*128, ...); pure reshape/transpose per level, so
    XLA lowers it to an efficient copy (no gather).
    """
    geom, _ = _tile_geom(spatial_shapes)
    n = x.shape[0]
    rest = x.shape[2:]
    outs = []
    for (h, w, hp, wp, ntr, ntc, start, _) in geom:
        part = x[:, start:start + h * w].reshape((n, h, w) + rest)
        pad = [(0, 0), (0, hp - h), (0, wp - w)] + [(0, 0)] * len(rest)
        part = jnp.pad(part, pad)
        part = part.reshape((n, ntr, _TH, ntc, _TW) + rest)
        perm = (0, 1, 3, 2, 4) + tuple(range(5, 5 + len(rest)))
        outs.append(part.transpose(perm).reshape(
            (n, ntr * ntc * _BQ) + rest))
    return jnp.concatenate(outs, axis=1)


def _untile_tokens(x: jax.Array,
                   spatial_shapes: Tuple[Tuple[int, int], ...]) -> jax.Array:
    """Inverse of `_tile_tokens`: (N, NT*128, ...) -> (N, S, ...)."""
    geom, _ = _tile_geom(spatial_shapes)
    n = x.shape[0]
    rest = x.shape[2:]
    outs = []
    for (h, w, hp, wp, ntr, ntc, _, tstart) in geom:
        part = x[:, tstart * _BQ:(tstart + ntr * ntc) * _BQ]
        part = part.reshape((n, ntr, ntc, _TH, _TW) + rest)
        perm = (0, 1, 3, 2, 4) + tuple(range(5, 5 + len(rest)))
        part = part.transpose(perm).reshape((n, hp, wp) + rest)
        outs.append(part[:, :h, :w].reshape((n, h * w) + rest))
    return jnp.concatenate(outs, axis=1)


@functools.lru_cache(maxsize=None)
def _real_token_mask(spatial_shapes: Tuple[Tuple[int, int], ...]):
    """(S_t,) bool: which tile-order slots hold real tokens (the rest are
    the 8x16 tile padding). Static per geometry — used to sentinel-mask
    pre-tiled query slots so garbage loc/attn in padding slots can't
    inflate the kernel's sweep rectangles."""
    import numpy as np
    outs = []
    for (h, w, hp, wp, ntr, ntc, _, _) in _tile_geom(spatial_shapes)[0]:
        m = np.zeros((hp, wp), bool)
        m[:h, :w] = True
        m = m.reshape(ntr, _TH, ntc, _TW).transpose(0, 2, 1, 3)
        outs.append(m.reshape(-1))
    return np.concatenate(outs)


def _corner_terms(locx, locy, attn, spatial_shapes, n_points):
    """Shared fwd/bwd tap math on full (L*P, BQ) tiles.

    Returns per-corner dicts of (LP, BQ) arrays: window id, lane id,
    bilinear weight (valid-masked, WITHOUT attn), d/dx and d/dy bilinear
    weight factors, rect row/col with +-BIG sentinels for dead taps, plus
    the per-row level constants (wsv, hsv) for the grad_loc chain rule.
    """
    P = n_points
    LP = locx.shape[0]
    geom, _ = _tile_geom(spatial_shapes)

    row = jax.lax.broadcasted_iota(jnp.int32, (LP, 1), 0)
    wsv = jnp.zeros((LP, 1), jnp.float32)
    hsv = jnp.zeros((LP, 1), jnp.float32)
    ntcv = jnp.zeros((LP, 1), jnp.int32)
    tsv = jnp.zeros((LP, 1), jnp.int32)
    for l, (h, w, hp, wp, ntr, ntc, _, tstart) in enumerate(geom):
        in_l = (row >= l * P) & (row < (l + 1) * P)
        wsv = jnp.where(in_l, float(w), wsv)
        hsv = jnp.where(in_l, float(h), hsv)
        ntcv = jnp.where(in_l, ntc, ntcv)
        tsv = jnp.where(in_l, tstart, tsv)

    px = locx * wsv - 0.5
    py = locy * hsv - 0.5
    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    fx = px - x0f
    fy = py - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    wsi = wsv.astype(jnp.int32)
    hsi = hsv.astype(jnp.int32)
    # live: excludes ONLY sentinel-padded queries (attn == -1); real taps
    # with attn == 0 stay in the rectangles so d_attn matches the oracle
    live = attn >= 0.0
    big = jnp.int32(2 ** 30)

    corners = []
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            valid = ((xi >= 0) & (xi < wsi) & (yi >= 0) & (yi < hsi))
            xc = jnp.clip(xi, 0, wsi - 1)
            yc = jnp.clip(yi, 0, hsi - 1)
            tr = yc >> 3
            tc = xc >> 4
            win = tsv + tr * ntcv + tc
            lane = ((yc & 7) << 4) | (xc & 15)
            wx = fx if dx else 1 - fx
            wy = fy if dy else 1 - fy
            bw = jnp.where(valid, wx * wy, 0.0)
            dwx = jnp.where(valid, (1.0 if dx else -1.0) * wy, 0.0)
            dwy = jnp.where(valid, (1.0 if dy else -1.0) * wx, 0.0)
            use = valid & live
            corners.append(dict(
                win=win, lane=lane, bw=bw, dwx=dwx, dwy=dwy,
                rlo=jnp.where(use, tr, big), rhi=jnp.where(use, tr, -big),
                clo=jnp.where(use, tc, big), chi=jnp.where(use, tc, -big),
            ))
    return corners, wsv, hsv


def _level_rect(corners, lo, hi):
    """Scalar window rectangle for tap rows [lo, hi): 4 reductions."""
    rmin = jnp.min(jnp.stack([c["rlo"][lo:hi] for c in corners]))
    rmax = jnp.max(jnp.stack([c["rhi"][lo:hi] for c in corners]))
    cmin = jnp.min(jnp.stack([c["clo"][lo:hi] for c in corners]))
    cmax = jnp.max(jnp.stack([c["chi"][lo:hi] for c in corners]))
    nrow = jnp.maximum(rmax - rmin + 1, 0)
    ncol = jnp.maximum(cmax - cmin + 1, 0)
    return rmin, cmin, ncol, nrow * ncol


def _gather(tile, lane, d):
    return jnp.take_along_axis(
        tile, jnp.broadcast_to(lane, (d, _BQ)), axis=1,
        mode="promise_in_bounds")


def _unpack_bf16_pair(g):
    """i32 lanes holding (odd << 16) | even bf16 bit pairs -> two f32
    tiles (a bf16's f32 value is its bits in the top 16)."""
    even = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(g, 16), jnp.float32)
    odd = jax.lax.bitcast_convert_type(g & jnp.int32(-65536), jnp.float32)
    return even, odd


def _fwd_kernel(locx_ref, locy_ref, attn_ref, value_ref, out_ref, *,
                spatial_shapes: Tuple[Tuple[int, int], ...], n_points: int,
                packed: bool = False, fwd_mxu: bool = False):
    """locx/locy/attn (1,1,LP,BQ) f32; value (1,1,NT,D,BQ) f32 or
    (1,1,NT,D/2,BQ) packed-bf16 i32; out (1,1,D,BQ) (packed: rows are
    [even channels; odd channels] — the wrapper re-interleaves).

    fwd_mxu: accumulate each window through one C-matrix MXU matmul
    instead of 16 lane gathers (see _FWD_MXU; requires unpacked f32)."""
    P = n_points
    D = out_ref.shape[2]
    dg = value_ref.shape[3]                 # gather rows (D or D/2)
    geom, _ = _tile_geom(spatial_shapes)

    attn = attn_ref[0, 0]
    corners, _, _ = _corner_terms(locx_ref[0, 0], locy_ref[0, 0], attn,
                                  spatial_shapes, P)

    attn_c = jnp.maximum(attn, 0.0)         # clamp the -1 pad sentinel
    iota_tok = (jax.lax.broadcasted_iota(jnp.int32, (_BQ, _BQ), 0)
                if fwd_mxu else None)
    acc = jnp.zeros((D, _BQ), jnp.float32)
    for l, (h, w, hp, wp, ntr, ntc, _, tstart) in enumerate(geom):
        lo, hi = l * P, (l + 1) * P
        rmin, cmin, ncol, total = _level_rect(corners, lo, hi)
        wgts = [c["bw"][lo:hi] * attn_c[lo:hi] for c in corners]  # (P, BQ)
        wins = [c["win"][lo:hi] for c in corners]
        lanes = [c["lane"][lo:hi] for c in corners]

        def body(k, acc, wins=wins, lanes=lanes, wgts=wgts, ncol=ncol,
                 rmin=rmin, cmin=cmin, tstart=tstart, ntc=ntc):
            r = k // ncol
            wnd = tstart + (rmin + r) * ntc + (cmin + k - r * ncol)
            tile = value_ref[0, 0, wnd]                       # (dg, BQ)
            if fwd_mxu:
                # C is ALWAYS accumulated in f32: a bf16 select on the
                # broadcast-compare mask makes Mosaic relayout an i1
                # vector between (8,128) and (16,128) tilings, which it
                # rejects ("Invalid relayout", r4 queue log). Mode 2
                # rounds the finished C to bf16 ONCE before the dot —
                # same numerics class, one cast per window.
                C = jnp.zeros((_BQ, _BQ), jnp.float32)  # (token, query)
                for ci in range(4):
                    m_all = jnp.where(wins[ci] == wnd, wgts[ci], 0.0)
                    for p in range(P):
                        onehot = iota_tok == jnp.broadcast_to(
                            lanes[ci][p:p + 1], (_BQ, _BQ))
                        C = C + jnp.where(
                            onehot,
                            jnp.broadcast_to(m_all[p:p + 1], (_BQ, _BQ)),
                            0.0)
                if fwd_mxu == 2:
                    C = C.astype(jnp.bfloat16)
                return acc + jax.lax.dot_general(
                    tile, C, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=(None if fwd_mxu == 2
                               else jax.lax.Precision.HIGHEST))
            for ci in range(4):
                m_all = jnp.where(wins[ci] == wnd, wgts[ci], 0.0)
                for p in range(P):
                    g = (tile if _FWD_NO_GATHER
                         else _gather(tile, lanes[ci][p:p + 1], dg))
                    m = m_all[p:p + 1]
                    if packed:
                        even, odd = _unpack_bf16_pair(g)
                        acc = acc + jnp.concatenate(
                            [even, odd], axis=0) * m
                    else:
                        acc = acc + g * m
            return acc

        acc = jax.lax.fori_loop(0, total, body, acc)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _prep_inputs(value, spatial_shapes, sampling_locations,
                 attention_weights, packed: bool = False,
                 value_tiled: bool = False, queries_tiled: bool = False,
                 slab_dtype=jnp.float32):
    """Common host-side layout for fwd/bwd: tiled value slab + kernel
    query layouts. Returns (v, locx, locy, attn, tiled_q, lq_t).

    packed: bf16 value channels pair-packed into i32 lanes
    ((odd << 16) | even), slab shape (N, M, NT, D/2, 128).
    value_tiled: value's token axis is ALREADY in tile order (length
    NT*128) — the per-level pad/permute is skipped and only the cheap
    slab transpose remains. queries_tiled: loc/attn are already in tile
    order too (encoder running fully tiled); the static padding slots
    get the -1 sentinel from `_real_token_mask` and no query permute or
    output untile happens."""
    N, S_in, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    geom, NT = _tile_geom(spatial_shapes)
    s_row = sum(h * w for h, w in spatial_shapes)
    assert S_in == (NT * _BQ if value_tiled else s_row)

    loc = sampling_locations.astype(jnp.float32)
    attn = attention_weights.astype(jnp.float32)
    tiled_q = False
    if queries_tiled:
        assert Lq == NT * _BQ
        real = jnp.asarray(_real_token_mask(spatial_shapes))
        attn = jnp.where(real[None, :, None, None, None], attn, -1.0)
        lq_t = Lq
    elif Lq == s_row:
        # encoder self-attention: queries are the tokens — permute them
        # into tile order so each 128-query block is an 8x16px patch.
        # Padded rows get the sentinel attn == -1 (the +1/-1 trick rides
        # the zero-padding) -> excluded from sweep rectangles while REAL
        # taps with attn exactly 0 keep their oracle-exact d_attn.
        # Constraint (documented): attention_weights must be >= 0
        # (softmax outputs) — negative values are reserved for padding.
        tiled_q = True
        loc = _tile_tokens(loc, spatial_shapes)
        attn = _tile_tokens(attn + 1.0, spatial_shapes) - 1.0
        lq_t = attn.shape[1]
    else:
        lq_t = _round_up(Lq, _BQ)
        if lq_t != Lq:
            loc = jnp.pad(loc, ((0, 0), (0, lq_t - Lq)) + ((0, 0),) * 4)
            attn = jnp.pad(attn, ((0, 0), (0, lq_t - Lq)) + ((0, 0),) * 3,
                           constant_values=-1.0)

    # Mosaic's dynamic_gather is 32-bit: slab is f32, or pair-packed
    # bf16 lanes when `packed` (halves gather vreg traffic)
    if packed:
        assert D % 2 == 0, D
        vb = value.astype(jnp.bfloat16)
        if not value_tiled:
            vb = _tile_tokens(vb, spatial_shapes)
        vb = vb.reshape(N, NT, _BQ, M, D).transpose(0, 3, 1, 4, 2)
        u = jax.lax.bitcast_convert_type(vb, jnp.uint16).astype(jnp.uint32)
        even, odd = u[:, :, :, 0::2], u[:, :, :, 1::2]
        v = jax.lax.bitcast_convert_type(
            (odd << 16) | even, jnp.int32)       # (N, M, NT, D/2, 128)
    else:
        # slab_dtype bf16: the fwd-MXU mode-2 slab (halves VMEM; value
        # sampling in bf16, the packed-gather numerics)
        vf = value.astype(slab_dtype)
        if not value_tiled:
            vf = _tile_tokens(vf, spatial_shapes)
        v = vf.reshape(N, NT, _BQ, M, D).transpose(0, 3, 1, 4, 2)

    locx = loc[..., 0].transpose(0, 2, 3, 4, 1).reshape(N, M, L * P, lq_t)
    locy = loc[..., 1].transpose(0, 2, 3, 4, 1).reshape(N, M, L * P, lq_t)
    attn = attn.transpose(0, 2, 3, 4, 1).reshape(N, M, L * P, lq_t)
    return v, locx, locy, attn, tiled_q, lq_t


@functools.partial(jax.jit,
                   static_argnames=("spatial_shapes", "interpret",
                                    "packed", "value_tiled",
                                    "queries_tiled"))
def ms_deform_attn_pallas(value: jax.Array,
                          spatial_shapes: Tuple[Tuple[int, int], ...],
                          sampling_locations: jax.Array,
                          attention_weights: jax.Array,
                          interpret: bool = False,
                          packed: bool = None,
                          value_tiled: bool = False,
                          queries_tiled: bool = False) -> jax.Array:
    """Same signature/semantics as ops.ms_deform_attn.ms_deform_attn.

    value (N, S, M, D); sampling_locations (N, Lq, M, L, P, 2) in [0,1];
    attention_weights (N, Lq, M, L, P). Returns (N, Lq, M*D).

    packed: pair-pack bf16 value channels into i32 gather lanes
    (numerics = bf16 value sampling, exact for bf16 inputs); None reads
    SDT_PACKED_GATHER and requires a bf16 value tensor.
    value_tiled / queries_tiled: the token axes are pre-permuted into
    tile order by the caller (see _prep_inputs) — the per-call layout
    permutes (the measured 40% of the SSOD step, r4 profile) collapse to
    one cheap slab transpose, and the output stays in tile order.
    """
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    if packed is None:
        packed = (_PACKED_GATHER and value.dtype == jnp.bfloat16
                  and D % 2 == 0)
    fwd_mxu = _FWD_MXU
    if fwd_mxu == 2 and value.dtype != jnp.bfloat16:
        fwd_mxu = 1             # bf16 mode only for bf16 value tensors
    slab_dtype = jnp.bfloat16 if fwd_mxu == 2 else jnp.float32
    if fwd_mxu:
        packed = False          # the MXU path needs an unpacked slab
    geom, NT = _tile_geom(spatial_shapes)
    v, locx, locy, attn, tiled_q, lq_t = _prep_inputs(
        value, spatial_shapes, sampling_locations, attention_weights,
        packed=packed, value_tiled=value_tiled,
        queries_tiled=queries_tiled, slab_dtype=slab_dtype)

    grid = (N, M, lq_t // _BQ)
    kernel = functools.partial(_fwd_kernel, spatial_shapes=spatial_shapes,
                               n_points=P, packed=packed,
                               fwd_mxu=fwd_mxu)

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
            pl.BlockSpec((1, 1, NT, D // 2 if packed else D, _BQ),
                         lambda n, m, q: (n, m, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D, _BQ),
                               lambda n, m, q: (n, m, 0, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, M, D, lq_t), value.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=8 * N * M * lq_t * L * P * D,
            bytes_accessed=(N * M * NT * _BQ * D * 4
                            + 3 * N * M * lq_t * L * P * 4),
            transcendentals=0,
        ),
    )(locx, locy, attn, v)

    if packed:
        # kernel rows are [even channels; odd channels] — re-interleave
        import numpy as np
        perm = np.argsort(np.r_[np.arange(0, D, 2), np.arange(1, D, 2)])
        out = out[:, :, perm, :]
    out = out.transpose(0, 3, 1, 2).reshape(N, lq_t, M * D)
    if queries_tiled:
        return out                     # caller keeps the tiled order
    if tiled_q:
        out = _untile_tokens(out, spatial_shapes)
    else:
        out = out[:, :Lq]
    return out


def _bwd_kernel(locx_ref, locy_ref, attn_ref, g_ref, gT_ref, value_ref,
                dv_ref, dlx_ref, dly_ref, da_ref, *,
                spatial_shapes: Tuple[Tuple[int, int], ...],
                n_points: int, c_bf16: bool = False,
                packed: bool = False):
    """Windowed backward, one combined scatter matmul per window.

    Math matches XLA autodiff of the oracle exactly: for corner c with
    bilinear weight w_c = wx*wy and validity v_c,
      d_attn   = sum_c v_c * w_c * <g, V_c>
      d_px     = attn * sum_c v_c * (sx_c * wy_c) * <g, V_c>   (sx = +-1)
      d_locx   = d_px * W_level  (px = locx * W - 0.5)
      dV[t]   += (sum_{q,p,c: idx=t} v*w*attn)[q] . g[q]
    The dV scatter builds C[token, query] = sum of masked one-hots over
    all 16 (point, corner) pairs, then ONE f32 MXU matmul C @ g per
    window accumulates into the revisited dv block.

    packed: value tile rows are pair-packed bf16 lanes (D/2 rows); the
    <g, V_c> dots halve their gather traffic by unpacking after the
    gather. g_ref rows arrive pre-deinterleaved ([even; odd] channel
    halves) so the unpacked pair lines up without a strided slice.
    The dv path (C @ gT) is untouched — C is channel-independent.
    """
    P = n_points
    D = gT_ref.shape[3]
    dg = value_ref.shape[3]                 # gather rows (D or D/2)
    geom, _ = _tile_geom(spatial_shapes)
    q_id = pl.program_id(2)

    @pl.when(q_id == 0)
    def _init():
        dv_ref[0, 0] = jnp.zeros(dv_ref.shape[2:], jnp.float32)

    g = g_ref[0, 0]                                     # (D, BQ)
    gT = gT_ref[0, 0]                                   # (BQ, D)
    if packed:
        ge, go = g[:dg], g[dg:]                         # (D/2, BQ) halves
    c_dt = jnp.bfloat16 if c_bf16 else jnp.float32
    if c_bf16:
        gT = gT.astype(jnp.bfloat16)    # one native MXU pass for C @ g
    attn = attn_ref[0, 0]                               # (LP, BQ)
    corners, wsv, hsv = _corner_terms(locx_ref[0, 0], locy_ref[0, 0],
                                      attn, spatial_shapes, P)
    iota_tok = jax.lax.broadcasted_iota(jnp.int32, (_BQ, _BQ), 0)

    for l, (h, w, hp, wp, ntr, ntc, _, tstart) in enumerate(geom):
        lo, hi = l * P, (l + 1) * P
        rmin, cmin, ncol, total = _level_rect(corners, lo, hi)
        at = jnp.maximum(attn[lo:hi], 0.0)               # (P, BQ), -1 pad
        bws = [c["bw"][lo:hi] for c in corners]
        dwxs = [c["dwx"][lo:hi] * at for c in corners]
        dwys = [c["dwy"][lo:hi] * at for c in corners]
        wgts = [c["bw"][lo:hi] * at for c in corners]
        wins = [c["win"][lo:hi] for c in corners]
        lanes = [c["lane"][lo:hi] for c in corners]

        def body(k, carry, wins=wins, lanes=lanes, wgts=wgts, bws=bws,
                 dwxs=dwxs, dwys=dwys, ncol=ncol, rmin=rmin, cmin=cmin,
                 tstart=tstart, ntc=ntc):
            da_l, dpx_l, dpy_l = carry
            r = k // ncol
            wnd = tstart + (rmin + r) * ntc + (cmin + k - r * ncol)
            tile = value_ref[0, 0, wnd]                  # (D, BQ)
            # C accumulates in f32 even under c_bf16: a bf16 select on
            # the broadcast-compare mask trips Mosaic's i1 relayout
            # ((8,128) vs (16,128) tiling — the r4 "bf16 C accumulator
            # crash"); rounding once before the matmul is the same
            # numerics class at one cast per window.
            C = jnp.zeros((_BQ, _BQ), jnp.float32)       # (token, query)
            for ci in range(4):
                hit = wins[ci] == wnd                    # (P, BQ)
                m_all = jnp.where(hit, wgts[ci], 0.0)
                dots = []
                for p in range(P):
                    lane_r = lanes[ci][p:p + 1]          # (1, BQ)
                    gath = _gather(tile, lane_r, dg)
                    if packed:
                        even, odd = _unpack_bf16_pair(gath)
                        dots.append(jnp.sum(ge * even + go * odd,
                                            axis=0, keepdims=True))
                    else:
                        dots.append(jnp.sum(g * gath, axis=0,
                                            keepdims=True))
                    if not _SKIP_DV:
                        onehot = iota_tok == jnp.broadcast_to(lane_r,
                                                              (_BQ, _BQ))
                        C = C + jnp.where(
                            onehot,
                            jnp.broadcast_to(m_all[p:p + 1], (_BQ, _BQ)),
                            0.0)
                if not _SKIP_DLOC:
                    dot = jnp.where(hit, jnp.concatenate(dots, 0), 0.0)
                    da_l = da_l + bws[ci] * dot
                    dpx_l = dpx_l + dwxs[ci] * dot
                    dpy_l = dpy_l + dwys[ci] * dot
            if not _SKIP_DV:
                # HIGHEST: grad_value must match the f32 scatter-add; the
                # MXU's default bf16 passes would round C and g.
                delta = jax.lax.dot_general(
                    C.astype(c_dt), gT,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=(jax.lax.Precision.DEFAULT if c_bf16
                               else _BWD_MM_PRECISION))
                dv_ref[0, 0, wnd] = dv_ref[0, 0, wnd] + delta
            return da_l, dpx_l, dpy_l

        zeros = jnp.zeros((P, _BQ), jnp.float32)
        da_l, dpx_l, dpy_l = jax.lax.fori_loop(
            0, total, body, (zeros, zeros, zeros))
        da_ref[0, 0, lo:hi] = da_l
        dlx_ref[0, 0, lo:hi] = dpx_l * wsv[lo:hi]
        dly_ref[0, 0, lo:hi] = dpy_l * hsv[lo:hi]


@functools.partial(jax.jit,
                   static_argnames=("spatial_shapes", "interpret",
                                    "c_bf16", "packed", "value_tiled",
                                    "queries_tiled"))
def ms_deform_attn_bwd_pallas(value, spatial_shapes, sampling_locations,
                              attention_weights, cotangent,
                              interpret: bool = False,
                              c_bf16: bool = None,
                              packed: bool = None,
                              value_tiled: bool = False,
                              queries_tiled: bool = False):
    """Backward of ms_deform_attn: returns (d_value, d_locations,
    d_attention_weights) given the output cotangent (N, Lq, M*D).

    c_bf16: build the d_value scatter matrix in bf16 (see _BWD_C_BF16);
    None reads SDT_BWD_C_BF16.
    packed: pair-packed bf16 value gathers (see _PACKED_GATHER); None =
    on for bf16 value tensors (exact there — the gathers only feed the
    d_loc/d_attn dots; dv's scatter matmul bypasses the packed lanes).
    value_tiled / queries_tiled: mirror the forward — inputs arrive and
    gradients leave in tile order, skipping all per-call permutes."""
    if c_bf16 is None:
        c_bf16 = _BWD_C_BF16
    N, S, M, D = value.shape
    if packed is None:
        packed = (_PACKED_GATHER and value.dtype == jnp.bfloat16
                  and D % 2 == 0)
    _, Lq, _, L, P, _ = sampling_locations.shape
    taps = L * P
    geom, NT = _tile_geom(spatial_shapes)
    v, locx, locy, attn, tiled_q, lq_t = _prep_inputs(
        value, spatial_shapes, sampling_locations, attention_weights,
        packed=packed, value_tiled=value_tiled,
        queries_tiled=queries_tiled)

    gq = cotangent.astype(jnp.float32).reshape(N, Lq, M, D)
    if tiled_q:
        gq = _tile_tokens(gq, spatial_shapes)
    elif lq_t != Lq:
        gq = jnp.pad(gq, ((0, 0), (0, lq_t - Lq), (0, 0), (0, 0)))
    gT = gq.transpose(0, 2, 1, 3)                        # (N, M, lq, D)
    g = gT.transpose(0, 1, 3, 2)                         # (N, M, D, lq)
    if packed:
        # deinterleave g's channel rows into [even; odd] halves so the
        # kernel's unpacked (even, odd) tiles line up row-for-row
        g = jnp.concatenate([g[:, :, 0::2], g[:, :, 1::2]], axis=2)

    grid = (N, M, lq_t // _BQ)
    kernel = functools.partial(_bwd_kernel, spatial_shapes=spatial_shapes,
                               n_points=P, c_bf16=c_bf16, packed=packed)

    def spec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    dv, dlx, dly, da = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec((1, 1, taps, _BQ), lambda n, m, q: (n, m, 0, q)),
            spec((1, 1, taps, _BQ), lambda n, m, q: (n, m, 0, q)),
            spec((1, 1, taps, _BQ), lambda n, m, q: (n, m, 0, q)),
            spec((1, 1, D, _BQ), lambda n, m, q: (n, m, 0, q)),
            spec((1, 1, _BQ, D), lambda n, m, q: (n, m, q, 0)),
            spec((1, 1, NT, D // 2 if packed else D, _BQ),
                 lambda n, m, q: (n, m, 0, 0, 0)),
        ],
        out_specs=[
            spec((1, 1, NT, _BQ, D), lambda n, m, q: (n, m, 0, 0, 0)),
            spec((1, 1, taps, _BQ), lambda n, m, q: (n, m, 0, q)),
            spec((1, 1, taps, _BQ), lambda n, m, q: (n, m, 0, q)),
            spec((1, 1, taps, _BQ), lambda n, m, q: (n, m, 0, q)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, M, NT, _BQ, D), jnp.float32),
            jax.ShapeDtypeStruct((N, M, taps, lq_t), jnp.float32),
            jax.ShapeDtypeStruct((N, M, taps, lq_t), jnp.float32),
            jax.ShapeDtypeStruct((N, M, taps, lq_t), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(locx, locy, attn, g, gT, v)

    # untile d_value back to row-major tokens (padding slots never
    # receive gradient: clamped coords always land on real tokens) —
    # unless the caller keeps everything in tile order
    dvq = dv.transpose(0, 2, 3, 1, 4).reshape(N, NT * _BQ, M, D)
    if value_tiled:
        d_value = dvq.astype(value.dtype)
    else:
        d_value = _untile_tokens(dvq, spatial_shapes).astype(value.dtype)

    def unq(x):                                          # (N,M,taps,lq)
        x = x.transpose(0, 3, 1, 2)                      # (N, lq, M, taps)
        if tiled_q:
            x = _untile_tokens(x, spatial_shapes)
        elif not queries_tiled:
            x = x[:, :Lq]
        return x.reshape(N, Lq, M, L, P)

    d_loc = jnp.stack([unq(dlx), unq(dly)], -1).astype(
        sampling_locations.dtype)
    d_attn = unq(da).astype(attention_weights.dtype)
    return d_value, d_loc, d_attn


def ms_deform_attn_sorted(value, spatial_shapes, sampling_locations,
                          attention_weights, _op=None,
                          value_tiled: bool = False):
    """Decoder cross-attention through the Pallas kernel: queries are
    box-conditioned (arbitrary positions), so first cluster them
    spatially — sort by the tile-grid cell of their mean sampling
    center — making each 128-query block touch a compact window
    rectangle. The permutation is numerics-neutral (output is
    inverse-permuted; the kernel is exact)."""
    geom, _ = _tile_geom(spatial_shapes)
    ntr, ntc = geom[0][4], geom[0][5]                     # level-0 grid
    ctr = jax.lax.stop_gradient(
        sampling_locations.mean(axis=(2, 3, 4)))          # (N, Lq, 2)
    r = jnp.clip((ctr[..., 1] * ntr).astype(jnp.int32), 0, ntr - 1)
    c = jnp.clip((ctr[..., 0] * ntc).astype(jnp.int32), 0, ntc - 1)
    perm = jnp.argsort(r * ntc + c, axis=1)               # (N, Lq)
    inv = jnp.argsort(perm, axis=1)
    loc_s = jnp.take_along_axis(
        sampling_locations, perm[:, :, None, None, None, None], axis=1)
    attn_s = jnp.take_along_axis(
        attention_weights, perm[:, :, None, None, None], axis=1)
    if _op is not None:
        out = _op(value, spatial_shapes, loc_s, attn_s)
    else:
        out = ms_deform_attn_fused_tiled(value, spatial_shapes, loc_s,
                                         attn_s, value_tiled, False)
    return jnp.take_along_axis(out, inv[:, :, None], axis=1)


def ms_deform_attn_auto(value, spatial_shapes, sampling_locations,
                        attention_weights, prefer_pallas: bool = True,
                        value_tiled: bool = False,
                        queries_tiled: bool = False):
    """Backend dispatch on TPU: the Pallas kernel directly for local
    sampling (encoder self-attention: one query per token), the
    sorted-query Pallas path for decoder cross-attention (few query
    blocks, so even wide rectangles beat XLA's gather/scatter); the XLA
    oracle elsewhere (CPU, interpret-free tests).

    value_tiled / queries_tiled: the caller keeps the token axes in tile
    order (see ms_deform_attn_pallas). On the oracle path the tensors
    are untiled around the call so numerics stay bit-identical to the
    row-major layout."""
    on_tpu = jax.default_backend() == "tpu"
    if prefer_pallas and on_tpu:
        if queries_tiled:
            return ms_deform_attn_fused_tiled(
                value, spatial_shapes, sampling_locations,
                attention_weights, value_tiled, True)
        local = sampling_locations.shape[1] == value.shape[1]
        if local and not value_tiled:
            return ms_deform_attn_fused(value, spatial_shapes,
                                        sampling_locations,
                                        attention_weights)
        return ms_deform_attn_sorted(value, spatial_shapes,
                                     sampling_locations, attention_weights,
                                     value_tiled=value_tiled)
    if value_tiled:
        value = _untile_tokens(value, spatial_shapes)
    if queries_tiled:
        sampling_locations = _untile_tokens(sampling_locations,
                                            spatial_shapes)
        attention_weights = _untile_tokens(attention_weights,
                                           spatial_shapes)
    out = ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                             attention_weights)
    if queries_tiled:
        out = _tile_tokens(out, spatial_shapes)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_fused(value, spatial_shapes, sampling_locations,
                         attention_weights):
    """Pallas forward + Pallas backward (custom_vjp)."""
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def ms_deform_attn_fused_tiled(value, spatial_shapes, sampling_locations,
                               attention_weights, value_tiled,
                               queries_tiled):
    """Pallas fwd+bwd with pre-tiled token layouts (custom_vjp)."""
    return ms_deform_attn_pallas(value, spatial_shapes,
                                 sampling_locations, attention_weights,
                                 value_tiled=value_tiled,
                                 queries_tiled=queries_tiled)


def _fwd_tiled(value, spatial_shapes, sampling_locations,
               attention_weights, value_tiled, queries_tiled):
    out = ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                                attention_weights,
                                value_tiled=value_tiled,
                                queries_tiled=queries_tiled)
    return out, (value, sampling_locations, attention_weights)


def _bwd_tiled(spatial_shapes, value_tiled, queries_tiled, res, g):
    value, loc, attn = res
    if jax.default_backend() == "tpu":
        return ms_deform_attn_bwd_pallas(value, spatial_shapes, loc, attn,
                                         g, value_tiled=value_tiled,
                                         queries_tiled=queries_tiled)
    # oracle fallback: untile around the row-major vjp, re-tile grads
    vr = _untile_tokens(value, spatial_shapes) if value_tiled else value
    lr = _untile_tokens(loc, spatial_shapes) if queries_tiled else loc
    ar = _untile_tokens(attn, spatial_shapes) if queries_tiled else attn
    gr = _untile_tokens(g, spatial_shapes) if queries_tiled else g
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_xla(v, spatial_shapes, l, a),
        vr, lr, ar)
    dv, dl, da = vjp(gr)
    if value_tiled:
        dv = _tile_tokens(dv, spatial_shapes)
    if queries_tiled:
        dl = _tile_tokens(dl, spatial_shapes)
        da = _tile_tokens(da, spatial_shapes)
    return dv, dl, da


ms_deform_attn_fused_tiled.defvjp(_fwd_tiled, _bwd_tiled)
