"""Deform-attn kernel microbenchmark at encoder scale (the train-step
hot spot: ~78% of fwd, ~90% of bwd per PARITY.md).

Times the Pallas forward and backward kernels standalone on the real
chip with realistic encoder sampling patterns (per-token reference
points + small learned offsets, matching DINOTransformer's encoder
self-attention), plus the XLA oracle forward for comparison.

Usage: python tools/benchmarks/attn_kernel_bench.py [--h 800 --w 1344]
       [--batch 2] [--iters 10]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def encoder_shapes(h: int, w: int, n_levels: int = 4):
    shapes = []
    for s in (8, 16, 32, 64)[:n_levels]:
        shapes.append((-(-h // s), -(-w // s)))
    return tuple(shapes)


def make_inputs(rs, N, M, D, P, spatial_shapes, offset_px=4.0):
    """Encoder-style sampling: every token queries around itself."""
    import numpy as np
    L = len(spatial_shapes)
    S = sum(hh * ww for hh, ww in spatial_shapes)
    value = rs.randn(N, S, M, D).astype(np.float32)
    # reference points: normalized center of each token of each level,
    # broadcast to every target level (matches get_reference_points)
    refs = []
    for (hh, ww) in spatial_shapes:
        yy, xx = np.meshgrid(
            (np.arange(hh) + 0.5) / hh, (np.arange(ww) + 0.5) / ww,
            indexing="ij")
        refs.append(np.stack([xx, yy], -1).reshape(-1, 2))
    ref = np.concatenate(refs, 0)  # (S, 2)
    loc = np.tile(ref[None, :, None, None, None, :], (N, 1, M, L, P, 1))
    # offsets: a few pixels in the *target level's* pixel scale
    wh = np.array([[ww, hh] for hh, ww in spatial_shapes], np.float32)
    off = rs.randn(N, S, M, L, P, 2).astype(np.float32) * offset_px
    loc = loc + off / wh[None, None, None, :, None, :]
    attn = rs.rand(N, S, M, L, P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)
    return value, loc.astype(np.float32), attn


def make_decoder_inputs(rs, N, Lq, M, D, P, spatial_shapes):
    """Decoder-style cross-attention sampling: queries are conditioned on
    reference BOXES at arbitrary positions (two-stage top-900 proposals +
    dn/consistency slots), so each query's L*P points spread over its box
    (DINOTransformerDecoderLayer cross-attn: loc = cxcy + off * wh / 2)."""
    import numpy as np
    L = len(spatial_shapes)
    S = sum(hh * ww for hh, ww in spatial_shapes)
    value = rs.randn(N, S, M, D).astype(np.float32)
    cxcy = rs.rand(N, Lq, 2).astype(np.float32)
    # box sizes: lognormal around ~10% of the image (COCO-like objects)
    wh = np.exp(rs.randn(N, Lq, 2) * 0.7 - 2.2).clip(0.01, 1.0)
    off = (rs.rand(N, Lq, M, L, P, 2).astype(np.float32) - 0.5)
    loc = cxcy[:, :, None, None, None, :] + \
        off * wh[:, :, None, None, None, :]
    attn = rs.rand(N, Lq, M, L, P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)
    return value, np.clip(loc, 0.0, 1.0).astype(np.float32), attn


def timeit(fn, iters, *args):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    # axon tunnel: force a real sync via device_get
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=800)
    p.add_argument("--w", type=int, default=1344)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--points", type=int, default=4)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--offset-px", type=float, default=4.0)
    p.add_argument("--skip-xla", action="store_true")
    p.add_argument("--skip-parity", action="store_true")
    p.add_argument("--bf16-value", action="store_true",
                   help="cast the value slab to bf16 (enables the "
                        "SDT_PACKED_GATHER fwd path when set)")
    p.add_argument("--decoder", action="store_true",
                   help="decoder cross-attention scale: --lq box-"
                        "conditioned queries through the sorted-query "
                        "kernel path (+ unsorted and XLA A/Bs)")
    p.add_argument("--lq", type=int, default=1260,
                   help="decoder query count (900 matching + 200 dn "
                        "+ 160 consistency slots at flagship warm-up)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import importlib
    xla_op = importlib.import_module("semi_detr_tpu.ops.ms_deform_attn")
    from semi_detr_tpu.ops.ms_deform_attn_pallas import (
        ms_deform_attn_bwd_pallas, ms_deform_attn_fused,
        ms_deform_attn_pallas, ms_deform_attn_sorted)

    shapes = encoder_shapes(args.h, args.w)
    S = sum(hh * ww for hh, ww in shapes)
    print(f"levels={shapes} S={S} N={args.batch} M={args.heads} "
          f"D={args.dim} P={args.points} backend={jax.default_backend()}")

    rs = np.random.RandomState(0)

    if args.decoder:
        value, loc, attn = make_decoder_inputs(
            rs, args.batch, args.lq, args.heads, args.dim, args.points,
            shapes)
        value, loc, attn = map(jnp.asarray, (value, loc, attn))
        if args.bf16_value:
            value = value.astype(jnp.bfloat16)
        g = jnp.asarray(rs.randn(args.batch, args.lq,
                                 args.heads * args.dim).astype(np.float32))
        print(f"decoder Lq={args.lq}")
        srt = jax.jit(lambda v, l, a: ms_deform_attn_sorted(v, shapes, l, a))
        t = timeit(srt, args.iters, value, loc, attn)
        print(f"sorted fwd  : {t * 1e3:8.2f} ms")
        uns = jax.jit(
            lambda v, l, a: ms_deform_attn_fused(v, shapes, l, a))
        t = timeit(uns, args.iters, value, loc, attn)
        print(f"unsorted fwd: {t * 1e3:8.2f} ms")

        def srt_bwd(v, l, a, ct):
            out, vjp = jax.vjp(
                lambda vv, ll, aa: ms_deform_attn_sorted(vv, shapes, ll,
                                                         aa), v, l, a)
            # bf16 values make the op output bf16 -> match the cotangent
            return vjp(ct.astype(out.dtype))
        t = timeit(jax.jit(srt_bwd), args.iters, value, loc, attn, g)
        print(f"sorted bwd  : {t * 1e3:8.2f} ms (full vjp incl. permute)")
        if not args.skip_xla:
            xf = jax.jit(lambda v, l, a: xla_op.ms_deform_attn(
                v, shapes, l, a))
            t = timeit(xf, max(1, args.iters // 3), value, loc, attn)
            print(f"xla fwd     : {t * 1e3:8.2f} ms")
        if not args.skip_parity:
            ref = xla_op.ms_deform_attn(value.astype(jnp.float32), shapes,
                                        loc, attn)
            got = srt(value, loc, attn)
            print(f"sorted fwd parity max err: "
                  f"{float(jnp.max(jnp.abs(ref - got))):.2e}")
        return

    value, loc, attn = make_inputs(rs, args.batch, args.heads, args.dim,
                                   args.points, shapes, args.offset_px)
    value, loc, attn = map(jnp.asarray, (value, loc, attn))
    if args.bf16_value:
        value = value.astype(jnp.bfloat16)
    g = jnp.asarray(rs.randn(args.batch, S,
                             args.heads * args.dim).astype(np.float32))

    fwd = lambda v, l, a: ms_deform_attn_pallas(v, shapes, l, a)
    bwd = lambda v, l, a, ct: ms_deform_attn_bwd_pallas(v, shapes, l, a, ct)

    t_fwd = timeit(fwd, args.iters, value, loc, attn)
    print(f"pallas fwd : {t_fwd * 1e3:8.2f} ms")
    t_bwd = timeit(bwd, args.iters, value, loc, attn, g)
    print(f"pallas bwd : {t_bwd * 1e3:8.2f} ms")

    if not args.skip_xla:
        xf = lambda v, l, a: xla_op.ms_deform_attn(v, shapes, l, a)
        t_x = timeit(xf, max(1, args.iters // 3), value, loc, attn)
        print(f"xla fwd    : {t_x * 1e3:8.2f} ms")

    if not args.skip_parity:
        # small-scale parity sanity (full scale handled by tests/)
        sh2 = encoder_shapes(160, 224)
        S2 = sum(hh * ww for hh, ww in sh2)
        v2, l2, a2 = make_inputs(rs, 1, 2, args.dim, args.points, sh2,
                                 args.offset_px)
        v2, l2, a2 = map(jnp.asarray, (v2, l2, a2))
        ref = xla_op.ms_deform_attn(v2, sh2, l2, a2)
        got = ms_deform_attn_pallas(v2, sh2, l2, a2)
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"fwd parity max err: {err:.2e}")
        ct = jnp.ones_like(ref)
        _, vjp = jax.vjp(
            lambda v, l, a: xla_op.ms_deform_attn(v, sh2, l, a), v2, l2, a2)
        dv_r, dl_r, da_r = vjp(ct)
        dv, dl, da = ms_deform_attn_bwd_pallas(v2, sh2, l2, a2, ct)
        for name, x, y in (("dv", dv, dv_r), ("dl", dl, dl_r),
                           ("da", da, da_r)):
            e = float(jnp.max(jnp.abs(x - y)))
            print(f"bwd parity {name}: {e:.2e}")


if __name__ == "__main__":
    main()
