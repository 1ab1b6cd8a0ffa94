"""Pallas deform-attn kernel vs XLA oracle (interpret mode on CPU).

Port of the reference kernel test strategy (`detr_od/models/utils/ops/
test.py:21-87`): forward parity across channel sizes + gradient check of
the fused custom-vjp op.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_detr_tpu.ops.ms_deform_attn import ms_deform_attn
from semi_detr_tpu.ops.ms_deform_attn_pallas import (ms_deform_attn_fused,
                                                     ms_deform_attn_pallas)

SHAPES = ((12, 16), (6, 8))
S = sum(h * w for h, w in SHAPES)


def _inputs(rs, n=1, m=2, d=8, lq=40, l=2, p=3):
    v = jnp.asarray(rs.randn(n, S, m, d).astype(np.float32))
    loc = jnp.asarray(rs.rand(n, lq, m, l, p, 2).astype(np.float32))
    aw = jax.nn.softmax(jnp.asarray(
        rs.randn(n, lq, m, l * p).astype(np.float32)), -1)
    return v, loc, aw.reshape(n, lq, m, l, p)


@pytest.mark.parametrize("d", [8, 32])
def test_pallas_forward_matches_oracle(d):
    rs = np.random.RandomState(d)
    v, loc, aw = _inputs(rs, d=d)
    ref = ms_deform_attn(v, SHAPES, loc, aw)
    got = ms_deform_attn_pallas(v, SHAPES, loc, aw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_out_of_bounds_taps_are_zero():
    rs = np.random.RandomState(0)
    v, loc, aw = _inputs(rs)
    loc = loc.at[..., 0].set(1.5)   # x outside -> zero contribution
    got = ms_deform_attn_pallas(v, SHAPES, loc, aw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)


def test_pallas_backward_matches_oracle_vjp():
    from semi_detr_tpu.ops.ms_deform_attn_pallas import \
        ms_deform_attn_bwd_pallas
    rs = np.random.RandomState(3)
    v, loc, aw = _inputs(rs, d=8, lq=16)
    g = jnp.asarray(rs.randn(1, 16, 2 * 8).astype(np.float32))
    _, vjp = jax.vjp(lambda v, l, a: ms_deform_attn(v, SHAPES, l, a),
                     v, loc, aw)
    dv_ref, dl_ref, da_ref = vjp(g)
    dv, dl, da = ms_deform_attn_bwd_pallas(v, SHAPES, loc, aw, g,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dl), np.asarray(dl_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_gradients_match_oracle():
    rs = np.random.RandomState(1)
    v, loc, aw = _inputs(rs, lq=12)

    def loss_fused(v, loc, aw):
        return (ms_deform_attn_fused(v, SHAPES, loc, aw) ** 2).sum()

    def loss_ref(v, loc, aw):
        return (ms_deform_attn(v, SHAPES, loc, aw) ** 2).sum()

    # fused forward runs the pallas kernel (interpret on CPU via the
    # default path would compile; use the oracle-vjp equivalence instead:
    # custom_vjp backward IS the oracle vjp, so compare oracle grads with
    # fused-forward output value
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(v, loc, aw)
    out_fused = ms_deform_attn_pallas(v, SHAPES, loc, aw, interpret=True)
    out_ref = ms_deform_attn(v, SHAPES, loc, aw)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    # finite-difference check of the oracle vjp on a few coordinates
    eps = 1e-3
    rs2 = np.random.RandomState(2)
    for _ in range(3):
        i = tuple(rs2.randint(s) for s in v.shape)
        vp = v.at[i].add(eps)
        vm = v.at[i].add(-eps)
        fd = (loss_ref(vp, loc, aw) - loss_ref(vm, loc, aw)) / (2 * eps)
        np.testing.assert_allclose(float(g_ref[0][i]), float(fd),
                                   rtol=2e-2, atol=2e-2)


def test_sorted_decoder_path_matches_oracle():
    """Decoder dispatch: spatial query sort + kernel + inverse permute
    must be numerics-neutral vs the oracle (arbitrary Lq != S)."""
    import functools
    from semi_detr_tpu.ops.ms_deform_attn_pallas import \
        ms_deform_attn_sorted
    rs = np.random.RandomState(7)
    v, loc, aw = _inputs(rs, d=8, lq=50)
    ref = ms_deform_attn(v, SHAPES, loc, aw)
    got = ms_deform_attn_sorted(
        v, SHAPES, loc, aw,
        _op=functools.partial(ms_deform_attn_pallas, interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tile_untile_roundtrip():
    """The tiled token permutation is a bijection on real tokens."""
    from semi_detr_tpu.ops.ms_deform_attn_pallas import (_tile_tokens,
                                                         _untile_tokens)
    rs = np.random.RandomState(0)
    shapes = ((13, 21), (7, 9))
    s = sum(h * w for h, w in shapes)
    x = jnp.asarray(rs.randn(2, s, 5).astype(np.float32))
    t = _tile_tokens(x, shapes)
    assert t.shape[1] % 128 == 0 and t.shape[1] >= s
    back = _untile_tokens(t, shapes)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_zero_attn_tap_gradient_matches_oracle():
    """A VALID tap with attention weight exactly 0 in an otherwise
    untouched window must still get its oracle d_attn (regression: the
    padding-exclusion mask used to drop it from the sweep rectangle)."""
    from semi_detr_tpu.ops.ms_deform_attn_pallas import \
        ms_deform_attn_bwd_pallas
    rs = np.random.RandomState(11)
    v, loc, aw = _inputs(rs, d=8, lq=16)
    # all taps cluster top-left; one zero-weight tap points far away
    loc = loc * 0.2
    loc = loc.at[0, 3, 1, 1, 2].set(jnp.asarray([0.95, 0.95]))
    aw = aw.at[0, 3, 1, 1, 2].set(0.0)
    g = jnp.asarray(rs.randn(1, 16, 2 * 8).astype(np.float32))
    _, vjp = jax.vjp(lambda vv, l, a: ms_deform_attn(vv, SHAPES, l, a),
                     v, loc, aw)
    _, _, da_ref = vjp(g)
    _, _, da = ms_deform_attn_bwd_pallas(v, SHAPES, loc, aw, g,
                                         interpret=True)
    ref = float(da_ref[0, 3, 1, 1, 2])
    got = float(da[0, 3, 1, 1, 2])
    assert abs(ref) > 1e-6, "test setup: tap gradient should be nonzero"
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_sorted_path_gradients_match_oracle():
    """Gradients flow through the sort/inverse-permute wrapper exactly
    (argsort is non-differentiable; take_along_axis carries the vjp)."""
    from semi_detr_tpu.ops.ms_deform_attn_pallas import \
        ms_deform_attn_sorted
    rs = np.random.RandomState(9)
    v, loc, aw = _inputs(rs, d=8, lq=30)

    def loss_sorted(v, loc, aw):
        out = ms_deform_attn_sorted(v, SHAPES, loc, aw,
                                    _op=ms_deform_attn)
        return (out ** 2).sum()

    def loss_ref(v, loc, aw):
        return (ms_deform_attn(v, SHAPES, loc, aw) ** 2).sum()

    gs = jax.grad(loss_sorted, argnums=(0, 1, 2))(v, loc, aw)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(v, loc, aw)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_packed_bf16_gather_matches_bf16_oracle():
    """SDT_PACKED_GATHER path: pair-packed bf16 gather must equal the
    oracle computed on the bf16-cast value (only the value cast loses
    precision; packing itself is exact)."""
    rs = np.random.RandomState(21)
    v, loc, aw = _inputs(rs, d=8, lq=40)
    vb = v.astype(jnp.bfloat16)
    ref = ms_deform_attn(vb.astype(jnp.float32), SHAPES, loc, aw)
    got = ms_deform_attn_pallas(vb, SHAPES, loc, aw, interpret=True,
                                packed=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)
    # and close to the unpacked f32 path at bf16 tolerance
    got32 = ms_deform_attn_pallas(v, SHAPES, loc, aw, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(got32), rtol=3e-2, atol=3e-2)


@pytest.mark.slow
def test_bwd_c_bf16_dv_close_dloc_dattn_exact():
    """SDT_BWD_C_BF16 path: d_value within bf16 rounding of the f32
    scatter (weights + cotangent rounded, accumulation stays f32);
    d_loc / d_attn use a separate dot path and must be untouched."""
    from semi_detr_tpu.ops.ms_deform_attn_pallas import \
        ms_deform_attn_bwd_pallas
    rs = np.random.RandomState(17)
    v, loc, aw = _inputs(rs, d=8, lq=32)
    g = jnp.asarray(rs.randn(1, 32, 2 * 8).astype(np.float32))
    dv32, dl32, da32 = ms_deform_attn_bwd_pallas(v, SHAPES, loc, aw, g,
                                                 interpret=True,
                                                 c_bf16=False)
    dvb, dlb, dab = ms_deform_attn_bwd_pallas(v, SHAPES, loc, aw, g,
                                              interpret=True, c_bf16=True)
    np.testing.assert_allclose(np.asarray(dvb), np.asarray(dv32),
                               rtol=3e-2, atol=3e-2)
    assert not np.allclose(np.asarray(dvb), np.asarray(dv32),
                           rtol=1e-7, atol=1e-9), \
        "bf16 path took effect (dv differs at f32 exactness)"
    np.testing.assert_array_equal(np.asarray(dlb), np.asarray(dl32))
    np.testing.assert_array_equal(np.asarray(dab), np.asarray(da32))


def test_packed_bwd_matches_bf16_oracle_vjp():
    """Packed backward: with a bf16 value tensor, the packed-gather bwd
    must match the oracle's autodiff on the (losslessly) f32-widened
    value EXACTLY in structure and tightly in value — the gathers only
    feed the d_loc/d_attn dots; dv's scatter matmul bypasses packing."""
    from semi_detr_tpu.ops.ms_deform_attn_pallas import \
        ms_deform_attn_bwd_pallas
    rs = np.random.RandomState(29)
    v, loc, aw = _inputs(rs, d=8, lq=16)
    vb = v.astype(jnp.bfloat16)
    vf = vb.astype(jnp.float32)
    g = jnp.asarray(rs.randn(1, 16, 2 * 8).astype(np.float32))
    _, vjp = jax.vjp(lambda v_, l, a: ms_deform_attn(vf, SHAPES, l, a)
                     if False else ms_deform_attn(v_, SHAPES, l, a),
                     vf, loc, aw)
    dv_ref, dl_ref, da_ref = vjp(g)
    dv, dl, da = ms_deform_attn_bwd_pallas(vb, SHAPES, loc, aw, g,
                                           interpret=True, packed=True)
    # d_value is returned in value's dtype (bf16 here) -> ~0.4% rounding
    np.testing.assert_allclose(np.asarray(dv, np.float32),
                               np.asarray(dv_ref), rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dl), np.asarray(dl_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref),
                               rtol=1e-4, atol=1e-5)
    # vs the unpacked bwd on the same bf16 value: dv's scatter matmul
    # bypasses packing -> bit-identical; dl/da dots reduce as
    # (even+odd) halves -> reduction-order-only noise
    dv2, dl2, da2 = ms_deform_attn_bwd_pallas(vb, SHAPES, loc, aw, g,
                                              interpret=True, packed=False)
    np.testing.assert_array_equal(np.asarray(dv, np.float32),
                                  np.asarray(dv2, np.float32))
    np.testing.assert_allclose(np.asarray(dl), np.asarray(dl2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da2),
                               rtol=1e-5, atol=1e-6)


def test_tiled_layout_kernel_matches_oracle():
    """value_tiled/queries_tiled: the kernel on pre-tiled tensors must
    equal tile(oracle(row-major)) — fwd and bwd (interpret mode)."""
    from semi_detr_tpu.ops.ms_deform_attn_pallas import (
        _tile_tokens, _untile_tokens, ms_deform_attn_bwd_pallas)
    rs = np.random.RandomState(31)
    m, d, l, p = 2, 8, 2, 3
    v, loc, aw = _inputs(rs, m=m, d=d, lq=S, l=l, p=p)   # queries = tokens
    ref = ms_deform_attn(v, SHAPES, loc, aw)

    v_t = _tile_tokens(v, SHAPES)
    loc_t = _tile_tokens(loc, SHAPES)
    aw_t = _tile_tokens(aw, SHAPES)
    got_t = ms_deform_attn_pallas(v_t, SHAPES, loc_t, aw_t,
                                  interpret=True, value_tiled=True,
                                  queries_tiled=True)
    got = _untile_tokens(got_t, SHAPES)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # tile-pad slots return exactly zero (sentinel-masked)
    real = np.zeros(got_t.shape[1], bool)
    from semi_detr_tpu.ops.ms_deform_attn_pallas import _real_token_mask
    real = np.asarray(_real_token_mask(SHAPES))
    np.testing.assert_array_equal(np.asarray(got_t)[:, ~real], 0.0)

    # backward: tiled grads == tile(row-major grads)
    g = jnp.asarray(rs.randn(1, S, m * d).astype(np.float32))
    _, vjp = jax.vjp(lambda v_, l_, a_: ms_deform_attn(v_, SHAPES, l_, a_),
                     v, loc, aw)
    dv_r, dl_r, da_r = vjp(g)
    dv, dl, da = ms_deform_attn_bwd_pallas(
        v_t, SHAPES, loc_t, aw_t, _tile_tokens(g, SHAPES),
        interpret=True, value_tiled=True, queries_tiled=True)
    np.testing.assert_allclose(np.asarray(_untile_tokens(dv, SHAPES)),
                               np.asarray(dv_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(_untile_tokens(dl, SHAPES)),
                               np.asarray(dl_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(_untile_tokens(da, SHAPES)),
                               np.asarray(da_r), rtol=1e-4, atol=1e-5)


def test_tiled_value_only_decoder_matches_oracle():
    """Decoder shape: pre-tiled VALUE, row-major queries (sorted path's
    inner op) — fwd parity vs the oracle (interpret mode)."""
    from semi_detr_tpu.ops.ms_deform_attn_pallas import _tile_tokens
    rs = np.random.RandomState(33)
    v, loc, aw = _inputs(rs, d=8, lq=40)
    ref = ms_deform_attn(v, SHAPES, loc, aw)
    got = ms_deform_attn_pallas(_tile_tokens(v, SHAPES), SHAPES, loc, aw,
                                interpret=True, value_tiled=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", [1, 2])
def test_fwd_mxu_modes_match_oracle(mode, monkeypatch):
    """SDT_FWD_MXU one-hot-MXU accumulate: mode 1 (f32 slab + HIGHEST
    matmul) must match the oracle tightly; mode 2 (bf16 slab + bf16 C,
    one native MXU pass) at bf16 tolerance. C is accumulated in f32 in
    BOTH modes (a bf16 select trips a Mosaic i1-relayout error on chip,
    r4 queue log) and rounded once before the dot in mode 2."""
    import semi_detr_tpu.ops.ms_deform_attn_pallas as mod

    monkeypatch.setattr(mod, "_FWD_MXU", mode)
    rs = np.random.RandomState(5 + mode)
    v, loc, aw = _inputs(rs, d=8, lq=40)
    if mode == 2:
        vb = v.astype(jnp.bfloat16)
        ref = ms_deform_attn(vb.astype(jnp.float32), SHAPES, loc, aw)
        got = mod.ms_deform_attn_pallas(vb, SHAPES, loc, aw,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref), rtol=3e-2, atol=3e-2)
    else:
        ref = ms_deform_attn(v, SHAPES, loc, aw)
        got = mod.ms_deform_attn_pallas(v, SHAPES, loc, aw,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_bwd_c_bf16_matches_oracle_vjp():
    """SDT_BWD_C_BF16 path (one native MXU pass for the dv scatter): C
    accumulates in f32 and is rounded once before the matmul (the bf16
    select variant trips Mosaic's i1 relayout on chip, r4 A/B table).
    dv at bf16 tolerance; dloc/dattn are C-independent and stay tight."""
    from semi_detr_tpu.ops.ms_deform_attn import ms_deform_attn
    from semi_detr_tpu.ops.ms_deform_attn_pallas import \
        ms_deform_attn_bwd_pallas
    rs = np.random.RandomState(7)
    v, loc, aw = _inputs(rs, d=8, lq=16)
    g = jnp.asarray(rs.randn(1, 16, 2 * 8).astype(np.float32))
    _, vjp = jax.vjp(lambda v, l, a: ms_deform_attn(v, SHAPES, l, a),
                     v, loc, aw)
    dv_ref, dl_ref, da_ref = vjp(g)
    dv, dl, da = ms_deform_attn_bwd_pallas(v, SHAPES, loc, aw, g,
                                           interpret=True, c_bf16=True)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dl), np.asarray(dl_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref),
                               rtol=1e-4, atol=1e-5)
