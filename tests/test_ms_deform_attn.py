"""Parity tests for ms_deform_attn vs a torch grid_sample oracle.

Ports the intent of the reference kernel test
(detr_od/models/utils/ops/test.py:21-87): forward parity against the
pure-PyTorch `ms_deform_attn_core_pytorch` implementation and
finite-difference-style gradient checks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_detr_tpu.ops.ms_deform_attn import (ms_deform_attn,
                                              sampling_offsets_init_bias)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

SHAPES = ((6, 4), (3, 2))  # (H, W) per level
N, M, D, Lq, P = 2, 4, 8, 5, 3
L = len(SHAPES)
S = sum(h * w for h, w in SHAPES)


def torch_oracle(value, shapes, loc, weights):
    """Bilinear multi-scale deformable attention via F.grid_sample
    (independent re-derivation of the published Deformable-DETR debug path)."""
    value = torch.as_tensor(value)
    loc = torch.as_tensor(loc)
    weights = torch.as_tensor(weights)
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = loc.shape
    splits = [h * w for h, w in shapes]
    vs = value.split(splits, dim=1)
    grids = 2 * loc - 1
    outs = []
    for li, (h, w) in enumerate(shapes):
        v = vs[li].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = grids[:, :, :, li].transpose(1, 2).flatten(0, 1)  # (n*m, lq, p, 2)
        outs.append(F.grid_sample(v, g, mode='bilinear',
                                  padding_mode='zeros', align_corners=False))
    w_ = weights.transpose(1, 2).reshape(n * m, 1, lq, l * p)
    out = (torch.stack(outs, dim=-2).flatten(-2) * w_).sum(-1)
    return out.view(n, m * d, lq).transpose(1, 2).numpy()


def _inputs(seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    value = rng.randn(N, S, M, D).astype(dtype) * 0.01
    # include out-of-bounds locations to exercise zero-padding
    loc = rng.uniform(-0.2, 1.2, (N, Lq, M, L, P, 2)).astype(dtype)
    w = rng.uniform(0, 1, (N, Lq, M, L, P)).astype(dtype) + 1e-5
    w = w / w.reshape(N, Lq, M, -1).sum(-1, keepdims=True).reshape(
        N, Lq, M, 1, 1)
    return value, loc, w


def test_forward_matches_torch_oracle():
    value, loc, w = _inputs()
    ours = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES,
                                     jnp.asarray(loc), jnp.asarray(w)))
    ref = torch_oracle(value, SHAPES, loc, w)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_forward_matches_torch_oracle_f64_inputs():
    value, loc, w = _inputs(seed=3)
    ours = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES,
                                     jnp.asarray(loc), jnp.asarray(w)))
    ref = torch_oracle(value.astype(np.float64), SHAPES,
                       loc.astype(np.float64), w.astype(np.float64))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-6)


def test_gradients_match_torch_oracle():
    value, loc, w = _inputs(seed=1)
    g = np.random.RandomState(2).randn(N, Lq, M * D).astype(np.float32)

    def f(v, l_, w_):
        return jnp.sum(ms_deform_attn(v, SHAPES, l_, w_) * jnp.asarray(g))

    gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))

    tv = torch.tensor(value, requires_grad=True)
    tl = torch.tensor(loc, requires_grad=True)
    tw = torch.tensor(w, requires_grad=True)
    n, s, m, d = tv.shape
    splits = [h_ * w_ for h_, w_ in SHAPES]
    vs = tv.split(splits, dim=1)
    grids = 2 * tl - 1
    outs = []
    for li, (h_, w2) in enumerate(SHAPES):
        v = vs[li].flatten(2).transpose(1, 2).reshape(n * m, d, h_, w2)
        gr = grids[:, :, :, li].transpose(1, 2).flatten(0, 1)
        outs.append(F.grid_sample(v, gr, mode='bilinear',
                                  padding_mode='zeros', align_corners=False))
    w2_ = tw.transpose(1, 2).reshape(n * m, 1, Lq, L * P)
    out = (torch.stack(outs, dim=-2).flatten(-2) * w2_).sum(-1)
    out = out.view(n, m * d, Lq).transpose(1, 2)
    (out * torch.as_tensor(g)).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(),
                               rtol=1e-3, atol=1e-5)
    # location grads: grid_sample's grad at exact cell boundaries is
    # subgradient-ambiguous; compare where not on a boundary.
    gl_t = tl.grad.numpy()
    np.testing.assert_allclose(np.asarray(gl), gl_t, rtol=1e-2, atol=1e-3)


def test_bf16_value_path():
    value, loc, w = _inputs(seed=4)
    out = ms_deform_attn(jnp.asarray(value, jnp.bfloat16), SHAPES,
                         jnp.asarray(loc), jnp.asarray(w))
    assert out.dtype == jnp.bfloat16
    ref = torch_oracle(value, SHAPES, loc, w)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=0.05, atol=1e-3)


def test_sampling_offsets_bias_matches_reference_formula():
    b = sampling_offsets_init_bias(8, 4, 4)
    assert b.shape == (8 * 4 * 4 * 2,)
    g = b.reshape(8, 4, 4, 2)
    # head 0 points along +x, scaled by point index+1, same across levels
    np.testing.assert_allclose(g[0, 0], [[1, 0], [2, 0], [3, 0], [4, 0]],
                               atol=1e-6)
    np.testing.assert_allclose(g[2, 1], [[0, 1], [0, 2], [0, 3], [0, 4]],
                               atol=1e-5)
