"""Parity tests for the legacy projection-free MHA and the
pseudo-sampler mask partitions — the last two §2.2 inventory rows.

The torch sides re-derive the reference semantics from
`detr_od/models/utils/attention.py:279-387` (q*scaling, no input
projections, bool/float attn_mask, key_padding_mask, head-averaged
weights, out Linear) and
`detr_od/core/bbox/samplers/ignore_sampler.py:24-46` /
`double_sampler.py:24-49` (nonzero partitions of gt_inds), which is
this file's purpose.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from semi_detr_tpu.core.samplers import (double_sampling_masks,  # noqa: E402
                                         ignore_sampling_masks)
from semi_detr_tpu.models.attention import \
    LegacyMultiheadAttention  # noqa: E402


def _torch_legacy_mha(q, k, v, w_out, b_out, num_heads,
                      key_padding_mask=None, attn_mask=None):
    """attention.py:279-387 with batch-first tensors: q scaled by
    head_dim**-0.5, NO input projections, bmm -> masks -> softmax ->
    bmm -> out linear; returns (out, head-averaged weights)."""
    b, l, e = q.shape
    s = k.shape[1]
    vdim = v.shape[-1]
    hd, vhd = e // num_heads, vdim // num_heads
    qs = (q * (hd ** -0.5)).reshape(b, l, num_heads, hd)
    logits = torch.einsum("blhd,bshd->bhls",
                          qs, k.reshape(b, s, num_heads, hd))
    if attn_mask is not None:
        m = attn_mask if attn_mask.dim() == 4 else attn_mask[None, None]
        if m.dtype == torch.bool:
            logits = logits.masked_fill(m, float("-inf"))
        else:
            logits = logits + m
    if key_padding_mask is not None:
        logits = logits.masked_fill(
            key_padding_mask[:, None, None, :], float("-inf"))
    w = torch.softmax(logits, dim=-1)
    out = torch.einsum("bhls,bshd->blhd",
                       w, v.reshape(b, s, num_heads, vhd))
    out = F.linear(out.reshape(b, l, vdim), w_out, b_out)
    return out, w.mean(dim=1)


@pytest.mark.parametrize("mask_kind", ["none", "bool", "float", "kpm"])
def test_legacy_mha_torch_parity(mask_kind):
    rs = np.random.RandomState(3)
    b, l, s, e, heads = 2, 5, 7, 16, 4
    q = rs.randn(b, l, e).astype(np.float32)
    k = rs.randn(b, s, e).astype(np.float32)
    v = rs.randn(b, s, e).astype(np.float32)

    kpm = attn = None
    t_kpm = t_attn = None
    if mask_kind == "bool":
        attn = rs.rand(l, s) < 0.3
        t_attn = torch.tensor(attn)
    elif mask_kind == "float":
        attn = rs.randn(l, s).astype(np.float32)
        t_attn = torch.tensor(attn)
    elif mask_kind == "kpm":
        kpm = np.zeros((b, s), bool)
        kpm[:, -2:] = True
        t_kpm = torch.tensor(kpm)

    mod = LegacyMultiheadAttention(num_heads=heads)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(q),
                      jnp.asarray(k), jnp.asarray(v))
    out, w = mod.apply(
        params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        key_padding_mask=None if kpm is None else jnp.asarray(kpm),
        attn_mask=None if attn is None else jnp.asarray(attn))

    kernel = np.asarray(params["params"]["out_proj"]["kernel"])
    bias = np.asarray(params["params"]["out_proj"]["bias"])
    want, want_w = _torch_legacy_mha(
        torch.tensor(q), torch.tensor(k), torch.tensor(v),
        torch.tensor(kernel.T.copy()), torch.tensor(bias), heads,
        key_padding_mask=t_kpm, attn_mask=t_attn)
    np.testing.assert_allclose(np.asarray(out), want.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), want_w.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_legacy_mha_separate_vdim():
    """vdim != embed_dim exercises the v_head_dim split
    (attention.py:275-276) and the Linear(vdim, vdim) out proj."""
    rs = np.random.RandomState(5)
    b, l, s, e, vdim, heads = 1, 3, 4, 8, 12, 2
    q = jnp.asarray(rs.randn(b, l, e).astype(np.float32))
    k = jnp.asarray(rs.randn(b, s, e).astype(np.float32))
    v = jnp.asarray(rs.randn(b, s, vdim).astype(np.float32))
    mod = LegacyMultiheadAttention(num_heads=heads)
    params = mod.init(jax.random.PRNGKey(1), q, k, v)
    out, w = mod.apply(params, q, k, v)
    assert out.shape == (b, l, vdim) and w.shape == (b, l, s)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)


def test_ignore_sampling_masks_partition():
    gt_inds = jnp.asarray([2, 0, -1, 1, 0, 3])     # >0 pos, 0 neg, <0 ign
    gt_bboxes = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    labels = jnp.asarray([5, 7, 1, 2, 0, 4])
    r = ignore_sampling_masks(gt_inds, gt_bboxes, labels)
    # reference partitions via nonzero (ignore_sampler.py:35-40)
    np.testing.assert_array_equal(np.asarray(r.pos),
                                  [True, False, False, True, False, True])
    np.testing.assert_array_equal(np.asarray(r.neg),
                                  [False, True, False, False, True, False])
    np.testing.assert_array_equal(np.asarray(r.ign),
                                  [False, False, True, False, False, False])
    assert not np.any(np.asarray(r.pos & r.neg | r.pos & r.ign
                                 | r.neg & r.ign))
    # pos_assigned_gt_inds = gt_inds[pos] - 1 (ignore_sampling_result.py:40)
    np.testing.assert_array_equal(np.asarray(r.pos_assigned_gt_inds),
                                  [1, 0, 0, 0, 0, 2])
    np.testing.assert_array_equal(np.asarray(r.pos_gt_bboxes[0]),
                                  np.arange(4, 8, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(r.pos_gt_bboxes[1]),
                                  np.zeros(4))
    np.testing.assert_array_equal(np.asarray(r.pos_gt_labels),
                                  [5, -1, -1, 2, -1, 4])
    assert int(r.num_pos) == 3


def test_double_sampling_masks_two_assignments():
    gt_inds_1 = jnp.asarray([1, 0, 2, 0])
    gt_inds_2 = jnp.asarray([0, 1, 1, 2])
    gt_bboxes = jnp.asarray(np.arange(8, dtype=np.float32).reshape(2, 4))
    r = double_sampling_masks(gt_inds_1, gt_inds_2, gt_bboxes)
    np.testing.assert_array_equal(np.asarray(r.pos_1),
                                  [True, False, True, False])
    np.testing.assert_array_equal(np.asarray(r.pos_2),
                                  [False, True, True, True])
    # gathered gt boxes follow assignment 1 (double_sampling_result.py:53)
    np.testing.assert_array_equal(np.asarray(r.pos_gt_bboxes[2]),
                                  np.arange(4, 8, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(r.pos_assigned_gt_inds_2),
                                  [0, 0, 0, 1])
    # jit/vmap-safe (static shapes end to end)
    jitted = jax.jit(double_sampling_masks)(gt_inds_1, gt_inds_2, gt_bboxes)
    np.testing.assert_array_equal(np.asarray(jitted.pos_1),
                                  np.asarray(r.pos_1))
