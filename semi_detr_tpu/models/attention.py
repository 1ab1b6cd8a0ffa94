"""Projection-free multi-head attention (the reference's legacy MHA).

The reference vendors a DAB-DETR-style `MultiheadAttention` WITHOUT
input projections (`detr_od/models/utils/attention.py:54-387`): the
caller supplies already-projected q/k/v (conditional-attention designs
concatenate content+position features themselves), the module only
scales q by head_dim**-0.5, splits heads, applies attn/key-padding
masks, softmaxes, and runs a single output Linear(vdim, vdim)
(`attention.py:96,380-383`). It is imported by the reference
transformer (`transformer.py:30`) but the live decoder path uses
`nn.MultiheadAttention` instead (`transformer.py:765`) — this module
exists for API/inventory parity and for conditional-DETR-style
variants built on this framework.

TPU-native notes: batch-first (B, L, E) layout (no seq-first
transposes — XLA keeps the two einsums on the MXU without layout
copies); logits accumulate in f32 regardless of input dtype (bf16
inputs stay bf16 through the value path); masks are additive-or-bool
exactly like the reference (`attention.py:356-372`). Dropout on the
attention weights matches `attention.py:378` under `deterministic=False`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


class LegacyMultiheadAttention(nn.Module):
    """q/k/v are used as given (no input projections).

    Shapes: query (B, L, E); key (B, S, E); value (B, S, vdim);
    key_padding_mask (B, S) bool, True = masked
    (`attention.py:130-134`); attn_mask (L, S) or (B*heads, L, S),
    bool True = blocked, float = added to the logits
    (`attention.py:144-149`). Returns (out (B, L, vdim),
    head-averaged weights (B, L, S)) like `attention.py:384-387`.
    """
    num_heads: int
    vdim: Optional[int] = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, query, key, value,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 attn_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, l, e = query.shape
        s = key.shape[1]
        vdim = self.vdim if self.vdim is not None else value.shape[-1]
        h = self.num_heads
        head_dim, v_head_dim = e // h, vdim // h
        assert head_dim * h == e and v_head_dim * h == vdim

        q = (query * (head_dim ** -0.5)).reshape(b, l, h, head_dim)
        k = key.reshape(b, s, h, head_dim)
        v = value.reshape(b, s, h, v_head_dim)

        # (B, h, L, S) logits in f32 (reference bmm is f32 throughout)
        logits = jnp.einsum("blhd,bshd->bhls", q, k,
                            preferred_element_type=jnp.float32)
        if attn_mask is not None:
            if attn_mask.ndim == 2:
                m = attn_mask[None, None]                  # (1,1,L,S)
            else:
                m = attn_mask.reshape(b, h, l, s)
            if m.dtype == jnp.bool_:
                logits = jnp.where(m, NEG_INF, logits)
            else:
                logits = logits + m.astype(logits.dtype)
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :], NEG_INF, logits)

        w = nn.softmax(logits, axis=-1)
        if self.dropout > 0.0 and not deterministic:
            w = nn.Dropout(rate=self.dropout)(w, deterministic=False)
        out = jnp.einsum("bhls,bshd->blhd", w.astype(value.dtype), v)
        out = out.reshape(b, l, vdim)
        out = nn.Dense(vdim, name="out_proj")(out)
        return out, w.mean(axis=1)
