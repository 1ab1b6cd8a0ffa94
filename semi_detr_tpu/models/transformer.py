"""DINO deformable transformer — TPU-native flax implementation.

Capability-parity redesign of the reference `DINOTransformer`
(`detr_od/models/utils/transformer.py:1046-1409`): 6-layer deformable
encoder over flattened multi-scale tokens, standard two-stage query
selection (top-900 encoder proposals), 6-layer decoder with
[self-attn, deformable cross-attn, FFN] and detached iterative box
refinement, learned target embeddings, CDN query support via a static
attention mask.

TPU-first deviations (behavior-preserving):
* all level shapes are static; padding-validity enters through masks and
  `valid_ratios`, exactly like the reference (the model already consumes
  padding masks — reference `dino_detr_head.py:316-325`).
* `gen_encoder_output_proposals`' +inf masking (reference
  `transformer.py:525-578`) is replaced by masking the class logits to a
  large negative value before top-k — identical selection, no infs in the
  graph.
* no dropout: the active config instantiates `DINOTransformer` with
  default `dropout=0.0` (`transformer.py:1052`), so we omit dropout
  entirely (deterministic trace).
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ms_deform_attn import ms_deform_attn, sampling_offsets_init_bias

xavier_uniform = nn.initializers.xavier_uniform()


def inverse_sigmoid(x, eps: float = 1e-5):
    """Matches mmdet inverse_sigmoid (clamped logit, eps=1e-5 — the
    reference routes every call site through
    mmdet/models/utils/transformer.py:358 or its own copy at
    detr_od/models/utils/transformer.py:435, both eps=1e-5)."""
    x = jnp.clip(x, 0, 1)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


def sine_embed(pos, num_feats: int = 128, temperature: float = 10000.0,
               scale: float = 2 * math.pi):
    """Sine embedding of normalized coords (reference
    `gen_sineembed_for_position`, transformer.py:467-499).

    pos: (..., K) in [0,1] -> (..., K*num_feats), per-coordinate layout
    [sin(x/t^0), cos(x/t^0), sin(x/t^2), ...] with y embedded BEFORE x
    (and then w, h) to match the reference concat order.
    """
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)

    def embed1(v):
        p = v[..., None] * scale / dim_t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                         axis=-1).reshape(*v.shape, num_feats)

    k = pos.shape[-1]
    order = [1, 0] if k == 2 else [1, 0, 2, 3]  # y, x (, w, h)
    return jnp.concatenate([embed1(pos[..., i]) for i in order], axis=-1)


def sine_positional_encoding_hw(valid_mask, num_feats: int = 128,
                                temp_h: float = 20.0, temp_w: float = 20.0,
                                scale: float = 2 * math.pi,
                                offset: float = 0.0, eps: float = 1e-6):
    """SinePositionalEncodingHW (reference
    detr_od/models/utils/positional_encoding.py:9-99) with normalize=True.

    valid_mask: (B, H, W) bool, True = valid pixel. Returns (B, H, W, 2F).
    """
    not_mask = valid_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
    x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale

    def embed1(v, temp):
        dim_t = jnp.arange(num_feats, dtype=jnp.float32)
        dim_t = temp ** (2 * (dim_t // 2) / num_feats)
        p = v[..., None] / dim_t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                         axis=-1).reshape(*v.shape, num_feats)

    return jnp.concatenate([embed1(y_embed, temp_h), embed1(x_embed, temp_w)],
                           axis=-1)


class Mlp(nn.Module):
    """`MLP` of the reference (relu between layers, none after last)."""
    hidden: int
    out: int
    num_layers: int = 3
    last_zero_init: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden, kernel_init=xavier_uniform,
                         dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        init = (nn.initializers.zeros if self.last_zero_init
                else xavier_uniform)
        bias_init = nn.initializers.zeros
        return nn.Dense(self.out, kernel_init=init, bias_init=bias_init,
                        dtype=self.dtype, name=f"fc{self.num_layers - 1}")(x)


class MSDeformAttention(nn.Module):
    """Query-conditioned multi-scale deformable attention (reference
    `MSDeformAttn`, ops/modules/ms_deform_attn.py:30-127): value/output
    projections + per-query sampling offsets and softmaxed attention
    weights, directional grid bias init for the offsets."""
    d_model: int = 256
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    dtype: Any = None
    # pre-tiled token layouts (see ops.ms_deform_attn_pallas._prep_inputs):
    # value_tiled = value_src's token axis is in kernel tile order;
    # queries_tiled = query/reference_points are too (fully tiled encoder)
    value_tiled: bool = False
    queries_tiled: bool = False

    @nn.compact
    def __call__(self, query, reference_points, value_src, spatial_shapes,
                 key_padding_mask=None):
        """query: (B, Lq, C); reference_points: (B, Lq, L, 2|4) in [0,1];
        value_src: (B, S, C); key_padding_mask: (B, S) True=PAD."""
        B, Lq, _ = query.shape
        M, L, P = self.n_heads, self.n_levels, self.n_points
        D = self.d_model // M

        value = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                         dtype=self.dtype, name="value_proj")(value_src)
        if key_padding_mask is not None:
            value = jnp.where(key_padding_mask[..., None], 0.0, value)
        value = value.reshape(B, -1, M, D)

        off_bias = sampling_offsets_init_bias(M, L, P)
        # offsets/attn logits in f32: sampling coordinates are
        # precision-sensitive (bf16 has ~3 decimal digits)
        offsets = nn.Dense(M * L * P * 2,
                           kernel_init=nn.initializers.zeros,
                           bias_init=lambda *a: jnp.asarray(off_bias),
                           dtype=jnp.float32,
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(B, Lq, M, L, P, 2)
        attn = nn.Dense(M * L * P, kernel_init=nn.initializers.zeros,
                        dtype=jnp.float32, name="attention_weights")(query)
        attn = jax.nn.softmax(attn.reshape(B, Lq, M, L * P), axis=-1)
        attn = attn.reshape(B, Lq, M, L, P)

        wh = jnp.asarray([[w, h] for h, w in spatial_shapes],
                         jnp.float32)  # (L, 2) as (W, H)
        if reference_points.shape[-1] == 2:
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / wh[None, None, None, :, None, :])
        else:
            loc = (reference_points[:, :, None, :, None, :2]
                   + offsets / P
                   * reference_points[:, :, None, :, None, 2:] * 0.5)

        from ..ops.ms_deform_attn_pallas import ms_deform_attn_auto
        out = ms_deform_attn_auto(value, tuple(spatial_shapes),
                                  loc.astype(jnp.float32),
                                  attn.astype(jnp.float32),
                                  value_tiled=self.value_tiled,
                                  queries_tiled=self.queries_tiled)
        from jax.ad_checkpoint import checkpoint_name
        out = checkpoint_name(out, "msda_out")
        return nn.Dense(self.d_model, kernel_init=xavier_uniform,
                        dtype=self.dtype, name="output_proj")(out)


class EncoderLayer(nn.Module):
    """Deformable self-attention + FFN (reference
    `DINOTransformerEncoderLayer`, transformer.py:579-643).

    Returns `(out, None)` — the nn.scan body contract: the 6 identical
    layers are compiled ONCE and iterated with stacked (L, ...) params
    (a ~L-fold cut of the dominant compile chunk; XLA can't pipeline
    across sequential layers anyway, so steady-state perf is unchanged).
    """
    d_model: int = 256
    d_ffn: int = 2048
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    dtype: Any = None
    tiled: bool = False     # all token tensors arrive in kernel tile order

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes,
                 key_padding_mask):
        h = MSDeformAttention(self.d_model, self.n_heads, self.n_levels,
                              self.n_points, dtype=self.dtype,
                              value_tiled=self.tiled,
                              queries_tiled=self.tiled,
                              name="self_attn")(
            src + pos, reference_points, src, spatial_shapes,
            key_padding_mask)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + h)
        f = nn.Dense(self.d_ffn, kernel_init=xavier_uniform,
                     dtype=self.dtype, name="linear1")(src)
        f = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                     dtype=self.dtype, name="linear2")(nn.relu(f))
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                           name="norm2")(src + f)
        return out, None


def encoder_reference_points(spatial_shapes, valid_ratios):
    """Per-level normalized center grid scaled by valid ratios (reference
    `DINOTransformerEncoder.get_reference_points`, transformer.py:676-692).

    valid_ratios: (B, L, 2) as (w_ratio, h_ratio). Returns (B, S, L, 2)."""
    refs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry = (np.arange(h, dtype=np.float32) + 0.5)
        rx = (np.arange(w, dtype=np.float32) + 0.5)
        gy, gx = np.meshgrid(ry, rx, indexing="ij")
        gy = jnp.asarray(gy.reshape(-1))[None] / (
            valid_ratios[:, None, lvl, 1] * h)
        gx = jnp.asarray(gx.reshape(-1))[None] / (
            valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([gx, gy], -1))
    ref = jnp.concatenate(refs, 1)  # (B, S, 2)
    return ref[:, :, None] * valid_ratios[:, None]


def make_proposals(spatial_shapes, valid_ratios):
    """Anchor proposals per token (reference
    `gen_encoder_output_proposals`, transformer.py:525-578): grid centers
    normalized by the VALID extent, wh = 0.05 * 2**lvl.

    Returns (proposals (B,S,4) in [0,1] unclipped, static level grid)."""
    out = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        grid = jnp.asarray(
            np.stack([gx.reshape(-1), gy.reshape(-1)], -1))  # (HW, 2)
        # scale = valid extent (valid_ratio * full extent)
        scale = valid_ratios[:, None, lvl, :] * jnp.asarray(
            [[float(w), float(h)]])
        ctr = (grid[None] + 0.5) / scale
        wh = jnp.full_like(ctr, 0.05 * (2.0 ** lvl))
        out.append(jnp.concatenate([ctr, wh], -1))
    return jnp.concatenate(out, 1)


class DecoderLayer(nn.Module):
    """[self-attn, deformable cross-attn, FFN] (reference
    `DINOTransformerDecoderLayer`, transformer.py:747-875)."""
    d_model: int = 256
    d_ffn: int = 2048
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    dtype: Any = None
    value_tiled: bool = False    # memory's token axis in kernel tile order

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points_input, memory,
                 spatial_shapes, memory_key_padding_mask, self_attn_mask):
        # self attention (q = k = tgt + query_pos, v = tgt)
        q = tgt + query_pos
        attn_mask = None
        if self_attn_mask is not None:
            # flax mask: True = may attend; reference mask True = blocked
            attn_mask = ~self_attn_mask[None, None]
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            kernel_init=xavier_uniform, dtype=self.dtype,
            name="self_attn")(
            inputs_q=q, inputs_k=q, inputs_v=tgt, mask=attn_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt + h)

        # cross attention
        h = MSDeformAttention(self.d_model, self.n_heads, self.n_levels,
                              self.n_points, dtype=self.dtype,
                              value_tiled=self.value_tiled,
                              name="cross_attn")(
            tgt + query_pos, reference_points_input, memory, spatial_shapes,
            memory_key_padding_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt + h)

        # ffn
        f = nn.Dense(self.d_ffn, kernel_init=xavier_uniform,
                     dtype=self.dtype, name="linear1")(tgt)
        f = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                     dtype=self.dtype, name="linear2")(nn.relu(f))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt + f)


def _dense_apply(p, x, dtype):
    """Functional nn.Dense (same dtype semantics: inputs+params cast to
    `dtype` before the matmul when set, plain promotion otherwise)."""
    k, b = p["kernel"], p["bias"]
    if dtype is not None:
        x, k, b = x.astype(dtype), k.astype(dtype), b.astype(dtype)
    return x @ k + b


def _mlp_apply(p, x, num_layers, dtype):
    """Functional `Mlp` (relu between layers, none after last)."""
    for i in range(num_layers - 1):
        x = nn.relu(_dense_apply(p[f"fc{i}"], x, dtype))
    return _dense_apply(p[f"fc{num_layers - 1}"], x, dtype)


class DecoderStep(nn.Module):
    """nn.scan body for the decoder: query-pos embed -> one decoder layer
    -> detached iterative box refinement (reference
    `DINOTransformerDecoder.forward`, transformer.py:974-1045).

    The refinement threads two modules whose parameters are SHARED across
    layers and owned elsewhere (`ref_point_head` on the transformer,
    `fc_reg` on the head) — nn.scan can only stack the per-layer
    DecoderLayer params, so the shared params ride in as broadcast VALUES
    (`shared` = (p_ref_head, p_fc_reg) pytrees read off the owning bound
    modules) and are applied functionally; gradients still flow to the
    owning scopes because the values are the enclosing apply's traced
    params. Both are 'Mlp' instances, applied via `_mlp_apply`.

    Carry: (output (B,nq,C), reference (B,nq,4) sigmoided, detached).
    Per-step outputs: (raw layer output, refined reference) — decoder_norm
    is applied to the stacked outputs outside the scan (elementwise over
    layers, so identical to the reference's per-layer application)."""
    d_model: int = 256
    d_ffn: int = 2048
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    dtype: Any = None
    value_tiled: bool = False

    @nn.compact
    def __call__(self, carry, memory, pad_mask, attn_mask, vr4,
                 spatial_shapes, shared):
        output, reference = carry
        p_ref_head, p_fc_reg = shared
        ref_input = reference[:, :, None] * vr4[:, None]    # (B,nq,L,4)
        qse = sine_embed(ref_input[:, :, 0, :], self.d_model // 2)
        query_pos = _mlp_apply(p_ref_head, qse, 2, self.dtype)
        output = DecoderLayer(self.d_model, self.d_ffn, self.n_heads,
                              self.n_levels, self.n_points,
                              dtype=self.dtype,
                              value_tiled=self.value_tiled, name="layer")(
            output, query_pos, ref_input, memory, spatial_shapes,
            pad_mask, attn_mask)
        new_ref = jax.nn.sigmoid(
            _mlp_apply(p_fc_reg, output, 3, self.dtype)
            + inverse_sigmoid(reference))
        return ((output, jax.lax.stop_gradient(new_ref)),
                (output, new_ref))


class DINOTransformer(nn.Module):
    """Encoder + two-stage selection + decoder w/ iterative refinement.

    `fc_reg`/`fc_cls`/`fc_enc_reg`/`fc_enc_cls` are passed in bound from the
    head so decoder-internal refinement shares the head's parameters, the
    same wiring as the reference (head owns them, transformer consumes:
    `dino_detr_head.py:355-362`)."""
    d_model: int = 256
    n_heads: int = 8
    num_queries: int = 900
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 2048
    n_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    # jax.checkpoint per layer: trade recompute for activation memory
    # (the encoder's per-layer sampling tensors are ~300MB/layer at DINO
    # scale; remat is what makes flagship-scale training fit HBM)
    remat: bool = False
    # run the encoder fully in the attention kernel's tile order (tile
    # the token stream ONCE before the 6-layer scan, untile once after)
    # and feed the decoder's cross-attention a pre-tiled memory: the r4
    # profile attributed 40% of the SSOD step to the per-layer
    # tile/untile permutes this removes. Numerics-preserving: the tile
    # permutation is a bijection on real tokens, padding slots are
    # sentinel-masked in the kernel, and the CPU/oracle dispatch untiles
    # around the call.
    tiled_tokens: bool = True
    # lax.scan unroll for the layer scans: the r4 profile shows ~0.3
    # s/step of scan machinery (stacked-param dynamic slicing on the way
    # in, gradient dynamic-update-slice accumulation on the way out).
    # unroll=length turns those into static slices XLA folds away, at
    # the scanned bodies' compile-time cost of full unrolling. Values:
    # 1 = true scan (cheapest compile), N = unrolled runtime.
    scan_unroll: int = 1
    dtype: Any = None

    def setup(self):
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.n_levels, self.d_model))
        self.tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.d_model))
        self.enc_output = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                                   dtype=self.dtype)
        self.enc_output_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        # Save the deform-attn outputs across remat (policy below): the
        # Pallas gather kernel is the step's hot spot, so replaying it in
        # the backward would cost ~a third of the attention budget for a
        # ~23MB/layer activation. Everything else (projections, FFN,
        # norms) is rematerialized as before.
        msda_policy = jax.checkpoint_policies.save_only_these_names(
            "msda_out")
        enc_cls = (nn.remat(EncoderLayer, static_argnums=(4,),
                            policy=msda_policy)
                   if self.remat else EncoderLayer)
        # DecoderStep.__call__(self, carry, memory, pad_mask, attn_mask,
        # vr4, spatial_shapes, shared): spatial_shapes (arg 6 incl. self)
        # is a static python tuple
        dec_cls = (nn.remat(DecoderStep, static_argnums=(6,),
                            policy=msda_policy)
                   if self.remat else DecoderStep)
        # identical encoder layers ride ONE compiled body via nn.scan
        # (params get a leading (n_layers,) axis under "enc"); the decoder
        # scans DecoderStep, which folds the shared-param refinement into
        # the body as broadcast values (see DecoderStep docstring)
        scan_enc = nn.scan(
            enc_cls, variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,) * 4,
            length=self.num_encoder_layers,
            unroll=min(self.scan_unroll, self.num_encoder_layers))
        self.encoder = scan_enc(self.d_model, self.d_ffn, self.n_heads,
                                self.n_levels, self.enc_n_points,
                                dtype=self.dtype,
                                tiled=self.tiled_tokens, name="enc")
        scan_dec = nn.scan(
            dec_cls, variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,) * 6,
            length=self.num_decoder_layers,
            unroll=min(self.scan_unroll, self.num_decoder_layers))
        self.decoder = scan_dec(self.d_model, self.d_ffn, self.n_heads,
                                self.n_levels, self.dec_n_points,
                                dtype=self.dtype,
                                value_tiled=self.tiled_tokens, name="dec")
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.ref_point_head = Mlp(self.d_model, self.d_model, 2,
                                  dtype=self.dtype)

    def encode(self, srcs, valid_masks, spatial_shapes,
               fc_enc_reg=None, fc_enc_cls=None):
        """Flatten + 6-layer deformable encoder + two-stage top-k selection.

        Args:
          srcs: list of (B, H_l, W_l, C) projected features.
          valid_masks: list of (B, H_l, W_l) bool, True = valid.
          spatial_shapes: static ((H, W), ...) per level.

        Returns dict: memory (B, S, C), pad_mask (B, S) True=PAD,
          valid_ratios (B, L, 2), matching query init (tgt (B,nq,C),
          refpoint_unsig (B,nq,4) detached), encoder interim outputs.
        """
        B = srcs[0].shape[0]
        src_flat = jnp.concatenate(
            [s.reshape(B, -1, self.d_model) for s in srcs], 1)
        pad_mask = jnp.concatenate(
            [~m.reshape(B, -1) for m in valid_masks], 1)  # True = PAD

        pos = []
        for lvl, m in enumerate(valid_masks):
            p = sine_positional_encoding_hw(m, self.d_model // 2)
            pos.append(p.reshape(B, -1, self.d_model)
                       + self.level_embed[lvl][None, None])
        pos_flat = jnp.concatenate(pos, 1)
        if self.dtype is not None:
            pos_flat = pos_flat.astype(self.dtype)

        # valid ratios (reference get_valid_ratio: first row/col of mask)
        vr = jnp.stack(
            [jnp.stack([m[:, 0, :].sum(1) / m.shape[2],
                        m[:, :, 0].sum(1) / m.shape[1]], -1)
             for m in valid_masks], 1).astype(jnp.float32)  # (B, L, 2) w,h

        # ---------------- encoder (scanned: one compiled layer body)
        enc_ref = encoder_reference_points(spatial_shapes, vr)
        memory_t = None
        pad_mask_t = None
        if self.tiled_tokens:
            # one tile permute per tensor for the WHOLE encoder; every
            # per-layer kernel call then runs layout-free, and the scan
            # output doubles as the decoder's pre-tiled memory
            from ..ops.ms_deform_attn_pallas import (_tile_tokens,
                                                     _untile_tokens)
            src_t = _tile_tokens(src_flat, spatial_shapes)
            pos_t = _tile_tokens(pos_flat, spatial_shapes)
            ref_t = _tile_tokens(enc_ref, spatial_shapes)
            # zero-pad of `valid` marks the static tile-pad slots as PAD
            pad_mask_t = ~_tile_tokens(~pad_mask, spatial_shapes)
            memory_t, _ = self.encoder(src_t, pos_t, ref_t,
                                       spatial_shapes, pad_mask_t)
            memory = _untile_tokens(memory_t, spatial_shapes)
        else:
            memory, _ = self.encoder(src_flat, pos_flat, enc_ref,
                                     spatial_shapes, pad_mask)

        # ---------------- two-stage selection
        proposals = make_proposals(spatial_shapes, vr)  # (B, S, 4)
        prop_valid = jnp.all((proposals > 0.01) & (proposals < 0.99), -1)
        token_valid = prop_valid & ~pad_mask
        out_memory = jnp.where(token_valid[..., None], memory, 0.0)
        out_memory = self.enc_output_norm(self.enc_output(out_memory))

        enc_cls = fc_enc_cls(out_memory)                      # (B, S, #cls)
        enc_coord_unsig = fc_enc_reg(out_memory) + inverse_sigmoid(proposals)
        # select top-k valid tokens by max class logit
        score = jnp.where(token_valid, enc_cls.max(-1), -1e9)
        topk_idx = jax.lax.top_k(score, self.num_queries)[1]  # (B, k)

        def take(x):
            return jnp.take_along_axis(x, topk_idx[..., None], axis=1)

        ref_undetach = take(enc_coord_unsig)                   # unsigmoided
        refpoint_unsig = jax.lax.stop_gradient(ref_undetach)
        tgt = jnp.broadcast_to(self.tgt_embed[None],
                               (B, self.num_queries, self.d_model))
        if self.dtype is not None:
            tgt = tgt.astype(self.dtype)

        return {
            "memory": memory,
            "pad_mask": pad_mask,
            # pre-tiled twins for the decoder's cross-attention (None
            # when tiled_tokens is off)
            "memory_t": memory_t,
            "pad_mask_t": pad_mask_t,
            "valid_ratios": vr,
            "tgt": tgt,
            "refpoint_unsig": refpoint_unsig,
            # == fc_enc_cls(take(out_memory)): gather commutes with the
            # pointwise head, so reuse the logits computed above
            "enc_out_class": take(enc_cls),
            "enc_out_coord": jax.nn.sigmoid(ref_undetach),
        }

    def decode(self, memory, pad_mask, valid_ratios, spatial_shapes,
               tgt, refpoint_unsig, attn_mask=None, fc_reg=None):
        """6-layer decoder with detached iterative box refinement.

        tgt: (B, nq_t, C) content queries (front blocks + matching).
        refpoint_unsig: (B, nq_t, 4) unsigmoided reference boxes.
        attn_mask: (nq_t, nq_t) bool True=blocked, or None.
        memory/pad_mask: under tiled_tokens these must be the PRE-TILED
        twins from encode() ("memory_t"/"pad_mask_t").

        Returns (hs (n_dec, B, nq_t, C) normed, refs (n_dec+1, B, nq_t, 4)
        sigmoided).
        """
        output = tgt if self.dtype is None else tgt.astype(self.dtype)
        reference = jax.nn.sigmoid(refpoint_unsig)
        vr4 = jnp.concatenate([valid_ratios, valid_ratios], -1)  # (B, L, 4)
        if attn_mask is None:
            # the scanned body takes a concrete mask; all-False == fully
            # visible (DecoderLayer applies ~mask as the attention mask)
            nq_t = tgt.shape[1]
            attn_mask = jnp.zeros((nq_t, nq_t), bool)

        # materialize the shared modules' params before the scan reads
        # them functionally (first real application happens inside the
        # scan body, which can't create params)
        if self.is_initializing():
            dummy = jnp.zeros((1, 1, 2 * self.d_model), jnp.float32)
            _ = self.ref_point_head(dummy)
            _ = fc_reg(jnp.zeros((1, 1, self.d_model), jnp.float32))
        shared = (self.ref_point_head.variables["params"],
                  fc_reg.variables["params"])

        (_, _), (hs_raw, refs_out) = self.decoder(
            (output, reference), memory, pad_mask, attn_mask, vr4,
            spatial_shapes, shared)
        # decoder_norm commutes with the layer stacking (elementwise over
        # the layer axis) — one vectorized application == the reference's
        # per-layer `self.decoder.norm` (transformer.py:1041-1045)
        hs = self.decoder_norm(hs_raw)
        refs = jnp.concatenate([reference[None], refs_out], axis=0)
        return hs, refs
