"""DINO detection head — input projections, shared cls/box heads, CDN split.

Capability parity with the reference `DINODETRHead`/`DINODETRSSODHead`
forward path (`detr_od/models/dense_heads/dino_detr_head.py:215-407`,
`dino_detr_ssod_head.py:343-505`):

* input_proj: 1x1 conv + GroupNorm(32) for the 3 backbone levels, plus a
  3x3 stride-2 conv + GN on C5 for the 4th level (`dino_detr_head.py:219-236`)
* shared class Linear (prior-prob 0.01 bias init) and 3-layer box MLP
  (zero-init last layer) across decoder layers
  (`dino_detr_head.py:237-260`: dec_pred_*_embed_share=True); separate
  copies for the encoder two-stage heads (two_stage_*_embed_share=False)
* label_enc Embedding(dn_labelbook_size+1, C) for CDN content queries
* per-layer outputs: coord = sigmoid(fc_reg(hs_l) + inv_sigmoid(ref_l)),
  class = fc_cls(hs_l)  (`dino_detr_head.py:374-384`)
* output split into [dn | matching] query blocks by the static CDN
  layout (`dn_post_process`, dn_components.py:462-497)

Static-shape design: images come in bucketed (H, W) with per-image valid
extents; per-level masks are computed with the same nearest-neighbor
index math torch's F.interpolate applies to the image mask
(`dino_detr_head.py:316-325`).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .dn import CdnBatch, build_cdn_queries, cdn_attn_mask
from .resnet import ResNet
from .transformer import DINOTransformer, Mlp, inverse_sigmoid, xavier_uniform


@dataclass(frozen=True)
class DinoConfig:
    num_classes: int = 80
    num_queries: int = 900
    d_model: int = 256
    n_heads: int = 8
    n_levels: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 2048
    enc_n_points: int = 4
    dec_n_points: int = 4
    backbone_depth: int = 50
    backbone_channels: Tuple[int, ...] = (512, 1024, 2048)
    dn_labelbook_size: int = 81
    # CDN slot budget: 2*dn_single_pad*dn_groups STATIC slots (= the
    # reference's 2*dn_number = 200 budget, dn_components.py:164-175);
    # the (single_pad, groups) partition itself is computed PER BATCH as
    # traced content (see models/dn.py) so all GTs up to
    # dn_single_pad*dn_groups get DN supervision and small-GT batches get
    # the reference's many noise groups
    dn_single_pad: int = 100
    dn_groups: int = 1
    dn_label_noise_ratio: float = 0.5
    dn_box_noise_scale: float = 0.4
    max_gt: int = 100            # GT padding capacity per image
    dtype: Any = jnp.float32     # compute dtype for backbone/transformer
    remat: bool = False          # jax.checkpoint per transformer layer
    # encoder/decoder token streams in kernel tile order (see
    # DINOTransformer.tiled_tokens); numerics-preserving perf default
    tiled_tokens: bool = True
    # layer-scan unroll factor (see DINOTransformer.scan_unroll):
    # 1 = true scan, num_layers = fully unrolled runtime. Default 6
    # (= the flagship depth): the on-chip A/B measured the rolled scan's
    # stacked-param dynamic slices + grad dynamic-update-slices at
    # ~0.2 s/step of the SSOD recipe step (trace_summary of
    # /tmp/ssod_trace_tiled); unrolling emits static slices XLA folds
    # away (SSOD 1574 -> 1454 ms/step, supervised bs2 413 -> 364 ms)
    # while nn.scan still traces/compiles the body once per unroll group.
    scan_unroll: int = 6

    @property
    def dn_pad_size(self) -> int:
        return 2 * self.dn_single_pad * self.dn_groups


def prepare_images(images, img_hw):
    """Device-side normalization for raw-uint8 batches.

    The host pipeline ships uint8 pixels (data/pipeline.py:pack) — 4x
    less host->device traffic than normalized f32. Matches the host path
    (the reference's mmdet Normalize+Pad) to 1 ulp: f32 (x - mean)/std,
    with rows/cols beyond the per-image valid extent re-zeroed (host
    pads AFTER normalizing, so pad pixels are exactly 0). No-op for
    float inputs, so pre-normalized batches keep working.
    """
    if images.dtype != jnp.uint8:
        return images
    from ..data.augment import IMG_MEAN, IMG_STD
    x = (images.astype(jnp.float32) - IMG_MEAN) / IMG_STD
    _, H, W, _ = images.shape
    vi = jnp.arange(H)[None, :] < img_hw[:, :1]      # (B, H)
    vj = jnp.arange(W)[None, :] < img_hw[:, 1:2]     # (B, W)
    return x * (vi[:, :, None] & vj[:, None, :])[..., None]


def level_valid_masks(spatial_shapes, input_hw, img_hw):
    """Per-level validity masks via torch F.interpolate(nearest) index math:
    level pixel (i, j) is valid iff floor(i * H_in / H_l) < img_h etc.

    input_hw: static (H, W) of the padded batch; img_hw: (B, 2) int per-image
    valid extents. Returns list of (B, H_l, W_l) bool (True = valid)."""
    H, W = input_hw
    masks = []
    for (h, w) in spatial_shapes:
        src_i = (np.arange(h) * H // h)[None, :]        # (1, h)
        src_j = (np.arange(w) * W // w)[None, :]        # (1, w)
        vi = jnp.asarray(src_i) < img_hw[:, :1]          # (B, h)
        vj = jnp.asarray(src_j) < img_hw[:, 1:2]         # (B, w)
        masks.append(vi[:, :, None] & vj[:, None, :])
    return masks


def backbone_spatial_shapes(input_hw, n_levels: int = 4):
    """Static conv arithmetic: strides 8/16/32 from ResNet C3-C5, extra
    stride-64 level from a stride-2 conv on C5 (all ceil division)."""
    H, W = input_hw
    shapes = []
    for s in (8, 16, 32):
        shapes.append((-(-H // s), -(-W // s)))
    h5, w5 = shapes[-1]
    for _ in range(n_levels - 3):
        h5, w5 = -(-h5 // 2), -(-w5 // 2)
        shapes.append((h5, w5))
    return tuple(shapes[:n_levels])


class ClsHead(nn.Module):
    num_classes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        prior = 0.01
        bias = -math.log((1 - prior) / prior)
        return nn.Dense(self.num_classes, kernel_init=xavier_uniform,
                        bias_init=nn.initializers.constant(bias),
                        dtype=self.dtype, name="cls")(x)


class DINODetector(nn.Module):
    """Backbone + projections + transformer + heads. Returns raw per-layer
    outputs plus the dn/matching split."""
    cfg: DinoConfig

    def setup(self):
        c = self.cfg
        self.backbone = ResNet(depth=c.backbone_depth, dtype=c.dtype)
        n_backbone = len(c.backbone_channels)
        projs, norms = [], []
        for i in range(c.n_levels):
            if i < n_backbone:
                projs.append(nn.Conv(c.d_model, (1, 1),
                                     kernel_init=xavier_uniform,
                                     dtype=c.dtype, name=f"input_proj_{i}"))
            else:
                projs.append(nn.Conv(c.d_model, (3, 3), strides=(2, 2),
                                     padding=[(1, 1), (1, 1)],
                                     kernel_init=xavier_uniform,
                                     dtype=c.dtype, name=f"input_proj_{i}"))
            # dtype matters: GroupNorm defaults to promoting against its
            # f32 params, which would silently upcast the whole
            # transformer input stream back to f32
            norms.append(nn.GroupNorm(32, epsilon=1e-5, dtype=c.dtype,
                                      name=f"input_proj_gn_{i}"))
        self.input_projs = projs
        self.input_norms = norms

        self.transformer = DINOTransformer(
            d_model=c.d_model, n_heads=c.n_heads, num_queries=c.num_queries,
            num_encoder_layers=c.num_encoder_layers,
            num_decoder_layers=c.num_decoder_layers, d_ffn=c.d_ffn,
            n_levels=c.n_levels, enc_n_points=c.enc_n_points,
            dec_n_points=c.dec_n_points, remat=c.remat,
            tiled_tokens=c.tiled_tokens, scan_unroll=c.scan_unroll,
            dtype=c.dtype)

        self.fc_cls = ClsHead(c.num_classes, dtype=c.dtype)  # shared
        self.fc_reg = Mlp(c.d_model, 4, 3, last_zero_init=True,
                          dtype=c.dtype)
        self.fc_enc_cls = ClsHead(c.num_classes, dtype=c.dtype)
        self.fc_enc_reg = Mlp(c.d_model, 4, 3, last_zero_init=True,
                              dtype=c.dtype)

        self.label_enc = self.param(
            "label_enc", nn.initializers.normal(1.0),
            (c.dn_labelbook_size + 1, c.d_model))

    def features(self, images):
        """images: (B, H, W, 3) normalized float. Returns (srcs,
        spatial_shapes). uint8 batches must go through `prepare_images`
        first (encode_images does)."""
        c = self.cfg
        feats = self.backbone(images.astype(c.dtype))
        srcs = []
        for i in range(c.n_levels):
            if i < len(feats):
                x = feats[i]
            elif i == len(feats):
                x = feats[-1]        # extra level from raw C5
            else:
                x = srcs[-1]
            srcs.append(self.input_norms[i](self.input_projs[i](x)))
        shapes = tuple((int(s.shape[1]), int(s.shape[2])) for s in srcs)
        return srcs, shapes

    def encode_images(self, images, img_hw, features=None):
        """Backbone + input projections + encoder + two-stage selection.

        Returns the transformer encode dict (memory, pad_mask, valid_ratios,
        matching tgt/refpoints, encoder interim outputs) plus
        'spatial_shapes' (static) and 'srcs' (projected feature maps, for
        RoIAlign consumers). `features` lets callers reuse precomputed
        backbone outputs. uint8 batches are normalized on device here.
        """
        c = self.cfg
        images = prepare_images(images, img_hw)
        if features is None:
            srcs, shapes = self.features(images)
        else:
            srcs, shapes = features
        vmasks = level_valid_masks(
            shapes, (images.shape[1], images.shape[2]), img_hw)
        enc = self.transformer.encode(
            srcs, vmasks, shapes,
            fc_enc_reg=self.fc_enc_reg, fc_enc_cls=self.fc_enc_cls)
        enc["spatial_shapes"] = shapes
        enc["srcs"] = srcs
        return enc

    def decode_queries(self, enc, extra_tgt=None, extra_ref_unsig=None,
                       attn_mask=None, cdn: Optional[CdnBatch] = None):
        """Decoder over [front blocks | matching queries].

        extra_tgt/extra_ref_unsig: (B, n_front, C)/(B, n_front, 4) prepended
        query blocks (CDN and/or consistency). Returns the standard output
        dict (cls/coord per decoder layer split into matching and front
        blocks, encoder interim outputs, hs).
        """
        tgt, refpoint_unsig = enc["tgt"], enc["refpoint_unsig"]
        n_front = 0
        if extra_tgt is not None:
            n_front = extra_tgt.shape[1]
            tgt = jnp.concatenate([extra_tgt, tgt], 1)
            refpoint_unsig = jnp.concatenate(
                [extra_ref_unsig, refpoint_unsig], 1)

        # under tiled_tokens the decoder consumes the pre-tiled memory
        # twin written by encode() (one tile permute per encode, zero per
        # decode pass)
        mem = enc["memory_t"] if enc.get("memory_t") is not None \
            else enc["memory"]
        pad = enc["pad_mask_t"] if enc.get("pad_mask_t") is not None \
            else enc["pad_mask"]
        hs, refs = self.transformer.decode(
            mem, pad, enc["valid_ratios"],
            enc["spatial_shapes"], tgt, refpoint_unsig, attn_mask,
            self.fc_reg)

        all_cls = self.fc_cls(hs).astype(jnp.float32)    # (n_dec, B, nq_t, K)
        all_coord = jax.nn.sigmoid(
            self.fc_reg(hs).astype(jnp.float32) + inverse_sigmoid(refs[:-1]))

        out = {
            "cls": all_cls[:, :, n_front:],
            "coord": all_coord[:, :, n_front:],
            "enc_cls": enc["enc_out_class"].astype(jnp.float32),
            "enc_coord": enc["enc_out_coord"],
            "hs": hs,
            "n_front": n_front,
        }
        if n_front:
            out["front_cls"] = all_cls[:, :, :n_front]
            out["front_coord"] = all_coord[:, :, :n_front]
        if cdn is not None:
            out["cdn"] = cdn
        return out

    def __call__(self, images, img_hw, gt=None, dn_rng=None,
                 extra_queries=None, enc=None):
        """Full forward.

        Args:
          images: (B, H, W, 3); img_hw: (B, 2) valid (h, w) per image.
          gt: optional dict(boxes (B,G,4) cxcywh-normalized, labels (B,G),
            valid (B,G)) — enables CDN.
          dn_rng: PRNG key for CDN noise (required with gt).
          extra_queries: optional dict(content (B,Q1,C), bbox_unsig (B,Q1,4),
            attn_mask (T,T) bool True=blocked, optional cdn) — prepended
            front queries for SSOD (replaces gt-driven CDN construction).
          enc: optional precomputed `encode_images` dict — lets callers
            batch several branches' backbone+encoder passes into one
            call and split the result (train/ssod.py fuses the 1-image
            supervised encode into the unlabeled student encode).

        Returns dict with per-decoder-layer class/coord for the matching
        block, the dn block, encoder interim outputs, and cdn metadata.
        """
        c = self.cfg
        if enc is None:
            enc = self.encode_images(images, img_hw)

        cdn: Optional[CdnBatch] = None
        dn_tgt = dn_ref = attn_mask = None
        if extra_queries is not None:
            dn_tgt = extra_queries["content"]
            dn_ref = extra_queries["bbox_unsig"]
            attn_mask = extra_queries["attn_mask"]
            cdn = extra_queries.get("cdn")
        elif gt is not None:
            cdn = build_cdn_queries(
                dn_rng, gt["boxes"], gt["labels"], gt["valid"],
                self.label_enc, c.num_classes, c.dn_single_pad, c.dn_groups,
                c.dn_label_noise_ratio, c.dn_box_noise_scale)
            dn_tgt, dn_ref = cdn.query_label, cdn.query_bbox
            attn_mask = cdn_attn_mask(cdn.single_pad, cdn.groups,
                                      c.num_queries,
                                      capacity=c.dn_pad_size)

        return self.decode_queries(enc, dn_tgt, dn_ref, attn_mask, cdn)

    def forward_features_only(self, images):
        return self.features(images)
