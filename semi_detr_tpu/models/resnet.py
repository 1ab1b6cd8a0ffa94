"""ResNet-50 backbone with frozen BatchNorm — TPU-native (NHWC, bf16-ready).

Capability parity with the reference backbone config
(`configs/dino_detr/dino_detr_ssod_r50_coco_120k.py:9-18`): depth 50,
out_indices (1,2,3) -> C3/C4/C5 at strides 8/16/32, frozen_stages=1,
norm_eval=True (BN statistics never update; stage-1 + stem parameters are
frozen), 'pytorch' style (stride-2 inside the 3x3 conv of a bottleneck).

TPU-first notes: NHWC layout (XLA's preferred conv layout on TPU), BN folded
into an affine op at trace time (norm_eval=True means BN is always
inference-mode, so this is exact), parameters stored fp32 with compute dtype
configurable (bfloat16 by default inside the train step).

Freezing is handled by the optimizer mask (see train/optim.py), mirroring
mmdet's `frozen_stages` which zeroes grads rather than removing params.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class FrozenBN(nn.Module):
    """BatchNorm with permanently frozen running stats (norm_eval=True).

    gamma/beta live in 'params' (trainable unless masked); mean/var live in
    'batch_stats' (never updated)."""
    features: int
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             nn.initializers.zeros, None, (self.features,))
        var = self.variable("batch_stats", "var",
                            nn.initializers.ones, None, (self.features,))
        scale = gamma / jnp.sqrt(var.value + self.eps)
        bias = beta - mean.value * scale
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class Bottleneck(nn.Module):
    mid: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = self.mid * 4
        h = nn.Conv(self.mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = FrozenBN(self.mid, self.dtype, name="bn1")(h)
        h = nn.relu(h)
        # 'pytorch' style: stride on the 3x3
        h = nn.Conv(self.mid, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = FrozenBN(self.mid, self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(out, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = FrozenBN(out, self.dtype, name="bn3")(h)
        if self.downsample:
            x = nn.Conv(out, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            x = FrozenBN(out, self.dtype, name="ds_bn")(x)
        return nn.relu(h + x)


class ResNet(nn.Module):
    """ResNet-50/101. Input NHWC float; returns features at out_indices
    (0=C2/stride4 ... 3=C5/stride32)."""
    depth: int = 50
    out_indices: Sequence[int] = (1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    STAGES = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}

    @nn.compact
    def __call__(self, x):
        blocks = self.STAGES[self.depth]
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        h = FrozenBN(64, self.dtype, name="stem_bn")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        for si, n_blocks in enumerate(blocks):
            mid = 64 * (2 ** si)
            for bi in range(n_blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                h = Bottleneck(mid, stride=stride, downsample=(bi == 0),
                               dtype=self.dtype,
                               name=f"layer{si + 1}_{bi}")(h)
            if si in self.out_indices:
                outs.append(h)
        return tuple(outs)
