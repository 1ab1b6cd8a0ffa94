"""Torch checkpoint import: torchvision ResNet-50 -> flax param tree.

The reference initializes its backbone from torchvision
(`configs/dino_detr/dino_detr_ssod_r50_coco_120k.py:16-18`,
init_cfg checkpoint='torchvision://resnet50'). This converter maps a
torchvision resnet50 state_dict (.pth, loaded with torch CPU) onto the
`models/resnet.py` layout: NHWC conv kernels (OIHW -> HWIO), FrozenBN
scale/bias params + batch_stats mean/var.

Works offline from any local .pth (no download).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_torchvision_resnet50(state_dict: Dict[str, Any]
                                 ) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) trees for models.resnet.ResNet.

    Accepts a torchvision resnet50 state_dict (keys conv1.weight,
    bn1.*, layer{1..4}.{i}.conv{1..3}/bn{1..3}/downsample.*).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(dst_name: str, src_prefix: str):
        params[dst_name] = {
            "scale": sd[f"{src_prefix}.weight"],
            "bias": sd[f"{src_prefix}.bias"],
        }
        stats[dst_name] = {
            "mean": sd[f"{src_prefix}.running_mean"],
            "var": sd[f"{src_prefix}.running_var"],
        }

    params["stem_conv"] = {"kernel": _conv(sd["conv1.weight"])}
    put_bn("stem_bn", "bn1")

    blocks = (3, 4, 6, 3)
    for si, n in enumerate(blocks):
        for bi in range(n):
            src = f"layer{si + 1}.{bi}"
            dst = f"layer{si + 1}_{bi}"
            params[dst] = {}
            for ci in (1, 2, 3):
                params[dst][f"conv{ci}"] = {
                    "kernel": _conv(sd[f"{src}.conv{ci}.weight"])}
            if f"{src}.downsample.0.weight" in sd:
                params[dst]["ds_conv"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])}
            stats_node: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                stats_node[f"bn{ci}"] = {
                    "mean": sd[f"{src}.bn{ci}.running_mean"],
                    "var": sd[f"{src}.bn{ci}.running_var"]}
                params[dst][f"bn{ci}"] = {
                    "scale": sd[f"{src}.bn{ci}.weight"],
                    "bias": sd[f"{src}.bn{ci}.bias"]}
            if f"{src}.downsample.1.weight" in sd:
                stats_node["ds_bn"] = {
                    "mean": sd[f"{src}.downsample.1.running_mean"],
                    "var": sd[f"{src}.downsample.1.running_var"]}
                params[dst]["ds_bn"] = {
                    "scale": sd[f"{src}.downsample.1.weight"],
                    "bias": sd[f"{src}.downsample.1.bias"]}
            stats[dst] = stats_node
    return params, stats


def load_backbone_from_pth(path: str) -> Tuple[Dict, Dict]:
    """Load a torchvision resnet50 .pth and convert."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()
          if isinstance(v, torch.Tensor)}
    return convert_torchvision_resnet50(sd)


def install_backbone(variables: Dict, params: Dict, stats: Dict) -> Dict:
    """Place converted backbone weights into a DINODetector variable tree."""
    import jax
    out = jax.tree.map(lambda x: x, variables)
    out["params"]["backbone"] = jax.tree.map(
        lambda dst, src: np.asarray(src, dtype=np.asarray(dst).dtype),
        out["params"]["backbone"], params)
    out["batch_stats"]["backbone"] = jax.tree.map(
        lambda dst, src: np.asarray(src, dtype=np.asarray(dst).dtype),
        out["batch_stats"]["backbone"], stats)
    return out
