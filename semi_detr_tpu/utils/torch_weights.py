"""Torch checkpoint import: reference .pth state_dicts -> flax param trees.

Three converters, all offline (torch CPU only for .pth IO):

1. `convert_torchvision_resnet50` — backbone init from torchvision
   (`configs/dino_detr/dino_detr_ssod_r50_coco_120k.py:16-18`,
   init_cfg checkpoint='torchvision://resnet50').
2. `convert_dino_detector` — a FULL reference DINO detector state_dict
   (`backbone.* + bbox_head.*` keys, layout per
   `detr_od/models/dense_heads/dino_detr_head.py:215-281` and
   `detr_od/models/utils/transformer.py:1046-1224`) onto the
   `models/dino_head.DINODetector` variable tree.  `export_dino_detector`
   is the exact inverse (flax -> torch layout), for round-trip checks and
   for exporting trained weights back into reference-land for box-level
   parity runs.
3. `split_teacher_student` / `convert_ssod_checkpoint` — SSOD wrapper
   checkpoints with `teacher./student./projector.` prefixes, including the
   reference's duplication rule for plain detector checkpoints
   (`detr_ssod/models/dino_detr_ssod.py:953-978`).

Layout notes (torch -> flax): Linear weight (out,in) -> kernel (in,out);
Conv2d OIHW -> HWIO; LayerNorm/GroupNorm weight -> scale;
nn.MultiheadAttention in_proj_weight (3C,C) -> separate per-head q/k/v
kernels (C,H,Dh); the Projector's fc1 consumes a torch NCHW flatten
(c*49+h*7+w) which must be permuted to the flax HWC flatten order.
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


# --------------------------------------------------------------------------
# full DINO detector converter (reference backbone.* + bbox_head.* keys)
# --------------------------------------------------------------------------

def _lin(sd, prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear -> flax Dense."""
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _norm(sd, prefix: str) -> Dict[str, np.ndarray]:
    """torch LayerNorm/GroupNorm -> flax (scale, bias)."""
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _mlp(sd, prefix: str, n: int) -> Dict[str, Dict]:
    """reference MLP (transformer.py:453-465, .layers.{i}) -> models Mlp."""
    return {f"fc{i}": _lin(sd, f"{prefix}.layers.{i}") for i in range(n)}


def _msda(sd, prefix: str) -> Dict[str, Dict]:
    """reference MSDeformAttn projections (ms_deform_attn.py:55-58)."""
    return {k: _lin(sd, f"{prefix}.{k}")
            for k in ("sampling_offsets", "attention_weights",
                      "value_proj", "output_proj")}


def _mha(sd, prefix: str, n_heads: int) -> Dict[str, Dict]:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention.

    in_proj_weight rows are [q; k; v] (each (C, C)); flax wants per-head
    kernels (C, H, Dh) and biases (H, Dh); out kernel is (H, Dh, C).
    """
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])      # (3C, C)
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])        # (3C,)
    c = w.shape[1]
    dh = c // n_heads
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        out[name] = {
            "kernel": w[i * c:(i + 1) * c].T.reshape(c, n_heads, dh),
            "bias": b[i * c:(i + 1) * c].reshape(n_heads, dh),
        }
    wo = np.asarray(sd[f"{prefix}.out_proj.weight"])    # (C, C) out,in
    out["out"] = {"kernel": wo.T.reshape(n_heads, dh, c),
                  "bias": np.asarray(sd[f"{prefix}.out_proj.bias"])}
    return out


def _count_layers(sd, pattern: str) -> int:
    n = 0
    while f"{pattern.format(n)}" in sd:
        n += 1
    return n


def convert_dino_detector(state_dict: Dict[str, Any],
                          n_heads: int = 8) -> Dict[str, Any]:
    """Full reference DINO detector state_dict -> flax variables.

    Input keys: `backbone.*` (torchvision-layout ResNet) and `bbox_head.*`
    (input_proj / fc_cls / fc_reg / fc_enc_cls / fc_enc_reg / label_enc /
    transformer.*). The shared decoder heads (`fc_cls.{i}` all aliasing one
    module, `dino_detr_head.py:274-284`) are read from index 0.

    Returns {"params": ..., "batch_stats": ...} matching
    `models/dino_head.DINODetector`.
    """
    import jax

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    bb_sd = {k[len("backbone."):]: v for k, v in sd.items()
             if k.startswith("backbone.")}
    bb_params, bb_stats = convert_torchvision_resnet50(bb_sd)

    params: Dict[str, Any] = {"backbone": bb_params}

    n_proj = _count_layers(sd, "bbox_head.input_proj.{}.0.weight")
    for i in range(n_proj):
        params[f"input_proj_{i}"] = {
            "kernel": _conv(sd[f"bbox_head.input_proj.{i}.0.weight"]),
            "bias": np.asarray(sd[f"bbox_head.input_proj.{i}.0.bias"])}
        params[f"input_proj_gn_{i}"] = _norm(sd, f"bbox_head.input_proj.{i}.1")

    params["fc_cls"] = {"cls": _lin(sd, "bbox_head.fc_cls.0")}
    params["fc_reg"] = _mlp(sd, "bbox_head.fc_reg.0", 3)
    params["fc_enc_cls"] = {"cls": _lin(sd, "bbox_head.fc_enc_cls")}
    params["fc_enc_reg"] = _mlp(sd, "bbox_head.fc_enc_reg", 3)
    params["label_enc"] = np.asarray(sd["bbox_head.label_enc.weight"])

    t = "bbox_head.transformer"
    tr: Dict[str, Any] = {
        "level_embed": np.asarray(sd[f"{t}.level_embed"]),
        "tgt_embed": np.asarray(sd[f"{t}.tgt_embed.weight"]),
        "enc_output": _lin(sd, f"{t}.enc_output"),
        "enc_output_norm": _norm(sd, f"{t}.enc_output_norm"),
        "decoder_norm": _norm(sd, f"{t}.decoder.norm"),
        "ref_point_head": _mlp(sd, f"{t}.decoder.ref_point_head", 2),
    }
    n_enc = _count_layers(sd, t + ".encoder.layers.{}.norm1.weight")
    enc_layers = []
    for i in range(n_enc):
        p = f"{t}.encoder.layers.{i}"
        enc_layers.append({
            "self_attn": _msda(sd, f"{p}.self_attn"),
            "norm1": _norm(sd, f"{p}.norm1"),
            "norm2": _norm(sd, f"{p}.norm2"),
            "linear1": _lin(sd, f"{p}.linear1"),
            "linear2": _lin(sd, f"{p}.linear2"),
        })
    # the flax encoder is nn.scan'ed: leaves carry a leading layer axis
    # (same stacking `checkpoint.migrate_scanned_encoder` applies)
    tr["enc"] = jax.tree.map(lambda *xs: np.stack(xs), *enc_layers)
    n_dec = _count_layers(sd, t + ".decoder.layers.{}.norm1.weight")
    dec_layers = []
    for i in range(n_dec):
        p = f"{t}.decoder.layers.{i}"
        dec_layers.append({
            "cross_attn": _msda(sd, f"{p}.cross_attn"),
            "self_attn": _mha(sd, f"{p}.self_attn", n_heads),
            "norm1": _norm(sd, f"{p}.norm1"),
            "norm2": _norm(sd, f"{p}.norm2"),
            "norm3": _norm(sd, f"{p}.norm3"),
            "linear1": _lin(sd, f"{p}.linear1"),
            "linear2": _lin(sd, f"{p}.linear2"),
        })
    # scanned decoder: one DecoderStep body named "dec", its DecoderLayer
    # child "layer", leaves stacked on a leading layer axis (same layout
    # rule as "enc")
    tr["dec"] = {"layer": jax.tree.map(lambda *xs: np.stack(xs),
                                       *dec_layers)}
    params["transformer"] = tr
    return {"params": params, "batch_stats": {"backbone": bb_stats}}


def convert_projector(state_dict: Dict[str, Any],
                      prefix: str = "projector.") -> Dict[str, Any]:
    """Reference Projector (`dino_detr_ssod.py:33-72`) -> models.ssod.Projector.

    BN running stats are dropped: the reference only ever runs the
    projector in training mode (batch statistics), which our masked-BN
    reproduces. fc1 needs the NCHW->HWC flatten permutation.
    """
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    w1 = sd["fc1.weight"]                               # (1024, C*7*7)
    # fc1's input channels come from conv2's OUTPUT (conv1/conv2 happen
    # to share 256 in the reference, but derive from the right one)
    c = sd["conv2.weight"].shape[0]
    hw = int(np.sqrt(w1.shape[1] // c))
    w1 = (w1.reshape(w1.shape[0], c, hw, hw)
          .transpose(0, 2, 3, 1).reshape(w1.shape[0], -1))
    return {
        "conv1": {"kernel": _conv(sd["conv1.weight"])},
        "conv2": {"kernel": _conv(sd["conv2.weight"])},
        "bn1_scale": sd["bn1.weight"], "bn1_bias": sd["bn1.bias"],
        "bn2_scale": sd["bn2.weight"], "bn2_bias": sd["bn2.bias"],
        "fc_bn_scale": sd["bn.weight"], "fc_bn_bias": sd["bn.bias"],
        "fc1": {"kernel": w1.T, "bias": sd["fc1.bias"]},
        "fc2": {"kernel": sd["fc2.weight"].T, "bias": sd["fc2.bias"]},
    }


def split_teacher_student(state_dict: Dict[str, Any]
                          ) -> Tuple[Dict, Dict, Dict]:
    """Partition an SSOD-wrapper state_dict into (teacher, student, rest).

    Implements the reference duplication rule (`dino_detr_ssod.py:953-978`):
    a plain detector checkpoint (no teacher./student. prefix) is loaded
    into BOTH copies. `rest` holds wrapper-level keys (projector.*).
    """
    has_prefix = any(k.startswith(("teacher.", "student."))
                     for k in state_dict)
    if not has_prefix:
        det = {k: v for k, v in state_dict.items()
               if not k.startswith("projector.")}
        rest = {k: v for k, v in state_dict.items()
                if k.startswith("projector.")}
        return dict(det), dict(det), rest
    teacher = {k[len("teacher."):]: v for k, v in state_dict.items()
               if k.startswith("teacher.")}
    student = {k[len("student."):]: v for k, v in state_dict.items()
               if k.startswith("student.")}
    rest = {k: v for k, v in state_dict.items()
            if not k.startswith(("teacher.", "student."))}
    return teacher, student, rest


def convert_ssod_checkpoint(state_dict: Dict[str, Any],
                            n_heads: int = 8) -> Dict[str, Any]:
    """Full SSOD checkpoint -> {student: variables, teacher_params, projector}.

    Accepts either a wrapper checkpoint (teacher./student./projector.
    prefixes) or a plain detector checkpoint (duplicated into both).
    `projector` is None when the checkpoint carries no projector keys.
    """
    t_sd, s_sd, rest = split_teacher_student(state_dict)
    student = convert_dino_detector(s_sd, n_heads)
    teacher = convert_dino_detector(t_sd, n_heads)
    proj = (convert_projector(rest) if any(
        k.startswith("projector.") for k in rest) else None)
    return {"student": student, "teacher_params": teacher["params"],
            "projector": proj}


# --------------------------------------------------------------------------
# inverse: flax detector variables -> reference torch layout
# --------------------------------------------------------------------------

def _inv_lin(node) -> Dict[str, np.ndarray]:
    out = {"weight": np.asarray(node["kernel"]).T}
    if "bias" in node:
        out["bias"] = np.asarray(node["bias"])
    return out


def export_dino_detector(variables: Dict[str, Any],
                         num_decoder_layers: int = 6) -> Dict[str, np.ndarray]:
    """DINODetector flax variables -> reference-layout torch state_dict.

    Exact inverse of `convert_dino_detector` (shared decoder heads are
    materialized at every index, as torch state_dict() does for aliased
    ModuleList entries).
    """
    import jax

    p = variables["params"]
    stats = variables.get("batch_stats", {}).get("backbone", {})
    sd: Dict[str, np.ndarray] = {}

    # backbone (inverse of convert_torchvision_resnet50)
    bb = p["backbone"]

    def put_conv(name, node):
        sd[name + ".weight"] = np.transpose(
            np.asarray(node["kernel"]), (3, 2, 0, 1))

    def put_bn(name, pnode, snode):
        sd[name + ".weight"] = np.asarray(pnode["scale"])
        sd[name + ".bias"] = np.asarray(pnode["bias"])
        sd[name + ".running_mean"] = np.asarray(snode["mean"])
        sd[name + ".running_var"] = np.asarray(snode["var"])

    put_conv("backbone.conv1", bb["stem_conv"])
    put_bn("backbone.bn1", bb["stem_bn"], stats["stem_bn"])
    for si, n in enumerate((3, 4, 6, 3)):
        for bi in range(n):
            src = f"layer{si + 1}_{bi}"
            if src not in bb:
                continue
            dst = f"backbone.layer{si + 1}.{bi}"
            for ci in (1, 2, 3):
                put_conv(f"{dst}.conv{ci}", bb[src][f"conv{ci}"])
                put_bn(f"{dst}.bn{ci}", bb[src][f"bn{ci}"],
                       stats[src][f"bn{ci}"])
            if "ds_conv" in bb[src]:
                put_conv(f"{dst}.downsample.0", bb[src]["ds_conv"])
                put_bn(f"{dst}.downsample.1", bb[src]["ds_bn"],
                       stats[src]["ds_bn"])

    def put(prefix, d):
        for k, v in d.items():
            sd[f"{prefix}.{k}"] = v

    i = 0
    while f"input_proj_{i}" in p:
        put_conv(f"bbox_head.input_proj.{i}.0", p[f"input_proj_{i}"])
        sd[f"bbox_head.input_proj.{i}.0.bias"] = np.asarray(
            p[f"input_proj_{i}"]["bias"])
        sd[f"bbox_head.input_proj.{i}.1.weight"] = np.asarray(
            p[f"input_proj_gn_{i}"]["scale"])
        sd[f"bbox_head.input_proj.{i}.1.bias"] = np.asarray(
            p[f"input_proj_gn_{i}"]["bias"])
        i += 1

    for li in range(num_decoder_layers):
        put(f"bbox_head.fc_cls.{li}", _inv_lin(p["fc_cls"]["cls"]))
        for j in range(3):
            put(f"bbox_head.fc_reg.{li}.layers.{j}",
                _inv_lin(p["fc_reg"][f"fc{j}"]))
    put("bbox_head.fc_enc_cls", _inv_lin(p["fc_enc_cls"]["cls"]))
    for j in range(3):
        put(f"bbox_head.fc_enc_reg.layers.{j}",
            _inv_lin(p["fc_enc_reg"][f"fc{j}"]))
    sd["bbox_head.label_enc.weight"] = np.asarray(p["label_enc"])

    tr = p["transformer"]
    t = "bbox_head.transformer"
    sd[f"{t}.level_embed"] = np.asarray(tr["level_embed"])
    sd[f"{t}.tgt_embed.weight"] = np.asarray(tr["tgt_embed"])
    put(f"{t}.enc_output", _inv_lin(tr["enc_output"]))
    sd[f"{t}.enc_output_norm.weight"] = np.asarray(
        tr["enc_output_norm"]["scale"])
    sd[f"{t}.enc_output_norm.bias"] = np.asarray(tr["enc_output_norm"]["bias"])
    sd[f"{t}.decoder.norm.weight"] = np.asarray(tr["decoder_norm"]["scale"])
    sd[f"{t}.decoder.norm.bias"] = np.asarray(tr["decoder_norm"]["bias"])
    for j in range(2):
        put(f"{t}.decoder.ref_point_head.layers.{j}",
            _inv_lin(tr["ref_point_head"][f"fc{j}"]))

    def put_norm(name, node):
        sd[name + ".weight"] = np.asarray(node["scale"])
        sd[name + ".bias"] = np.asarray(node["bias"])

    def put_msda(name, node):
        for k in ("sampling_offsets", "attention_weights", "value_proj",
                  "output_proj"):
            put(f"{name}.{k}", _inv_lin(node[k]))

    # scanned encoder: leaves have a leading layer axis — unstack per layer
    enc = tr["enc"]
    n_enc = np.asarray(enc["norm1"]["scale"]).shape[0]

    for i in range(n_enc):
        lp = f"{t}.encoder.layers.{i}"
        node = jax.tree.map(lambda x: np.asarray(x)[i], enc)
        put_msda(f"{lp}.self_attn", node["self_attn"])
        put_norm(f"{lp}.norm1", node["norm1"])
        put_norm(f"{lp}.norm2", node["norm2"])
        put(f"{lp}.linear1", _inv_lin(node["linear1"]))
        put(f"{lp}.linear2", _inv_lin(node["linear2"]))
    # scanned decoder: unstack the "dec"/"layer" leaves per layer
    dec = tr["dec"]["layer"]
    n_dec = np.asarray(dec["norm1"]["scale"]).shape[0]
    for i in range(n_dec):
        lp = f"{t}.decoder.layers.{i}"
        node = jax.tree.map(lambda x: np.asarray(x)[i], dec)
        put_msda(f"{lp}.cross_attn", node["cross_attn"])
        mha = node["self_attn"]
        c = mha["out"]["bias"].shape[0]
        qkv_w = np.concatenate([
            np.asarray(mha[k]["kernel"]).reshape(c, c).T
            for k in ("query", "key", "value")], 0)
        qkv_b = np.concatenate([
            np.asarray(mha[k]["bias"]).reshape(c)
            for k in ("query", "key", "value")], 0)
        sd[f"{lp}.self_attn.in_proj_weight"] = qkv_w
        sd[f"{lp}.self_attn.in_proj_bias"] = qkv_b
        sd[f"{lp}.self_attn.out_proj.weight"] = np.asarray(
            mha["out"]["kernel"]).reshape(c, c).T
        sd[f"{lp}.self_attn.out_proj.bias"] = np.asarray(mha["out"]["bias"])
        put_norm(f"{lp}.norm1", node["norm1"])
        put_norm(f"{lp}.norm2", node["norm2"])
        put_norm(f"{lp}.norm3", node["norm3"])
        put(f"{lp}.linear1", _inv_lin(node["linear1"]))
        put(f"{lp}.linear2", _inv_lin(node["linear2"]))
    return sd


def load_checkpoint_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth (reference or torchvision) into a numpy state_dict."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()
            if isinstance(v, torch.Tensor)}


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
