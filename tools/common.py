"""Shared CLI plumbing: config -> datasets / model configs."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Respect an explicit JAX_PLATFORMS env var: some TPU-terminal site
# hooks (axon) force jax_platforms at interpreter start, which silently
# moves "CPU" runs onto the shared chip. Pin it back before any backend
# initialization (same workaround as __graft_entry__.dryrun_multichip).
if os.environ.get("JAX_PLATFORMS"):
    import jax
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from semi_detr_tpu.data.coco import COCO_CLASSES, VOC_CLASSES, CocoDataset
from semi_detr_tpu.models.dino_head import DinoConfig
from semi_detr_tpu.models.ssod import SsodConfig
from semi_detr_tpu.parallel import maybe_initialize_distributed
from semi_detr_tpu.utils.config import load_config, parse_cfg_options


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--load-from", default=None,
                   help="warm-start detector weights: a reference/torch "
                        ".pth (converted on load, teacher/student "
                        "duplication rule) or an orbax checkpoint dir "
                        "from a supervised run")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--cfg-options", nargs="+", default=[],
                   help="override config entries, key=value (dotted keys)")
    return p


def load_cfg(args) -> dict:
    # multi-host runtime must form BEFORE any jax backend use (the analog
    # of the reference init_dist call, tools/train_detr_ssod.py:130-137)
    maybe_initialize_distributed()
    cfg = load_config(args.config, parse_cfg_options(args.cfg_options))
    if args.work_dir:
        cfg["work_dir"] = args.work_dir
    if args.seed is not None:
        cfg["seed"] = args.seed
    if getattr(args, "load_from", None):
        cfg["load_from"] = args.load_from
    return cfg


def class_names(cfg) -> tuple:
    """data.classes: 'voc', an explicit name list/tuple (mmdet custom-
    dataset parity — names absent from the list are DROPPED by
    CocoDataset's category mapping), or unset -> COCO."""
    c = cfg["data"].get("classes")
    if c == "voc":
        return VOC_CLASSES
    if isinstance(c, (list, tuple)):
        if not c:
            # an empty list is a config bug (e.g. broken templating);
            # falling back to COCO80 would silently remap categories
            raise ValueError("data.classes is an empty list")
        return tuple(c)
    return COCO_CLASSES


def dino_config(cfg) -> DinoConfig:
    import jax.numpy as jnp
    m = dict(cfg["model"])
    m.pop("type", None)
    if isinstance(m.get("dtype"), str):
        m["dtype"] = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                      "bf16": jnp.bfloat16}[m["dtype"]]
    return DinoConfig(**m)


def ssod_config(cfg) -> SsodConfig:
    s = dict(cfg.get("ssod", {}))
    s.pop("type", None)
    if "ema_decay_intervals" in s:
        s["ema_decay_intervals"] = tuple(s["ema_decay_intervals"] or ())
    if s.get("cls_avg_groups") is not None:
        s["cls_avg_groups"] = tuple(s["cls_avg_groups"])
    return SsodConfig(dino=dino_config(cfg), **s)


def build_dataset(ann, prefix, names, train=True):
    return CocoDataset(ann, prefix, classes=names,
                       filter_empty_gt=train, test_mode=not train)
