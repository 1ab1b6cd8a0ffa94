"""Checkpoint / resume — orbax-backed, reference-compatible semantics.

Capability parity with the reference's checkpoint subsystem (SURVEY.md §5):
* save every `interval` steps, keep the last `max_keep` plus a `latest`
  pointer (mmcv CheckpointHook every 4000 / max_keep_ckpts=5 +
  `patch_checkpoint`'s latest.pth copy, `detr_ssod/utils/patch.py:33-57`);
* one state tree holds {student params, teacher EMA params, optimizer
  state, step} (reference: teacher./student. prefixes in one state_dict);
* a SUPERVISED checkpoint (no teacher) warm-starts BOTH copies — the
  reference's key-duplication rule (`dino_detr_ssod.py:953-978`);
* resume tolerates optimizer-state mismatch by dropping the optimizer and
  keeping params (reference `detr_ssod/apis/train.py:210-222` fallback).
"""
from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState, copy_tree


def migrate_scanned_encoder(tree):
    """Migrate legacy per-layer transformer params (`enc_0`../`dec_0`..,
    written before the encoder/decoder became nn.scans) into the stacked
    `enc` / `dec.layer` subtrees (leaves gain a leading layer axis).
    Checkpoints from any era restore transparently; non-dict inputs /
    current-layout trees pass through unchanged."""
    if not isinstance(tree, dict):
        return tree
    out = {k: migrate_scanned_encoder(v) for k, v in tree.items()}
    enc_keys = sorted((k for k in out if re.fullmatch(r"enc_\d+", k)),
                      key=lambda k: int(k.rsplit("_", 1)[1]))
    if enc_keys and "enc" not in out:
        layers = [out.pop(k) for k in enc_keys]
        out["enc"] = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    dec_keys = sorted((k for k in out if re.fullmatch(r"dec_\d+", k)),
                      key=lambda k: int(k.rsplit("_", 1)[1]))
    if dec_keys and "dec" not in out:
        layers = [out.pop(k) for k in dec_keys]
        out["dec"] = {"layer": jax.tree.map(lambda *xs: np.stack(xs),
                                            *layers)}
    return out


class CheckpointManager:
    def __init__(self, directory: str, interval: int = 4000,
                 max_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_keep, create=True),
        )
        self.interval = interval

    def maybe_save(self, state: TrainState, force: bool = False) -> bool:
        step = int(state.step)
        if not force and (step == 0 or step % self.interval != 0):
            return False
        # orbax raises StepAlreadyExistsError on a re-save; the end-of-
        # training force-save lands on an interval step whenever
        # total_steps % interval == 0 (the headline 120k/4k recipe)
        if step in self.mgr.all_steps():
            return False
        self.mgr.save(step, args=ocp.args.StandardSave(state))
        return True

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        assert step is not None, "no checkpoint found"
        try:
            return self.mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        except Exception:
            # structure-mismatch fallback: restore params/teacher/step only
            # (migrating legacy param layouts), re-init optimizer
            # (reference resume_optimizer=False retry)
            raw = self.mgr.restore(step)
            out = template.replace(
                step=jax.numpy.asarray(raw["step"]),
                params=migrate_scanned_encoder(
                    jax.tree.map(np.asarray, raw["params"])),
                batch_stats=jax.tree.map(np.asarray, raw["batch_stats"]),
            )
            if raw.get("teacher_params") is not None:
                out = out.replace(teacher_params=migrate_scanned_encoder(
                    jax.tree.map(np.asarray, raw["teacher_params"])))
            return out

    def wait(self):
        """Block until async saves complete (call before process exit —
        orbax's async executor cannot run during interpreter shutdown)."""
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()


def duplicate_into_teacher(state: TrainState) -> TrainState:
    """Warm-start rule: a plain detector checkpoint (student only) is
    duplicated into the teacher (`dino_detr_ssod.py:963-968`)."""
    det = (state.params["detector"] if isinstance(state.params, dict)
           and "detector" in state.params else state.params)
    return state.replace(teacher_params=copy_tree(det))


def load_pretrained_detector(state: TrainState, detector_params) -> TrainState:
    """Load supervised detector params into an SSOD state (both copies)."""
    params = dict(state.params)
    params["detector"] = detector_params
    return state.replace(params=params,
                         teacher_params=copy_tree(detector_params))


def _cast_like(dst, src):
    # np.array (copy) rather than np.asarray: a plain-detector warm start
    # feeds the SAME loaded tree into student and teacher — aliased
    # leaves break buffer donation (donate-twice XLA error)
    return jax.tree.map(
        lambda d, s: np.array(s, dtype=np.asarray(d).dtype), dst, src)


def load_warm_start(path: str, n_heads: int = 8) -> dict:
    """Load detector weights for `load_from` warm starts
    (reference `detr_ssod/apis/train.py:210-222` + the duplication rule
    `dino_detr_ssod.py:953-978`).

    `path` is either a reference/torch `.pth` checkpoint (converted via
    utils.torch_weights) or an orbax checkpoint directory produced by our
    trainers. Returns {"params": detector params, "teacher_params":
    detector params, "batch_stats": ... or None, "projector": ... or None}.
    """
    if path.endswith((".pth", ".pt")):
        from ..utils.torch_weights import (convert_ssod_checkpoint,
                                           load_checkpoint_state_dict)
        out = convert_ssod_checkpoint(load_checkpoint_state_dict(path),
                                      n_heads=n_heads)
        return {"params": out["student"]["params"],
                "teacher_params": out["teacher_params"],
                "batch_stats": out["student"]["batch_stats"],
                "projector": out["projector"]}
    mgr = ocp.CheckpointManager(os.path.abspath(path))
    step = mgr.latest_step()
    assert step is not None, f"no checkpoint under {path}"
    raw = mgr.restore(step)
    mgr.close()
    params = migrate_scanned_encoder(raw["params"])
    projector = None
    if isinstance(params, dict) and "detector" in params:
        projector = params.get("projector")
        params = params["detector"]
    teacher = migrate_scanned_encoder(raw.get("teacher_params")) or params
    return {"params": params, "teacher_params": teacher,
            "batch_stats": raw.get("batch_stats"), "projector": projector}


def apply_warm_start(state: TrainState, loaded: dict,
                     ssod: bool) -> TrainState:
    """Install `load_warm_start` output into a TrainState (dtype-cast to
    the state's trees). For SSOD states the teacher copy is always set."""
    if ssod:
        params = dict(state.params)
        params["detector"] = _cast_like(params["detector"], loaded["params"])
        if loaded.get("projector") is not None:
            params["projector"] = _cast_like(params["projector"],
                                             loaded["projector"])
        state = state.replace(
            params=params,
            teacher_params=_cast_like(state.teacher_params,
                                      loaded["teacher_params"]))
    else:
        state = state.replace(
            params=_cast_like(state.params, loaded["params"]))
        if state.teacher_params is not None:
            state = state.replace(teacher_params=_cast_like(
                state.teacher_params, loaded["teacher_params"]))
    if loaded.get("batch_stats"):
        state = state.replace(batch_stats=_cast_like(
            state.batch_stats, loaded["batch_stats"]))
    return state


def apply_backbone_init(state: TrainState, path: str,
                        ssod: bool) -> TrainState:
    """Install torchvision-resnet50 pretrained weights (reference
    `init_cfg checkpoint='torchvision://resnet50'`,
    `configs/dino_detr/dino_detr_ssod_r50_coco_120k.py:16-18`) into the
    student (and the teacher EMA copy) from a local .pth."""
    from ..utils.torch_weights import load_backbone_from_pth
    bb_params, bb_stats = load_backbone_from_pth(path)

    def install(det_params):
        out = dict(det_params)
        out["backbone"] = _cast_like(det_params["backbone"], bb_params)
        return out

    if ssod:
        params = dict(state.params)
        params["detector"] = install(params["detector"])
        state = state.replace(params=params)
    else:
        state = state.replace(params=install(state.params))
    if state.teacher_params is not None:
        state = state.replace(teacher_params=install(state.teacher_params))
    stats = dict(state.batch_stats)
    stats["backbone"] = _cast_like(stats["backbone"], bb_stats)
    return state.replace(batch_stats=stats)
