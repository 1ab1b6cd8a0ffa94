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
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


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
            # optimizer-mismatch fallback: restore params/teacher/step only,
            # re-init optimizer (reference resume_optimizer=False retry)
            raw = self.mgr.restore(step)
            out = template.replace(
                step=jax.numpy.asarray(raw["step"]),
                params=jax.tree.map(np.asarray, raw["params"]),
                batch_stats=jax.tree.map(np.asarray, raw["batch_stats"]),
            )
            if raw.get("teacher_params") is not None:
                out = out.replace(teacher_params=jax.tree.map(
                    np.asarray, raw["teacher_params"]))
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
    return state.replace(teacher_params=jax.tree.map(lambda x: x, det))


def load_pretrained_detector(state: TrainState, detector_params) -> TrainState:
    """Load supervised detector params into an SSOD state (both copies)."""
    params = dict(state.params)
    params["detector"] = detector_params
    return state.replace(
        params=params,
        teacher_params=jax.tree.map(lambda x: x, detector_params))
