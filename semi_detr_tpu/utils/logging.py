"""Logging / observability: text logger, TensorBoard, throttled scalars,
weight summary, step timing.

Capability parity with the reference's logging stack (SURVEY.md §5):
mmcv TextLoggerHook + Tensorboard/WandbLoggerHook
(`base_dino_detr_ssod_coco.py:254-271`), `log_every_n` throttling
(`detr_ssod/utils/logger.py:164-178`), `WeightSummary` parameter table
with lr/wd (`weights_summary.py:61-101`), IterTimerHook time/data_time.
Wandb is gated (not installed here) — the interface accepts any sink.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import numpy as np

_LOG_COUNTS: Dict[str, int] = defaultdict(int)


def get_logger(name: str = "semi_detr_tpu",
               log_file: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    if not logger.handlers:
        logger.setLevel(logging.INFO)
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if log_file:
        # a second trainer in the same process gets ITS work dir's
        # train.log (the old handler-presence early-return appended
        # everything to the first trainer's file)
        path = os.path.abspath(log_file)
        have = [h for h in logger.handlers
                if isinstance(h, logging.FileHandler)]
        if not any(h.baseFilename == path for h in have):
            for h in have:
                logger.removeHandler(h)
                h.close()
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            fh = logging.FileHandler(path)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


def log_every_n(logger: logging.Logger, msg: str, n: int = 50,
                key: Optional[str] = None):
    """Log only every n-th call per key (reference log_every_n)."""
    key = key or msg[:40]
    _LOG_COUNTS[key] += 1
    if (_LOG_COUNTS[key] - 1) % n == 0:
        logger.info(msg)


def device_memory_summary():
    """One-line HBM usage summary of device 0, or None when the backend
    exposes no allocator stats (CPU, some tunnel clients). Peak bytes is
    the number that matters: it bounds per-chip batch headroom."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return None
    if "peak_bytes_in_use" not in stats:
        return None
    gb = 1024 ** 3
    out = {"hbm_peak_gb": round(stats["peak_bytes_in_use"] / gb, 3)}
    if stats.get("bytes_limit"):
        out["hbm_limit_gb"] = round(stats["bytes_limit"] / gb, 3)
        out["hbm_headroom_gb"] = round(
            (stats["bytes_limit"] - stats["peak_bytes_in_use"]) / gb, 3)
    return out


class MetricsLogger:
    """Text + optional TensorBoard + JSONL metric sink."""

    def __init__(self, work_dir: str, use_tensorboard: bool = True,
                 interval: int = 50, use_wandb: bool = False,
                 wandb_init_kwargs: Optional[Dict[str, Any]] = None):
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.logger = get_logger(
            log_file=os.path.join(work_dir, "train.log"))
        self.interval = interval
        self.jsonl = open(os.path.join(work_dir, "metrics.jsonl"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(os.path.join(work_dir, "tb"))
            except Exception:
                self.logger.warning("tensorboardX unavailable; TB disabled")
        # reference WandbLoggerHook (`base_dino_detr_ssod_coco.py:258-268`):
        # gated on the wandb package actually being importable — absent in
        # this sandbox, so TB/JSONL remain the primary sinks
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                wandb.init(dir=work_dir, **(wandb_init_kwargs or {}))
                self.wandb = wandb
            except Exception:
                self.logger.warning("wandb unavailable; wandb disabled")
        self._t_last = time.perf_counter()
        self._step_last = 0

    def log_step(self, step: int, metrics: Dict[str, Any],
                 lr: Optional[float] = None, prefix: str = "train"):
        if step % self.interval != 0:
            return
        now = time.perf_counter()
        dt = (now - self._t_last) / max(step - self._step_last, 1)
        self._t_last, self._step_last = now, step
        scalars = {k: float(np.asarray(v)) for k, v in metrics.items()
                   if np.ndim(v) == 0}
        scalars["time"] = dt
        if lr is not None:
            scalars["lr"] = lr
        msg = f"Iter [{step}] " + " ".join(
            f"{k}: {v:.4f}" for k, v in sorted(scalars.items())
            if k in ("total_loss", "grad_norm", "time", "lr",
                     "sup_loss_cls", "unsup_loss_cls", "gmm_thr",
                     "pseudo_per_img"))
        self.logger.info(msg)
        self.jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
        self.jsonl.flush()
        if self.tb:
            for k, v in scalars.items():
                self.tb.add_scalar(f"{prefix}/{k}", v, step)
        if self.wandb:
            self.wandb.log({f"{prefix}/{k}": v for k, v in scalars.items()},
                           step=step)

    def log_eval(self, step: int, results: Dict[str, Any],
                 tag: str = "teacher"):
        msg = f"Eval[{tag}] iter {step}: " + " ".join(
            f"{k}={v:.4f}" for k, v in results.items()
            if isinstance(v, float))
        self.logger.info(msg)
        if self.tb:
            for k, v in results.items():
                if isinstance(v, float):
                    self.tb.add_scalar(f"eval_{tag}/{k}", v, step)
        if self.wandb:
            self.wandb.log({f"eval_{tag}/{k}": v for k, v in results.items()
                            if isinstance(v, float)}, step=step)

    def close(self):
        self.jsonl.close()
        if self.tb:
            self.tb.close()
        if self.wandb:
            self.wandb.finish()


def log_image_with_boxes(work_dir: str, tag: str, step: int,
                         image: np.ndarray, boxes: np.ndarray,
                         labels: np.ndarray, scores: np.ndarray = None,
                         keep: np.ndarray = None, class_names=None,
                         denormalize: bool = True) -> str:
    """Render boxes onto a (normalized) training image and save it under
    `work_dir/tag/step_N.jpg` — the file backend of the reference's
    `log_image_with_boxes` (detr_ssod/utils/logger.py:91-161), used to
    eyeball teacher pseudo labels during SSOD training.

    image: (H, W, 3) float normalized (ImageNet mean/std) or uint8 RGB.
    boxes: (P, 4) xyxy pixels; keep: (P,) bool mask of drawn boxes
    (kept pseudo labels); dropped-but-valid boxes are NOT drawn, matching
    the reference which renders the post-filter set.
    """
    import cv2
    if denormalize and image.dtype != np.uint8:
        from ..data.augment import IMG_MEAN, IMG_STD
        image = np.clip(np.asarray(image) * IMG_STD + IMG_MEAN,
                        0, 255).astype(np.uint8)
    img = cv2.cvtColor(image, cv2.COLOR_RGB2BGR).copy()
    n = len(boxes)
    keep = np.ones((n,), bool) if keep is None else np.asarray(keep)
    for i in range(n):
        if not keep[i]:
            continue
        x0, y0, x1, y1 = (int(v) for v in boxes[i])
        cv2.rectangle(img, (x0, y0), (x1, y1), (0, 255, 0), 2)
        name = (class_names[int(labels[i])] if class_names
                else str(int(labels[i])))
        txt = name if scores is None else f"{name}:{float(scores[i]):.2f}"
        cv2.putText(img, txt, (x0, max(y0 - 4, 0)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
    out_dir = os.path.join(work_dir, tag)
    os.makedirs(out_dir, exist_ok=True)
    out_file = os.path.join(out_dir, f"step_{step}.jpg")
    cv2.imwrite(out_file, img)
    return out_file


def weight_summary(params, tx_labels=None, lrs=None) -> str:
    """Parameter table: name, shape, #params (+ optimizer group), like the
    reference WeightSummary hook."""
    import jax
    rows = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        total += n
        rows.append((name, tuple(getattr(leaf, "shape", ())), n))
    lines = [f"{'name':<72}{'shape':<24}{'#params':>12}"]
    for name, shape, n in rows:
        lines.append(f"{name:<72}{str(shape):<24}{n:>12}")
    lines.append(f"TOTAL: {total:,} parameters")
    return "\n".join(lines)


class Profiler:
    """jax.profiler wrapper — the TPU-native replacement for the absent
    torch profiling (SURVEY.md §5 'Tracing/profiling: none')."""

    def __init__(self, work_dir: str):
        self.dir = os.path.join(work_dir, "profile")

    def trace(self, start_step: int, num_steps: int = 5):
        import jax
        return jax.profiler.trace(self.dir)
