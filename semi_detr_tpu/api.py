"""High-level user API — init_detector / inference_detector parity.

Mirrors the reference apis (`detr_ssod/apis/inference.py:11-82`:
init_detector builds the wrapper + loads a checkpoint; inference_detector
runs the test pipeline on one image; save_result renders boxes).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def init_detector(config_path: str, checkpoint_dir: str,
                  cfg_options: Optional[dict] = None):
    """Build the detector + load a checkpoint. Returns a `Predictor`."""
    import jax
    import jax.numpy as jnp
    import optax

    from .data.coco import COCO_CLASSES, VOC_CLASSES
    from .models.dino_head import DinoConfig, DINODetector
    from .models.ssod import Projector, SsodConfig
    from .train.checkpoint import CheckpointManager
    from .train.ssod import init_ssod_state
    from .utils.config import load_config

    cfg = load_config(config_path, cfg_options)
    m = dict(cfg["model"])
    m.pop("type", None)
    if isinstance(m.get("dtype"), str):
        m["dtype"] = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                      "bf16": jnp.bfloat16}[m["dtype"]]
    dcfg = DinoConfig(**m)
    s = dict(cfg.get("ssod", {}))
    s.pop("type", None)
    scfg = SsodConfig(dino=dcfg, **s)

    detector = DINODetector(dcfg)
    template = init_ssod_state(
        detector, Projector(dcfg.d_model), optax.identity(), scfg,
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64, 64]], jnp.int32))
    from .train.checkpoint import duplicate_into_teacher
    if checkpoint_dir.endswith((".pth", ".pt")):
        # reference/torch checkpoint: convert on load (teacher/student
        # duplication rule handled by the converter). The step is parsed
        # from an "iter_XXXX" filename like the reference tools/test.py
        # (:235-241); unparseable names assume a finished run (top-k
        # decode path).
        import re

        from .train.checkpoint import apply_warm_start, load_warm_start
        state = apply_warm_start(
            template, load_warm_start(checkpoint_dir, dcfg.n_heads),
            ssod=True)
        m = re.search(r"iter_(\d+)", os.path.basename(checkpoint_dir))
        step = int(m.group(1)) if m else scfg.warm_up_step
        state = state.replace(step=jnp.asarray(step, jnp.int32))
    else:
        state = CheckpointManager(checkpoint_dir).restore(template)
        if not (isinstance(state.params, dict)
                and "detector" in state.params):
            # plain supervised checkpoint: wrap and duplicate into the
            # teacher (the reference's state_dict duplication rule,
            # dino_detr_ssod.py:963-968)
            state = state.replace(params={
                "detector": state.params,
                "projector": template.params["projector"]})
            state = duplicate_into_teacher(state)
    names = (VOC_CLASSES if cfg["data"].get("classes") == "voc"
             else COCO_CLASSES)
    return Predictor(detector, state, scfg, names)


class Predictor:
    """Single/batch image inference on the TEACHER (reference test.py
    default), NMS-vs-topk decode selected by the checkpoint step."""

    def __init__(self, detector, state, scfg, class_names,
                 inference_on: str = "teacher", use_nms=None):
        from .models.inference import make_predict_fn
        self.detector = detector
        self.state = state
        self.cfg = scfg
        self.class_names = class_names
        params = (state.teacher_params if inference_on == "teacher"
                  and state.teacher_params is not None
                  else (state.params["detector"]
                        if isinstance(state.params, dict)
                        and "detector" in state.params else state.params))
        self.variables = {"params": params,
                          "batch_stats": state.batch_stats}
        if use_nms is None:
            # step-vs-warm_up heuristic matches the reference tools/test
            # protocol for SSOD checkpoints; for supervised checkpoints
            # (whose step counter is unrelated to the SSOD stages) pass
            # use_nms explicitly: True for O2M warm-up-branch training,
            # False for the standard top-k test protocol
            use_nms = int(state.step) < scfg.warm_up_step
        self._predict = make_predict_fn(detector, use_nms=use_nms)

    def __call__(self, image: np.ndarray, score_thr: float = 0.3,
                 bucket: Tuple[int, int] = (800, 1344),
                 test_scale: Optional[Tuple[int, int]] = None):
        """image: (H, W, 3) uint8 RGB. Returns (boxes xyxy in original
        image coords, scores, labels) above score_thr."""
        import jax
        from .data.augment import TEST_SCALE, make_sample, test_resize
        from .data.pipeline import pack

        s = test_resize(make_sample(image), test_scale or TEST_SCALE)
        # orient the bucket like the eval loop does per aspect flag —
        # a portrait image keep-ratio-resizes taller than the landscape
        # bucket and would fail pack()'s fit assert
        h, w = s.img.shape[:2]
        bh, bw = bucket
        land = (bh, bw) if bw >= bh else (bw, bh)
        bucket = land if w >= h else (land[1], land[0])
        p = pack(s, bucket, 1)
        boxes, scores, labels = jax.device_get(self._predict(
            self.variables, p.image[None], p.hw[None]))
        keep = scores[0] > score_thr
        return (boxes[0][keep] / np.tile(p.scale_factor, 2),
                scores[0][keep], labels[0][keep])


def inference_detector(predictor: Predictor, image, **kw):
    return predictor(image, **kw)


def save_result(image: np.ndarray, result, class_names, out_file: str,
                score_thr: float = 0.3):
    """Render detections onto the image and save (reference save_result)."""
    import cv2
    boxes, scores, labels = result
    img = cv2.cvtColor(image, cv2.COLOR_RGB2BGR).copy()
    for b, s, l in zip(boxes, scores, labels):
        if s < score_thr:
            continue
        x0, y0, x1, y1 = map(int, b)
        cv2.rectangle(img, (x0, y0), (x1, y1), (0, 255, 0), 2)
        cv2.putText(img, f"{class_names[int(l)]}:{s:.2f}",
                    (x0, max(y0 - 4, 0)), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    (0, 255, 0), 1)
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    cv2.imwrite(out_file, img)
    return out_file
