"""Weak/strong augmentation pipelines with 3x3 transform-matrix recording.

Behavior parity with the reference SSOD pipelines
(`configs/detr_ssod/base_dino_detr_ssod_coco.py:6-198`,
`detr_ssod/datasets/pipelines/rand_aug.py`, `geo_utils.py:7-94`):

* weak  = RandResize(11 scales, 'value' mode, keep_ratio) + RandFlip(0.5)
* strong = weak + shuffled[OneOf(9 color ops), OneOf(translate_x |
  translate_y | rotate±30° | shear_x+shear_y ±30°)] + RandErase(1-5
  patches of (r*H, r*W), one ratio r per patch (squared=True draws a
  single ratio, NOT square pixels), 0-0.2 ratio, fill 125)
* sup = RandResize + RandFlip + OneOf(color)

Every geometric step composes its homogeneous matrix into
`transform_matrix` (new = T @ old, `geo_utils.py:14-21`), which the SSOD
wrapper uses to re-project pseudo boxes between views.

Implemented host-side in numpy/cv2/PIL (the reference augments on CPU
workers too); all randomness comes from an explicit np.random.Generator so
the pipeline is reproducible and shardable per host.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Sequence, Tuple

import numpy as np

COCO_SCALES: Tuple[Tuple[int, int], ...] = tuple(
    (s, 1333) for s in (480, 512, 544, 576, 608, 640, 672, 704, 736, 768,
                        800))
TEST_SCALE = (800, 1333)
IMG_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMG_STD = np.array([58.395, 57.12, 57.375], np.float32)
FILL = 125


@dataclass
class Sample:
    img: np.ndarray                 # (H, W, 3) uint8 RGB
    boxes: np.ndarray               # (n, 4) xyxy float32
    labels: np.ndarray              # (n,) int64
    matrix: np.ndarray              # (3, 3) float64 accumulated transform
    # per-axis (fx, fy): int-rounded keep-ratio resize makes nh/h differ
    # slightly from nw/w, and mmdet rescales by [fx, fy, fx, fy]
    scale_factor: np.ndarray = field(
        default_factory=lambda: np.ones(2, np.float32))


def _compose(sample: Sample, t: np.ndarray) -> np.ndarray:
    return t.astype(np.float64) @ sample.matrix


def _transform_boxes_np(boxes, mat, w, h, clip=True):
    if len(boxes) == 0:
        return boxes
    x0, y0, x1, y1 = boxes.T
    xs = np.stack([x0, x1, x0, x1], 1)          # (n, 4)
    ys = np.stack([y0, y1, y1, y0], 1)
    pts = np.stack([xs, ys, np.ones_like(xs)], 1)   # (n, 3, 4)
    out = mat[None] @ pts
    px, py = out[:, 0] / out[:, 2], out[:, 1] / out[:, 2]
    nb = np.stack([px.min(1), py.min(1), px.max(1), py.max(1)], 1)
    if clip:
        nb[:, 0::2] = np.clip(nb[:, 0::2], 0, w)
        nb[:, 1::2] = np.clip(nb[:, 1::2], 0, h)
    return nb.astype(np.float32)


def _filter_degenerate(s: Sample, min_size: float = 0.0) -> Sample:
    if len(s.boxes) == 0:
        return s
    keep = ((s.boxes[:, 2] - s.boxes[:, 0]) > min_size) & (
        (s.boxes[:, 3] - s.boxes[:, 1]) > min_size)
    return replace(s, boxes=s.boxes[keep], labels=s.labels[keep])


# ---------------------------------------------------------------- resize/flip

def rescale_size(h: int, w: int, scale: Tuple[int, int]) -> Tuple[int, int,
                                                                  float]:
    """mmdet keep_ratio rescale: factor = min(long/max, short/min)."""
    short, long_ = min(scale), max(scale)
    f = min(long_ / max(h, w), short / min(h, w))
    return int(h * f + 0.5), int(w * f + 0.5), f


def resize(sample: Sample, scale: Tuple[int, int]) -> Sample:
    import cv2
    h, w = sample.img.shape[:2]
    nh, nw, _ = rescale_size(h, w, scale)
    img = cv2.resize(sample.img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    fx, fy = nw / w, nh / h
    t = np.array([[fx, 0, 0], [0, fy, 0], [0, 0, 1]], np.float64)
    boxes = sample.boxes * np.array([fx, fy, fx, fy], np.float32)
    return replace(sample, img=img, boxes=boxes, matrix=_compose(sample, t),
                   scale_factor=sample.scale_factor
                   * np.array([fx, fy], np.float32))


def rand_resize(rng: np.random.Generator, sample: Sample,
                scales=COCO_SCALES) -> Sample:
    return resize(sample, scales[rng.integers(len(scales))])


def hflip(sample: Sample) -> Sample:
    h, w = sample.img.shape[:2]
    img = sample.img[:, ::-1]
    t = np.array([[-1, 0, w], [0, 1, 0], [0, 0, 1]], np.float64)
    if len(sample.boxes):
        b = sample.boxes.copy()
        b[:, [0, 2]] = w - sample.boxes[:, [2, 0]]
    else:
        b = sample.boxes
    return replace(sample, img=np.ascontiguousarray(img), boxes=b,
                   matrix=_compose(sample, t))


def rand_flip(rng, sample: Sample, p: float = 0.5) -> Sample:
    return hflip(sample) if rng.random() < p else sample


# ---------------------------------------------------------------- color ops

def _pil(img):
    from PIL import Image
    return Image.fromarray(img)


def apply_color_op(rng: np.random.Generator, sample: Sample) -> Sample:
    """OneOf the 9 color ops (incl. Identity), magnitude ~ U{1..9} on a
    0-10 scale (`rand_aug.py:59-61`)."""
    from PIL import ImageEnhance, ImageOps
    op = int(rng.integers(9))
    mag = int(rng.integers(1, 10))
    img = sample.img

    def enhance(enhancer):
        v = mag * 1.8 / 10 + 0.1
        return np.asarray(enhancer(_pil(img)).enhance(v), img.dtype)

    if op == 0:
        out = img
    elif op == 1:
        out = np.asarray(ImageOps.autocontrast(_pil(img)), img.dtype)
    elif op == 2:
        out = np.asarray(ImageOps.equalize(_pil(img)), img.dtype)
    elif op == 3:
        thr = min(int(mag * 256 / 10), 255)
        out = np.where(img < thr, img, 255 - img).astype(img.dtype)
    elif op == 4:
        out = enhance(ImageEnhance.Color)
    elif op == 5:
        out = enhance(ImageEnhance.Contrast)
    elif op == 6:
        out = enhance(ImageEnhance.Brightness)
    elif op == 7:
        out = enhance(ImageEnhance.Sharpness)
    else:
        bits = 4 - int(mag * 4 / 10)
        out = np.asarray(ImageOps.posterize(_pil(img), bits), img.dtype)
    return replace(sample, img=out)


# ---------------------------------------------------------------- geometric

def _warp(sample: Sample, t2x3: np.ndarray) -> Sample:
    import cv2
    h, w = sample.img.shape[:2]
    img = cv2.warpAffine(sample.img, t2x3, (w, h),
                         borderValue=(FILL, FILL, FILL))
    t3 = np.concatenate([t2x3, [[0, 0, 1]]], 0)
    boxes = _transform_boxes_np(sample.boxes, t3, w, h)
    s = replace(sample, img=img, boxes=boxes, matrix=_compose(sample, t3))
    return _filter_degenerate(s)


def translate(rng, sample: Sample, x_range=None, y_range=None) -> Sample:
    h, w = sample.img.shape[:2]
    dx = dy = 0.0
    if x_range is not None:
        dx = (rng.random() * (x_range[1] - x_range[0]) + x_range[0]) * w
    if y_range is not None:
        dy = (rng.random() * (y_range[1] - y_range[0]) + y_range[0]) * h
    t = np.array([[1, 0, dx], [0, 1, dy]], np.float64)
    return _warp(sample, t)


def rotate(rng, sample: Sample, angle_range=(-30, 30)) -> Sample:
    import cv2
    h, w = sample.img.shape[:2]
    angle = rng.random() * (angle_range[1] - angle_range[0]) + angle_range[0]
    center = ((w - 1) * 0.5, (h - 1) * 0.5)
    # mmcv.imrotate convention: positive angle = clockwise -> cv2 -angle
    t = cv2.getRotationMatrix2D(center, -angle, 1.0)
    return _warp(sample, t)


def shear(rng, sample: Sample, x_range=(-30, 30), y_range=(-30, 30)
          ) -> Sample:
    # reference applies shear_x then shear_y sequentially (config OneOf
    # entry is a 2-transform list); magnitudes in degrees -> tan
    for rg, horiz in ((x_range, True), (y_range, False)):
        deg = rng.random() * (rg[1] - rg[0]) + rg[0]
        m = np.tan(deg * np.pi / 180)
        t = (np.array([[1, m, 0], [0, 1, 0]], np.float64) if horiz
             else np.array([[1, 0, 0], [m, 1, 0]], np.float64))
        sample = _warp(sample, t)
    return sample


def apply_geometric_op(rng, sample: Sample) -> Sample:
    """OneOf: translate_x | translate_y | rotate | shear (x then y)."""
    op = int(rng.integers(4))
    if op == 0:
        return translate(rng, sample, x_range=(-0.1, 0.1))
    if op == 1:
        return translate(rng, sample, y_range=(-0.1, 0.1))
    if op == 2:
        return rotate(rng, sample)
    return shear(rng, sample)


def rand_erase(rng, sample: Sample, n_range=(1, 5), size=(0.0, 0.2)
               ) -> Sample:
    h, w = sample.img.shape[:2]
    img = sample.img.copy()
    n = int(rng.integers(n_range[0], n_range[1]))
    for _ in range(n):
        ratio = rng.random() * (size[1] - size[0]) + size[0]
        ph, pw = int(ratio * h), int(ratio * w)
        if w - pw <= 0 or h - ph <= 0:
            continue
        px = int(rng.integers(0, w - pw))
        py = int(rng.integers(0, h - ph))
        img[py:py + ph, px:px + pw] = FILL
    return replace(sample, img=img)


# ---------------------------------------------------------------- pipelines

def make_sample(img, boxes=None, labels=None) -> Sample:
    boxes = (np.zeros((0, 4), np.float32) if boxes is None
             else np.asarray(boxes, np.float32).reshape(-1, 4))
    labels = (np.zeros((0,), np.int64) if labels is None
              else np.asarray(labels, np.int64))
    return Sample(img=img, boxes=boxes, labels=labels,
                  matrix=np.eye(3, dtype=np.float64))


def weak_augment(rng, sample: Sample, scales=COCO_SCALES) -> Sample:
    return rand_flip(rng, rand_resize(rng, sample, scales))


def sup_augment(rng, sample: Sample, scales=COCO_SCALES) -> Sample:
    return apply_color_op(rng, weak_augment(rng, sample, scales))


def strong_augment(rng, sample: Sample, scales=COCO_SCALES) -> Sample:
    s = weak_augment(rng, sample, scales)
    # ShuffledSequential over [color, geometric]
    if rng.random() < 0.5:
        s = apply_geometric_op(rng, apply_color_op(rng, s))
    else:
        s = apply_color_op(rng, apply_geometric_op(rng, s))
    return rand_erase(rng, s)


def test_resize(sample: Sample, scale=TEST_SCALE) -> Sample:
    return resize(sample, scale)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 RGB -> float32 normalized (reference img_norm_cfg,
    `base_dino_detr_ssod_coco.py:4-5`)."""
    return (img.astype(np.float32) - IMG_MEAN) / IMG_STD
