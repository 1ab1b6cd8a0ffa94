"""Host-side batching to STATIC shapes: bucketed padding + GT packing.

TPU-native replacement for the reference's dynamic-shape collate
(`detr_ssod/datasets/builder.py:94-176` pads each batch to its max shape,
a new shape every step -> would recompile XLA every iteration). Here:

* images are padded to a fixed bucket (H, W) chosen from a small static
  set, so only a handful of programs are ever compiled;
* GT is packed to `max_gt` slots with a validity mask (the model's loss is
  mask-driven, `models/criterion.py`);
* each sample carries its valid (h, w) extent — the model consumes it the
  same way the reference consumes padding masks
  (`dino_detr_head.py:316-325`);
* boxes are converted to normalized cxcywh over the VALID extent, the
  coordinate system of the DETR loss (reference `_get_target_single`
  factor math).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

# Ship raw uint8 pixels to the device and normalize there
# (models/dino_head.py:prepare_images) — 4x less host->device traffic
# than normalized f32 (the SSOD recipe step moves 9 bucket images), and
# the host skips a 13 MB/image f32 write. Numerics match the host path
# to 1 ulp (f32 (x - mean)/std on device; the C++ path multiplies by
# 1/std) and pad rows/cols re-zero via the img_hw mask exactly as the
# host pads after normalizing. SDT_HOST_NORMALIZE=1 restores host f32.
_DEVICE_NORMALIZE = os.environ.get("SDT_HOST_NORMALIZE", "0") != "1"

from .augment import (Sample, make_sample, normalize_image, strong_augment,
                      sup_augment, test_resize, weak_augment)

# buckets covering the 11 training scales x max long side 1333 (H, W and
# W, H orientations); chosen so every resized image fits with <13% padding
DEFAULT_BUCKETS: Tuple[Tuple[int, int], ...] = (
    (512, 672), (672, 512),
    (544, 912), (912, 544),
    (704, 1184), (1184, 704),
    (800, 1344), (1344, 800),
)


# training bucket short-sides for multi-bucket mode: the 11 reference
# scales (480..800 x 1333) quantize onto 3 bucket heights -> 6 programs
# (3 sizes x 2 orientations) instead of padding everything to 800x1344
# (~15-25% padded-area saving, ROADMAP P1)
BUCKET_SHORTS: Tuple[int, ...] = (544, 672, 800)


def _quantize_short(short: int, base_bucket) -> int:
    """Bucket short-side for a scale's short side.

    Fallback = the configured bucket's short side: custom scale sets
    with short > max(BUCKET_SHORTS) must still get a bucket that FITS
    the resize (keep-ratio resize short side <= scale short <= bh)."""
    bh = next((s for s in BUCKET_SHORTS if s >= short), min(base_bucket))
    return min(bh, min(base_bucket))


def pick_step_bucket(bucket_rng, scales, base_bucket, flag):
    """Multi-bucket training: draw ONE scale for this step, quantize it to
    a bucket, and return every scale in that bucket's quantization class.

    The reference draws a resize scale PER IMAGE, uniform over the 11
    scales (`rand_aug.py:880-950` RandResize); a static-shape batch must
    instead share one bucket per step. Drawing the bucket by a uniform
    scale draw and then letting each image draw uniformly from the scales
    that QUANTIZE to that bucket is the unique two-stage scheme whose
    per-image scale marginal is exactly the reference's uniform
    distribution (the class sizes are the bucket probabilities), while
    keeping the compiled-program count at (3 sizes x 2 orientations).
    `bucket_rng` must be advanced exactly once per step so multi-host
    shards agree.

    Returns (class_scales, (H, W) bucket) with the bucket oriented by
    `flag` (1 = landscape). Per-image diversity happens downstream:
    `make_*_batch` passes `class_scales` to the aug pipeline, whose
    `rand_resize` draws per image.
    """
    scale = tuple(scales[int(bucket_rng.integers(len(scales)))])
    long_side = max(base_bucket)
    bh = _quantize_short(min(scale), base_bucket)
    class_scales = [tuple(s) for s in scales
                    if _quantize_short(min(s), base_bucket) == bh]
    bucket = (bh, long_side) if flag == 1 else (long_side, bh)
    return class_scales, bucket


def pick_bucket(h: int, w: int,
                buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS
                ) -> Tuple[int, int]:
    """Smallest bucket that contains (h, w)."""
    best = None
    for bh, bw in buckets:
        if bh >= h and bw >= w:
            area = bh * bw
            if best is None or area < best[0]:
                best = (area, (bh, bw))
    if best is None:  # fall back to the largest
        return max(buckets, key=lambda b: b[0] * b[1])
    return best[1]


@dataclass
class PackedImage:
    image: np.ndarray       # (BH, BW, 3) padded: raw uint8 (device-side
                            # normalize, the default) or normalized float32
    hw: np.ndarray          # (2,) int32 valid extent
    boxes: np.ndarray       # (G, 4) float32 normalized cxcywh
    labels: np.ndarray      # (G,) int32
    valid: np.ndarray       # (G,) bool
    matrix: np.ndarray      # (3, 3) float32 transform matrix
    image_id: int = -1
    scale_factor: np.ndarray = None   # (2,) per-axis (fx, fy)


def pack(sample: Sample, bucket: Tuple[int, int], max_gt: int,
         image_id: int = -1) -> PackedImage:
    h, w = sample.img.shape[:2]
    bh, bw = bucket
    assert h <= bh and w <= bw, ((h, w), bucket)
    from .. import native
    from .augment import IMG_MEAN, IMG_STD
    if _DEVICE_NORMALIZE and sample.img.dtype == np.uint8:
        img = np.zeros((bh, bw, 3), np.uint8)
        img[:h, :w] = sample.img
    elif native.available() and sample.img.dtype == np.uint8:
        img = native.normalize_pad(sample.img, (bh, bw), IMG_MEAN, IMG_STD)
    else:
        img = np.zeros((bh, bw, 3), np.float32)
        img[:h, :w] = normalize_image(sample.img)

    n = min(len(sample.boxes), max_gt)
    boxes = np.zeros((max_gt, 4), np.float32)
    labels = np.zeros((max_gt,), np.int32)
    valid = np.zeros((max_gt,), bool)
    if n:
        b = sample.boxes[:n]
        cx = (b[:, 0] + b[:, 2]) / 2 / w
        cy = (b[:, 1] + b[:, 3]) / 2 / h
        bw_ = (b[:, 2] - b[:, 0]) / w
        bh_ = (b[:, 3] - b[:, 1]) / h
        boxes[:n] = np.stack([cx, cy, bw_, bh_], 1)
        labels[:n] = sample.labels[:n]
        valid[:n] = True
    return PackedImage(
        image=img, hw=np.asarray([h, w], np.int32), boxes=boxes,
        labels=labels, valid=valid,
        matrix=sample.matrix.astype(np.float32), image_id=image_id,
        scale_factor=sample.scale_factor)


def _stack(packed: List[PackedImage]) -> Dict[str, np.ndarray]:
    return {
        "images": np.stack([p.image for p in packed]),
        "img_hw": np.stack([p.hw for p in packed]),
        "gt": {
            "boxes": np.stack([p.boxes for p in packed]),
            "labels": np.stack([p.labels for p in packed]),
            "valid": np.stack([p.valid for p in packed]),
        },
        "tmat": np.stack([p.matrix for p in packed]),
        "image_ids": np.asarray([p.image_id for p in packed], np.int64),
    }


def make_sup_batch(rng: np.random.Generator, dataset, indices,
                   bucket: Tuple[int, int], max_gt: int = 100,
                   augment=sup_augment, scales=None) -> Dict:
    """Supervised batch: one shared bucket per batch (static shapes)."""
    from .augment import COCO_SCALES
    scales = COCO_SCALES if scales is None else scales
    packed = []
    for i in indices:
        rec = dataset[i]
        s = make_sample(dataset.load_image(i), rec.boxes, rec.labels)
        s = augment(rng, s, scales)
        packed.append(pack(s, bucket, max_gt, rec.id))
    out = _stack(packed)
    return {"images": out["images"], "img_hw": out["img_hw"],
            "gt": out["gt"], "image_ids": out["image_ids"]}


def make_unsup_batch(rng: np.random.Generator, dataset, indices,
                     bucket: Tuple[int, int], max_gt: int = 100,
                     scales=None) -> Dict:
    """Two views of the same images (reference MultiBranch,
    `rand_aug.py:952-965`): weak for the teacher, strong for the student,
    each with its transform matrix."""
    from .augment import COCO_SCALES
    scales = COCO_SCALES if scales is None else scales
    weak_p, strong_p = [], []
    for i in indices:
        rec = dataset[i]
        img = dataset.load_image(i)
        s0 = make_sample(img)  # unlabeled: no GT (PseudoSamples semantics)
        weak_p.append(pack(weak_augment(rng, s0, scales), bucket, max_gt,
                           rec.id))
        strong_p.append(pack(strong_augment(rng, s0, scales), bucket,
                             max_gt, rec.id))
    wk, st = _stack(weak_p), _stack(strong_p)
    return {
        "teacher_images": wk["images"], "teacher_hw": wk["img_hw"],
        "teacher_tmat": wk["tmat"],
        "student_images": st["images"], "student_hw": st["img_hw"],
        "student_tmat": st["tmat"],
        "image_ids": wk["image_ids"],
    }


def make_test_batch(dataset, indices, bucket: Tuple[int, int] = (800, 1344),
                    max_gt: int = 100, scale=None) -> Dict:
    packed = []
    for i in indices:
        rec = dataset[i]
        s = make_sample(dataset.load_image(i), rec.boxes, rec.labels)
        s = test_resize(s) if scale is None else test_resize(s, scale)
        packed.append(pack(s, bucket, max_gt, rec.id))
    out = _stack(packed)
    out["scale_factors"] = np.asarray(
        [p.scale_factor for p in packed], np.float32)
    return out
