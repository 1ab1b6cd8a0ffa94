"""Synthetic COCO dataset generator for smoke tests and demos.

One bright rectangle per image on dark noise — trivially learnable, so
an overfit run validates the full train -> eval -> checkpoint pipeline
(used by tests/test_multidevice_and_e2e.py and the verify skill; the
reference has no analog, its tests rely on downloaded COCO).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Sequence, Tuple


def write_synthetic_coco(root: str, n: int = 8,
                         hw: Tuple[int, int] = (96, 128), seed: int = 0,
                         class_name: str = "person",
                         splits: Dict[str, Sequence[int]] = None,
                         n_classes: int = 1, max_boxes: int = 1,
                         distractors: int = 0):
    """Write images + annotation json(s) under `root`.

    splits: {name: image indices (0-based)} -> writes `<name>.json` per
    split; None -> one `ann.json` with all images. Returns
    (paths dict or single path, image dir).

    n_classes/max_boxes: defaults reproduce the original single-box
    single-class scene. With max_boxes > 1 each image gets 1..max_boxes
    rectangles (occluded regions are still annotated by their full box,
    like real COCO amodal-ish boxes); with n_classes > 1 each class has
    a distinct fill color so the classification task is learnable.

    distractors > 0: each image additionally gets 0..distractors
    UNANNOTATED clutter elements — ellipses and thin bars in
    palette-adjacent (jittered) colors, plus per-box color jitter and
    speckle on the annotated rectangles. This keeps the task learnable
    while denying the teacher a wall of max-confidence detections, so a
    rehearsal's pseudo_per_img reflects a COCO-like distribution
    instead of pinning at the max_pseudo cap (round-4 verdict #5).
    """
    import cv2
    import numpy as np

    rs = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    h, w = hw
    # distinct, bright per-class colors (BGR); class 0 keeps the
    # original red so old fixtures render identically
    palette = [(220, 60, 60), (60, 220, 60), (60, 60, 220),
               (220, 220, 60), (220, 60, 220), (60, 220, 220)]
    if n_classes > len(palette):
        # color IS the class signal — aliasing colors would make the
        # classification task silently unlearnable
        raise ValueError(
            f"n_classes={n_classes} > {len(palette)} distinct colors")
    images, anns = [], []
    aid = 0
    for i in range(1, n + 1):
        img = (rs.rand(h, w, 3) * 40).astype(np.uint8)
        if distractors:
            for _ in range(int(rs.randint(0, distractors + 1))):
                col = np.clip(np.asarray(
                    palette[int(rs.randint(0, len(palette)))], np.int32)
                    + rs.randint(-90, 90, 3), 0, 255).tolist()
                cx, cy = int(rs.uniform(0, w)), int(rs.uniform(0, h))
                if rs.rand() < 0.5:     # ellipse blob
                    ax = (int(rs.uniform(0.03 * w, 0.12 * w)),
                          int(rs.uniform(0.03 * h, 0.12 * h)))
                    cv2.ellipse(img, (cx, cy), ax,
                                float(rs.uniform(0, 180)), 0, 360,
                                col, -1)
                else:                   # thin bar
                    bw_ = int(rs.uniform(0.15 * w, 0.4 * w))
                    bh_ = max(int(rs.uniform(0.01 * h, 0.04 * h)), 1)
                    if rs.rand() < 0.5:
                        bw_, bh_ = bh_, bw_
                    x0 = max(min(cx, w - bw_), 0)
                    y0 = max(min(cy, h - bh_), 0)
                    img[y0:y0 + bh_, x0:x0 + bw_] = col
        k = 1 if max_boxes <= 1 else int(rs.randint(1, max_boxes + 1))
        for _ in range(k):
            bw = int(rs.uniform(0.22 * w, 0.36 * w))
            bh = int(rs.uniform(0.25 * h, 0.42 * h))
            x = int(rs.uniform(0, w - bw))
            y = int(rs.uniform(0, h - bh))
            # no RNG draw when single-class: keeps the default fixtures'
            # random stream (and thus pixels) byte-identical to before
            cls = 0 if n_classes == 1 else int(rs.randint(0, n_classes))
            fill = np.asarray(palette[cls % len(palette)], np.int32)
            if distractors:
                # jitter + speckle: same class color signal, less
                # saturating teacher confidence
                fill = np.clip(fill + rs.randint(-35, 35, 3), 0, 255)
                patch = np.clip(
                    fill[None, None] + rs.randint(-25, 25, (bh, bw, 3)),
                    0, 255).astype(np.uint8)
                img[y:y + bh, x:x + bw] = patch
            else:
                img[y:y + bh, x:x + bw] = fill.tolist()
            aid += 1
            anns.append({"id": aid, "image_id": i, "category_id": cls + 1,
                         "bbox": [x, y, bw, bh], "area": bw * bh,
                         "iscrowd": 0})
        cv2.imwrite(os.path.join(img_dir, f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"{i}.jpg", "width": w,
                       "height": h})
    cats = [{"id": c + 1, "name": class_name if c == 0 else f"class{c}"}
            for c in range(n_classes)]

    def dump(name, idx):
        sel = [images[j] for j in idx]
        ids = {im["id"] for im in sel}
        sub = {"images": sel,
               "annotations": [a for a in anns if a["image_id"] in ids],
               "categories": cats}
        path = os.path.join(root, f"{name}.json")
        with open(path, "w") as f:
            json.dump(sub, f)
        return path

    if splits is None:
        return dump("ann", range(n)), img_dir
    return {name: dump(name, idx) for name, idx in splits.items()}, img_dir


def synthetic_ssod_batch(n_sup: int, n_unsup: int, h: int, w: int,
                         max_gt: int, gt_per_image: int = 8, seed: int = 0):
    """Random SSOD recipe batch at given shapes (benchmarks, smoke tests).

    Mirrors the train-loop batch layout (`train/loop.py:batches`): sup
    images with packed GT, unsup teacher/weak + student/strong views with
    identity transform matrices (the model cost is view-content
    independent, so random pixels measure the real step).
    """
    import numpy as np
    rs = np.random.RandomState(seed)

    def imgs(n):
        return rs.randn(n, h, w, 3).astype(np.float32) * 0.5

    def hws(n):
        return np.tile(np.asarray([[h, w]], np.int32), (n, 1))

    g = max_gt
    cxy = rs.uniform(0.3, 0.7, (n_sup, g, 2)).astype(np.float32)
    wh = rs.uniform(0.1, 0.3, (n_sup, g, 2)).astype(np.float32)
    eye = np.tile(np.eye(3, dtype=np.float32)[None], (n_unsup, 1, 1))
    return {
        "sup": {
            "images": imgs(n_sup), "img_hw": hws(n_sup),
            "gt": {"boxes": np.concatenate([cxy, wh], -1),
                   "labels": rs.randint(0, 80, (n_sup, g)).astype(np.int32),
                   "valid": np.tile(np.arange(g)[None] < gt_per_image,
                                    (n_sup, 1))},
        },
        "unsup": {
            "student_images": imgs(n_unsup), "student_hw": hws(n_unsup),
            "student_tmat": eye,
            "teacher_images": imgs(n_unsup), "teacher_hw": hws(n_unsup),
            "teacher_tmat": eye.copy(),
        },
    }
