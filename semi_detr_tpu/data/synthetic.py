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
                         splits: Dict[str, Sequence[int]] = None):
    """Write images + annotation json(s) under `root`.

    splits: {name: image indices (0-based)} -> writes `<name>.json` per
    split; None -> one `ann.json` with all images. Returns
    (paths dict or single path, image dir).
    """
    import cv2
    import numpy as np

    rs = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    h, w = hw
    images, anns = [], []
    for i in range(1, n + 1):
        img = (rs.rand(h, w, 3) * 40).astype(np.uint8)
        bw = int(rs.uniform(0.22 * w, 0.36 * w))
        bh = int(rs.uniform(0.25 * h, 0.42 * h))
        x = int(rs.uniform(0, w - bw))
        y = int(rs.uniform(0, h - bh))
        img[y:y + bh, x:x + bw] = (220, 60, 60)
        cv2.imwrite(os.path.join(img_dir, f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"{i}.jpg", "width": w,
                       "height": h})
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [x, y, bw, bh], "area": bw * bh,
                     "iscrowd": 0})
    cats = [{"id": 1, "name": class_name}]

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
