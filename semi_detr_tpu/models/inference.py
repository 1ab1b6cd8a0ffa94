"""Test-time decode + batched evaluation loop (teacher AND student).

Behavior parity with the reference eval path (SURVEY.md §3.4):
* post-warm-up decode = top-300 of the flattened (query x class) sigmoid
  scores (`dino_detr_ssod_head.py:1400-1412`);
* warm-up / pseudo-label decode = multiclass NMS (score_thr .01, iou .6,
  max 300) (`:1368-1399`) — selected by `curr_step` exactly like
  `tools/test.py:235-241` parses the checkpoint iteration;
* boxes are scaled by the valid image extent and rescaled to original
  image coordinates (rescale=True semantics);
* `SubModulesDistEvalHook` parity: `evaluate` runs BOTH the teacher and
  the student params over the same loader
  (`submodules_evaluation.py:71-101`).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import boxes as box_ops
from ..ops.nms import multiclass_nms
from .dino_head import DINODetector


@partial(jax.jit, static_argnames=("max_dets",))
def decode_topk(cls_logits, coords, img_hw, max_dets: int = 300):
    """Top-k over flattened query x class scores; one image per row.

    cls_logits (B, nq, K); coords (B, nq, 4) normalized cxcywh.
    Returns boxes (B, D, 4) xyxy ABS (valid-extent coords), scores, labels.
    """
    b, nq, k = cls_logits.shape
    max_dets = min(max_dets, nq * k)

    def per_image(logits, coord, hw):
        scores = jax.nn.sigmoid(logits).reshape(-1)
        top_s, top_i = jax.lax.top_k(scores, max_dets)
        q = top_i // k
        lbl = (top_i % k).astype(jnp.int32)
        wh = jnp.asarray([hw[1], hw[0], hw[1], hw[0]], jnp.float32)
        bx = box_ops.cxcywh_to_xyxy(coord[q]) * wh
        bx = jnp.stack([
            jnp.clip(bx[:, 0], 0, hw[1]), jnp.clip(bx[:, 1], 0, hw[0]),
            jnp.clip(bx[:, 2], 0, hw[1]), jnp.clip(bx[:, 3], 0, hw[0]),
        ], -1)
        return bx, top_s, lbl

    return jax.vmap(per_image)(cls_logits, coords,
                               img_hw.astype(jnp.float32))


@partial(jax.jit, static_argnames=("max_dets",))
def decode_nms(cls_logits, coords, img_hw, max_dets: int = 300):
    """Warm-up / pseudo-label decode: multiclass NMS path."""
    def per_image(logits, coord, hw):
        scores = jax.nn.sigmoid(logits)
        boxes = jnp.clip(box_ops.cxcywh_to_xyxy(coord), 0.0, 1.0)
        nms = multiclass_nms(boxes, scores, 0.01, 0.6, max_dets, 2000)
        wh = jnp.asarray([hw[1], hw[0], hw[1], hw[0]], jnp.float32)
        s = jnp.where(nms["valid"], nms["scores"], 0.0)
        return nms["boxes"] * wh, s, nms["labels"]

    return jax.vmap(per_image)(cls_logits, coords,
                               img_hw.astype(jnp.float32))


_PREDICT_CACHE: Dict[Tuple, object] = {}


def make_predict_fn(detector: DINODetector, use_nms: bool = False,
                    max_dets: int = 300):
    """Returns jitted predict(variables, images, img_hw) ->
    (boxes, scores, labels).

    Memoized on (model config, decode mode): a fresh @jax.jit closure per
    call would re-trace/re-compile the full forward at EVERY periodic
    eval (x2 for teacher+student) across a 120k-step run. Params are an
    argument, so teacher and student share one compiled program."""
    key = (detector.cfg, use_nms, max_dets)
    fn = _PREDICT_CACHE.get(key)
    if fn is not None:
        return fn

    @jax.jit
    def predict(variables, images, img_hw):
        out = detector.apply(variables, images, img_hw)
        cls, coord = out["cls"][-1], out["coord"][-1]
        if use_nms:
            return decode_nms(cls, coord, img_hw, max_dets)
        return decode_topk(cls, coord, img_hw, max_dets)

    _PREDICT_CACHE[key] = predict
    return predict


def run_eval(predict_fn, variables, batches: Iterable[Dict],
             score_thr: float = 0.0, mesh=None) -> Dict[int, Tuple]:
    """Run inference over batches (from data.pipeline.make_test_batch) and
    return {image_id: (boxes_orig_xyxy, scores, labels)} rescaled to the
    ORIGINAL image frame (rescale=True).

    mesh: shard each batch over the mesh's 'data' axis so periodic eval
    uses the whole slice (the reference's `multi_gpu_test` sharding,
    detr_od/apis/test.py:70-191; our outputs come back as global arrays,
    so no result-collection collective is needed)."""
    sharding = None
    if mesh is not None and jax.process_count() == 1:
        # multi-host: a process-spanning mesh isn't addressable for
        # device_put of host batches — fall back to the replicated
        # (per-host redundant) eval, which is the reference DistEvalHook
        # behavior minus its rank-sliced dataset
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P("data"))
    results = {}
    for batch in batches:
        images, img_hw = batch["images"], batch["img_hw"]
        if sharding is not None:
            images = jax.device_put(images, sharding)
            img_hw = jax.device_put(img_hw, sharding)
        boxes, scores, labels = jax.device_get(predict_fn(
            variables, images, img_hw))
        sf = batch["scale_factors"]               # (B, 2) per-axis
        for i, img_id in enumerate(batch["image_ids"]):
            keep = scores[i] > score_thr
            results[int(img_id)] = (
                boxes[i][keep] / np.tile(sf[i], 2), scores[i][keep],
                labels[i][keep])
    return results


def gather_results(results: Dict[int, Tuple], max_dets: int = 300
                   ) -> Dict[int, Tuple]:
    """All-gather per-image eval results across processes (multi-host
    rank-sliced eval — the reference's `collect_results_gpu`,
    detr_od/apis/test.py:152-191, as ONE host-side allgather of padded
    fixed-shape arrays instead of its pickle-shard dance).

    Every process passes ITS images' {image_id: (boxes, scores, labels)};
    every process returns the union. No-op on single-process."""
    if jax.process_count() == 1:
        return results
    from jax.experimental import multihost_utils as mh

    ids = sorted(results)
    counts = np.asarray(mh.process_allgather(
        jnp.asarray(len(ids), jnp.int32)))
    m = int(counts.max())
    img_ids = np.full((m,), -1, np.int32)   # COCO ids < 2^31; x64 is off
    ndet = np.zeros((m,), np.int32)
    boxes = np.zeros((m, max_dets, 4), np.float32)
    scores = np.zeros((m, max_dets), np.float32)
    labels = np.zeros((m, max_dets), np.int32)
    for i, iid in enumerate(ids):
        b, s, l = results[iid]
        k = min(len(s), max_dets)
        img_ids[i], ndet[i] = iid, k
        boxes[i, :k], scores[i, :k], labels[i, :k] = b[:k], s[:k], l[:k]
    g = mh.process_allgather({"ids": img_ids, "n": ndet, "b": boxes,
                              "s": scores, "l": labels}, tiled=False)
    merged: Dict[int, Tuple] = {}
    gi, gn = np.asarray(g["ids"]), np.asarray(g["n"])
    gb, gs, gl = np.asarray(g["b"]), np.asarray(g["s"]), np.asarray(g["l"])
    for p in range(gi.shape[0]):
        for r in range(gi.shape[1]):
            if gi[p, r] >= 0:
                k = gn[p, r]
                merged[int(gi[p, r])] = (gb[p, r, :k], gs[p, r, :k],
                                         gl[p, r, :k])
    return merged


def evaluate_detector(detector: DINODetector, variables, dataset,
                      batch_size: int = 4, use_nms: bool = False,
                      bucket=(800, 1344), test_scale=None,
                      num_classes: int = 80,
                      class_names=None, mesh=None) -> Dict[str, float]:
    """Full COCO-mAP eval of one parameter set over a CocoDataset.

    mesh: data-shard eval batches across the slice (batch_size rounds up
    to a multiple of the data-axis size; the tail pads by repeating the
    last image, whose duplicate results overwrite the same image_id)."""
    from ..data.coco_eval import coco_map
    from ..data.pipeline import make_test_batch

    if mesh is not None:
        n = mesh.shape["data"]
        batch_size = -(-batch_size // n) * n

    predict = make_predict_fn(detector, use_nms)

    def batches():
        # group by aspect-ratio flag so each batch pads to one
        # orientation's bucket (portrait images transpose the bucket)
        h, w = bucket
        land = (h, w) if w >= h else (w, h)
        flags = np.asarray(dataset.flags)
        for f, bkt in ((1, land), (0, (land[1], land[0]))):
            ids = np.nonzero(flags == f)[0]
            for s in range(0, len(ids), batch_size):
                idx = [int(i) for i in ids[s:s + batch_size]]
                idx = idx + [idx[-1]] * (batch_size - len(idx))
                yield make_test_batch(dataset, idx, bkt, scale=test_scale)

    nproc = jax.process_count()
    if nproc > 1:
        # rank-sliced eval (reference multi_gpu_test: each rank infers a
        # disjoint dataset slice, results gathered to every host)
        pidx = jax.process_index()
        my = (b for i, b in enumerate(batches()) if i % nproc == pidx)
        dets = gather_results(run_eval(predict, variables, my))
    else:
        dets = run_eval(predict, variables, batches(), mesh=mesh)
    gts = {}
    for rec in dataset.records:
        ig = np.zeros(len(rec.boxes), bool)
        areas = getattr(rec, "areas", np.zeros(0))
        ig_areas = getattr(rec, "areas_ignore", np.zeros(0))
        if len(rec.boxes_ignore):
            boxes = np.concatenate([rec.boxes, rec.boxes_ignore])
            labels = np.concatenate([rec.labels, rec.labels_ignore])
            ig = np.concatenate(
                [ig, np.ones(len(rec.boxes_ignore), bool)])
            areas = (np.concatenate([areas, ig_areas])
                     if len(areas) == len(rec.boxes)
                     and len(ig_areas) == len(rec.boxes_ignore) else None)
        else:
            boxes, labels = rec.boxes, rec.labels
            if len(areas) != len(boxes):
                areas = None
        # areas = COCO ann['area'] when the dataset carries it (s/m/l
        # bucketing per the protocol); bbox-area fallback inside coco_map
        gts[rec.id] = ((boxes, labels, ig) if areas is None
                       else (boxes, labels, ig, areas))
    return coco_map(dets, gts, num_classes, class_names)


def evaluate_teacher_and_student(detector: DINODetector, state, dataset,
                                 **kw) -> Dict[str, Dict[str, float]]:
    """SubModulesDistEvalHook parity: evaluate both EMA teacher and
    student."""
    det_params = (state.params["detector"]
                  if isinstance(state.params, dict)
                  and "detector" in state.params else state.params)
    out = {"student": evaluate_detector(
        detector, {"params": det_params,
                   "batch_stats": state.batch_stats}, dataset, **kw)}
    if state.teacher_params is not None:
        out["teacher"] = evaluate_detector(
            detector, {"params": state.teacher_params,
                       "batch_stats": state.batch_stats}, dataset, **kw)
    return out
