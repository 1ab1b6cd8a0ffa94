"""Real-data smoke tests, gated on data presence (RUNBOOK.md §7).

These auto-activate the moment real COCO data / a reference checkpoint
exists (zero-egress sandbox: they skip in CI here, but are the day-1
validation on real hardware):

- SDT_COCO_ROOT: a COCO root with annotations/instances_val2017.json +
  val2017/ images -> drive 8 real images through the full host pipeline.
- SDT_REF_CKPT: a reference Semi-DETR .pth -> full converter coverage.
- both: one real batch through the predict program.
"""
import os

import numpy as np
import pytest

COCO_ROOT = os.environ.get("SDT_COCO_ROOT", "")
REF_CKPT = os.environ.get("SDT_REF_CKPT", "")

_VAL_ANN = os.path.join(COCO_ROOT, "annotations",
                        "instances_val2017.json") if COCO_ROOT else ""
_VAL_DIR = os.path.join(COCO_ROOT, "val2017") if COCO_ROOT else ""

needs_coco = pytest.mark.skipif(
    not (COCO_ROOT and os.path.isfile(_VAL_ANN) and os.path.isdir(_VAL_DIR)),
    reason="SDT_COCO_ROOT with val2017 not present")
needs_ckpt = pytest.mark.skipif(
    not (REF_CKPT and os.path.isfile(REF_CKPT)),
    reason="SDT_REF_CKPT not present")


def _val_dataset(n=8):
    from semi_detr_tpu.data.coco import COCO_CLASSES, CocoDataset
    ds = CocoDataset(_VAL_ANN, img_prefix=_VAL_DIR, classes=COCO_CLASSES,
                     filter_empty_gt=False, test_mode=True)
    assert len(ds) >= n
    return ds


@needs_coco
def test_real_pipeline_shapes():
    """8 real val images through decode/resize/pad/bucket: static
    shapes, f32 (or uint8 transfer mode) images, ids round-trip."""
    from semi_detr_tpu.data.pipeline import make_sup_batch

    ds = _val_dataset()
    rng = np.random.default_rng(0)
    bucket = (800, 1344)
    batch = make_sup_batch(rng, ds, list(range(8)), bucket, max_gt=100)
    assert batch["images"].shape[:1] == (8,)
    assert batch["images"].shape[1:3] == bucket
    assert batch["img_hw"].shape == (8, 2)
    assert (batch["img_hw"] <= np.asarray(bucket)).all()
    assert np.isfinite(np.asarray(batch["images"], np.float32)).all()


@needs_ckpt
def test_reference_checkpoint_full_coverage():
    """Convert the released reference checkpoint; every param leaf of a
    freshly-initialized flagship model must be covered (no random leaves
    left), and teacher/student both present for wrapper checkpoints."""
    import jax
    import jax.numpy as jnp
    import torch

    from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector
    from semi_detr_tpu.utils.torch_weights import convert_ssod_checkpoint

    sd = torch.load(REF_CKPT, map_location="cpu")
    sd = sd.get("state_dict", sd)
    out = convert_ssod_checkpoint(sd)
    model = DINODetector(DinoConfig())
    ref = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.asarray([[64, 64]], jnp.int32)))
    want = jax.tree_util.tree_structure(ref["params"])
    got = jax.tree_util.tree_structure(out["student"]["params"])
    assert want == got, "converted student tree != model tree"
    assert out["teacher_params"] is not None


@needs_coco
@needs_ckpt
def test_real_eval_batch():
    """One real val batch through the predict program with converted
    reference weights: finite scores, boxes inside the image."""
    import jax.numpy as jnp
    import torch

    from semi_detr_tpu.data.pipeline import make_sup_batch
    from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector
    from semi_detr_tpu.models.inference import make_predict_fn
    from semi_detr_tpu.utils.torch_weights import convert_ssod_checkpoint

    ds = _val_dataset(2)
    rng = np.random.default_rng(0)
    batch = make_sup_batch(rng, ds, [0, 1], (800, 1344), max_gt=100)

    sd = torch.load(REF_CKPT, map_location="cpu")
    out = convert_ssod_checkpoint(sd.get("state_dict", sd))
    model = DINODetector(DinoConfig())
    predict = make_predict_fn(model, use_nms=False)
    dets = predict({"params": out["teacher_params"]},
                   jnp.asarray(batch["images"]),
                   jnp.asarray(batch["img_hw"]))
    scores = np.asarray(jax.tree_util.tree_leaves(dets)[0])
    assert np.isfinite(scores).all()
