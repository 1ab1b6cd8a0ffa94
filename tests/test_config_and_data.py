"""Config system, dataset reader, split generator, sampler tests."""
import json
import os

import numpy as np
import pytest

from semi_detr_tpu.data.coco import CocoDataset
from semi_detr_tpu.data.pipeline import pack, pick_bucket
from semi_detr_tpu.data.augment import make_sample
from semi_detr_tpu.data.sampler import SemiBalanceSampler
from semi_detr_tpu.data.semi_split import split_coco
from semi_detr_tpu.utils.config import (apply_semi_wrapper, deep_merge,
                                        load_config, resolve_vars)


def _tiny_coco(n_img=6, n_ann_per=2):
    images, anns = [], []
    aid = 1
    for i in range(1, n_img + 1):
        images.append({"id": i, "file_name": f"{i}.jpg", "width": 100,
                       "height": 80})
        for j in range(n_ann_per):
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "bbox": [10 * j, 10, 20, 20], "area": 400,
                         "iscrowd": 0})
            aid += 1
    return {"images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "person"}]}


def test_coco_dataset_loading():
    ds = CocoDataset(_tiny_coco(), classes=("person",))
    assert len(ds) == 6
    assert ds[0].boxes.shape == (2, 4)
    assert (ds[0].labels == 0).all()
    assert ds[0].aspect_flag == 1  # w/h = 100/80 > 1


def test_semi_split_deterministic():
    coco = _tiny_coco(n_img=100)
    lab1, unl1 = split_coco(coco, percent=10, seed=3)
    lab2, _ = split_coco(coco, percent=10, seed=3)
    assert len(lab1["images"]) == 10
    assert len(unl1["images"]) == 90
    assert [im["id"] for im in lab1["images"]] == [
        im["id"] for im in lab2["images"]]
    assert len(unl1["annotations"]) == 0
    # labeled annotations belong to labeled images only
    lab_ids = {im["id"] for im in lab1["images"]}
    assert all(a["image_id"] in lab_ids for a in lab1["annotations"])


def test_sampler_ratio_and_determinism():
    s = SemiBalanceSampler(10, 40, [0] * 10, [0] * 40,
                           samples_per_batch=5, sample_ratio=(1, 4),
                           epoch_length=20, seed=5)
    batches = list(s.epoch(0))
    assert len(batches) == 20
    for sup, unsup, flag in batches:
        assert len(sup) == 1 and len(unsup) == 4
        assert sup.max() < 10 and unsup.max() < 40
        assert flag == 0          # all images portrait-flagged here
    batches2 = list(SemiBalanceSampler(
        10, 40, [0] * 10, [0] * 40, 5, (1, 4), 20, seed=5).epoch(0))
    assert all((a[0] == b[0]).all() and (a[1] == b[1]).all()
               for a, b in zip(batches, batches2))


def test_sampler_by_prob_reference_distribution():
    """Multinomial batch mixing (reference semi_sampler.py:113-135):
    n_sup ~ Binomial(batch, p_sup) with both sides clamped to >= 1.
    Asserts every batch keeps >= 1 sup and >= 1 unsup, fills the batch,
    and the empirical E[n_sup] matches the exact clamped-binomial mean."""
    from math import comb

    batch, p = 5, 1 / 5
    s = SemiBalanceSampler(10, 40, [0] * 10, [0] * 40,
                           samples_per_batch=batch, sample_ratio=(1, 4),
                           epoch_length=3000, seed=11, by_prob=True)
    n_sups = []
    for sup, unsup, _ in s.epoch(0):
        assert 1 <= len(sup) <= batch - 1
        assert len(sup) + len(unsup) == batch
        n_sups.append(len(sup))
    assert len(set(n_sups)) > 1, "by_prob should vary the composition"
    # exact mean of the reference's clamped Binomial(batch, p)
    pmf = [comb(batch, k) * p ** k * (1 - p) ** (batch - k)
           for k in range(batch + 1)]
    clamped = [max(min(k, batch - 1), 1) for k in range(batch + 1)]
    exact_mean = sum(c * q for c, q in zip(clamped, pmf))
    emp = np.mean(n_sups)
    # 3000 draws, sigma ~ 0.78/sqrt(3000) ~ 0.014 -> 5-sigma band
    assert abs(emp - exact_mean) < 0.08, (emp, exact_mean)


def test_sampler_orientation_groups():
    # 6 landscape + 4 portrait sup; 20 landscape + 20 portrait unsup:
    # every batch must be orientation-pure w.r.t. the dataset flags
    sup_flags = [1] * 6 + [0] * 4
    unsup_flags = [1] * 20 + [0] * 20
    s = SemiBalanceSampler(10, 40, sup_flags, unsup_flags,
                           samples_per_batch=5, sample_ratio=(1, 4),
                           epoch_length=40, seed=3)
    saw = set()
    for sup, unsup, flag in s.epoch(0):
        saw.add(flag)
        assert all(sup_flags[i] == flag for i in sup)
        assert all(unsup_flags[i] == flag for i in unsup)
    assert saw == {0, 1}


def test_sampler_sharding_same_step_disjoint_data():
    """Multi-host semantics: every shard sees the SAME step count and
    flag, with disjoint index slices of one global per-step draw
    (reference rank sharding, semi_sampler.py:185-187)."""
    kw = dict(samples_per_batch=5, sample_ratio=(1, 4), epoch_length=8,
              seed=1)
    shards = [list(SemiBalanceSampler(10, 40, [0] * 10, [0] * 40,
                                      num_shards=2, shard_id=i,
                                      **kw).epoch(0)) for i in (0, 1)]
    assert len(shards[0]) == len(shards[1]) == 8
    for (s0, u0, f0), (s1, u1, f1) in zip(*shards):
        assert f0 == f1                       # same bucket per step
        assert len(s0) == len(s1) == 1 and len(u0) == len(u1) == 4
        # unsup slices within a step are disjoint (40 ids, 8 drawn from
        # one permutation stream -> no repeats inside a step)
        assert not (set(u0.tolist()) & set(u1.tolist()))
    # reruns are deterministic
    again = list(SemiBalanceSampler(10, 40, [0] * 10, [0] * 40,
                                    num_shards=2, shard_id=1,
                                    **kw).epoch(0))
    assert all((a[1] == b[1]).all() for a, b in zip(shards[1], again))


def test_pack_static_shapes():
    img = np.zeros((60, 80, 3), np.uint8)
    s = make_sample(img, [[10, 10, 30, 40]], [2])
    p = pack(s, (64, 96), max_gt=8)
    assert p.image.shape == (64, 96, 3)
    assert p.boxes.shape == (8, 4)
    assert p.valid.sum() == 1
    # normalized cxcywh over VALID extent (60, 80)
    assert np.allclose(p.boxes[0], [20 / 80, 25 / 60, 20 / 80, 30 / 60])
    assert (p.hw == [60, 80]).all()


def test_uint8_device_normalize_bitexact(monkeypatch):
    """pack() ships raw uint8 by default; the model's device-side
    prepare_images must reproduce the host normalize-then-pad path to
    1 ulp (the native C++ path multiplies by 1/std where the device
    divides) with the pad region exactly 0."""
    import jax.numpy as jnp
    from semi_detr_tpu.data import pipeline
    from semi_detr_tpu.models.dino_head import prepare_images

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (60, 80, 3), np.uint8)
    s = make_sample(img, [[10, 10, 30, 40]], [2])

    monkeypatch.setattr(pipeline, "_DEVICE_NORMALIZE", True)
    raw = pack(s, (64, 96), max_gt=8)
    assert raw.image.dtype == np.uint8
    monkeypatch.setattr(pipeline, "_DEVICE_NORMALIZE", False)
    host = pack(s, (64, 96), max_gt=8)
    assert host.image.dtype == np.float32

    dev = prepare_images(jnp.asarray(raw.image[None]),
                         jnp.asarray(raw.hw[None]))
    assert dev.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(dev[0]), host.image, atol=5e-7)
    # pad region exactly zero in both
    assert not np.asarray(dev[0])[60:].any() and not host.image[60:].any()
    assert not np.asarray(dev[0])[:, 80:].any()
    # float input passes through untouched
    passthru = prepare_images(jnp.asarray(host.image[None]),
                              jnp.asarray(host.hw[None]))
    np.testing.assert_array_equal(np.asarray(passthru[0]), host.image)


def test_pick_bucket():
    assert pick_bucket(500, 600) == (512, 672)
    assert pick_bucket(800, 1333) == (800, 1344)
    assert pick_bucket(1333, 800) == (1344, 800)


def test_config_merge_vars_and_wrapper(tmp_path):
    base = tmp_path / "base.py"
    base.write_text(
        "model = dict(a=1, b=dict(c=2))\n"
        "percent = 10\n"
        "name = 'p${percent}'\n")
    child = tmp_path / "child.py"
    child.write_text(
        "_base_ = ['base.py']\n"
        "model = dict(b=dict(c=5), d='${model.a}')\n"
        "semi_wrapper = dict(kind='ssod')\n")
    cfg = load_config(str(child))
    assert cfg["model"]["a"] == 1
    assert cfg["model"]["b"]["c"] == 5
    assert cfg["model"]["d"] == 1          # value-typed interpolation
    assert cfg["name"] == "p10"            # string interpolation
    cfg2 = apply_semi_wrapper(cfg)
    assert cfg2["model"]["kind"] == "ssod"


def test_config_delete_semantics():
    a = {"x": {"p": 1, "q": 2}, "y": 3}
    b = {"x": {"_delete_": True, "r": 7}}
    out = deep_merge(a, b)
    assert out["x"] == {"r": 7}
    assert out["y"] == 3


def test_pick_step_bucket():
    from semi_detr_tpu.data.augment import COCO_SCALES
    from semi_detr_tpu.data.pipeline import pick_step_bucket

    rng1 = np.random.default_rng(5)
    rng2 = np.random.default_rng(5)
    seen = set()
    for _ in range(60):
        scales, bucket = pick_step_bucket(rng1, COCO_SCALES, (800, 1344), 1)
        scales2, bucket2 = pick_step_bucket(rng2, COCO_SCALES,
                                            (800, 1344), 0)
        # shard-deterministic: same rng stream -> same class either flag
        assert scales == scales2
        assert bucket == (bucket2[1], bucket2[0])   # orientation transpose
        # bucket contains the worst-case resized dims for every class scale
        for s in scales:
            assert bucket[0] >= min(s) and bucket[1] >= 1333
        seen.add(bucket)
    # the 11 scales quantize onto exactly 3 landscape buckets
    assert seen == {(544, 1344), (672, 1344), (800, 1344)}

    # a per-image draw from the returned class keeps the reference's
    # UNIFORM marginal over the 11 scales (rand_aug.py:880-950): the
    # class sizes are the bucket probabilities, so the two-stage draw
    # composes back to 1/11 per scale
    classes = {}
    rng = np.random.default_rng(0)
    for _ in range(400):
        scales, bucket = pick_step_bucket(rng, COCO_SCALES, (800, 1344), 1)
        classes[bucket] = tuple(scales)
    per_scale = {}
    for cls in classes.values():
        for s in cls:
            assert s not in per_scale, "classes must partition the scales"
            per_scale[s] = len(cls)
    assert set(per_scale) == {tuple(s) for s in COCO_SCALES}
    # P(scale) = P(bucket) * 1/|class| = (|class|/11) * 1/|class| = 1/11
    # holds for any partition -> verified by the partition asserts above


def test_pick_step_bucket_custom_large_scales():
    """Custom scale sets with short side above max(BUCKET_SHORTS) must
    still produce a bucket the keep-ratio resize fits into (regression:
    the fallback used to cap at 800)."""
    from semi_detr_tpu.data.pipeline import pick_step_bucket
    rng = np.random.default_rng(0)
    scales, bucket = pick_step_bucket(rng, [(900, 1500)], (900, 1504), 1)
    assert scales == [(900, 1500)]
    assert bucket == (900, 1504)
    # portrait flag transposes
    _, bp = pick_step_bucket(np.random.default_rng(0), [(900, 1500)],
                             (900, 1504), 0)
    assert bp == (1504, 900)


def test_config_drops_helpers_and_tuple_overrides(tmp_path):
    """Helper functions/classes in a config file must not leak into the
    tree, and --cfg-options can index into tuple-valued entries."""
    from semi_detr_tpu.utils.config import load_config, set_by_path
    p = tmp_path / "cfg.py"
    p.write_text(
        "def helper(x):\n    return x\n"
        "class Foo:\n    pass\n"
        "model = dict(size=helper(4))\n"
        "bucket = (800, 1344)\n")
    cfg = load_config(str(p))
    assert set(cfg) == {"model", "bucket"}
    set_by_path(cfg, "bucket.0", 640)
    assert list(cfg["bucket"])[0] == 640


def test_checkpoint_force_save_after_interval_save(tmp_path):
    """End-of-training force-save on an interval step must not crash
    (orbax raises StepAlreadyExistsError on a duplicate save)."""
    import jax.numpy as jnp
    import optax
    from semi_detr_tpu.train.checkpoint import CheckpointManager
    from semi_detr_tpu.train.state import TrainState
    v = {"params": {"w": jnp.ones((2,))}}
    st = TrainState.create(v, optax.identity(), with_teacher=False)
    st = st.replace(step=jnp.asarray(4, jnp.int32),
                    opt_state=optax.identity().init(v["params"]))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), interval=4)
    assert mgr.maybe_save(st) is True
    assert mgr.maybe_save(st, force=True) is False   # no re-save crash
    mgr.close()


def test_log_image_with_boxes(tmp_path):
    """Pseudo-label visualization (reference log_image_with_boxes file
    backend, detr_ssod/utils/logger.py:91-161): denormalizes, draws only
    kept boxes, writes work_dir/tag/step_N.jpg."""
    from semi_detr_tpu.data.augment import IMG_MEAN, IMG_STD
    from semi_detr_tpu.utils.logging import log_image_with_boxes

    img = (np.full((60, 80, 3), 128.0, np.float32) - IMG_MEAN) / IMG_STD
    boxes = np.array([[5, 5, 30, 40], [50, 10, 70, 50]], np.float32)
    out = log_image_with_boxes(
        str(tmp_path), "pseudo_vis", 42, img.astype(np.float32), boxes,
        labels=np.array([0, 1]), scores=np.array([0.9, 0.4]),
        keep=np.array([True, False]), class_names=("cat", "dog"))
    assert out.endswith("pseudo_vis/step_42.jpg")
    import cv2
    rendered = cv2.imread(out)
    assert rendered is not None and rendered.shape == (60, 80, 3)
    # kept box: strong green edge; dropped box: its right edge (x=69,
    # far from any kept drawing) stays near the gray background
    assert (rendered[10:35, 5, 1] > 200).mean() > 0.8
    assert np.abs(rendered[15:49, 69].astype(int) - 128).max() < 30


def test_synthetic_ssod_batch_matches_step_layout():
    """bench.py feeds synthetic_ssod_batch straight into
    make_ssod_train_step — the tree layout must match the train loop's
    batch contract (train/ssod.py:make_ssod_train_step docstring)."""
    from semi_detr_tpu.data.synthetic import synthetic_ssod_batch

    b = synthetic_ssod_batch(2, 3, 64, 96, max_gt=8)
    assert b["sup"]["images"].shape == (2, 64, 96, 3)
    assert b["sup"]["img_hw"].shape == (2, 2)
    assert (b["sup"]["img_hw"] == [64, 96]).all()
    gt = b["sup"]["gt"]
    assert gt["boxes"].shape == (2, 8, 4) and gt["boxes"].dtype == np.float32
    assert gt["labels"].shape == (2, 8) and gt["labels"].dtype == np.int32
    assert gt["valid"].shape == (2, 8) and gt["valid"].dtype == bool
    assert gt["valid"].sum() == 2 * 8  # gt_per_image default fills all 8
    for side in ("student", "teacher"):
        assert b["unsup"][f"{side}_images"].shape == (3, 64, 96, 3)
        assert b["unsup"][f"{side}_hw"].shape == (3, 2)
        assert b["unsup"][f"{side}_tmat"].shape == (3, 3, 3)
        np.testing.assert_array_equal(
            b["unsup"][f"{side}_tmat"][0], np.eye(3))
    assert (0 < gt["boxes"]).all() and (gt["boxes"] < 1).all()


def test_write_synthetic_coco_multiobject(tmp_path):
    """n_classes/max_boxes extend the generator without touching the
    default single-box single-class stream (byte-identical RNG path)."""
    import json
    from semi_detr_tpu.data.synthetic import write_synthetic_coco

    path, img_dir = write_synthetic_coco(
        str(tmp_path / "m"), n=12, hw=(64, 96), seed=3,
        n_classes=3, max_boxes=5)
    d = json.load(open(path))
    assert len(d["images"]) == 12
    assert len(d["categories"]) == 3
    per_img = {}
    for a in d["annotations"]:
        per_img[a["image_id"]] = per_img.get(a["image_id"], 0) + 1
        assert 1 <= a["category_id"] <= 3
        x, y, w, h = a["bbox"]
        assert 0 <= x and 0 <= y and x + w <= 96 and y + h <= 64
    assert max(per_img.values()) > 1          # multi-object actually occurs
    assert max(per_img.values()) <= 5
    assert len({a["id"] for a in d["annotations"]}) == len(d["annotations"])

    # default args: single box per image, one category, ann ids == img ids
    p1, _ = write_synthetic_coco(str(tmp_path / "s"), n=4, hw=(64, 96),
                                 seed=3)
    d1 = json.load(open(p1))
    assert len(d1["annotations"]) == 4
    assert [a["id"] for a in d1["annotations"]] == [1, 2, 3, 4]
    assert d1["categories"] == [{"id": 1, "name": "person"}]


def test_class_names_custom_list(monkeypatch):
    """data.classes: explicit name list (mmdet custom-dataset parity),
    'voc' keyword, or unset -> COCO80; empty list raises
    (tools/common.py:class_names)."""
    import os
    monkeypatch.syspath_prepend(os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from common import COCO_CLASSES, VOC_CLASSES, class_names

    assert class_names({"data": {}}) == COCO_CLASSES
    assert class_names({"data": {"classes": "voc"}}) == VOC_CLASSES
    assert class_names(
        {"data": {"classes": ["person", "class1", "class2"]}}) \
        == ("person", "class1", "class2")
    with pytest.raises(ValueError):
        class_names({"data": {"classes": []}})
