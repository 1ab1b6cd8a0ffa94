"""Criterion golden tests: hand-computed Hungarian targets, O2M
assignment, focal/TAL losses, DN target construction."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_detr_tpu.models import assign, losses
from semi_detr_tpu.models.criterion import detection_loss


def test_one_to_one_targets_prefers_matching_box():
    nq, g, k = 6, 2, 3
    # queries 0 and 3 sit exactly on the two gts with confident logits
    gt_boxes = jnp.asarray([[.25, .25, .2, .2], [.75, .75, .2, .2]])
    gt_labels = jnp.asarray([1, 2])
    gt_valid = jnp.asarray([True, True])
    preds = jnp.tile(jnp.asarray([[.5, .5, .1, .1]]), (nq, 1))
    preds = preds.at[0].set(gt_boxes[0]).at[3].set(gt_boxes[1])
    logits = jnp.full((nq, k), -4.0)
    logits = logits.at[0, 1].set(4.0).at[3, 2].set(4.0)
    tg = assign.one_to_one_targets(logits, preds, gt_boxes, gt_labels,
                                   gt_valid, k)
    lab = np.asarray(tg.labels)
    assert lab[0] == 1 and lab[3] == 2
    assert (lab[[1, 2, 4, 5]] == k).all()           # background
    np.testing.assert_allclose(np.asarray(tg.bbox_targets[0]),
                               np.asarray(gt_boxes[0]))
    assert float(tg.num_pos) == 2.0


def test_one_to_one_ignores_invalid_gt():
    nq, k = 4, 2
    gt_boxes = jnp.asarray([[.5, .5, .2, .2], [0., 0., 0., 0.]])
    gt_labels = jnp.asarray([0, 1])
    gt_valid = jnp.asarray([True, False])
    preds = jnp.tile(jnp.asarray([[.5, .5, .2, .2]]), (nq, 1))
    logits = jnp.zeros((nq, k))
    tg = assign.one_to_one_targets(logits, preds, gt_boxes, gt_labels,
                                   gt_valid, k)
    assert float(tg.num_pos) == 1.0
    assert (np.asarray(tg.labels) == k).sum() == nq - 1


def test_o2m_topk_and_conflict_resolution():
    nq, k = 20, 3
    gt_boxes = jnp.asarray([[.3, .3, .2, .2], [.7, .7, .2, .2]])
    gt_labels = jnp.asarray([0, 1])
    gt_valid = jnp.asarray([True, True])
    rs = np.random.RandomState(0)
    preds = jnp.asarray(np.clip(
        rs.rand(nq, 4) * 0.2 + np.tile([[.3, .3, .15, .15]], (nq, 1)),
        0.01, 0.99).astype(np.float32))
    # all queries overlap gt0 mostly; the metric = score^1 * iou^6
    logits = jnp.asarray(rs.randn(nq, k).astype(np.float32))
    tg = assign.o2m_targets(logits, preds, gt_boxes, gt_labels, gt_valid, k,
                            topk=5)
    lab = np.asarray(tg.labels)
    # at most topk per gt, each positive assigned to exactly one gt
    assert 0 < (lab != k).sum() <= 10
    # norm metrics positive exactly at positives
    nm = np.asarray(tg.norm_metrics)
    assert ((nm > 0) == (lab != k)).all()
    # per-gt max normalized metric equals the gt's max IoU over assigned
    pred_xyxy = np.asarray(
        jnp.concatenate([preds[:, :2] - preds[:, 2:] / 2,
                         preds[:, :2] + preds[:, 2:] / 2], -1))


def test_sigmoid_focal_loss_golden():
    # single element, positive class: -alpha*(1-p)^gamma*log(p)
    logits = jnp.asarray([[2.0]])
    labels = jnp.asarray([0])
    w = jnp.ones((1,))
    out = float(losses.sigmoid_focal_loss(logits, labels, w, 1.0, 1))
    p = 1 / (1 + np.exp(-2.0))
    expect = -0.25 * (1 - p) ** 2 * np.log(p)
    assert out == pytest.approx(expect, rel=1e-5)
    # background element: -(1-alpha)*p^gamma*log(1-p)
    out_bg = float(losses.sigmoid_focal_loss(logits, jnp.asarray([1]),
                                             w, 1.0, 1))
    expect_bg = -0.75 * p ** 2 * np.log(1 - p)
    assert out_bg == pytest.approx(expect_bg, rel=1e-5)


def test_task_aligned_focal_loss_golden():
    # QFL-style: |soft - p|^2 * BCE(p, soft), soft = metric on gt class
    prob = np.asarray([0.6, 0.2])
    logits = jnp.asarray([np.log(prob / (1 - prob))], jnp.float32)
    labels = jnp.asarray([0])
    metrics = jnp.asarray([0.8])
    w = jnp.ones((1,))
    out = float(losses.task_aligned_focal_loss(logits, labels, metrics, w,
                                               1.0, 2))
    def bce(p, t):
        return -(t * np.log(p) + (1 - t) * np.log(1 - p))
    expect = (abs(0.8 - 0.6) ** 2 * bce(0.6, 0.8)
              + abs(0.0 - 0.2) ** 2 * bce(0.2, 0.0))
    assert out == pytest.approx(expect, rel=1e-5)


def test_detection_loss_dn_zeroed_for_pseudo_in_warmup():
    n_dec, b, nq, k, g, pad = 2, 1, 8, 3, 4, 8
    rs = np.random.RandomState(0)
    from semi_detr_tpu.models.dn import CdnBatch
    cdn = CdnBatch(
        query_label=jnp.zeros((b, pad, 16)),
        query_bbox=jnp.zeros((b, pad, 4)),
        gt_idx=jnp.asarray(np.tile(np.arange(2), 4), jnp.int32),
        is_positive=jnp.asarray(np.tile([True, True, False, False], 2)),
        slot_valid=jnp.ones((b, pad), bool),
        pad_mask=jnp.zeros((b,), bool))
    outputs = {
        "cls": jnp.asarray(rs.randn(n_dec, b, nq, k).astype(np.float32)),
        "coord": jnp.asarray(
            rs.rand(n_dec, b, nq, 4).astype(np.float32) * .5 + .25),
        "enc_cls": jnp.asarray(rs.randn(b, nq, k).astype(np.float32)),
        "enc_coord": jnp.asarray(
            rs.rand(b, nq, 4).astype(np.float32) * .5 + .25),
        "front_cls": jnp.asarray(
            rs.randn(n_dec, b, pad, k).astype(np.float32)),
        "front_coord": jnp.asarray(
            rs.rand(n_dec, b, pad, 4).astype(np.float32) * .5 + .25),
        "cdn": cdn, "n_front": pad, "hs": None,
    }
    gt = {"boxes": jnp.asarray(
        rs.rand(b, g, 4).astype(np.float32) * .3 + .3),
        "labels": jnp.zeros((b, g), jnp.int32),
        "valid": jnp.asarray([[True, True, False, False]])}
    warm_pseudo = detection_loss(outputs, gt, k, warm_up=True,
                                 is_pseudo_label=True)
    assert float(warm_pseudo["dn_loss_cls"]) == 0.0
    assert float(warm_pseudo["d0.dn_loss_iou"]) == 0.0
    sup = detection_loss(outputs, gt, k, warm_up=True,
                         is_pseudo_label=False)
    assert float(sup["dn_loss_cls"]) > 0.0
    post = detection_loss(outputs, gt, k, warm_up=False,
                          is_pseudo_label=True)
    assert float(post["dn_loss_cls"]) > 0.0
    # every named loss appears per decoder layer
    for lid in range(n_dec - 1):
        assert f"d{lid}.loss_cls" in post
    assert "enc_loss_cls" in post and "total" in post


def test_task_aligned_focal_loss_saturated_logits_finite():
    """Saturated sigmoid (logit 30 -> p == 1.0 in f32) must not produce
    inf/NaN (regression: clip(p, ..., 1 - 1e-12) was a no-op in f32)."""
    logits = jnp.asarray([[30.0, -30.0]])
    labels = jnp.asarray([0])
    out = float(losses.task_aligned_focal_loss(
        logits, labels, jnp.asarray([0.5]), jnp.ones((1,)), 1.0, 2))
    assert np.isfinite(out)


def test_grouped_cls_avg_factor():
    """cls_group reproduces the reference's unsynced per-GPU cls avg
    factor (sync_cls_avg_factor=False, dino_detr_ssod_head.py:763-770):
    per-group normalization + DDP gradient mean. cls_group == full batch
    must equal the default global factor; per-image groups must equal a
    hand-computed mean of per-image-normalized losses."""
    from semi_detr_tpu.models.criterion import _grouped_cls_weights

    pos = jnp.asarray([3.0, 1.0])
    w = np.asarray(_grouped_cls_weights(pos, 1))
    np.testing.assert_allclose(w, [1 / (3 * 2), 1 / (1 * 2)])
    # one group spanning the batch = global normalization
    np.testing.assert_allclose(np.asarray(_grouped_cls_weights(pos, 2)),
                               [1 / 4, 1 / 4])
    # empty group clamps to 1 (reference max(cls_avg_factor, 1))
    w0 = np.asarray(_grouped_cls_weights(jnp.asarray([0.0, 2.0]), 1))
    np.testing.assert_allclose(w0, [1 / 2, 1 / (2 * 2)])
    # non-divisible or disabled -> None (global path)
    assert _grouped_cls_weights(jnp.asarray([1.0, 1.0, 1.0]), 2) is None
    assert _grouped_cls_weights(pos, None) is None

    # end to end: batch-wide group == default detection_loss
    n_dec, b, nq, k, g = 2, 2, 8, 3, 4
    rs = np.random.RandomState(1)
    outputs = {
        "cls": jnp.asarray(rs.randn(n_dec, b, nq, k).astype(np.float32)),
        "coord": jnp.asarray(
            rs.rand(n_dec, b, nq, 4).astype(np.float32) * .5 + .25),
        "enc_cls": jnp.asarray(rs.randn(b, nq, k).astype(np.float32)),
        "enc_coord": jnp.asarray(
            rs.rand(b, nq, 4).astype(np.float32) * .5 + .25),
    }
    gt = {"boxes": jnp.asarray(
        rs.rand(b, g, 4).astype(np.float32) * .3 + .3),
        "labels": jnp.zeros((b, g), jnp.int32),
        "valid": jnp.asarray([[True, True, False, False],
                              [True, False, False, False]])}
    base = detection_loss(outputs, gt, k, warm_up=False)
    full = detection_loss(outputs, gt, k, warm_up=False, cls_group=b)
    for key in base:
        if "loss_cls" in key:
            np.testing.assert_allclose(float(full[key]), float(base[key]),
                                       rtol=1e-6, err_msg=key)
    # per-image groups change the cls losses (3 vs 1 positives) but
    # leave the reg losses (always globally reduce_mean'd) untouched
    per = detection_loss(outputs, gt, k, warm_up=False, cls_group=1)
    assert float(per["loss_cls"]) != pytest.approx(float(base["loss_cls"]))
    np.testing.assert_allclose(float(per["loss_bbox"]),
                               float(base["loss_bbox"]), rtol=1e-6)
