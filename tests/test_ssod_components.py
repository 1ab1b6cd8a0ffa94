"""SSOD component tests: pseudo-label decode, cross-view transform,
consistency loss normalization."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_detr_tpu.models.ssod import (SsodConfig, consistency_loss,
                                       consistency_partition,
                                       consistency_positions,
                                       decode_pseudo_labels,
                                       normalize_boxes,
                                       transform_pseudo_to_student)
from semi_detr_tpu.models.dino_head import DinoConfig


CFG = SsodConfig(dino=DinoConfig(num_classes=3), max_pseudo=4,
                 cons_groups=2, nms_max_out=16, nms_pre_topk=32)


def test_decode_pseudo_labels_mean_std_filter():
    nq, k = 12, 3
    logits = jnp.full((1, nq, k), -8.0)
    # two strong boxes, several weak ones -> mean+std keeps the strong
    logits = logits.at[0, 0, 1].set(3.0)     # p=0.95
    logits = logits.at[0, 1, 2].set(2.0)     # p=0.88
    for i in range(2, 8):
        logits = logits.at[0, i, 0].set(-2.0)  # p=0.12 crowd of weak
    coords = jnp.tile(jnp.asarray([[.5, .5, .2, .2]]), (1, nq, 1))
    # make boxes distinct to survive NMS
    coords = coords.at[0, 0].set(jnp.asarray([.2, .2, .15, .15]))
    coords = coords.at[0, 1].set(jnp.asarray([.8, .8, .15, .15]))
    for i in range(2, 8):
        cx = 0.1 + 0.1 * i
        coords = coords.at[0, i].set(jnp.asarray([cx, .5, .05, .05]))
    hw = jnp.asarray([[100, 200]], jnp.int32)
    pl = decode_pseudo_labels(logits, coords, hw, CFG)
    v = np.asarray(pl.valid[0])
    s = np.asarray(pl.scores[0])
    # only scores above mean+std survive: the two confident ones
    assert v.sum() == 2
    assert s[v].min() > 0.8
    # boxes are in ABS teacher-frame coords
    b = np.asarray(pl.boxes_t[0][v])
    assert (b[:, 2] <= 200 + 1e-3).all() and (b[:, 3] <= 100 + 1e-3).all()
    assert b.max() > 1.5   # definitely not normalized


def test_transform_pseudo_roundtrip_flip():
    # teacher frame -> student frame under a horizontal flip of a
    # 100x200 image
    from semi_detr_tpu.models.ssod import PseudoLabels
    boxes_t = jnp.asarray([[[20., 10., 60., 40.],
                            [0., 0., 0., 0.]]])
    pl = PseudoLabels(boxes_t, boxes_t, jnp.zeros((1, 2), jnp.int32),
                      jnp.asarray([[.9, .0]]),
                      jnp.asarray([[True, False]]))
    eye = jnp.eye(3)[None]
    flip = jnp.asarray([[[-1., 0., 200.], [0., 1., 0.], [0., 0., 1.]]])
    out = transform_pseudo_to_student(pl, eye, flip,
                                      jnp.asarray([[100, 200]]))
    np.testing.assert_allclose(np.asarray(out.boxes_s[0, 0]),
                               [140., 10., 180., 40.], atol=1e-4)


def test_normalize_boxes():
    boxes = jnp.asarray([[[20., 10., 60., 40.]]])
    hw = jnp.asarray([[100, 200]])
    out = np.asarray(normalize_boxes(boxes, hw)[0, 0])
    np.testing.assert_allclose(out, [40 / 200, 25 / 100, 40 / 200,
                                     30 / 100], atol=1e-6)


def test_consistency_partition_adaptive_layout():
    """Adaptive group size = batch max kept count (reference
    single_pad_1 = int(max(known_num)), dino_detr_ssod.py:537) inside
    the static cons_pad budget."""
    # batch kept counts [2, 1] (prefix-packed) -> single_pad_dyn = 2
    packed = jnp.asarray([[True, True, False, False],
                          [True, False, False, False]])
    sp, slot_idx, slot_w = consistency_partition(packed, CFG.cons_groups,
                                                 CFG.cons_pad)
    assert int(sp) == 2
    # slots cycle the packed prefix per group; active = groups * sp
    np.testing.assert_array_equal(np.asarray(slot_idx),
                                  [0, 1, 0, 1, 0, 1, 0, 1])
    np.testing.assert_array_equal(
        np.asarray(slot_w),
        [[True, True, True, True, False, False, False, False],
         [True, False, True, False, False, False, False, False]])

    # full occupancy degenerates to the old static tiling
    full = jnp.ones((1, CFG.max_pseudo), bool)
    sp_f, idx_f, w_f = consistency_partition(full, CFG.cons_groups,
                                             CFG.cons_pad)
    assert int(sp_f) == CFG.max_pseudo
    np.testing.assert_array_equal(
        np.asarray(idx_f), np.tile(np.arange(CFG.max_pseudo),
                                   CFG.cons_groups))
    assert np.asarray(w_f).all()


def test_consistency_positions_layout():
    boxes = jnp.zeros((1, CFG.max_pseudo, 4)).at[0, 0].set(
        jnp.asarray([20., 10., 60., 40.]))
    hw = jnp.asarray([[100, 200]])
    valid = jnp.zeros((1, CFG.max_pseudo), bool).at[0, 0].set(True)
    sp, slot_idx, slot_w = consistency_partition(valid, CFG.cons_groups,
                                                 CFG.cons_pad)
    assert int(sp) == 1                      # max kept count in batch
    pos = consistency_positions(boxes, hw, slot_w, slot_idx)
    assert pos.shape == (1, CFG.cons_pad, 4)
    p = np.asarray(pos[0])
    # the kept box occupies one slot per group; inactive slots zero
    np.testing.assert_allclose(p[0], p[1], atol=1e-6)
    assert np.abs(p[0]).max() > 0
    np.testing.assert_allclose(p[2:], 0.0)


def test_consistency_loss_detach_and_weighting():
    n_dec, b, c = 2, 1, 8
    pad = CFG.cons_pad
    rs = np.random.RandomState(0)
    hs_s = jnp.asarray(rs.randn(n_dec, b, pad, c).astype(np.float32))
    hs_t = jnp.asarray(rs.randn(n_dec, b, pad, c).astype(np.float32))
    # per-slot weights over the full cons_pad (2 kept slots per group)
    w = jnp.asarray([[1., 1., 0., 0.] * CFG.cons_groups], jnp.float32)
    counts = jnp.asarray([2])
    out = consistency_loss(hs_s, hs_t, w, counts, CFG, weight=10.0)
    assert set(out) == {"consis_loss.d0", "consis_loss.d1"}
    v = float(out["consis_loss.d0"])
    assert v > 0
    # identical embeddings -> zero loss
    out0 = consistency_loss(hs_s, hs_s, w, counts, CFG, weight=10.0)
    assert float(out0["consis_loss.d0"]) == pytest.approx(0.0, abs=1e-8)
    # gradient flows to the student side only
    g = jax.grad(lambda h: consistency_loss(
        h, hs_t, w, counts, CFG, 10.0)["consis_loss.d0"])(hs_s)
    assert float(jnp.abs(g).max()) > 0
    gt = jax.grad(lambda h: consistency_loss(
        hs_s, h, w, counts, CFG, 10.0)["consis_loss.d0"])(hs_t)
    assert float(jnp.abs(gt).max()) == 0.0


def test_inject_fake_consistency_roi():
    """Empty images get the reference's fake center RoI
    (dino_detr_ssod.py:516-521, :575-581): slot 0 becomes
    [w/4, h/4, 3w/4, 3h/4] in each frame and joins the known set;
    non-empty images are untouched."""
    from semi_detr_tpu.models.ssod import inject_fake_consistency_roi
    keep = jnp.asarray([[True, False, False],
                        [False, False, False]])
    bt = jnp.ones((2, 3, 4)) * 7.0
    bs = jnp.ones((2, 3, 4)) * 9.0
    t_hw = jnp.asarray([[100, 200], [80, 160]])
    s_hw = jnp.asarray([[120, 240], [60, 120]])
    known, bt2, bs2 = inject_fake_consistency_roi(keep, bt, bs, t_hw, s_hw)
    np.testing.assert_array_equal(np.asarray(known),
                                  [[True, False, False],
                                   [True, False, False]])
    # image 0 (non-empty): boxes untouched
    np.testing.assert_array_equal(np.asarray(bt2[0]), np.asarray(bt[0]))
    np.testing.assert_array_equal(np.asarray(bs2[0]), np.asarray(bs[0]))
    # image 1 slot 0: center half-extent box per frame
    np.testing.assert_allclose(np.asarray(bt2[1, 0]), [40, 20, 120, 60])
    np.testing.assert_allclose(np.asarray(bs2[1, 0]), [30, 15, 90, 45])
    np.testing.assert_array_equal(np.asarray(bt2[1, 1:]),
                                  np.asarray(bt[1, 1:]))
    # the fake's normalized cxcywh is the sigmoid(0) padding box, so
    # consistency positions are unchanged by the injection
    np.testing.assert_allclose(
        np.asarray(normalize_boxes(bs2[1:, :1], s_hw[1:])),
        [[[0.5, 0.5, 0.5, 0.5]]], atol=1e-7)
