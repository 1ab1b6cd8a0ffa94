"""Augmentation pipeline tests: matrix correctness + box consistency."""
import numpy as np
import pytest

from semi_detr_tpu.data import augment as A


def _sample(h=60, w=80, boxes=((10, 10, 30, 40),)):
    img = (np.arange(h * w * 3).reshape(h, w, 3) % 255).astype(np.uint8)
    labels = np.zeros(len(boxes), np.int64)
    return A.make_sample(img, np.asarray(boxes, np.float32), labels)


def _apply_mat(m, pts):
    pts = np.concatenate([pts, np.ones((len(pts), 1))], 1)
    out = (m @ pts.T).T
    return out[:, :2] / out[:, 2:3]


def test_resize_matrix_matches_boxes():
    s = A.resize(_sample(), (48, 100))
    # matrix applied to original corners == transformed boxes
    corners = np.asarray([[10, 10], [30, 40]])
    mapped = _apply_mat(s.matrix, corners)
    assert np.allclose([mapped[0][0], mapped[0][1], mapped[1][0],
                        mapped[1][1]], s.boxes[0], atol=1e-4)


def test_flip_matrix_round_trip():
    s0 = _sample()
    s = A.hflip(A.resize(s0, (48, 100)))
    corners = np.asarray([[10, 10], [30, 40]])
    mapped = _apply_mat(s.matrix, corners)
    x0, x1 = sorted([mapped[0][0], mapped[1][0]])
    assert np.allclose([x0, mapped[0][1], x1, mapped[1][1]], s.boxes[0],
                       atol=1e-4)
    # flip twice = scale only
    s2 = A.hflip(s)
    assert np.allclose(s2.boxes[0], A.resize(s0, (48, 100)).boxes[0],
                       atol=1e-4)


def test_rotate_keeps_center_box():
    rng = np.random.default_rng(0)
    h, w = 64, 64
    s = A.make_sample(np.full((h, w, 3), 99, np.uint8),
                      np.asarray([[28, 28, 36, 36]], np.float32),
                      np.zeros(1, np.int64))
    out = A.rotate(rng, s, angle_range=(45, 45))
    # center box stays near center after rotation about center
    cx = (out.boxes[0][0] + out.boxes[0][2]) / 2
    cy = (out.boxes[0][1] + out.boxes[0][3]) / 2
    assert abs(cx - 31.5) < 1.5 and abs(cy - 31.5) < 1.5


def test_translate_box_clipped_and_matrix():
    rng = np.random.default_rng(1)
    s = _sample()
    out = A.translate(rng, s, x_range=(0.1, 0.1))  # exactly +8 px
    assert np.allclose(out.boxes[0], [18, 10, 38, 40], atol=1e-4)
    assert np.allclose(out.matrix[0, 2], 8.0, atol=1e-6)


def test_strong_weak_run_and_record():
    rng = np.random.default_rng(2)
    for fn in (A.weak_augment, A.strong_augment, A.sup_augment):
        s = fn(rng, _sample())
        assert s.img.dtype == np.uint8
        assert s.matrix.shape == (3, 3)
        assert np.isfinite(s.matrix).all()
        if len(s.boxes):
            h, w = s.img.shape[:2]
            assert (s.boxes[:, 0] >= -1e-3).all()
            assert (s.boxes[:, 2] <= w + 1e-3).all()


def test_cross_view_reprojection():
    """The SSOD invariant: M = T_s @ inv(T_w) maps weak-view boxes onto
    strong-view boxes (for affine-only strong aug)."""
    base = _sample()
    rng1, rng2 = np.random.default_rng(3), np.random.default_rng(4)
    weak = A.weak_augment(rng1, base)
    strong = A.translate(rng2, A.weak_augment(rng2, base),
                         x_range=(-0.05, 0.05))
    m = strong.matrix @ np.linalg.inv(weak.matrix)
    mapped = _apply_mat(m, weak.boxes[0].reshape(2, 2))
    xs, ys = sorted(mapped[:, 0]), sorted(mapped[:, 1])
    got = np.asarray([xs[0], ys[0], xs[1], ys[1]])
    h, w = strong.img.shape[:2]
    got = np.clip(got, 0, [w, h, w, h])
    assert np.allclose(got, strong.boxes[0], atol=0.6)


def test_normalize():
    img = np.full((4, 4, 3), 128, np.uint8)
    out = A.normalize_image(img)
    exp = (128 - A.IMG_MEAN) / A.IMG_STD
    assert np.allclose(out[0, 0], exp, atol=1e-5)
