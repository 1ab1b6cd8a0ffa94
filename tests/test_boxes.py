import jax.numpy as jnp
import numpy as np

from semi_detr_tpu.core import boxes


def _rand_boxes(rng, n):
    cxy = rng.uniform(0.2, 0.8, (n, 2))
    wh = rng.uniform(0.05, 0.4, (n, 2))
    return np.concatenate([cxy, wh], -1).astype(np.float32)


def test_cxcywh_roundtrip():
    rng = np.random.RandomState(0)
    b = _rand_boxes(rng, 32)
    out = boxes.xyxy_to_cxcywh(boxes.cxcywh_to_xyxy(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(out), b, atol=1e-6)


def test_iou_giou_against_torchvision_style_reference():
    rng = np.random.RandomState(1)
    a = np.asarray(boxes.cxcywh_to_xyxy(jnp.asarray(_rand_boxes(rng, 13))))
    b = np.asarray(boxes.cxcywh_to_xyxy(jnp.asarray(_rand_boxes(rng, 7))))

    # NumPy reference
    def np_iou(a, b):
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        union = area_a[:, None] + area_b[None] - inter
        return inter / union, union

    iou_ref, union = np_iou(a, b)
    np.testing.assert_allclose(
        np.asarray(boxes.pairwise_iou(jnp.asarray(a), jnp.asarray(b))),
        iou_ref, atol=1e-5)

    lt_c = np.minimum(a[:, None, :2], b[None, :, :2])
    rb_c = np.maximum(a[:, None, 2:], b[None, :, 2:])
    wh_c = np.clip(rb_c - lt_c, 0, None)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    giou_ref = iou_ref - (area_c - union) / area_c
    np.testing.assert_allclose(
        np.asarray(boxes.pairwise_giou(jnp.asarray(a), jnp.asarray(b))),
        giou_ref, atol=1e-5)


def test_degenerate_boxes_no_nan():
    z = jnp.zeros((4, 4))
    assert not np.any(np.isnan(np.asarray(boxes.pairwise_giou(z, z))))
    assert not np.any(np.isnan(np.asarray(boxes.elementwise_giou(z, z))))


def test_transform_boxes_identity_and_flip():
    b = jnp.asarray([[10., 20., 50., 80.]])
    eye = jnp.eye(3)
    np.testing.assert_allclose(
        np.asarray(boxes.transform_boxes(b, eye)), np.asarray(b), atol=1e-5)
    # horizontal flip about image width 100
    flip = jnp.asarray([[-1., 0., 100.], [0., 1., 0.], [0., 0., 1.]])
    out = boxes.transform_boxes(b, flip)
    np.testing.assert_allclose(
        np.asarray(out), [[50., 20., 90., 80.]], atol=1e-5)
