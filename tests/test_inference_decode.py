"""Inference decode paths: top-k and NMS, rescale semantics."""
import numpy as np
import pytest

import jax.numpy as jnp

from semi_detr_tpu.models.inference import decode_nms, decode_topk


def test_decode_topk_orders_and_scales():
    nq, k = 6, 3
    logits = jnp.full((1, nq, k), -9.0)
    logits = logits.at[0, 2, 1].set(2.0)     # best
    logits = logits.at[0, 4, 0].set(1.0)     # second
    coords = jnp.tile(jnp.asarray([[.5, .5, .2, .4]]), (1, nq, 1))
    coords = coords.at[0, 2].set(jnp.asarray([.25, .5, .1, .2]))
    hw = jnp.asarray([[100, 200]], jnp.int32)
    boxes, scores, labels = decode_topk(logits, coords, hw, max_dets=4)
    assert boxes.shape == (1, 4, 4)
    s = np.asarray(scores[0])
    assert s[0] > s[1] > s[2]
    assert int(labels[0, 0]) == 1 and int(labels[0, 1]) == 0
    # box 0: cxcywh (.25,.5,.1,.2) on (w=200,h=100) -> xyxy abs
    np.testing.assert_allclose(np.asarray(boxes[0, 0]),
                               [40., 40., 60., 60.], atol=1e-3)


def test_decode_topk_clips_to_valid_extent():
    logits = jnp.zeros((1, 2, 1))
    coords = jnp.asarray([[[.95, .5, .3, .4], [.5, .5, .2, .2]]])
    hw = jnp.asarray([[100, 200]], jnp.int32)
    boxes, _, _ = decode_topk(logits, coords, hw, max_dets=2)
    b = np.asarray(boxes[0])
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 200).all()
    assert (b[:, 1] >= 0).all() and (b[:, 3] <= 100).all()


def test_decode_nms_suppresses_duplicates():
    nq, k = 8, 2
    logits = jnp.full((1, nq, k), -9.0)
    # three near-identical boxes of class 0 with ordered scores + one far
    for i, v in ((0, 3.0), (1, 2.0), (2, 1.0)):
        logits = logits.at[0, i, 0].set(v)
    logits = logits.at[0, 5, 1].set(2.5)
    coords = jnp.tile(jnp.asarray([[.3, .3, .2, .2]]), (1, nq, 1))
    coords = coords.at[0, 1].set(jnp.asarray([.31, .3, .2, .2]))
    coords = coords.at[0, 2].set(jnp.asarray([.3, .31, .2, .2]))
    coords = coords.at[0, 5].set(jnp.asarray([.8, .8, .1, .1]))
    hw = jnp.asarray([[100, 100]], jnp.int32)
    boxes, scores, labels = decode_nms(logits, coords, hw, max_dets=8)
    s = np.asarray(scores[0])
    survivors = (s > 0.05).sum()
    # duplicates suppressed at IoU .6: one of the trio + the far box
    # survive with meaningful scores (background-ish taps stay ~0)
    assert survivors == 2
    lbl = np.asarray(labels[0])[s > 0.05]
    assert set(lbl.tolist()) == {0, 1}


@pytest.mark.slow
def test_predictor_portrait_image(tmp_path):
    """The public api must orient the bucket per image aspect (regression:
    portrait images crashed pack()'s fit assert)."""
    import jax
    import optax

    from semi_detr_tpu.api import Predictor
    from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector
    from semi_detr_tpu.models.ssod import Projector, SsodConfig
    from semi_detr_tpu.train.ssod import init_ssod_state

    tiny = DinoConfig(num_classes=2, num_queries=12, d_model=64, n_heads=2,
                      num_encoder_layers=1, num_decoder_layers=1, d_ffn=64,
                      dn_single_pad=2, dn_groups=1, max_gt=4)
    cfg = SsodConfig(dino=tiny, max_pseudo=2, cons_groups=1,
                     nms_max_out=8, nms_pre_topk=16)
    det, proj = DINODetector(tiny), Projector(tiny.d_model)
    state = init_ssod_state(det, proj, optax.identity(), cfg,
                            jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)),
                            jnp.asarray([[64, 64]], jnp.int32))
    pred = Predictor(det, state, cfg, ("a", "b"), use_nms=False)
    img = (np.random.RandomState(0).rand(120, 80, 3) * 255).astype(np.uint8)
    boxes, scores, labels = pred(img, score_thr=0.0, bucket=(96, 128),
                                 test_scale=(80, 112))
    assert boxes.shape[1] == 4 and np.isfinite(boxes).all()
