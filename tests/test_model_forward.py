"""Smoke + invariance tests for the DINO detector forward pass."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_detr_tpu.models.dino_head import (DinoConfig, DINODetector,
                                            backbone_spatial_shapes,
                                            level_valid_masks)

TINY = DinoConfig(num_classes=7, num_queries=24, d_model=64, n_heads=2,
                  num_encoder_layers=2, num_decoder_layers=2, d_ffn=64,
                  dn_single_pad=4, dn_groups=2, max_gt=8)


@pytest.fixture(scope="module")
def model_and_params():
    model = DINODetector(TINY)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((2, 64, 96, 3))
    hw = jnp.asarray([[64, 96], [48, 64]])
    params = model.init({"params": rng}, imgs, hw)
    return model, params


def test_forward_shapes_inference(model_and_params):
    model, params = model_and_params
    imgs = jnp.asarray(np.random.RandomState(0)
                       .randn(2, 64, 96, 3).astype(np.float32))
    hw = jnp.asarray([[64, 96], [48, 64]])
    out = model.apply(params, imgs, hw)
    n_dec, nq, k = TINY.num_decoder_layers, TINY.num_queries, TINY.num_classes
    assert out["cls"].shape == (n_dec, 2, nq, k)
    assert out["coord"].shape == (n_dec, 2, nq, 4)
    assert out["enc_cls"].shape == (2, nq, k)
    assert out["enc_coord"].shape == (2, nq, 4)
    assert out["n_front"] == 0
    c = np.asarray(out["coord"])
    assert np.all((c >= 0) & (c <= 1))
    assert not np.any(np.isnan(np.asarray(out["cls"])))


def test_forward_with_cdn(model_and_params):
    model, params = model_and_params
    imgs = jnp.zeros((2, 64, 96, 3))
    hw = jnp.asarray([[64, 96], [48, 64]])
    g = TINY.max_gt
    gt = {
        "boxes": jnp.tile(jnp.asarray([[.5, .5, .2, .3]]), (2, g, 1)),
        "labels": jnp.zeros((2, g), jnp.int32),
        "valid": jnp.asarray(
            np.arange(g)[None] < np.asarray([[3], [0]])),
    }
    out = model.apply(params, imgs, hw, gt=gt,
                      dn_rng=jax.random.PRNGKey(1))
    pad = TINY.dn_pad_size
    assert out["n_front"] == pad
    assert out["front_cls"].shape == (2, 2, pad, 7)
    cdn = out["cdn"]
    # image 1 has no gt -> fake injected, pad_mask set
    assert bool(cdn.pad_mask[1]) and not bool(cdn.pad_mask[0])
    assert bool(cdn.slot_valid[1, 0])
    # image 0: 3 valid gts per chunk
    assert int(cdn.slot_valid[0].sum()) == 3 * 2 * TINY.dn_groups


def test_spatial_shape_arithmetic():
    assert backbone_spatial_shapes((64, 96)) == (
        (8, 12), (4, 6), (2, 3), (1, 2))
    # odd sizes round up (conv ceil semantics)
    assert backbone_spatial_shapes((100, 150)) == (
        (13, 19), (7, 10), (4, 5), (2, 3))


def test_level_masks_match_interpolate_semantics():
    shapes = ((4, 6),)
    hw = jnp.asarray([[50, 96]])
    m = level_valid_masks(shapes, (64, 96), hw)[0]
    # rows: floor(i*64/4)=16i < 50 -> i in {0,1,2,3}: 0,16,32,48 -> all valid
    assert np.asarray(m)[0, :, 0].tolist() == [True, True, True, True]
    hw2 = jnp.asarray([[40, 60]])
    m2 = np.asarray(level_valid_masks(shapes, (64, 96), hw2)[0])[0]
    # rows 0,16,32 < 40 valid, 48 invalid
    assert m2[:, 0].tolist() == [True, True, True, False]
    # cols: floor(j*96/6)=16j < 60 -> j in {0,1,2,3} valid
    assert m2[0, :].tolist() == [True, True, True, True, False, False]


def test_backbone_shapes_match_static_arithmetic(model_and_params):
    model, params = model_and_params
    imgs = jnp.zeros((1, 100, 150, 3))
    srcs, shapes = model.apply(params, imgs,
                               method=DINODetector.forward_features_only)
    assert shapes == backbone_spatial_shapes((100, 150))


@pytest.mark.slow
def test_bf16_dtype_propagates_through_transformer():
    """cfg.dtype=bfloat16 must reach the encoder/decoder compute stream
    (regression: GroupNorm/Dense defaulted to f32 promotion, silently
    running the whole transformer in f32)."""
    import jax.numpy as jnp

    from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector

    cfg = DinoConfig(num_classes=3, num_queries=12, d_model=64, n_heads=2,
                     num_encoder_layers=1, num_decoder_layers=1, d_ffn=64,
                     dn_single_pad=2, dn_groups=1, max_gt=4,
                     dtype=jnp.bfloat16)
    m = DINODetector(cfg)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    hw = jnp.asarray([[64, 64]], jnp.int32)
    variables = m.init({"params": jax.random.PRNGKey(0)}, imgs, hw)
    out, inter = m.apply(variables, imgs, hw,
                         capture_intermediates=lambda mdl, name: True,
                         mutable=["intermediates"])
    flat = jax.tree_util.tree_flatten_with_path(inter["intermediates"])[0]
    # the encoder output ('memory' of the encode_images dict) carries the
    # transformer compute dtype (the scanned encoder's internals are not
    # individually captured through the lifted transform)
    enc_dtypes = [leaf.dtype for path, leaf in flat
                  if any(getattr(k, "key", "") == "memory" for k in path)
                  and hasattr(leaf, "dtype")]
    assert enc_dtypes, "no encoder memory intermediate captured"
    assert all(d == jnp.bfloat16 for d in enc_dtypes), enc_dtypes
    # loss-facing outputs stay f32
    assert out["cls"].dtype == jnp.float32
    assert out["coord"].dtype == jnp.float32
    assert jnp.isfinite(out["cls"].astype(jnp.float32)).all()


@pytest.mark.slow
def test_scan_unroll_is_numerically_identical():
    """scan_unroll is a pure perf knob: lax.scan unroll must not change
    any output bit (same params via identical init seed, same math)."""
    outs = {}
    for unroll in (1, 2):
        cfg = DinoConfig(num_classes=3, num_queries=12, d_model=64,
                         n_heads=2, num_encoder_layers=2,
                         num_decoder_layers=2, d_ffn=64,
                         dn_single_pad=2, dn_groups=1, max_gt=4,
                         scan_unroll=unroll)
        m = DINODetector(cfg)
        imgs = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                           jnp.float32)
        hw = jnp.asarray([[64, 64]], jnp.int32)
        variables = m.init({"params": jax.random.PRNGKey(0)}, imgs, hw)
        outs[unroll] = m.apply(variables, imgs, hw)
    for k in ("cls", "coord"):
        assert jnp.abs(outs[1][k] - outs[2][k]).max() == 0.0, k
