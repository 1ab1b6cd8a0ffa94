"""StableHLO export round-trip — the TPU-native deployment-artifact path
(the reference's ONNX-export analog, `detr_od/models/dino_detr.py:52-72`).

Exports the jitted predict program with weights baked in, serializes,
deserializes, and checks the artifact reproduces the in-process outputs
(up to last-ulp compile-fusion jitter — the deserialized program is
re-lowered, so fusions can differ) on the same platform.
"""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector
from semi_detr_tpu.models.inference import make_predict_fn

TINY = DinoConfig(num_classes=7, num_queries=24, d_model=64, n_heads=2,
                  num_encoder_layers=2, num_decoder_layers=2, d_ffn=64,
                  dn_single_pad=4, dn_groups=2, max_gt=8)


@pytest.mark.slow
def test_stablehlo_export_roundtrip():
    from jax import export as jexport

    model = DINODetector(TINY)
    imgs = jnp.asarray(np.random.RandomState(0)
                       .randn(1, 64, 96, 3).astype(np.float32))
    hw = jnp.asarray([[64, 96]], jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, imgs, hw)

    predict = make_predict_fn(model)
    want = predict(variables, imgs, hw)

    fn = jax.jit(lambda im, h: predict(variables, im, h))
    exported = jexport.export(fn)(imgs, hw)
    blob = exported.serialize()
    assert len(blob) > 1000
    restored = jexport.deserialize(blob)
    got = restored.call(imgs, hw)

    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(w, np.float32),
                                   np.asarray(g, np.float32),
                                   rtol=1e-4, atol=1e-4)
