"""VOC converter test + GMM threshold parity vs sklearn (the reference's
actual GMM implementation, `dino_detr_ssod.py:832-890`)."""
import numpy as np
import pytest

import jax.numpy as jnp

VOC_XML = """<annotation>
  <filename>000001.jpg</filename>
  <size><width>353</width><height>500</height><depth>3</depth></size>
  <object>
    <name>dog</name><difficult>0</difficult>
    <bndbox><xmin>48</xmin><ymin>240</ymin><xmax>195</xmax><ymax>371</ymax></bndbox>
  </object>
  <object>
    <name>person</name><difficult>1</difficult>
    <bndbox><xmin>8</xmin><ymin>12</ymin><xmax>352</xmax><ymax>498</ymax></bndbox>
  </object>
</annotation>"""


def test_voc_to_coco_conversion(tmp_path):
    from semi_detr_tpu.data.coco import VOC_CLASSES, CocoDataset
    from semi_detr_tpu.data.voc import voc_to_coco

    (tmp_path / "000001.xml").write_text(VOC_XML)
    coco = voc_to_coco(str(tmp_path))
    assert len(coco["images"]) == 1
    assert coco["images"][0]["width"] == 353
    assert len(coco["annotations"]) == 2
    dog = coco["annotations"][0]
    # 1-based inclusive -> 0-based xywh
    assert dog["bbox"] == [47.0, 239.0, 195 - 47, 371 - 239]
    assert dog["ignore"] == 0
    person = coco["annotations"][1]
    assert person["ignore"] == 1  # difficult -> ignore region

    ds = CocoDataset(coco, classes=VOC_CLASSES, filter_empty_gt=False,
                     test_mode=True)
    rec = ds[0]
    assert len(rec.boxes) == 1            # difficult moved to ignore
    assert len(rec.boxes_ignore) == 1
    assert rec.labels[0] == VOC_CLASSES.index("dog")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gmm_threshold_matches_sklearn(seed):
    """The in-graph EM must reproduce the reference's sklearn fit +
    threshold rule (top-scored sample of the low-cost component)."""
    sklearn = pytest.importorskip("sklearn")
    import sklearn.mixture as skm

    from semi_detr_tpu.ops.gmm import fit_gmm_threshold

    rs = np.random.RandomState(seed)
    # bimodal cost pool like real match costs
    lo = rs.normal(2.0, 0.5, size=40)
    hi = rs.normal(8.0, 1.0, size=25)
    costs = np.concatenate([lo, hi]).astype(np.float32)

    # reference procedure (dino_detr_ssod.py:843-890)
    x = np.sort(costs).reshape(-1, 1).astype(np.float64)
    gmm = skm.GaussianMixture(
        2, weights_init=[0.5, 0.5],
        means_init=np.array([[x.min()], [x.max()]]),
        precisions_init=np.ones((2, 1)), covariance_type="diag",
        reg_covar=1e-5)
    gmm.fit(x)
    assign = gmm.predict(x)
    scores = gmm.score_samples(x)
    mask = assign == 0
    if mask.any():
        ref_thr = float(x[mask][np.argmax(scores[mask])])
    else:
        ref_thr = float(x[assign == 1][np.argmax(scores[assign == 1])])

    pad = np.concatenate([costs, np.zeros(35, np.float32)])
    valid = np.concatenate([np.ones(65, bool), np.zeros(35, bool)])
    got = float(fit_gmm_threshold(jnp.asarray(pad), jnp.asarray(valid)))
    # same threshold up to EM convergence differences
    assert got == pytest.approx(ref_thr, abs=0.5)
    # and it separates the modes
    assert 0.5 < got < 8.0


def test_gmm_degenerate_pools():
    from semi_detr_tpu.ops.gmm import fit_gmm_threshold
    empty = float(fit_gmm_threshold(jnp.zeros(8), jnp.zeros(8, bool)))
    assert empty == 0.0
    single = float(fit_gmm_threshold(
        jnp.asarray([3.0] + [0.0] * 7),
        jnp.asarray([True] + [False] * 7)))
    assert single == pytest.approx(3.0)
