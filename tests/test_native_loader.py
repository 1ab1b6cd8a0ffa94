"""Native C++ dataloader: decode/resize/normalize parity + prefetcher."""
import numpy as np
import pytest

from semi_detr_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader not built")


@pytest.fixture(scope="module")
def img():
    return (np.random.RandomState(0).rand(50, 70, 3) * 255).astype(
        np.uint8)


def test_jpeg_decode_matches_cv2(img):
    import cv2
    ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    dec = native.decode_image(enc.tobytes())
    ref = cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR),
                       cv2.COLOR_BGR2RGB)
    assert (dec == ref).all()


def test_png_decode_lossless(img):
    import cv2
    ok, enc = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    dec = native.decode_image(enc.tobytes())
    assert (dec == img).all()


def test_resize_matches_cv2(img):
    import cv2
    got = native.resize_bilinear(img, 25, 37)
    ref = cv2.resize(img, (37, 25), interpolation=cv2.INTER_LINEAR)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_normalize_pad(img):
    from semi_detr_tpu.data.augment import IMG_MEAN, IMG_STD
    out = native.normalize_pad(img, (64, 80), IMG_MEAN, IMG_STD)
    ref = np.zeros((64, 80, 3), np.float32)
    ref[:50, :70] = (img.astype(np.float32) - IMG_MEAN) / IMG_STD
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_prefetch_loader(tmp_path, img):
    import cv2
    path = str(tmp_path / "a.jpg")
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    pl = native.PrefetchLoader(2)
    for i in range(3):
        pl.submit(i, path, (30, 40))
    pl.submit(9, str(tmp_path / "missing.jpg"))
    got = sorted([pl.next() for _ in range(4)], key=lambda t: t[0])
    pl.close()
    assert [g[0] for g in got] == [0, 1, 2, 9]
    assert all(g[1].shape == (30, 40, 3) for g in got[:3])
    assert got[3][1] is None


def test_decode_corrupt_returns_none():
    assert native.decode_image(b"not an image") is None
