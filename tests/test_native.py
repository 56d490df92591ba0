"""Native C++ image ops: parity with the PIL/numpy reference paths."""

import numpy as np
import pytest
from PIL import Image

from zoomearth_tpu import native
from zoomearth_tpu.image.loader import PrefetchLoader, TileImage
from zoomearth_tpu.image.preprocess import (
    IMAGE_MEAN,
    IMAGE_STD,
    normalize,
    patchify,
    preprocess_image,
    preprocess_image_fast,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), dtype=np.uint8)


def test_normalize_patchify_exact():
    img = _img(112, 140)
    ref = patchify(normalize(img))[0]
    out = native.normalize_patchify(img, IMAGE_MEAN, IMAGE_STD)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_crop_byte_identical_to_pil():
    img = _img(500, 400)
    pil = np.asarray(Image.fromarray(img).crop((30, 50, 330, 350)))
    assert np.array_equal(native.crop(img, (30, 50, 330, 350)), pil)


def test_resize_close_to_pil():
    img = _img(1000, 800, seed=2)
    pil = np.asarray(Image.fromarray(img).resize((256, 320), Image.BICUBIC))
    cpp = native.resize_bicubic(img, 320, 256)
    diff = np.abs(pil.astype(int) - cpp.astype(int))
    assert diff.max() <= 1  # within PIL's fixed-point rounding


def test_preprocess_u8_device_normalize_matches_fp32():
    """uint8 path + device-order normalization == host fp32 path, bit-exact; native
    and numpy patchify_u8 agree byte-for-byte."""
    from zoomearth_tpu.image.preprocess import preprocess_image_u8

    img = Image.fromarray(_img(620, 480, seed=7))
    ref_pv, ref_grid = preprocess_image(img, max_pixels=256 * 28 * 28)
    u8_pv, u8_grid = preprocess_image_u8(img, max_pixels=256 * 28 * 28)
    assert u8_grid == ref_grid and u8_pv.dtype == np.uint8
    reps = u8_pv.shape[-1] // 3
    dev = (u8_pv.astype(np.float32) / 255.0 - np.repeat(IMAGE_MEAN, reps)) / np.repeat(
        IMAGE_STD, reps
    )
    np.testing.assert_array_equal(dev.astype(np.float32), ref_pv)

    import zoomearth_tpu.native as N

    orig = N.available
    N.available = lambda: False
    try:
        np_pv, np_grid = preprocess_image_u8(img, max_pixels=256 * 28 * 28)
    finally:
        N.available = orig
    assert np_grid == u8_grid and np.array_equal(np_pv, u8_pv)


def test_preprocess_fast_matches_reference_pipeline():
    """Fast path must produce the SAME pixels as the parity path (PIL resize +
    float-exact patchify)."""
    img = Image.fromarray(_img(600, 500, seed=3))
    ref_pv, ref_grid = preprocess_image(img, max_pixels=256 * 28 * 28)
    fast_pv, fast_grid = preprocess_image_fast(img, max_pixels=256 * 28 * 28)
    assert ref_grid == fast_grid
    np.testing.assert_allclose(fast_pv, ref_pv, atol=1e-6)


class TestTileImage:
    def test_crop_matches_pil(self):
        arr = _img(800, 900, seed=4)
        t = TileImage(arr)
        pil = np.asarray(Image.fromarray(arr).crop((10, 20, 522, 532)))
        assert np.array_equal(t.crop((10, 20, 522, 532)).array, pil)

    def test_resize_matches_pil(self):
        arr = _img(640, 480, seed=5)
        t = TileImage(arr)
        pil = np.asarray(Image.fromarray(arr).resize((120, 160), Image.BICUBIC))
        assert np.array_equal(t.resize((120, 160)).array, pil)

    def test_size_accessors(self):
        t = TileImage(_img(300, 400))
        assert t.size == (400, 300) and t.width == 400 and t.height == 300

    def test_works_with_geometry_cut_image(self):
        from zoomearth_tpu.image.geometry import cut_image

        t = TileImage(_img(2000, 2000, seed=6))
        crop = cut_image(t, [100, 100, 140, 140])
        assert crop.size == (512, 512)


class TestPrefetchLoader:
    def test_order_preserved(self):
        out = list(PrefetchLoader(range(10), lambda i: i * i, depth=3))
        assert out == [i * i for i in range(10)]

    def test_exception_propagates(self):
        def boom(i):
            if i == 2:
                raise RuntimeError("x")
            return i

        it = iter(PrefetchLoader(range(4), boom, depth=2))
        assert next(it) == 0 and next(it) == 1
        with pytest.raises(RuntimeError):
            next(it)

    def test_overlap_actually_happens(self):
        import time

        def slow(i):
            time.sleep(0.05)
            return i

        loader = PrefetchLoader(range(4), slow, depth=2)
        t0 = time.time()
        for _ in loader:
            time.sleep(0.05)  # consumer work overlaps producer work
        elapsed = time.time() - t0
        assert elapsed < 0.35  # serial would be ~0.4s
