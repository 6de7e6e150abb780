"""Host-side I/O and geometry helper tests (io/images.py)."""
import numpy as np
import pytest

from innfer_tpu.io import images as iio


class TestModcrop:
    def test_crops_to_multiple(self, rng):
        img = rng.integers(0, 256, (34, 53, 3), dtype=np.uint8)
        out = iio.modcrop(img, 4)
        assert out.shape == (32, 52, 3)
        np.testing.assert_array_equal(out, img[:32, :52])

    def test_2d(self, rng):
        img = rng.integers(0, 256, (9, 9), dtype=np.uint8)
        assert iio.modcrop(img, 4).shape == (8, 8)


class TestLinearResize:
    def test_identity_when_multiple(self, rng):
        img = rng.integers(0, 256, (256, 512, 3), dtype=np.uint8)
        np.testing.assert_array_equal(iio.linear_resize(img, 256), img)

    def test_resizes_up_to_next_multiple(self, rng):
        img = rng.integers(0, 256, (200, 300, 3), dtype=np.uint8)
        out = iio.linear_resize(img, 256)
        assert out.shape == (256, 512, 3)
        assert out.dtype == np.uint8

    def test_flat_image_is_preserved(self):
        """Resizing through linear light must not shift flat colors
        (srgb->linear->srgb roundtrip exactness on constant regions)."""
        img = np.full((100, 130, 3), 120, np.uint8)
        out = iio.linear_resize(img, 128)
        assert out.shape == (128, 256, 3)
        # interior is exactly the flat color (bicubic of constant = constant)
        assert np.all(np.abs(out[5:-5, 5:-5].astype(int) - 120) <= 1)


class TestMergeImgs:
    def test_hconcat_with_nn_upscale(self, rng):
        a = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
        b = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
        out = iio.merge_imgs([a, b])
        assert out.shape == (20, 48, 3)
        np.testing.assert_array_equal(out[:, 24:], b)

    def test_passthrough_array(self, rng):
        a = rng.integers(0, 256, (5, 5, 3), dtype=np.uint8)
        np.testing.assert_array_equal(iio.merge_imgs(a), a)

    def test_rejects_non_list(self):
        with pytest.raises(NotImplementedError):
            iio.merge_imgs("nope")


class TestScanDir:
    def test_sorted_recursive(self, tmp_path, rng):
        (tmp_path / "sub").mkdir()
        for name in ("b.png", "a.png", "sub/c.jpg", "skip.txt"):
            (tmp_path / name).write_bytes(b"x")
        found = iio.scan_dir(str(tmp_path))
        names = [p.split("/")[-1] for p in found]
        assert names == ["a.png", "b.png", "c.jpg"]

    def test_invalid_dir(self):
        with pytest.raises(AssertionError):
            iio.scan_dir("/nonexistent/dir")
