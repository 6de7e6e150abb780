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

    def test_matches_device_color_formulas(self, rng):
        """linear_resize's HOST numpy srgb<->linear math (kept on host to
        avoid two device round-trips on the blocking prepare path) must
        agree with ops/colors.py's device formulas."""
        import cv2
        import jax.numpy as jnp

        from innfer_tpu.ops import colors

        img = rng.integers(0, 256, (40, 52, 3), dtype=np.uint8)
        out = iio.linear_resize(img, 64)
        lin = np.asarray(colors.srgb_to_linear(jnp.asarray(img)))
        lin = cv2.resize(lin, dsize=(64, 64), interpolation=cv2.INTER_CUBIC)
        ref = np.asarray(colors.linear_to_srgb(jnp.asarray(lin)))
        assert out.shape == ref.shape == (64, 64, 3)
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


class TestSaveImg:
    def test_raises_on_imwrite_failure(self, tmp_path, monkeypatch):
        """cv2.imwrite signals failure by RETURN VALUE only; save_img must
        raise so a directory run can't report written paths for missing
        files (pipeline's end-of-run drain surfaces it)."""
        from innfer_tpu.runtime import native

        monkeypatch.setattr(iio.cv2, "imwrite", lambda *a, **k: False)
        monkeypatch.setattr(native, "encode_png", lambda *a, **k: False)
        img = np.zeros((4, 4, 3), np.uint8)
        with pytest.raises(OSError):
            iio.save_img(img, str(tmp_path / "x.png"))


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
