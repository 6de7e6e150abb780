"""Native C++ runtime tests: codec parity with cv2, prefetch loader order."""
import os.path as osp

import cv2
import numpy as np
import pytest

from innfer_tpu.runtime import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_png_roundtrip_matches_cv2(lib, tmp_path, rng):
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    p_cv = str(tmp_path / "cv.png")
    p_nat = str(tmp_path / "nat.png")
    cv2.imwrite(p_cv, img)
    assert native.encode_png(p_nat, img)
    # native decode of both files == original
    for p in (p_cv, p_nat):
        dec = native.decode(p)
        np.testing.assert_array_equal(dec, img)
    # cv2 can read native-encoded file
    np.testing.assert_array_equal(cv2.imread(p_nat, cv2.IMREAD_UNCHANGED), img)


def test_png_rgba_and_gray(lib, tmp_path, rng):
    rgba = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    gray = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    for name, img in (("rgba", rgba), ("gray", gray)):
        p = str(tmp_path / f"{name}.png")
        cv2.imwrite(p, img)
        np.testing.assert_array_equal(native.decode(p), img)


def test_16bit_png_native_decode(lib, tmp_path, rng):
    """16-bit PNGs decode natively with cv2 IMREAD_UNCHANGED parity
    (uint16 BGR, native endianness) — round-1 stretch item."""
    for shape in ((8, 8, 3), (7, 9)):
        img16 = rng.integers(0, 65536, shape, dtype=np.uint16)
        p = str(tmp_path / f"deep{len(shape)}.png")
        cv2.imwrite(p, img16)
        dec = native.decode(p)
        assert dec is not None and dec.dtype == np.uint16
        np.testing.assert_array_equal(
            dec, cv2.imread(p, cv2.IMREAD_UNCHANGED))


def test_jpeg_decode_close_to_cv2(lib, tmp_path, rng):
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    p = str(tmp_path / "img.jpg")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    ours = native.decode(p)
    theirs = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert ours.shape == theirs.shape
    # different IDCT implementations may differ by a couple of levels
    assert np.mean(np.abs(ours.astype(int) - theirs.astype(int))) < 3.0


def test_prefetch_loader_order_and_fallback(lib, tmp_path, rng):
    paths = []
    imgs = []
    for i in range(6):
        img = rng.integers(0, 256, (10 + i, 12, 3), dtype=np.uint8)
        p = str(tmp_path / f"im{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
        imgs.append(img)
    # one file the native codec can't do (16-bit) -> fallback path
    deep = rng.integers(0, 65536, (7, 7, 3), dtype=np.uint16)
    pd = str(tmp_path / "im_deep.png")
    cv2.imwrite(pd, deep)
    paths.insert(3, pd)
    imgs.insert(3, deep)

    loader = native.PrefetchLoader(
        paths, capacity=3, threads=2,
        fallback=lambda p: cv2.imread(p, cv2.IMREAD_UNCHANGED))
    seen = []
    for idx, path, img in loader:
        seen.append(idx)
        np.testing.assert_array_equal(img, imgs[idx])
    loader.close()
    assert seen == list(range(len(paths)))  # submission order preserved


def test_palette_png_matches_cv2(lib, tmp_path, rng):
    """Indexed-color PNGs must come back BGR like cv2 (palette->rgb + bgr)."""
    from PIL import Image

    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    p = str(tmp_path / "pal.png")
    Image.fromarray(img[:, :, ::-1]).convert("P", palette=Image.ADAPTIVE).save(p)
    ours = native.decode(p)
    theirs = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(ours, theirs)


def test_corrupt_files_return_none(lib, tmp_path, rng):
    """Truncated PNG/JPEG must decode to None (cv2 fallback), exercising
    the longjmp error handlers (which also free the pixel buffers — the
    leak class fixed round 5)."""
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    p_png, p_jpg = str(tmp_path / "t.png"), str(tmp_path / "t.jpg")
    cv2.imwrite(p_png, img)
    cv2.imwrite(p_jpg, img)
    data = open(p_png, "rb").read()
    open(p_png, "wb").write(data[: len(data) // 2])  # truncate mid-stream
    assert native.decode(p_png) is None
    # libjpeg gray-fills MID-STREAM truncation (warning, cv2-parity) — the
    # error_exit/longjmp path needs a broken header
    data = open(p_jpg, "rb").read()
    open(p_jpg, "wb").write(data[:24])
    assert native.decode(p_jpg) is None


def test_stale_library_degrades_to_none(tmp_path, monkeypatch):
    """A truncated/corrupt .so newer than the sources (interrupted g++)
    must make get_lib return None — the documented cv2 fallback — not
    raise OSError out of every read/save call."""
    import os
    import time

    bad = tmp_path / "libbad.so"
    bad.write_bytes(b"not an elf")
    future = time.time() + 10 ** 6
    os.utime(str(bad), (future, future))
    monkeypatch.setattr(native, "_LIB_PATH", str(bad))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", False)
    assert native.get_lib() is None
    assert native._build_failed


def test_prebuilt_library_usable_without_sources(monkeypatch):
    """An installed tree without src/ must still load a prebuilt .so."""
    if not osp.exists(native._LIB_PATH):
        pytest.skip("native library not built")
    monkeypatch.setattr(native, "_SRC", native._SRC + "_missing")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", False)
    assert native.get_lib() is not None
