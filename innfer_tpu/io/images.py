"""Host-side image I/O and directory scanning.

Equivalent of /root/reference/utils/utils.py:17-133 (scan_dir, read_img,
save_img, save_img_comp) and the host-side geometry helpers modcrop /
linear_resize (utils.py:251-275).  cv2 keeps images BGR HWC uint8/uint16 on
disk; the device pipeline converts to RGB floats (innfer_tpu.pipeline).
"""
from __future__ import annotations

import os
import os.path as osp
from typing import List, Optional, Sequence

import cv2
import numpy as np

MODEL_EXTENSIONS = (".pth", ".pt")
IMG_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".webp", "tga", ".tif", ".tiff", ".dng",
)

MAX_VALUES_BY_DTYPE = {
    np.dtype("int8"): 127,
    np.dtype("uint8"): 255,
    np.dtype("int16"): 32767,
    np.dtype("uint16"): 65535,
    np.dtype("int32"): 2147483647,
    np.dtype("uint32"): 4294967295,
    np.dtype("int64"): 9223372036854775807,
    np.dtype("uint64"): 18446744073709551615,
    np.dtype("float32"): 1.0,
    np.dtype("float64"): 1.0,
}

try:  # DNG raw support is optional, as in the reference (utils.py:10-14)
    import rawpy

    _RAWPY = True
except ImportError:
    _RAWPY = False


def scan_dir(path: str, extensions: Sequence[str] = IMG_EXTENSIONS) -> List[str]:
    if not osp.isdir(path):
        raise AssertionError(f"{path} is not a valid directory")
    found = []
    for dirpath, _, fnames in sorted(os.walk(path)):
        for fname in sorted(fnames):
            if any(fname.endswith(ext) for ext in extensions):
                found.append(osp.join(dirpath, fname))
    return found


def get_models_paths(path: str) -> List[str]:
    models = scan_dir(path, MODEL_EXTENSIONS)
    if not models:
        raise AssertionError(f"{path} has no valid model file")
    return models


def get_images_paths(path: str) -> List[str]:
    images = scan_dir(path, IMG_EXTENSIONS)
    if not images:
        raise AssertionError(f"{path} has no valid image file")
    return images


def read_img(path: str, use_native: bool = True) -> Optional[np.ndarray]:
    """Read an image as numpy HWC BGR (uint8/uint16), like the reference.

    Uses the native C++ codec (runtime/native.py) for 8-bit PNG/JPEG and
    falls back to cv2 (and rawpy for DNG) for everything else."""
    if not path:
        raise AssertionError("Empty path provided.")
    if _RAWPY and path[-3:].lower() == "dng":
        with rawpy.imread(path) as raw:
            return raw.postprocess()
    if use_native:
        from innfer_tpu.runtime import native

        img = native.decode(path)
        if img is not None:
            return img
    return cv2.imread(path, cv2.IMREAD_UNCHANGED)


def save_img(img: np.ndarray, img_path: str, scale: Optional[float] = None) -> None:
    if scale:
        img = cv2.resize(img, dsize=None, fx=scale, fy=scale,
                         interpolation=cv2.INTER_NEAREST)
    os.makedirs(osp.dirname(osp.abspath(img_path)), exist_ok=True)
    if img_path.lower().endswith(".png") and img.dtype == np.uint8:
        from innfer_tpu.runtime import native

        if native.encode_png(img_path, img):
            return
    if not cv2.imwrite(img_path, img):
        # imwrite signals failure (full disk, bad extension, lost write
        # permission) by RETURN VALUE only — swallowing it would let a
        # directory run report written paths for missing files
        raise OSError(f"failed to write image {img_path}")


def merge_imgs(img_list) -> np.ndarray:
    """Horizontally concatenate, NN-upscaling smaller entries to match."""
    if isinstance(img_list, np.ndarray):
        return img_list
    if not isinstance(img_list, list):
        raise NotImplementedError("img_list should be a list of cv2 images")
    max_h = max(im.shape[0] for im in img_list)
    max_w = max(im.shape[1] for im in img_list)
    resized = [
        im if (im.shape[0] == max_h and im.shape[1] == max_w)
        else cv2.resize(im, (max_w, max_h), interpolation=cv2.INTER_NEAREST)
        for im in img_list
    ]
    return cv2.hconcat(resized)


def save_img_comp(img_list, img_path: str) -> None:
    save_img(merge_imgs(img_list), img_path)


def modcrop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H, W down to multiples of ``scale`` (utils.py:251-264)."""
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale, ...]


def linear_resize(img: np.ndarray, st: int = 256) -> np.ndarray:
    """Resize up to the next multiple of ``st`` through linear light
    (utils.py:267-275): srgb->linear, bicubic, linear->srgb.

    The pointwise srgb<->linear math runs in HOST numpy (same formulas as
    ops/colors.py): this sits on the blocking per-image prepare path, and
    routing it through device arrays would add two host->device->host
    round-trips of float32 pixels over the tunnel-bound link."""
    h, w = img.shape[:2]
    if h % st == 0 and w % st == 0:
        return img
    oh, ow = -(-h // st) * st, -(-w // st) * st
    a, att, gamma = 0.055, 12.92, 2.4
    x = img.astype(np.float32) / 255.0
    linear = np.where(x <= 0.04045, x / att,
                      np.power((x + a) / (1 + a), gamma))
    linear = cv2.resize(linear, dsize=(ow, oh), interpolation=cv2.INTER_CUBIC)
    x = np.clip(linear, 0.0, 1.0)
    srgb = np.where(x <= 0.0031308, x * att,
                    (1 + a) * np.power(x, 1.0 / gamma) - a)
    return np.clip(srgb * 255.0, 0.0, 255.0).astype(np.uint8)
