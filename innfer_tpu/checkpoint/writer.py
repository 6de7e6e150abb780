"""Torch-free writer for PyTorch-compatible ``.pth`` checkpoints.

Completes the checkpoint subsystem (SURVEY.md §5): models converted or
edited inside this framework (e.g. SWA-unwrapped, mesrgan->esrgan remapped,
or JAX-finetuned params transposed back) can be saved in the zip container
format that ``torch.load`` — and this framework's reader — both accept.

The pickle payload is emitted as raw opcodes (protocol 2) so no torch
import is needed: standard pickle.Pickler would verify that GLOBAL targets
resolve to the *same object* in an importable module, which only torch
itself could satisfy.
"""
from __future__ import annotations

import pickle
import struct
import zipfile
from typing import Dict

import numpy as np

try:
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BF16 = None

_STORAGE_BY_DTYPE = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("float16"): "HalfStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
    np.dtype("int16"): "ShortStorage",
    np.dtype("int8"): "CharStorage",
    np.dtype("uint8"): "ByteStorage",
    np.dtype("bool"): "BoolStorage",
}
if _BF16 is not None:
    _STORAGE_BY_DTYPE[_BF16] = "BFloat16Storage"


class _Opcodes:
    """Minimal protocol-2 pickle emitter."""

    def __init__(self):
        self.out = bytearray()
        self.memo_n = 0

    def proto(self):
        self.out += b"\x80\x02"

    def global_(self, module: str, name: str):
        self.out += b"c" + module.encode() + b"\n" + name.encode() + b"\n"

    def unicode(self, s: str):
        b = s.encode("utf-8")
        self.out += b"X" + struct.pack("<I", len(b)) + b

    def int_(self, v: int):
        if 0 <= v < 256:
            self.out += b"K" + bytes([v])
        elif 0 <= v < 65536:
            self.out += b"M" + struct.pack("<H", v)
        elif -2 ** 31 <= v < 2 ** 31:
            self.out += b"J" + struct.pack("<i", v)
        else:
            # LONG1 for values outside signed 32-bit (e.g. numel/stride of
            # very large storages)
            nbytes = (v.bit_length() + 8) // 8  # +1 sign bit headroom
            self.out += b"\x8a" + bytes([nbytes]) + v.to_bytes(
                nbytes, "little", signed=True)

    def none(self):
        self.out += b"N"

    def bool_(self, v: bool):
        self.out += b"\x88" if v else b"\x89"

    def mark(self):
        self.out += b"("

    def tuple_(self):
        self.out += b"t"

    def tuple2(self):
        self.out += b"\x86"

    def empty_dict(self):
        self.out += b"}"

    def empty_tuple(self):
        self.out += b")"

    def setitem(self):
        self.out += b"s"

    def setitems(self):
        self.out += b"u"

    def reduce(self):
        self.out += b"R"

    def binpersid(self):
        self.out += b"Q"

    def stop(self):
        self.out += b"."


def write_checkpoint(path: str, state: Dict[str, np.ndarray]) -> None:
    """Save ``{key: array}`` as a torch-zip checkpoint (torch.load-able).

    Arrays are written contiguously; unsupported dtypes raise ValueError.
    """
    arrays = {}
    for key, val in state.items():
        a0 = np.asarray(val)
        # np.ascontiguousarray promotes 0-d arrays to shape (1,) — reshape
        # back so scalar entries (BN num_batches_tracked, SWA n_averaged)
        # round-trip with their true rank
        arr = np.ascontiguousarray(a0).reshape(a0.shape)
        if arr.dtype not in _STORAGE_BY_DTYPE:
            raise ValueError(f"unsupported dtype {arr.dtype} for key {key}")
        arrays[key] = arr

    p = _Opcodes()
    p.proto()
    p.empty_dict()
    p.mark()
    for i, (key, arr) in enumerate(arrays.items()):
        storage_key = str(i)
        p.unicode(key)
        # torch._utils._rebuild_tensor_v2(storage, offset, size, stride,
        #                                 requires_grad, backward_hooks)
        p.global_("torch._utils", "_rebuild_tensor_v2")
        p.mark()
        # persistent id tuple: ('storage', StorageType, key, location, numel)
        p.mark()
        p.unicode("storage")
        p.global_("torch", _STORAGE_BY_DTYPE[arr.dtype])
        p.unicode(storage_key)
        p.unicode("cpu")
        p.int_(arr.size)
        p.tuple_()
        p.binpersid()
        p.int_(0)  # storage offset
        p.mark()
        for d in arr.shape:
            p.int_(d)
        p.tuple_()
        # contiguous strides (in elements)
        strides = []
        acc = 1
        for d in reversed(arr.shape):
            strides.append(acc)
            acc *= d
        p.mark()
        for s in reversed(strides):
            p.int_(s)
        p.tuple_()
        p.bool_(False)  # requires_grad
        # backward_hooks: collections.OrderedDict()
        p.global_("collections", "OrderedDict")
        p.empty_tuple()
        p.reduce()
        p.tuple_()
        p.reduce()
    p.setitems()
    p.stop()

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", bytes(p.out))
        zf.writestr("archive/version", "3\n")
        for i, arr in enumerate(arrays.values()):
            zf.writestr(f"archive/data/{i}", arr.tobytes())
