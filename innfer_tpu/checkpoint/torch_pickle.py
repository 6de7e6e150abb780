"""Torch-free reader for PyTorch ``.pth`` checkpoints.

Parses both the zipfile container format (torch >= 1.6 default) and the
legacy sequential-pickle format, reconstructing tensors as numpy arrays
without importing torch.  This replaces the reference's ``torch.load``
(/root/reference/run.py:44) as a first-class component of the framework
(SURVEY.md §5 "checkpoint/resume").

Design notes
------------
* A restricted ``pickle.Unpickler`` whitelists only the torch rebuild
  helpers and container types a state dict can contain; anything else
  raises ``UnpicklingError`` (no arbitrary code execution).
* Storages are materialized lazily from the raw little-endian buffers, then
  tensors are built with numpy ``as_strided`` to honor offset/stride views.
* bfloat16 payloads use ``ml_dtypes.bfloat16`` (numpy has no native bf16).
"""
from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, BinaryIO, Dict

import numpy as np

try:  # ml_dtypes ships with jax
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
    "BFloat16Storage": _BFLOAT16,
    "ComplexFloatStorage": np.dtype("<c8"),
    "ComplexDoubleStorage": np.dtype("<c16"),
}


class _AttrDict(dict):
    """dict that accepts attribute assignment (state dicts carry _metadata)."""


class _StorageType:
    """Stand-in for torch.FloatStorage & co. found in pickle GLOBAL opcodes."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES.get(name)

    def __repr__(self):  # pragma: no cover
        return f"_StorageType({self.name})"


class _Storage:
    """A raw storage buffer: bytes + element dtype."""

    def __init__(self, data: bytes, dtype: np.dtype):
        if dtype is None:
            raise pickle.UnpicklingError("unsupported storage dtype (bfloat16 needs ml_dtypes)")
        self.data = data
        self.dtype = dtype


class _LazyTensor:
    """Tensor whose storage payload arrives after the pickle (legacy format)."""

    def __init__(self, storage: _Storage, offset, size, stride):
        self.spec = (storage, offset, size, stride)

    def materialize(self) -> np.ndarray:
        return _rebuild_tensor_v2(*self.spec)


def _materialize(obj):
    if isinstance(obj, _LazyTensor):
        return obj.materialize()
    if isinstance(obj, dict):
        return {k: _materialize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_materialize(v) for v in obj)
    return obj


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride, *_args):
    if not storage.data:
        return _LazyTensor(storage, storage_offset, size, stride)
    itemsize = storage.dtype.itemsize
    buf = np.frombuffer(storage.data, dtype=storage.dtype)
    if not size:  # 0-dim tensor
        return buf[storage_offset].copy().reshape(())
    byte_strides = tuple(s * itemsize for s in stride)
    base = buf[storage_offset:]
    arr = np.lib.stride_tricks.as_strided(base, shape=tuple(size), strides=byte_strides)
    return np.ascontiguousarray(arr)


def _rebuild_tensor(storage: _Storage, storage_offset, size, stride) -> np.ndarray:
    return _rebuild_tensor_v2(storage, storage_offset, size, stride)


def _rebuild_parameter(data: np.ndarray, *_args) -> np.ndarray:
    return data


class _Unpickler(pickle.Unpickler):
    """Restricted unpickler for state-dict payloads."""

    def __init__(self, file: BinaryIO, storage_loader):
        super().__init__(file, encoding="latin1")
        self._storage_loader = storage_loader

    def find_class(self, module: str, name: str):
        if module == "collections" and name == "OrderedDict":
            return _AttrDict  # tolerates the _metadata attribute BUILD sets
        if module in ("torch._utils", "torch._tensor"):
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name == "_rebuild_tensor":
                return _rebuild_tensor
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module == "torch" and name == "Size":
            return tuple
        if module == "numpy.core.multiarray" and name == "scalar":
            return lambda dtype, data: np.frombuffer(data, dtype=dtype)[0]
        if module == "numpy" and name == "dtype":
            return np.dtype
        raise pickle.UnpicklingError(f"forbidden global in checkpoint: {module}.{name}")

    def persistent_load(self, saved_id):
        if not isinstance(saved_id, tuple) or saved_id[0] != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id: {saved_id!r}")
        _, storage_type, key, _location, numel = saved_id[:5]
        dtype = storage_type.dtype if isinstance(storage_type, _StorageType) else None
        return self._storage_loader(str(key), dtype, numel)


def _load_zip(path: str) -> Dict[str, Any]:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(
            (n for n in names if n.endswith("/data.pkl") or n == "data.pkl"), None
        )
        if pkl_name is None:
            raise ValueError(f"{path} is a zip file but not a torch checkpoint (no data.pkl)")
        prefix = pkl_name[: -len("data.pkl")]

        storages: Dict[str, _Storage] = {}

        def loader(key: str, dtype: np.dtype, _numel: int) -> _Storage:
            # memoize like the legacy path: tensors sharing one storage
            # (tied weights, multiple views) must alias ONE _Storage, not
            # re-read and re-materialize the zip entry per reference
            if key not in storages:
                storages[key] = _Storage(zf.read(f"{prefix}data/{key}"), dtype)
            return storages[key]

        with zf.open(pkl_name) as f:
            return _Unpickler(io.BytesIO(f.read()), loader).load()


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


class _HeaderUnpickler(pickle.Unpickler):
    """For the legacy header/trailer pickles (ints, dicts of primitives,
    lists of strings): forbids ALL globals so a crafted header can't run
    code before the restricted payload unpickler is even reached."""

    def find_class(self, module, name):  # pragma: no cover - security guard
        raise pickle.UnpicklingError(
            f"forbidden global in checkpoint header: {module}.{name}")


def _header_load(f: BinaryIO):
    return _HeaderUnpickler(f, encoding="latin1").load()


def _load_legacy(f: BinaryIO) -> Dict[str, Any]:
    magic = _header_load(f)
    if magic != _LEGACY_MAGIC:
        raise pickle.UnpicklingError("not a legacy torch checkpoint")
    _header_load(f)  # protocol version
    _header_load(f)  # sys info

    storages: Dict[str, _Storage] = {}
    pending: Dict[str, tuple] = {}

    def loader(key: str, dtype: np.dtype, numel: int) -> _Storage:
        # BINPERSID is not memoized by pickle: tensors sharing one storage
        # (tied weights) call this again with the same key — return the
        # existing storage so both views get the payload
        if key in storages:
            return storages[key]
        st = _Storage(b"", dtype)
        pending[key] = (st, numel)
        storages[key] = st
        return st

    result = _Unpickler(f, loader).load()

    # trailing section: list of storage keys, then raw payloads
    keys = _header_load(f)
    for key in keys:
        st, _numel = pending[str(key)]
        (numel_on_disk,) = struct.unpack("<q", f.read(8))
        st.data = f.read(numel_on_disk * st.dtype.itemsize)
    return _materialize(result)


def load_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth``/``.pt`` state dict as ``{key: numpy array}``.

    Supports the zip container (torch >= 1.6) and the legacy sequential
    format.  TorchScript archives (which contain code, not just tensors)
    are rejected with a clear error.
    """
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
        if any(n.endswith("constants.pkl") for n in names):
            raise ValueError(
                f"{path} is a TorchScript archive; only state-dict checkpoints are "
                "supported (reference '-a ts' path is torch-runtime-specific)"
            )
        state = _load_zip(path)
    else:
        with open(path, "rb") as f:
            state = _load_legacy(f)
    if not isinstance(state, dict):
        raise ValueError(f"{path} did not contain a state dict (got {type(state)})")
    # unwrap nested containers some trainers save ({'state_dict': ...} etc.)
    for key in ("params_ema", "params", "state_dict", "model_state_dict"):
        if key in state and isinstance(state[key], dict):
            state = state[key]
            break
    return state
