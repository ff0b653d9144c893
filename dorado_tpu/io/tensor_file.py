"""Pure-numpy reader/writer for dorado ``.tensor`` weight files.

Dorado model directories store each weight as a TorchScript zip archive
written by ``torch::save`` / ``torch::jit::pickle_save`` and read back with
``torch::load`` (reference: dorado/torch_utils/tensor_utils.cpp:147-165,
dorado/basecall/crf_utils.cpp:26-91).  The archive layout is::

    <name>/data.pkl           pickle of a __torch__.Module whose parameters
                              ("0", "1", ...) are the tensors
    <name>/data/<key>         raw little-endian storage bytes per tensor
    <name>/code/__torch__.py  TorchScript source stub (ignored)
    <name>/constants.pkl      empty tuple
    <name>/version            archive version

We parse the pickle ourselves (a tiny custom Unpickler with a
``persistent_load`` hook) so the production loader has **no torch
dependency** — tensors come back as numpy arrays, ready to become jax
arrays. bfloat16 maps to ``ml_dtypes.bfloat16`` (the dtype jax itself uses).
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from pathlib import Path

import ml_dtypes
import numpy as np

# torch storage class name -> numpy dtype
_STORAGE_DTYPES = {
    "DoubleStorage": np.dtype(np.float64),
    "FloatStorage": np.dtype(np.float32),
    "HalfStorage": np.dtype(np.float16),
    "BFloat16Storage": np.dtype(ml_dtypes.bfloat16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}
_DTYPE_TO_STORAGE = {v: k for k, v in _STORAGE_DTYPES.items()}


class _Storage:
    """Stand-in for a torch typed storage: dtype + archive data key."""

    def __init__(self, dtype: np.dtype, key: str, numel: int):
        self.dtype = dtype
        self.key = key
        self.numel = numel


class _Module(dict):
    """Stand-in for __torch__.Module: collects its parameter dict."""

    def __setstate__(self, state):
        self.update(state)


class _OrderedDictStandin(dict):
    pass


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *_args):
    return ("tensor", storage, storage_offset, tuple(size), tuple(stride))


class _TensorUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module == "torch._utils" and name.startswith("_rebuild_tensor"):
            return _rebuild_tensor_v2
        if module == "torch" and name in _STORAGE_DTYPES:
            return _STORAGE_DTYPES[name]
        if module.startswith("__torch__") or name == "Module":
            # torchscript class path varies with the saving module's name
            return _Module
        if module == "collections" and name == "OrderedDict":
            return _OrderedDictStandin
        raise pickle.UnpicklingError(f"unsupported global {module}.{name}")

    def persistent_load(self, pid):
        kind, dtype, key, _device, numel = pid
        if kind != "storage":
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        return _Storage(np.dtype(dtype), str(key), int(numel))


def _materialise(archive: zipfile.ZipFile, root: str, obj) -> np.ndarray:
    _tag, storage, offset, size, stride = obj
    raw = archive.read(f"{root}/data/{storage.key}")
    flat = np.frombuffer(raw, dtype=storage.dtype)
    if not size:
        return flat[offset].copy()
    itemstride = tuple(s * storage.dtype.itemsize for s in stride)
    arr = np.lib.stride_tricks.as_strided(flat[offset:], shape=size, strides=itemstride)
    return np.ascontiguousarray(arr)


def load_tensor_file(path: Path | str) -> list[np.ndarray]:
    """Load every tensor in a ``.tensor`` archive, in parameter-name order."""
    path = Path(path)
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        pkl = next(n for n in names if n.endswith("/data.pkl"))
        root = pkl[: -len("/data.pkl")]
        module = _TensorUnpickler(io.BytesIO(z.read(pkl))).load()
        # numeric keys are the saved parameters; jit-scripted modules also
        # carry attributes like "training" — ignore those
        items = sorted(
            ((k, v) for k, v in module.items() if str(k).isdigit()),
            key=lambda kv: int(kv[0]),
        )
        return [_materialise(z, root, v) for _, v in items]


def load_tensor(path: Path | str) -> np.ndarray:
    """Load a single-tensor ``.tensor`` archive."""
    tensors = load_tensor_file(path)
    if len(tensors) != 1:
        raise ValueError(f"{path}: expected 1 tensor, found {len(tensors)}")
    return tensors[0]


# ---------------------------------------------------------------------------
# Writer (for tests/fixtures and model export) — emits the same archive shape
# torch::save produces, so both this loader and torch::load can read it.
# ---------------------------------------------------------------------------


class _Pickler(pickle.Pickler):
    def __init__(self, fileobj):
        super().__init__(fileobj, protocol=2)

    def persistent_id(self, obj):
        if isinstance(obj, _Storage):
            return (
                "storage",
                _TorchStorageGlobal(_DTYPE_TO_STORAGE[obj.dtype]),
                obj.key,
                "cpu",
                obj.numel,
            )
        return None


class _TorchStorageGlobal:
    """Pickles as the global ``torch.<Name>Storage``."""

    def __init__(self, name: str):
        self.name = name

    def __reduce__(self):  # pragma: no cover - exercised via pickling
        raise NotImplementedError


def _pickle_module(tensors: list[np.ndarray]) -> bytes:
    # Hand-assemble the pickle stream: the graph is tiny and fixed, and doing
    # it manually sidesteps pickle's refusal to emit arbitrary GLOBALs.
    out = io.BytesIO()
    w = out.write
    w(b"\x80\x02")  # PROTO 2
    w(b"c__torch__\nModule\n")
    w(b")\x81}(")  # EMPTY_TUPLE NEWOBJ EMPTY_DICT MARK
    for i, t in enumerate(tensors):
        name = str(i).encode()
        w(b"X" + struct.pack("<I", len(name)) + name)
        w(b"ctorch._utils\n_rebuild_tensor_v2\n")
        w(b"((")  # args tuple, persistent-id tuple
        w(b"X\x07\x00\x00\x00storage")
        storage_cls = _DTYPE_TO_STORAGE[t.dtype].encode()
        w(b"ctorch\n" + storage_cls + b"\n")
        w(b"X" + struct.pack("<I", len(name)) + name)
        w(b"X\x03\x00\x00\x00cpu")
        w(b"J" + struct.pack("<i", t.size))
        w(b"tQ")  # TUPLE BINPERSID
        w(b"K\x00")  # storage_offset 0
        w(b"(")
        for s in t.shape:
            w(b"J" + struct.pack("<i", s))
        w(b"t(")
        stride = [1] * t.ndim
        for d in range(t.ndim - 2, -1, -1):
            stride[d] = stride[d + 1] * t.shape[d + 1]
        for s in stride:
            w(b"J" + struct.pack("<i", s))
        w(b"t")
        w(b"\x89")  # requires_grad = False
        w(b"ccollections\nOrderedDict\n)R")
        w(b"t")  # close args tuple
        w(b"R")  # REDUCE -> tensor
    w(b"u")  # SETITEMS
    w(b"b")  # BUILD
    w(b".")  # STOP
    return out.getvalue()


def save_tensor_file(path: Path | str, tensors: list[np.ndarray]) -> None:
    """Write tensors as a torch-compatible ``.tensor`` archive."""
    path = Path(path)
    root = path.stem or "archive"
    # np.asarray keeps 0-d scalars 0-d (ascontiguousarray would promote to
    # 1-d); .tobytes() below always serialises in C order.
    tensors = [np.asarray(t) for t in tensors]
    params = ", ".join(f'"{i}"' for i in range(len(tensors)))
    annotations = "".join(
        f'\n  __annotations__["{i}"] = Tensor' for i in range(len(tensors))
    )
    code = (
        "class Module(Module):\n"
        f"  __parameters__ = [{params}, ]\n"
        "  __buffers__ = []\n"
        "  __annotations__ = []" + annotations + "\n"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        for i, t in enumerate(tensors):
            z.writestr(f"{root}/data/{i}", t.tobytes())
        z.writestr(f"{root}/data.pkl", _pickle_module(tensors))
        z.writestr(f"{root}/code/__torch__.py", code)
        z.writestr(f"{root}/constants.pkl", b"\x80\x02).")
        z.writestr(f"{root}/version", b"3\n")
