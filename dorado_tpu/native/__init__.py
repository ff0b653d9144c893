"""Native (C++) runtime components: compiled on first use, loaded via ctypes.

The alignment library replaces the reference's edlib dependency
(dorado/3rdparty/edlib) for stereo duplex encoding, barcode/adapter scoring
and read splitting.
"""

from __future__ import annotations

import ctypes
import subprocess
from dataclasses import dataclass
from pathlib import Path

import numpy as np

_SRC_DIR = Path(__file__).parent
_LIB_PATH = _SRC_DIR / "libdorado_native.so"

EDOP_MATCH = 0
EDOP_INSERT = 1  # query-consumed-only (insertion to target)
EDOP_DELETE = 2  # target-consumed-only (deletion from target)
EDOP_MISMATCH = 3

MODE_NW = 0  # global
MODE_HW = 1  # infix (free gaps at target start+end)
MODE_SHW = 2  # prefix (free gap at target end)


def _build() -> None:
    sources = [str(p) for p in sorted(_SRC_DIR.glob("*.cpp"))]
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        str(_LIB_PATH),
        *sources,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


_lib = None
_lib_lock = __import__("threading").Lock()


def _get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        src_mtime = max(p.stat().st_mtime for p in _SRC_DIR.glob("*.cpp"))
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.dt_align.restype = ctypes.c_int
        lib.dt_align.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p,
        ]
        _i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
        lib.dt_chain.restype = ctypes.c_int
        lib.dt_chain.argtypes = [
            _i64p,
            _i64p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS"),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.dt_beam_search.restype = ctypes.c_int
        _f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
        lib.dt_beam_search.argtypes = [
            _f32p,
            ctypes.c_int,
            ctypes.c_int,
            _f32p,
            _f32p,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_float,
            np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS"),
            _f32p,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.svb16_decode_native.restype = ctypes.c_int
        lib.svb16_decode_native.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            np.ctypeslib.ndpointer(dtype=np.int16, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
    return _lib


def svb16_decode_native(
    raw: bytes, count: int, zigzag: bool = True, delta: bool = True
) -> np.ndarray:
    """C svb16 decode (vbz.cpp); ~40x the numpy path per thread, and ctypes
    releases the GIL so POD5 loader threads decode concurrently. Raises
    ValueError on a truncated payload (callers fall back to numpy)."""
    lib = _get_lib()
    out = np.empty(count, dtype=np.int16)
    buf = np.frombuffer(raw, dtype=np.uint8)
    rc = lib.svb16_decode_native(
        buf, len(buf), count, int(zigzag), int(delta), out
    )
    if rc != 0:
        raise ValueError("truncated svb16 payload")
    return out


def beam_search_native(
    scores: np.ndarray,
    back_guide: np.ndarray,
    posts: np.ndarray,
    beam_width: int = 32,
    beam_cut: float = 100.0,
    fixed_stay_score: float = 2.0,
):
    """C++ beam search for one chunk; same contract as
    decode/beam_search.py::beam_search (states, moves, qual_data, score)."""
    lib = _get_lib()
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    back_guide = np.ascontiguousarray(back_guide, dtype=np.float32)
    posts = np.ascontiguousarray(posts, dtype=np.float32)
    t_len, c_dim = scores.shape
    states = np.zeros(t_len, dtype=np.int32)
    moves = np.zeros(t_len, dtype=np.uint8)
    qual = np.zeros((t_len, 4), dtype=np.float32)
    score = ctypes.c_float()
    rc = lib.dt_beam_search(
        scores,
        t_len,
        c_dim,
        back_guide,
        posts,
        beam_width,
        beam_cut,
        fixed_stay_score,
        states,
        moves,
        qual,
        ctypes.byref(score),
    )
    if rc != 0:
        raise RuntimeError(f"dt_beam_search failed with code {rc}")
    return states, moves, qual, float(score.value)


def chain_native(
    q_pos: np.ndarray,
    r_pos: np.ndarray,
    k: int,
    max_gap: int = 5000,
    lookback: int = 50,
) -> tuple[np.ndarray, float]:
    """Best colinear chain over anchors sorted by (r, q): returns (indices
    into the sorted order, score). C++ twin of mapper._chain's recurrence."""
    lib = _get_lib()
    q = np.ascontiguousarray(q_pos, dtype=np.int64)
    r = np.ascontiguousarray(r_pos, dtype=np.int64)
    n = len(q)
    out = np.zeros(max(1, n), dtype=np.int32)
    score = ctypes.c_double()
    length = lib.dt_chain(q, r, n, k, max_gap, lookback, out, ctypes.byref(score))
    return out[:length], float(score.value)


def make_equality_table(pairs: list[tuple[str, str]]) -> bytes:
    """256x256 symmetric extra-equality table for wildcard matching
    (edlib additionalEqualities semantics)."""
    table = bytearray(256 * 256)
    for a, b in pairs:
        table[ord(a) * 256 + ord(b)] = 1
        table[ord(b) * 256 + ord(a)] = 1
    return bytes(table)


# edlib config used by the barcode classifier (BarcodeClassifier.cpp:28-38):
# N matches any base (the barcode mask), M matches A/C (16S wobble base)
BARCODE_EQUALITIES = [
    ("N", "A"),
    ("N", "T"),
    ("N", "C"),
    ("N", "G"),
    ("N", "U"),
    ("M", "A"),
    ("M", "C"),
]


@dataclass
class AlignResult:
    distance: int
    t_start: int
    t_end: int  # exclusive
    ops: np.ndarray  # uint8 edlib-style op codes, query-start -> query-end


def align(
    query: str | bytes,
    target: str | bytes,
    mode: int = MODE_NW,
    band: int | None = None,
    equalities: bytes | None = None,
) -> AlignResult:
    """Unit-cost edit-distance alignment with traceback.

    The band automatically doubles until the result is provably unclipped
    (banded DP with edge detection), so results match full DP.
    """
    q = query.encode() if isinstance(query, str) else bytes(query)
    t = target.encode() if isinstance(target, str) else bytes(target)
    lib = _get_lib()

    cap = len(q) + len(t) + 2
    ops_buf = (ctypes.c_uint8 * cap)()
    dist = ctypes.c_int32()
    t_start = ctypes.c_int32()
    t_end = ctypes.c_int32()
    ops_len = ctypes.c_int32()
    band_hit = ctypes.c_int32()

    b = band or max(32, abs(len(q) - len(t)) + 32)
    max_band = max(len(q), len(t), 1)
    while True:
        rc = lib.dt_align(
            q,
            len(q),
            t,
            len(t),
            mode,
            b,
            ctypes.byref(dist),
            ctypes.byref(t_start),
            ctypes.byref(t_end),
            ops_buf,
            cap,
            ctypes.byref(ops_len),
            ctypes.byref(band_hit),
            equalities,
        )
        if rc != 0:
            raise RuntimeError(f"dt_align failed with code {rc}")
        if (band_hit.value == 0 and dist.value >= 0) or b >= max_band:
            break
        b = min(max_band, b * 4)

    ops = np.frombuffer(bytes(ops_buf[: ops_len.value]), dtype=np.uint8).copy()
    return AlignResult(
        distance=int(dist.value),
        t_start=int(t_start.value),
        t_end=int(t_end.value),
        ops=ops,
    )
