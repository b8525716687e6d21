"""ctypes loader for the native parser library (native/fastparse.c).

The C library is compiled on demand into the user cache directory (this
package ships as source; pybind11 is deliberately avoided — plain C ABI +
ctypes keeps the toolchain requirement to just a C compiler).  Any failure —
no compiler, unwritable cache — silently falls back to the pure-Python
parsers, which are the semantic reference.  Disable with
SEQALIGN_TPU_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

from .input import ParseError

_SRC = Path(__file__).resolve().parents[2] / "native" / "fastparse.c"
_lib = None
_tried = False


def _build() -> ctypes.CDLL | None:
    if not _SRC.exists():
        return None
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    cache = Path(
        os.environ.get(
            "SEQALIGN_TPU_CACHE",
            os.path.expanduser("~/.cache/sequencealigner-tpu"),
        )
    )
    so = cache / f"libfastparse-{tag}.so"
    if not so.exists():
        cache.mkdir(parents=True, exist_ok=True)
        tmp = so.with_suffix(".so.tmp")
        subprocess.run(
            ["gcc", "-O3", "-shared", "-fPIC", "-o", str(tmp), str(_SRC)],
            check=True,
            capture_output=True,
        )
        tmp.replace(so)
    return ctypes.CDLL(str(so))


def get() -> ctypes.CDLL | None:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SEQALIGN_TPU_NATIVE", "1") == "0":
        return None
    try:
        lib = _build()
        if lib is None:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.fasta_parse.restype = ctypes.c_longlong
        lib.fasta_parse.argtypes = [
            u8p, ctypes.c_int64, i32p, ctypes.c_int32,
            u8p, i64p, ctypes.c_int64, ctypes.c_char_p,
        ]
        lib.dsv_parse_fast.restype = ctypes.c_longlong
        lib.dsv_parse_fast.argtypes = [
            u8p, ctypes.c_int64, i32p, ctypes.c_int32, ctypes.c_uint8,
            ctypes.c_int32, ctypes.c_int32,
            u8p, i64p, ctypes.c_int64, ctypes.c_char_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _run(fn, data: bytes, lut: np.ndarray, gap_pen: int, max_seqs: int, *extra):
    arr = np.frombuffer(data, dtype=np.uint8)
    lut32 = np.ascontiguousarray(lut, dtype=np.int32)
    out = np.empty(len(data) + 1, dtype=np.uint8)
    offsets = np.zeros(max_seqs + 1, dtype=np.int64)
    errbuf = ctypes.create_string_buffer(256)
    n = fn(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data),
        lut32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        -int(gap_pen),
        *extra,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_seqs,
        errbuf,
    )
    if n < 0:
        raise ParseError(errbuf.value.decode())
    return [out[offsets[i] : offsets[i + 1]] for i in range(n)]


def fasta(data: bytes, lut: np.ndarray, gap_pen: int) -> list[np.ndarray] | None:
    lib = get()
    if lib is None:
        return None
    return _run(lib.fasta_parse, data, lut, gap_pen, data.count(b">") + 1)


def dsv_fast(
    data: bytes, lut: np.ndarray, gap_pen: int, delim: int, cols: int, seq_col: int
) -> list[np.ndarray] | None:
    lib = get()
    if lib is None:
        return None
    return _run(
        lib.dsv_parse_fast, data, lut, gap_pen, data.count(b"\n") + 2,
        delim, cols, seq_col,
    )
