"""ctypes bindings for the native numeric-CSV parser (native/fastcsv.cpp).

Builds the shared library on first use when a compiler is available and
falls back to pandas otherwise — the public read_numeric_csv() always
works. Targets the reference's heavyweight ingest (2.03 GB animelist.csv,
download.py:99-119): memory-mapped multithreaded parse into column arrays.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "fastcsv.cpp"
_LIB = _NATIVE_DIR / "libfastcsv.so"
_lib: ctypes.CDLL | None = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB.exists():
        if not _SRC.exists():
            _build_failed = True
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", str(_LIB), str(_SRC), "-lpthread"],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, FileNotFoundError) as e:
            logger.warning("fastcsv build failed (%s); using pandas fallback", e)
            _build_failed = True
            return None
    lib = ctypes.CDLL(str(_LIB))
    lib.fastcsv_count_rows.restype = ctypes.c_int64
    lib.fastcsv_count_rows.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int)]
    lib.fastcsv_parse.restype = ctypes.c_int64
    lib.fastcsv_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def read_numeric_csv(path: str | Path, columns: list[str] | None = None,
                     n_threads: int | None = None) -> pd.DataFrame:
    """Read an all-numeric CSV into a DataFrame.

    ``columns``: names to assign when the file has no header (otherwise the
    header line is used). Falls back to pandas when the native library is
    unavailable or the file is not purely numeric.
    """
    path = Path(path)
    lib = _load()
    header_names = _sniff_header(path)
    if lib is None or header_names is _NOT_NUMERIC:
        return pd.read_csv(path)

    names = header_names or columns
    n_cols = len(names) if names else _sniff_n_cols(path)
    if names is None:
        names = [f"c{i}" for i in range(n_cols)]

    hdr = ctypes.c_int(0)
    n_rows = lib.fastcsv_count_rows(str(path).encode(), ctypes.byref(hdr))
    if n_rows < 0:
        return pd.read_csv(path)
    out = np.empty((n_rows, n_cols), dtype=np.float64)
    n_threads = n_threads or min(os.cpu_count() or 1, 8)
    got = lib.fastcsv_parse(str(path).encode(), n_cols, out, n_rows, n_threads)
    if got < 0:
        logger.warning("fastcsv parse failed (%d); pandas fallback", got)
        return pd.read_csv(path)
    # One transposed copy makes every column contiguous; downcast
    # exact-integer columns (IDs, counts) like pandas would infer.
    cols = out[:got].T.copy()
    data = {}
    for i, name in enumerate(names):
        col = cols[i]
        if np.isfinite(col).all() and (col == np.floor(col)).all():
            data[name] = col.astype(np.int64)
        else:
            data[name] = col
    return pd.DataFrame(data)


_NOT_NUMERIC = object()


def _sniff_header(path: Path):
    """Returns header names, None (headerless), or _NOT_NUMERIC."""
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        first = f.readline().strip("\n\r")
        second = f.readline().strip("\n\r")
    if not first:
        return None

    def numeric_line(line: str) -> bool:
        if not line:
            return True
        for tok in line.split(","):
            tok = tok.strip()
            if tok == "":
                continue
            try:
                float(tok)
            except ValueError:
                return False
        return True

    if numeric_line(first):
        return None  # headerless numeric file
    if numeric_line(second) and second:
        return [t.strip() for t in first.split(",")]
    return _NOT_NUMERIC


def _sniff_n_cols(path: Path) -> int:
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        return len(f.readline().split(","))
