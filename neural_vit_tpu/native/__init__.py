"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; the host-side ingest hot loop — parsing
columns of BigQuery string traces into the dense float32 buffers that feed
`jax.device_put` — is C++ (`trace_parser.cpp`). The shared library builds
on first use with the system g++ and is cached next to the source; every
caller has a pure-numpy fallback, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "trace_parser.cpp")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _lib_path() -> str:
    """Cache path keyed on a content hash of the C++ source: always built
    from the checked-in source (no binary lives in version control), and a
    source edit can never silently dlopen a stale artifact — the hash
    changes, so a fresh build happens."""
    import hashlib

    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_DIR, f"libtraceparse-{digest}.so")


def _build(lib_path: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        lib_path = _lib_path()
    except OSError:
        _load_failed = True
        return None
    if not os.path.exists(lib_path) and not _build(lib_path):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(lib_path)
        lib.parse_trace_column.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.parse_trace_column.restype = None
        lib.parse_trace_string.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.parse_trace_string.restype = ctypes.c_long
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def parse_string_traces(
    strs: Sequence[str], out_len: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Parse a column of trace strings → (dense (n, out_len) f32, valid).

    Returns None when the native library is unavailable (caller falls back
    to the numpy path).
    """
    lib = load()
    if lib is None:
        return None
    n = len(strs)
    out = np.zeros((n, out_len), np.float32)
    valid = np.zeros(n, np.uint8)
    encoded = [s.encode("utf-8") for s in strs]
    arr = (ctypes.c_char_p * n)(*encoded)
    lib.parse_trace_column(
        arr, n, out_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out, valid.astype(bool)
