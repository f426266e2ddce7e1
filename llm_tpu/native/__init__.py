"""ctypes loader for the native codec library (codecs.cpp).

Auto-builds libllmcodecs.so with g++ on first use (cached alongside this
module); every entry point degrades to the numpy codecs when the toolchain
or the build is unavailable. Set LLM_TPU_NATIVE=0 to force the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libllmcodecs.so"
_SRC = _DIR / "codecs.cpp"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        str(_SRC), "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"llm_tpu: native codec build failed ({e}); using numpy codecs",
              file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if os.environ.get("LLM_TPU_NATIVE", "1") == "0":
        return None
    # libgomp's default spin-wait starves the JAX runtime's host threads
    # (observed: a 28 MB device transfer stalling 10s behind spinning OMP
    # workers on a 4-cpu host); must be set before libgomp initializes
    os.environ.setdefault("OMP_WAIT_POLICY", "PASSIVE")
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as e:
            print(f"llm_tpu: cannot load native codecs ({e})", file=sys.stderr)
            return None
        lib.llm_transcode.restype = ctypes.c_int
        lib.llm_transcode.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.llm_dequantize.restype = ctypes.c_int
        lib.llm_dequantize.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def _ptr(a: Optional[np.ndarray]):
    return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None


def transcode(
    ggml_type: int,
    data: np.ndarray,  # raw uint8 tensor bytes
    K: int,
    rows: Optional[np.ndarray],  # int64 row indices or None
    n_rows: int,
    Kp: int,
    Rp: int,
    lo_bits: int,
    hi_bits: int,
    gsize: int,
    has_bias: bool,
):
    """Run the native single-pass transcode. Returns (lo, hi, scale, bias)
    numpy arrays in the packed plane layout, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(np.frombuffer(data, dtype=np.uint8))
    if rows is not None:
        rows = np.ascontiguousarray(rows, dtype=np.int64)

    if lo_bits == 8:
        lo = np.zeros((Kp, Rp), dtype=np.int8)
    else:
        lo = np.zeros((Kp // (32 // lo_bits), Rp), dtype=np.uint32)
    hi = (
        np.zeros((Kp // (32 // hi_bits), Rp), dtype=np.uint32)
        if hi_bits
        else None
    )
    scale = np.zeros((Kp // gsize, Rp), dtype=np.float32)
    bias = np.zeros((Kp // gsize, Rp), dtype=np.float32) if has_bias else None

    rc = lib.llm_transcode(
        ggml_type,
        _ptr(data),
        K,
        n_rows,
        _ptr(rows),
        _ptr(lo),
        _ptr(hi),
        _ptr(scale),
        _ptr(bias),
        Rp,
    )
    if rc != 0:
        return None
    return lo, hi, scale, bias


def dequantize(ggml_type: int, data, n_elements: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(np.frombuffer(data, dtype=np.uint8))
    out = np.empty(n_elements, dtype=np.float32)
    rc = lib.llm_dequantize(ggml_type, _ptr(data), n_elements, _ptr(out))
    return out if rc == 0 else None
