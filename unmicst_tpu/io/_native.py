"""ctypes binding to the native TIFF codec library (see ``native/``).

Optional: if the shared library hasn't been built (``python
native/build.py``), callers fall back to the pure-Python codecs.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libunmicst_tiffcodec.so")
_lib = None
_build_attempted = False


def _try_autobuild() -> None:
    """Build the codec library on first use when a toolchain exists.

    The .so is a build artifact (not committed); without it the LZW path
    falls back to pure Python at ~2 MB/s vs ~137 MB/s native — too big a
    cliff to leave to a manual ``python native/build.py`` step.  Opt out
    with UNMICST_NO_AUTOBUILD=1.  Failures are silent (the fallback is
    correct, just slow) but leave a one-line note on stderr.
    """
    global _build_attempted
    if _build_attempted or os.environ.get("UNMICST_NO_AUTOBUILD"):
        return
    _build_attempted = True
    import shutil
    import subprocess
    import sys

    if shutil.which("g++") is None:
        return
    build_py = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))), "native", "build.py",
    )
    if not os.path.exists(build_py):
        return
    try:
        subprocess.run(
            [sys.executable, build_py], check=True, timeout=120,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
    except Exception:
        print(
            "unmicst_tpu: native codec autobuild failed; using the "
            "pure-Python fallback (slow LZW). Run `python "
            "native/build.py` manually to see why.",
            file=sys.stderr,
        )


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not os.path.exists(_LIB_PATH):
        _try_autobuild()
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        for name in ("unmicst_lzw_decode", "unmicst_packbits_decode"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_longlong
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.c_longlong,
                ctypes.c_void_p,
                ctypes.c_longlong,
            ]
        lib.unmicst_predictor_undo.restype = None
        lib.unmicst_predictor_undo.argtypes = [
            ctypes.c_void_p,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_int,
        ]
        _lib = lib
    return _lib


def lzw_decode(data: bytes, max_out: int) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(max_out)
    n = lib.unmicst_lzw_decode(data, len(data), buf, max_out)
    if n < 0:
        raise ValueError("native LZW: corrupt stream or undersized buffer")
    return buf.raw[:n]


def packbits_decode(data: bytes, max_out: int) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(max_out)
    n = lib.unmicst_packbits_decode(data, len(data), buf, max_out)
    if n < 0:
        raise ValueError("native PackBits: corrupt stream")
    return buf.raw[:n]


def predictor_undo(arr: np.ndarray) -> Optional[np.ndarray]:
    """In-place horizontal-predictor undo for a (rows, cols) C-contiguous
    uint8/uint16 array.  Returns the array, or None if the lib is absent."""
    lib = get_lib()
    if lib is None:
        return None
    assert arr.flags["C_CONTIGUOUS"]
    rows = arr.shape[0]
    cols = int(np.prod(arr.shape[1:]))
    lib.unmicst_predictor_undo(
        arr.ctypes.data_as(ctypes.c_void_p), rows, cols, arr.dtype.itemsize
    )
    return arr
