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
_load_failed = False


def _autobuild_disabled() -> bool:
    # value-sensitive: UNMICST_NO_AUTOBUILD=0 means "autobuild enabled"
    return os.environ.get("UNMICST_NO_AUTOBUILD", "") not in ("", "0")


def _try_autobuild() -> None:
    """Build the codec library on first use when a toolchain exists.

    The .so is a build artifact (not committed); without it the LZW path
    falls back to pure Python at ~2 MB/s vs ~137 MB/s native — too big a
    cliff to leave to a manual ``python native/build.py`` step.  Opt out
    with UNMICST_NO_AUTOBUILD=1.  Failures are silent (the fallback is
    correct, just slow) but leave a one-line note on stderr.
    """
    global _build_attempted
    if _build_attempted or _autobuild_disabled():
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


def _load(path: str) -> ctypes.CDLL:
    lib = ctypes.CDLL(path)
    for name in (
        "unmicst_lzw_decode",
        "unmicst_packbits_decode",
        "unmicst_inflate",
    ):
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
    # bindings via getattr so a stale .so missing a symbol raises
    # AttributeError here and takes the rebuild-once path in get_lib
    for name in ("unmicst_lzw_decode_ex", "unmicst_packbits_decode_ex"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_longlong
        fn.argtypes = [
            ctypes.c_char_p,
            ctypes.c_longlong,
            ctypes.c_void_p,
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int),  # overrun out-flag
        ]
    fn = lib.unmicst_deflate
    fn.restype = ctypes.c_longlong
    fn.argtypes = [
        ctypes.c_char_p,
        ctypes.c_longlong,
        ctypes.c_void_p,
        ctypes.c_longlong,
    ]
    fn = lib.unmicst_deflate_chain
    fn.restype = ctypes.c_longlong
    fn.argtypes = [
        ctypes.c_char_p,
        ctypes.c_longlong,
        ctypes.c_void_p,
        ctypes.c_longlong,
        ctypes.c_longlong,  # max_chain
        ctypes.c_longlong,  # nice_len
        ctypes.c_longlong,  # good_len
        ctypes.c_longlong,  # max_lazy
    ]
    fn = lib.unmicst_decode_strips
    fn.restype = ctypes.c_longlong
    fn.argtypes = [
        ctypes.c_char_p,    # src span
        ctypes.c_void_p,    # src offsets (int64[n])
        ctypes.c_void_p,    # src lengths
        ctypes.c_void_p,    # dst offsets
        ctypes.c_void_p,    # dst lengths
        ctypes.c_longlong,  # n
        ctypes.c_longlong,  # codec (TIFF tag value)
        ctypes.c_void_p,    # dst
        ctypes.c_longlong,  # dst_cap
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _try_autobuild()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        _lib = _load(_LIB_PATH)
    except (OSError, AttributeError):
        # truncated or stale artifact (killed compiler, copied from a
        # different host, missing symbol): rebuild once if allowed, else
        # fall back permanently — a bad .so must degrade to the Python
        # codecs, never crash every TIFF decode
        if not _build_attempted and not _autobuild_disabled():
            try:
                os.remove(_LIB_PATH)
            except OSError:
                pass
            _try_autobuild()
            try:
                _lib = _load(_LIB_PATH)
            except (OSError, AttributeError):
                _load_failed = True
        else:
            _load_failed = True
    return _lib


def lzw_decode(data: bytes, max_out: int) -> Optional[np.ndarray]:
    """Decoded bytes as a uint8 array view (buffer-protocol compatible),
    or None if the lib is absent.  np.empty (not a zeroed ctypes buffer)
    and a sliced view (not a .raw copy): the hot multi-GB decode path must
    not pay a memset + memcpy of the full strip on top of the decode."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(max_out, np.uint8)
    n = lib.unmicst_lzw_decode(
        data, len(data), buf.ctypes.data_as(ctypes.c_void_p), max_out
    )
    if n < 0:
        raise ValueError("native LZW: corrupt stream or undersized buffer")
    return buf[:n]


def inflate(data: bytes, max_out: int) -> Optional[np.ndarray]:
    """zlib-stream (RFC 1950) decode into a fresh uint8 buffer; None when
    the lib is absent.  ~1.1-1.4x zlib on image-like strips (two-level
    L1-resident Huffman tables + hoisted-bounds fastloop; see
    ``native/tiffcodec.cpp``) and adler32-verified like zlib."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(max_out, np.uint8)
    n = lib.unmicst_inflate(
        data, len(data), buf.ctypes.data_as(ctypes.c_void_p), max_out
    )
    if n < 0:
        raise ValueError("native inflate: corrupt stream or undersized buffer")
    return buf[:n]


def deflate(data: bytes) -> Optional[bytes]:
    """zlib-stream compress (native/tiffcodec.cpp::unmicst_deflate):
    greedy single-probe matching + per-block dynamic Huffman with exact
    stored/static/dynamic choice.  2-5x zlib level 3 (the writer
    default) on probability maps and raw planes at <2% ratio cost on
    real outputs — measured table in BASELINE.md.  None when the lib is
    absent (callers fall back to zlib)."""
    lib = get_lib()
    if lib is None:
        return None
    cap = len(data) + (len(data) >> 6) + 1024
    buf = np.empty(cap, np.uint8)
    n = lib.unmicst_deflate(
        data, len(data), buf.ctypes.data_as(ctypes.c_void_p), cap
    )
    if n < 0:
        raise ValueError("native deflate: output buffer undersized")
    return buf[:n].tobytes()


# zlib's deflate_slow configuration_table rows (good, lazy, nice, chain)
# for levels 4..9 — the reference speed/ratio trade each level names
_CHAIN_PARAMS = {
    4: (4, 4, 16, 16),
    5: (8, 16, 32, 32),
    6: (8, 16, 128, 128),
    7: (8, 32, 128, 256),
    8: (32, 128, 258, 1024),
    9: (32, 258, 258, 4096),
}


def deflate_chain(data: bytes, level: int) -> Optional[bytes]:
    """zlib-stream compress with hash-chain + lazy matching
    (native/tiffcodec.cpp::unmicst_deflate_chain) at zlib's per-level
    good/lazy/nice/chain parameters.  Reaches zlib-6-class ratios on
    smooth planes where the greedy encoder leaves 15-20%; 2-4x zlib at
    the same level (measured table in BASELINE.md).  None when the lib
    is absent (callers fall back to zlib)."""
    lib = get_lib()
    if lib is None:
        return None
    good, lazy, nice, chain = _CHAIN_PARAMS[max(4, min(9, level))]
    cap = len(data) + (len(data) >> 6) + 1024
    buf = np.empty(cap, np.uint8)
    n = lib.unmicst_deflate_chain(
        data, len(data), buf.ctypes.data_as(ctypes.c_void_p), cap,
        chain, nice, good, lazy,
    )
    if n < 0:
        raise ValueError("native deflate: output buffer undersized")
    return buf[:n].tobytes()


def decode_strips(
    span: bytes,
    src_offs: np.ndarray,
    src_lens: np.ndarray,
    dst_offs: np.ndarray,
    dst_lens: np.ndarray,
    codec: int,
    out: np.ndarray,
) -> Optional[bool]:
    """Decode every strip of a page in one native call, straight into the
    (uint8-viewed, C-contiguous) ``out`` plane — no per-strip Python
    crossing, landing buffer, or assembly copy.  ``codec`` is the TIFF
    compression tag value (8 deflate, 5 LZW, 32773 PackBits).  Offsets
    are within ``span`` / ``out``; each strip must decode to exactly its
    ``dst_lens`` entry.  None when the lib is absent; raises ValueError
    naming the first bad strip otherwise.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(src_offs)
    arrs = [np.ascontiguousarray(a, np.int64)
            for a in (src_offs, src_lens, dst_offs, dst_lens)]
    rc = lib.unmicst_decode_strips(
        span, *(a.ctypes.data_as(ctypes.c_void_p) for a in arrs), n,
        codec, out.ctypes.data_as(ctypes.c_void_p), out.nbytes,
    )
    if rc < 0:
        raise ValueError(
            f"native strip decode: strip {-rc - 1} corrupt or wrong length"
        )
    return True


def packbits_decode(data: bytes, max_out: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(max_out, np.uint8)
    n = lib.unmicst_packbits_decode(
        data, len(data), buf.ctypes.data_as(ctypes.c_void_p), max_out
    )
    if n < 0:
        raise ValueError("native PackBits: corrupt stream")
    return buf[:n]


def lzw_decode_ex(data: bytes, max_out: int):
    """:func:`lzw_decode` plus an OVERRUN flag: True when ``max_out``
    was reached while the stream demonstrably encoded more output —
    mid-chain truncation, or an exact fill followed by a non-EOI data
    code (trailing EOI / zero-bit / byte padding stays False).  The
    plain decoders keep the libtiff/PIL accept-and-truncate posture;
    this variant makes writer padding distinguishable from an over-long
    (possibly corrupt) final strip, so fuzz harnesses and strict
    validators can count each (ADVICE r4).  Returns (array, overrun) or
    None when the lib is absent."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(max_out, np.uint8)
    overrun = ctypes.c_int(0)
    n = lib.unmicst_lzw_decode_ex(
        data, len(data), buf.ctypes.data_as(ctypes.c_void_p), max_out,
        ctypes.byref(overrun),
    )
    if n < 0:
        raise ValueError("native LZW: corrupt stream or undersized buffer")
    return buf[:n], bool(overrun.value)


def packbits_decode_ex(data: bytes, max_out: int):
    """:func:`packbits_decode` with the overrun flag (same contract as
    :func:`lzw_decode_ex`; trailing 0x80 no-op padding stays False)."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(max_out, np.uint8)
    overrun = ctypes.c_int(0)
    n = lib.unmicst_packbits_decode_ex(
        data, len(data), buf.ctypes.data_as(ctypes.c_void_p), max_out,
        ctypes.byref(overrun),
    )
    if n < 0:
        raise ValueError("native PackBits: corrupt stream")
    return buf[:n], bool(overrun.value)


def predictor_undo(arr: np.ndarray) -> Optional[np.ndarray]:
    """In-place horizontal-predictor undo for a (rows, cols) C-contiguous
    uint8/uint16 array.  Returns the array, or None if the lib is absent
    or the itemsize unsupported (the C function only handles 1- and
    2-byte samples — returning arr for wider types would silently hand
    back difference values as pixels)."""
    if arr.dtype.itemsize not in (1, 2):
        return None
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
