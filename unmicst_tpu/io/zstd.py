"""Zstandard decompression for compressed CZI sub-blocks.

Modern Zeiss ZEN exports compress sub-blocks with zstd (ZISRAW compression
ids 5 = "zstd0", 6 = "zstd1"); the reference tool reads these through
``czifile``/``imagecodecs`` (`/root/reference/Dockerfile:2` installs
``czifile==2019.7.2``).  Here decompression is served without a hard
third-party dependency, in preference order:

1. the ``zstandard`` package, if importable;
2. the system ``libzstd`` shared library via ctypes (one-shot
   ``ZSTD_decompress`` — sub-block payload sizes are known exactly from the
   directory entry's X/Y stored sizes, so no streaming API is needed);
3. otherwise a ``NotImplementedError`` naming both remedies.

The zstd1 flavor wraps the zstd frame in a small header that may declare
"hi-lo byte packing" preprocessing (16-bit samples split into a plane of
low bytes followed by a plane of high bytes to aid compression); see
``unpack_hilo`` and `io/czi.py` for the container-side handling.
"""

from __future__ import annotations

import ctypes
import threading
from typing import Callable, Optional

import numpy as np

_lock = threading.Lock()
_backend: Optional[Callable[[bytes, int], bytes]] = None
_backend_err: Optional[str] = None


def _load_backend() -> None:
    global _backend, _backend_err
    try:
        import zstandard

        def _py(data: bytes, max_out: int) -> bytes:
            # zstandard IGNORES max_output_size when the frame header
            # declares its content size (it allocates the declared size)
            # — so a crafted frame declaring 100 GB would bypass the
            # bound entirely.  Check the declared size first; -1 means
            # unknown, where max_output_size does apply.
            declared = zstandard.frame_content_size(data)
            if declared > max_out:
                raise ValueError(
                    f"zstd frame declares {declared} bytes, bound is "
                    f"{max_out}"
                )
            # ZstdDecompressor instances are documented as not thread-safe;
            # construction is cheap next to a sub-block decompress, so make
            # one per call (concurrent CZI readers, threaded serving)
            return zstandard.ZstdDecompressor().decompress(
                data, max_output_size=max_out
            )

        _backend = _py
        return
    except ImportError:
        pass
    try:
        lib = ctypes.CDLL("libzstd.so.1")
    except OSError:
        try:
            lib = ctypes.CDLL("libzstd.so")
        except OSError:
            _backend_err = (
                "no zstd backend: install the 'zstandard' package or a "
                "system libzstd"
            )
            return
    lib.ZSTD_decompress.restype = ctypes.c_size_t
    lib.ZSTD_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_isError.argtypes = [ctypes.c_size_t]

    def _native(data: bytes, max_out: int) -> bytes:
        buf = ctypes.create_string_buffer(max_out)
        n = lib.ZSTD_decompress(buf, max_out, data, len(data))
        if lib.ZSTD_isError(n):
            raise ValueError("corrupt zstd stream")
        return buf.raw[:n]

    _backend = _native


def available() -> bool:
    """True when some zstd backend (package or system library) exists."""
    if _backend is not None:  # lock-free fast path (per-sub-block call)
        return True
    with _lock:
        if _backend is None and _backend_err is None:
            _load_backend()
    return _backend is not None


def decompress(data: bytes, max_out: int) -> bytes:
    """Decompress one zstd frame, bounding output at ``max_out`` bytes.

    ``max_out`` comes from trusted-side geometry (plane height x width x
    itemsize), so a corrupt frame cannot trigger an oversized allocation.
    """
    if not available():
        raise NotImplementedError(_backend_err)
    try:
        return _backend(data, max_out)
    except ValueError:
        raise
    except Exception as exc:  # zstandard.ZstdError and friends
        raise ValueError(f"corrupt zstd stream: {exc}") from None


_compress_backend: Optional[Callable[[bytes, int], bytes]] = None
_compress_err: Optional[str] = None


def _load_compress_backend() -> None:
    global _compress_backend, _compress_err
    try:
        import zstandard

        def _py(data: bytes, level: int) -> bytes:
            return zstandard.ZstdCompressor(level=level).compress(data)

        _compress_backend = _py
        return
    except ImportError:
        pass
    lib = None
    for name in ("libzstd.so.1", "libzstd.so"):
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None:
        _compress_err = (
            "no zstd backend: install the 'zstandard' package or a "
            "system libzstd"
        )
        return
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
    ]
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_isError.argtypes = [ctypes.c_size_t]

    def _native(data: bytes, level: int) -> bytes:
        cap = lib.ZSTD_compressBound(len(data))
        buf = ctypes.create_string_buffer(cap)
        n = lib.ZSTD_compress(buf, cap, data, len(data), level)
        if lib.ZSTD_isError(n):
            raise ValueError("zstd compression failed")
        return buf.raw[:n]

    _compress_backend = _native


def compress_available() -> bool:
    """True when a zstd COMPRESSION backend exists (the decode chain can
    be satisfied by either backend; both also compress)."""
    if _compress_backend is not None:
        return True
    with _lock:
        if _compress_backend is None and _compress_err is None:
            _load_compress_backend()
    return _compress_backend is not None


def compress(data: bytes, level: int = 3) -> bytes:
    """Compress one zstd frame (used by the TIFF writer's opt-in
    ``compression="zstd"`` output mode)."""
    if not compress_available():
        raise NotImplementedError(_compress_err)
    return _compress_backend(data, level)


def unpack_hilo(buf: bytes, itemsize: int) -> bytes:
    """Undo CZI "hi-lo byte packing" of 16-bit samples.

    The packed layout is all low bytes first, then all high bytes (libCZI's
    ``LoHiBytePack`` preprocessing, signalled by bit 0 of the zstd1 header's
    chunk-1 flags).  Only meaningful for 2-byte samples; other item sizes
    pass through unchanged, matching libCZI.
    """
    if itemsize != 2 or len(buf) < 2:
        return buf
    half = len(buf) // 2
    arr = np.frombuffer(buf, np.uint8, count=2 * half)
    out = np.empty((half, 2), np.uint8)
    out[:, 0] = arr[:half]
    out[:, 1] = arr[half:]
    return out.tobytes()
