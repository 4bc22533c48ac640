"""JPEG XR (HD Photo) sub-block decode — optional-dependency backend.

The reference's CZI path decodes JXR-compressed sub-blocks through
``czifile==2019.7.2``, whose decompression table delegates id 4 to
``imagecodecs.jpegxr_decode`` — the reference Dockerfile installs
``imagecodecs`` explicitly for this (``/root/reference/Dockerfile:2``,
``UnMicst1-5.py:798-801``).  This module mirrors that dependency posture
exactly: with ``imagecodecs`` importable, JXR CZI files decode with the
reference's own semantics; without it, a precise error names the
sub-block and the remedy (``pip install imagecodecs``).

A vendored JXR entropy codec deliberately does NOT ship here: JPEG XR's
adaptive-VLC layer cannot be implemented faithfully without the ITU-T
T.832 code tables, and this build environment has neither the spec, any
existing implementation to vendor (no ``imagecodecs``, no ``jxrlib``,
and the system libavcodec has no jpegxr codec — probed 2026-08-17), nor
a single real JXR file to validate against (zero network egress).  A
speculative from-memory codec would risk silently wrong pixels, which is
strictly worse than a loud dependency error.  See docs/DESIGN.md
("JPEG XR posture") for the measured dependency-chain writeup.

The decode plumbing (sub-block extraction, payload hand-off, dtype and
shape validation, windowed row reads, block cache) is fully exercised by
``tests/test_slides_czi_nd2.py`` against a stub backend implementing the
same ``jpegxr_decode`` API, so a real ``imagecodecs`` install changes
nothing but the codec.
"""

from __future__ import annotations


import numpy as np

_BACKEND = None
_BACKEND_CHECKED = False


def _backend():
    global _BACKEND, _BACKEND_CHECKED
    if not _BACKEND_CHECKED:
        _BACKEND_CHECKED = True
        try:
            import imagecodecs as ic

            if hasattr(ic, "jpegxr_decode"):
                _BACKEND = ic
        except ImportError:
            _BACKEND = None
    return _BACKEND


def reset_backend_cache() -> None:
    """Forget the cached import probe (tests swap stub backends)."""
    global _BACKEND, _BACKEND_CHECKED
    _BACKEND = None
    _BACKEND_CHECKED = False


def available() -> bool:
    return _backend() is not None


def decode(
    buf: bytes,
    dtype: np.dtype,
    shape: tuple,
    context: str = "",
) -> bytes:
    """JXR payload -> uncompressed little-endian pixel bytes.

    ``shape``: the (height, width) the sub-block directory declares; the
    decoded image must agree (a mismatch means a corrupt file or a codec
    fault, never silently accepted).
    """
    ic = _backend()
    if ic is None:
        raise NotImplementedError(
            f"{context or 'CZI'}: sub-block is JPEG XR-compressed "
            "(compression=4); install the optional 'imagecodecs' package "
            "to decode it (the reference tool's own JXR path, "
            "czifile + imagecodecs).  See unmicst_tpu/io/jxr.py."
        )
    img = np.asarray(ic.jpegxr_decode(buf))
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    if img.ndim != 2 or tuple(img.shape) != tuple(shape):
        raise ValueError(
            f"{context or 'CZI'}: JXR payload decoded to shape "
            f"{img.shape}, directory declares {tuple(shape)}"
        )
    want = np.dtype(dtype)
    # exact dtype (kind + width), not just itemsize: a float16/int16
    # decode declared Gray16 would be silently value-converted by astype
    if img.dtype.newbyteorder("=") != want.newbyteorder("="):
        raise ValueError(
            f"{context or 'CZI'}: JXR payload decoded to {img.dtype}, "
            f"directory declares {want}"
        )
    return np.ascontiguousarray(img).astype(
        want.newbyteorder("<"), copy=False
    ).tobytes()
