"""Slide IO facade: channel readers for the supported formats.

Format dispatch parity with the CLI mains (``UnMicst1-5.py:794-806``):
``ome.tif / ome.tiff / btf / tif`` via the native TIFF reader (page ==
channel), ``czi`` / ``nd2`` via the vendored native readers
(:mod:`unmicst_tpu.io.czi`, :mod:`unmicst_tpu.io.nd2`) — no third-party
``czifile``/``nd2reader`` dependency.  The solo nd2 bug (undefined
``iChan`` NameError, ``UnMicst1-5.py:802-804``) is replaced by a working
channel read.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from unmicst_tpu.io.tiff import TiffFile, imread, num_pages

TIFF_LIKE = ("ome.tif", "ome.tiff", "btf", "tif", "tiff")


def read_channel(image_path: str, file_type: str, channel: int) -> np.ndarray:
    if file_type in TIFF_LIKE:
        return imread(image_path, channel)
    if file_type == "czi":
        from unmicst_tpu.io.czi import read_czi_channel

        return read_czi_channel(image_path, channel)
    if file_type == "nd2":
        from unmicst_tpu.io.nd2 import read_nd2_channel

        return read_nd2_channel(image_path, channel)
    raise NotImplementedError(
        f"Don't know how to read image with extension .{file_type}"
    )


def slide_shape(image_path: str, channel: int = 0) -> Tuple[int, int]:
    """(H, W) without decoding pixel data (TIFF-like only)."""
    with TiffFile(image_path) as tf:
        page = tf.pages[channel]
        return page.height, page.width


def n_channels(image_path: str) -> int:
    return num_pages(image_path)
