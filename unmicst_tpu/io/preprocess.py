"""Pre/post-processing parity with the reference CLI pipelines.

Reference pipeline per channel (``UnMicst1-5.py:807-821``)::

    read channel -> float32->uint16 cast -> resize by scalingFactor
    -> rescale_intensity(in=(min, max|percentile(outlier)), out=(0, 0.983))
    -> im2double

and per output class (``UnMicst1-5.py:845-875``)::

    uint8(255*PM) -> resize back to raw dims -> uint8(255*x) -> TIFF page

``im2double`` semantics: ``toolbox/imtools.py:42-53`` (uint16/65535,
uint8/255, float passthrough).  ``resize`` is ``skimage.transform.resize``
(``toolbox/imtools.py:8``) whose defaults are: convert via img_as_float,
bilinear (order=1) warp with half-pixel centers, 'reflect' boundary
(scipy 'mirror'), gaussian anti-aliasing sigma ``(factor-1)/2`` when
downscaling.  Re-implemented here on scipy.ndimage (skimage is not a
dependency); identical for scale=1, matching algorithmic choices otherwise.

Tool-specific quirk preserved: the v2 solo CLI computes the intensity
rescale but feeds the *resized-only* image to the network
(``UnMicst1-5.py:815-816,848``: ``cells`` is bound before the rescale) while
legacy/duo/cyto feed the rescaled image.  ``preprocess_channel`` exposes
both planes so each tool wires its reference behavior.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
from scipy import ndimage as ndi


def im2double(image: np.ndarray) -> np.ndarray:
    """``toolbox/imtools.py:42-53`` (unknown dtypes pass through)."""
    if image.dtype == np.uint16:
        return image.astype(np.float64) / 65535
    if image.dtype == np.uint8:
        return image.astype(np.float64) / 255
    if image.dtype == np.float32:
        return image.astype(np.float64)
    return image


def img_as_float(image: np.ndarray) -> np.ndarray:
    """skimage.img_as_float semantics for the dtypes we encounter."""
    if image.dtype == np.uint8:
        return image.astype(np.float64) / 255
    if image.dtype == np.uint16:
        return image.astype(np.float64) / 65535
    if image.dtype == np.uint32:
        return image.astype(np.float64) / 4294967295
    if image.dtype.kind == "f":
        return image.astype(np.float64)
    if image.dtype == np.int16:
        return image.astype(np.float64) / 32767
    return image.astype(np.float64)


def resize(image: np.ndarray, output_shape: Tuple[int, int]) -> np.ndarray:
    """``skimage.transform.resize`` work-alike (float output in [0, 1]).

    Identity (modulo dtype scaling) when the shape is unchanged.
    """
    img = img_as_float(image)
    in_h, in_w = img.shape[:2]
    out_h, out_w = output_shape
    if (in_h, in_w) == (out_h, out_w):
        return img.copy()
    factors = (in_h / out_h, in_w / out_w)
    # anti-aliasing on downscale (skimage default, sigma=(f-1)/2)
    sigmas = [max(0.0, (f - 1.0) / 2.0) for f in factors]
    if any(s > 0 for s in sigmas):
        img = ndi.gaussian_filter(img, sigmas, mode="mirror")
    rows = (np.arange(out_h) + 0.5) * factors[0] - 0.5
    cols = (np.arange(out_w) + 0.5) * factors[1] - 0.5
    grid = np.meshgrid(rows, cols, indexing="ij")
    return ndi.map_coordinates(img, grid, order=1, mode="mirror")


def rescale_intensity(
    image: np.ndarray,
    in_range: Tuple[float, float],
    out_range: Tuple[float, float],
) -> np.ndarray:
    """``skimage.exposure.rescale_intensity`` for float input."""
    imin, imax = float(in_range[0]), float(in_range[1])
    omin, omax = float(out_range[0]), float(out_range[1])
    image = np.clip(image, imin, imax)
    if imax == imin:
        return np.full_like(image, omin, dtype=np.float64)
    return ((image - imin) / (imax - imin)) * (omax - omin) + omin


@dataclass
class PreprocessedChannel:
    net_input: np.ndarray  # float64 [H*, W*] — what the network sees
    raw_norm: np.ndarray  # float64 [H, W] — QC preview plane (im2double/max)
    raw_shape: Tuple[int, int]


def preprocess_channel(
    plane: np.ndarray,
    scaling_factor: float = 1.0,
    outlier: float = -1,
    use_rescaled: bool = True,
) -> PreprocessedChannel:
    """The shared CLI front half (``UnMicst1-5.py:807-825``).

    ``use_rescaled=False`` reproduces the v2-solo quirk of feeding the
    un-rescaled resized image to inference.
    """
    if plane.dtype == np.float32:
        plane = plane.astype(np.uint16)  # UnMicst1-5.py:807-808
    raw_shape = plane.shape
    h = int(float(raw_shape[0]) * float(scaling_factor))
    w = int(float(raw_shape[1]) * float(scaling_factor))
    resized = resize(plane, (h, w))  # float64 in [0,1]
    if outlier == -1:
        max_limit = resized.max()
    else:
        max_limit = np.percentile(resized, outlier)
    rescaled = im2double(
        rescale_intensity(resized, (resized.min(), max_limit), (0, 0.983))
    )
    raw_d = im2double(plane)
    raw_norm = raw_d / raw_d.max() if raw_d.max() > 0 else raw_d
    return PreprocessedChannel(
        net_input=rescaled if use_rescaled else resized,
        raw_norm=raw_norm,
        raw_shape=raw_shape,
    )


def postprocess_pm(pm: np.ndarray, raw_shape: Tuple[int, int]) -> np.ndarray:
    """Probability map -> uint8 page (``UnMicst1-5.py:848-854``).

    Note the reference's double quantization: ``uint8(255*pm)`` then a float
    resize then ``uint8(255*x)`` again; ``np.uint8`` truncates toward zero.
    """
    q = np.uint8(255 * pm)
    r = resize(q, raw_shape)
    return np.uint8(255 * r)
