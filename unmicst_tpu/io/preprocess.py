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
from typing import Tuple

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


# value-collection bound for the streamed exact percentile (~32 MB of
# float64); tests shrink it to exercise the refinement path
_PERCENTILE_CAP = 1 << 22


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
    if image.dtype == np.int32:
        return image.astype(np.float64) / 2147483647
    if image.dtype.kind in "ui":
        # unlisted integer widths: failing loudly beats feeding raw
        # integer magnitudes to the net (the solo path skips rescale)
        raise NotImplementedError(
            f"img_as_float for dtype {image.dtype} not supported"
        )
    return image.astype(np.float64)


# img_as_float divisor per integer dtype (float passes through, scale 1)
_IMG_AS_FLOAT_SCALE = {
    np.dtype(np.uint8): 255.0,
    np.dtype(np.uint16): 65535.0,
    np.dtype(np.uint32): 4294967295.0,
    np.dtype(np.int16): 32767.0,
    np.dtype(np.int32): 2147483647.0,
}


def pinned_to_source_units(pairs, source):
    """Convert raw-pixel-unit pinned (lo, hi) rescale pairs into the units
    ``source.read_rows`` yields.

    :class:`ResampledSource` streams img_as_float unit-scale float32 rows
    (the integer full-scale already divided out), while the streaming
    engine applies ``stats=`` verbatim in source units — so raw-unit pins
    must divide by the underlying dtype's full-scale or every pixel clips
    to ``lo`` (silently constant maps).  Plain integer sources stream raw
    units and pass through unchanged.  Accepts ``None``, one ``(lo, hi)``
    pair, or a sequence of pairs; preserves the input structure.
    """
    scale = getattr(source, "raw_units_scale", None)
    if pairs is None or scale is None or scale == 1.0:
        return pairs
    arr = np.asarray(pairs, dtype=np.float64) / scale
    if arr.ndim == 1:
        return tuple(arr.tolist())
    return [tuple(p) for p in arr.tolist()]


def _fold_coords(coords: np.ndarray, n: int):
    """Mirror-fold sample coords into [0, n-1] and split into (lo index,
    lerp fraction) — scipy's mode="mirror" for the single-reflection
    range resize coordinates live in."""
    c = np.abs(coords)
    c = np.where(c > n - 1, 2.0 * (n - 1) - c, c)
    lo = np.floor(c).astype(np.intp)
    np.clip(lo, 0, n - 2, out=lo)
    return lo, c - lo


def _lerp_axis(img: np.ndarray, coords: np.ndarray, axis: int) -> np.ndarray:
    """Order-1 resample of one axis at ``coords``, half of the separable
    bilinear in :func:`resize`.  In-place op chain: the lerp
    `a + (b-a)*frac` allocates two big buffers total (the gathers), not
    five — large fresh allocations fault-in at ~10x the cost of the
    arithmetic on this class of host."""
    n = img.shape[axis]
    if n == 1:
        return np.repeat(img, len(coords), axis=axis)
    lo, frac = _fold_coords(coords, n)
    b = np.take(img, lo + 1, axis=axis)
    a = np.take(img, lo, axis=axis)
    np.subtract(b, a, out=b)
    np.multiply(b, frac[:, None] if axis == 0 else frac[None, :], out=b)
    np.add(b, a, out=b)
    return b


def _lerp_rows(img: np.ndarray, coords: np.ndarray) -> np.ndarray:
    return _lerp_axis(img, coords, 0)


def _lerp_cols(img: np.ndarray, coords: np.ndarray) -> np.ndarray:
    return _lerp_axis(img, coords, 1)


def resize(image: np.ndarray, output_shape: Tuple[int, int]) -> np.ndarray:
    """``skimage.transform.resize`` work-alike (float output in [0, 1]).

    Identity (modulo dtype scaling) when the shape is unchanged.  The
    interpolation runs as a separable two-stage lerp (rows then columns)
    — the same order-1/mirror sampling ``ndi.map_coordinates`` computes
    on the outer-product grid (equal to ~1e-15), without materializing
    two (out_h, out_w) float64 coordinate planes and ~4x faster on the
    upscale-bound postprocess path (BASELINE.md).
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
    return _lerp_cols(_lerp_rows(img, rows), cols)


def resize_rows(
    read_fn,
    in_shape: Tuple[int, int],
    out_shape: Tuple[int, int],
    r0: int,
    nrows: int,
) -> np.ndarray:
    """Rows ``[r0, r0+nrows)`` of ``resize(image, out_shape)``, exactly.

    ``read_fn(a, b)`` returns raw source rows ``[a, b)`` at full width.
    The block read includes the gaussian anti-alias support plus the linear
    interpolation footprint, so interior rows are bit-identical to the
    whole-image :func:`resize`; at the image top/bottom the block edge
    coincides with the true image edge, where the mirror boundary matches
    the whole-image call by construction.  This is what lets the streaming
    engine honor ``--scalingFactor`` (``UnMicst1-5.py:813-815``) without
    materializing the resized slide.
    """
    in_h, in_w = in_shape
    out_h, out_w = out_shape
    if nrows <= 0:
        return np.zeros((0, out_w), np.float64)
    fr, fc = in_h / out_h, in_w / out_w
    sr, sc = max(0.0, (fr - 1.0) / 2.0), max(0.0, (fc - 1.0) / 2.0)
    radius = int(4.0 * sr + 0.5) if sr > 0 else 0  # scipy truncate=4.0
    ys = (np.arange(r0, r0 + nrows) + 0.5) * fr - 0.5
    # fold out-of-range coords through the mirror boundary: the true sample
    # footprint of y < 0 is at -y (and symmetrically at the bottom), so the
    # block must cover the reflected positions too
    ys_fold = np.abs(ys)
    ys_fold = np.where(ys_fold > in_h - 1, 2 * (in_h - 1) - ys_fold, ys_fold)
    lo = max(int(np.floor(ys_fold.min())) - radius, 0)
    hi = min(int(np.floor(ys_fold.max())) + 1 + radius, in_h - 1)
    block = img_as_float(read_fn(lo, hi + 1))
    if sr > 0 or sc > 0:
        block = ndi.gaussian_filter(block, (sr, sc), mode="mirror")
    cols = (np.arange(out_w) + 0.5) * fc - 0.5
    # ys_fold - lo is exact (integer subtraction on float64), so floor/
    # frac — and therefore every float op — match the whole-image resize
    # bit-for-bit (test_resize_rows_blockwise_exact)
    return _lerp_cols(_lerp_rows(block, ys_fold - lo), cols)


class ResampledSource:
    """Virtual resized slide for the streaming engine (``--scalingFactor``).

    Presents ``height/width/dtype/read_rows/stats`` over
    ``resize(raw, (H*sf, W*sf))`` computed row-block-exactly on demand, so
    off-scale mega-slides stream with bounded memory while matching the
    whole-image preprocess (``UnMicst1-5.py:813-815``).  Applies the
    float32->uint16 parity cast before resizing, like
    :func:`preprocess_channel`.

    ``source``: 2-D numpy array, ``(TiffFile, page)``, or any windowed
    source with ``height``/``width``/``read_rows`` (e.g.
    :class:`unmicst_tpu.io.slides.ChannelSource` — czi/nd2 stream too).
    """

    def __init__(self, source, scaling_factor: float):
        if isinstance(source, np.ndarray):
            raw = (
                source.astype(np.uint16)
                if source.dtype == np.float32 else source
            )
            in_h, in_w = raw.shape
            read_dtype = raw.dtype
            self._read = lambda a, b: raw[a:b]
        elif hasattr(source, "read_rows"):
            in_h, in_w = source.height, source.width
            # ChannelSource.dtype is already post parity-cast
            read_dtype = np.dtype(source.dtype)
            self._read = lambda a, b: source.read_rows(a, b - a)
        else:
            tf, page = source
            in_h, in_w = tf.pages[page].height, tf.pages[page].width
            cast = np.dtype(tf.pages[page].dtype) == np.float32
            read_dtype = (
                np.dtype(np.uint16) if cast
                else np.dtype(tf.pages[page].dtype)
            )

            def _read(a, b, _tf=tf, _page=page, _w=in_w, _cast=cast):
                rows = _tf.read_region(_page, a, 0, b - a, _w)
                return rows.astype(np.uint16) if _cast else rows

            self._read = _read
        # resize_rows normalizes integer rows through img_as_float, so this
        # source's units are raw / raw_units_scale — callers pinning
        # raw-unit rescale ranges must divide by it (pinned_to_source_units)
        self.raw_units_scale = _IMG_AS_FLOAT_SCALE.get(read_dtype, 1.0)
        self.raw_shape = (in_h, in_w)
        self.height = int(float(in_h) * float(scaling_factor))
        self.width = int(float(in_w) * float(scaling_factor))
        if self.height <= 0 or self.width <= 0:
            # a silent 0x0 virtual image would stream (inf, -inf) stats
            # into NaN maps; the whole-image path fails loudly too
            raise ValueError(
                f"scalingFactor {scaling_factor} shrinks the "
                f"{in_h}x{in_w} slide to {self.height}x{self.width}"
            )
        self.dtype = np.dtype(np.float32)

    def read_rows(self, r0: int, nrows: int) -> np.ndarray:
        """Resized rows ``[r0, r0+nrows)`` (float32 in [0,1]; zero-padded
        outside the virtual image, matching the engine's edge fill)."""
        out = np.zeros((nrows, self.width), np.float32)
        a, b = max(r0, 0), min(r0 + nrows, self.height)
        if b > a:
            out[a - r0 : b - r0] = resize_rows(
                self._read, self.raw_shape, (self.height, self.width),
                a, b - a,
            )
        return out

    def _blocks(self, block: int = 1024):
        # float64 (pre-cast) rows: the stats must match the whole-image
        # host path, which computes min/max/percentile before any float32
        # narrowing
        for r0 in range(0, self.height, block):
            yield resize_rows(
                self._read, self.raw_shape, (self.height, self.width),
                r0, min(block, self.height - r0),
            )

    def stats(self, outlier: float = -1) -> Tuple[float, float]:
        """(min, max | exact percentile) over the virtual resized image.

        The percentile streams in three passes: min/max, a 64k-bin
        histogram to locate the order statistics, then a value-collection
        pass over just the covering bins — yielding np.percentile's exact
        linear-interpolated result without holding the image.
        """
        vmin, vmax = np.inf, -np.inf
        for rows in self._blocks():
            vmin = min(vmin, float(rows.min()))
            vmax = max(vmax, float(rows.max()))
        if outlier == -1 or vmax <= vmin:
            return vmin, vmax
        n = self.height * self.width
        pos = (n - 1) * outlier / 100.0
        k, frac = int(np.floor(pos)), pos - int(np.floor(pos))
        nbins = 65536
        cap = _PERCENTILE_CAP  # bounded even on dense plateaus

        # chained-grid membership: each refinement selects by the bin
        # indexes of ALL previous grids (identical clip formula in the
        # count and collect passes), so ranks stay exact under float
        # boundary effects while the candidate set shrinks 65536x/pass
        grids = []  # (lo, scale, b_lo, b_hi)

        def _mask(rows):
            m = np.ones(rows.shape, bool)
            for lo, sc, blo, bhi in grids:
                idx = np.clip(((rows - lo) * sc).astype(np.int64),
                              0, nbins - 1)
                m &= (idx >= blo) & (idx <= bhi)
            return m

        lo_v, hi_v, below = vmin, vmax, 0
        for _depth in range(4):
            scale = nbins / max(hi_v - lo_v, 1e-300)
            hist = np.zeros(nbins, np.int64)
            for rows in self._blocks():
                sel = rows[_mask(rows)]
                if sel.size:
                    idx = np.clip(((sel - lo_v) * scale).astype(np.int64),
                                  0, nbins - 1)
                    hist += np.bincount(idx, minlength=nbins)
            cum = np.cumsum(hist) + below  # global ranks
            b_lo = int(np.searchsorted(cum, k + 1))
            b_hi = int(np.searchsorted(cum, k + 2)) if frac > 0 else b_lo
            count_in = int(cum[b_hi]) - (
                int(cum[b_lo - 1]) if b_lo > 0 else below
            )
            grids.append((lo_v, scale, b_lo, b_hi))
            # ranks below the selected bins (for indexing the collected
            # values) — must advance whether we break or refine
            below = int(cum[b_lo - 1]) if b_lo > 0 else below
            if count_in <= cap:
                break
            new_lo = lo_v + b_lo / scale
            new_hi = lo_v + (b_hi + 1) / scale
            if not new_hi - new_lo < hi_v - lo_v:
                # range exhausted: the remaining candidates are one
                # float value — collecting them could still blow the cap
                return vmin, float(lo_v)
            lo_v, hi_v = new_lo, new_hi
        else:
            # still dense after max refinement: the candidates span less
            # than (vmax-vmin)/65536^3 — any of them IS the percentile
            return vmin, float(lo_v)

        picked = []
        for rows in self._blocks():
            sel = rows[_mask(rows)]
            if sel.size:
                picked.append(np.asarray(sel, np.float64))
        vals = np.sort(np.concatenate(picked))
        v_k = vals[k - below]
        v_k1 = vals[k + 1 - below] if frac > 0 else v_k
        return vmin, float(v_k + frac * (v_k1 - v_k))


def upscale_pm(pm_u8: np.ndarray, raw_shape: Tuple[int, int],
               block: int = 2048) -> np.ndarray:
    """Scaled uint8 probability map -> raw-resolution uint8 page, streamed.

    The blocked equivalent of :func:`postprocess_pm`'s resize-back
    (``UnMicst1-5.py:848-854``) — avoids the full-slide float64
    intermediate that ``map_coordinates`` would otherwise materialize.
    """
    out_h, out_w = raw_shape
    out = np.empty((out_h, out_w), np.uint8)
    for r0 in range(0, out_h, block):
        n = min(block, out_h - r0)
        rows = resize_rows(
            lambda a, b: pm_u8[a:b], pm_u8.shape, raw_shape, r0, n
        )
        out[r0 : r0 + n] = np.uint8(255 * rows)
    return out


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
        # skimage (>= 0.18, the reference's era): a degenerate in_range
        # clips to out_range instead of normalizing — a constant slide
        # passes through, it does not zero out
        return np.clip(image, omin, omax).astype(np.float64)
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
    cast_float32: bool = True,
    in_range=None,
) -> PreprocessedChannel:
    """The shared CLI front half (``UnMicst1-5.py:807-825``).

    ``use_rescaled=False`` reproduces the v2-solo quirk of feeding the
    un-rescaled resized image to inference.  ``cast_float32=False``
    reproduces UnMicstCyto2.py, which alone among the tools has no
    float32->uint16 parity cast — casting a [0,1] float slide would
    truncate every pixel to zero there.

    ``in_range``: optional pinned (lo, hi) rescale range in raw pixel
    units (post parity cast) — replaces the data-derived
    min/max|percentile so multiple slides (or windows of one slide)
    normalize identically; ``outlier`` is then ignored.
    """
    if cast_float32 and plane.dtype == np.float32:
        plane = plane.astype(np.uint16)  # UnMicst1-5.py:807-808
    raw_shape = plane.shape
    if in_range is not None:
        lo_r, hi_r = (float(v) for v in in_range)
        if not (np.isfinite(lo_r) and np.isfinite(hi_r) and lo_r < hi_r):
            raise ValueError(
                f"in_range must be finite with lo < hi, got {in_range}"
            )
        # raw units -> img_as_float units (the chain rescales after
        # img_as_float; integer dtypes divide by their full-scale value)
        div = {
            np.dtype(np.uint8): 255.0, np.dtype(np.uint16): 65535.0
        }.get(plane.dtype)
        if div is not None:
            lo_r, hi_r = lo_r / div, hi_r / div
    h = int(float(raw_shape[0]) * float(scaling_factor))
    w = int(float(raw_shape[1]) * float(scaling_factor))
    if (h, w) == tuple(raw_shape) and plane.dtype in (
        np.dtype(np.uint8), np.dtype(np.uint16)
    ):
        # scale-1 fast path: with no resampling, every per-pixel op in
        # the chain (img_as_float, clip, linear rescale, /max) is a pure
        # function of the 8/16-bit input value — run the float64 math
        # over a value table and gather, bit-identical to the full-image
        # float path (same ops per distinct value; min/max commute with
        # the monotone v/divisor map).  ~11 full-plane float64 passes
        # collapse to 2-3 gathers: 675 -> ~210 ms per 16 Mpx plane on a
        # 1-core host (BASELINE.md).
        values = np.arange(
            256 if plane.dtype == np.uint8 else 65536, dtype=plane.dtype
        )
        lut_f = img_as_float(values)  # monotone: v / (255 | 65535)
        vmin, vmax = int(plane.min()), int(plane.max())
        resized = None
        if in_range is not None:
            min_limit, max_limit = lo_r, hi_r
        elif outlier == -1:
            min_limit, max_limit = lut_f[vmin], lut_f[vmax]
        else:
            resized = lut_f[plane]
            min_limit, max_limit = lut_f[vmin], np.percentile(
                resized, outlier
            )
        lut_net = im2double(
            rescale_intensity(lut_f, (min_limit, max_limit), (0, 0.983))
        )
        lut_raw = lut_f / lut_f[vmax] if lut_f[vmax] > 0 else lut_f
        if use_rescaled:
            net_input = lut_net[plane]
        else:
            net_input = resized if resized is not None else lut_f[plane]
        return PreprocessedChannel(
            net_input=net_input,
            raw_norm=lut_raw[plane],
            raw_shape=raw_shape,
        )
    resized = resize(plane, (h, w))  # float64 in [0,1]
    if in_range is not None:
        min_limit, max_limit = lo_r, hi_r
    elif outlier == -1:
        min_limit, max_limit = resized.min(), resized.max()
    else:
        min_limit, max_limit = resized.min(), np.percentile(
            resized, outlier
        )
    rescaled = im2double(
        rescale_intensity(resized, (min_limit, max_limit), (0, 0.983))
    )
    raw_d = im2double(plane)
    raw_norm = raw_d / raw_d.max() if raw_d.max() > 0 else raw_d
    return PreprocessedChannel(
        net_input=rescaled if use_rescaled else resized,
        raw_norm=raw_norm,
        raw_shape=raw_shape,
    )


def preview_u8_from_raw(raw: np.ndarray) -> np.ndarray:
    """The QC preview page ``uint8(255 * im2double(raw)/max)`` in one step.

    For uint8/uint16 rasters the per-value float64 math runs over a
    256/65536-entry lookup table instead of the full image — bit-identical
    to ``np.uint8(255 * preprocess_channel(...).raw_norm)`` (same float64
    ops per distinct value) at ~100x less float traffic (measured ~5 s ->
    ~0.1 s per 16 Mpx on a 1-core host).  Other dtypes take the float
    path.
    """
    if raw.dtype == np.float32:
        raw = raw.astype(np.uint16)  # parity cast (UnMicst1-5.py:807-808)
    if raw.dtype in (np.dtype(np.uint8), np.dtype(np.uint16)):
        values = np.arange(
            65536 if raw.dtype == np.uint16 else 256, dtype=raw.dtype
        )
        d = im2double(values)
        vmax = d[int(raw.max())]
        lut = np.uint8(255 * (d / vmax)) if vmax > 0 else np.uint8(d)
        return lut[raw]
    raw_d = im2double(raw)
    vmax = raw_d.max()
    return np.uint8(255 * (raw_d / vmax if vmax > 0 else raw_d))


def postprocess_pm(pm: np.ndarray, raw_shape: Tuple[int, int]) -> np.ndarray:
    """Probability map -> uint8 page (``UnMicst1-5.py:848-854``).

    Note the reference's double quantization: ``uint8(255*pm)`` then a float
    resize then ``uint8(255*x)`` again; ``np.uint8`` truncates toward zero.
    """
    q = np.uint8(255 * pm)
    if q.shape == tuple(raw_shape):
        # scale-1 fast path: the identity resize is q/255 and the
        # requantize is uint8(255*(q/255)) — a pure function of the
        # uint8 value; one 256-entry LUT gather replaces the float64
        # round-trip, bit-identical (same ops per distinct value)
        lut = np.uint8(255 * img_as_float(np.arange(256, dtype=np.uint8)))
        return lut[q]
    r = resize(q, raw_shape)
    return np.uint8(255 * r)
