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


import numpy as np

from unmicst_tpu.io.tiff import TiffFile

TIFF_LIKE = ("ome.tif", "ome.tiff", "btf", "tif", "tiff")


def sniff_format(path: str) -> str:
    """Detect the container from magic bytes (extension-independent):
    classic/BigTIFF in either byte order, ZISRAW (CZI), or an ND2
    chunk-map file.  Used by the HTTP server, where uploads carry no
    trustworthy filename."""
    with open(path, "rb") as f:
        head = f.read(16)
    if head.startswith((b"II*\x00", b"II+\x00", b"MM\x00*", b"MM\x00+")):
        return "tif"
    if head.startswith(b"ZISRAWFILE"):
        return "czi"
    if head[:4] == b"\xda\xce\xbe\x0a":  # ND2 chunk magic 0x0ABECEDA LE
        return "nd2"
    raise ValueError(
        "unrecognized container (expected TIFF/BigTIFF, CZI, or ND2)"
    )


def tiff_plane(tf: TiffFile, channel: int) -> int:
    """channel -> IFD page of an open TIFF: OME-XML DimensionOrder-aware
    when present (``io/ome.py``); page == channel otherwise (the
    reference's ``tifffile.imread(key=channel)`` read,
    ``UnMicst1-5.py:795-797``)."""
    from unmicst_tpu.io import ome

    desc = tf.pages[0].description if tf.pages else ""
    return ome.plane_index(desc, channel, len(tf.pages))


def read_channel(image_path: str, file_type: str, channel: int) -> np.ndarray:
    if channel < 0:
        # the TIFF page list would Python-wrap (silently reading the LAST
        # plane) while CZI/ND2/OME raise — one contract for all formats
        raise IndexError(f"channel {channel} out of range")
    if file_type in TIFF_LIKE:
        from unmicst_tpu.io.tiff import PageTooLargeError

        try:
            with TiffFile(image_path) as tf:
                return tf.read_page(tiff_plane(tf, channel))
        except PageTooLargeError:
            # deliberate refusal — the fallback must not attempt the
            # very materialization the guard prevents
            raise
        except (NotImplementedError, ValueError):
            # exotic container/codec: PIL fallback, page == channel (no
            # OME mapping for files our native parser cannot walk).
            # PIL surfaces assorted internal types on corrupt input
            # (TypeError 'Missing dimensions', struct.error, ...) —
            # uploads reach this path via serve, so everything except
            # the out-of-range-frame EOFError (-> the IndexError
            # channel contract) is re-raised as ValueError
            from PIL import Image

            try:
                with Image.open(image_path) as im:
                    im.seek(channel)
                    return np.asarray(im)
            except EOFError:
                raise IndexError(
                    f"channel {channel} out of range"
                ) from None
            except Exception as e:  # noqa: BLE001 — PIL's types are open-ended
                raise ValueError(
                    f"{image_path}: unreadable by both the native TIFF "
                    f"parser and PIL ({type(e).__name__}: {e})"
                ) from e
    if file_type == "czi":
        from unmicst_tpu.io.czi import read_czi_channel

        return read_czi_channel(image_path, channel)
    if file_type == "nd2":
        from unmicst_tpu.io.nd2 import read_nd2_channel

        return read_nd2_channel(image_path, channel)
    raise NotImplementedError(
        f"Don't know how to read image with extension .{file_type}"
    )


def pyramid_plan(image_path: str, file_type: str, channel: int,
                 scaling_factor: float):
    """Pick the deepest stored SubIFD pyramid level usable at
    ``scaling_factor`` (the ``--usePyramid`` input path).

    Returns ``(level, divisor, full_shape, level_shape)`` or ``None``
    when the input is not TIFF-like, the channel's page carries no
    SubIFDs, or no stored level has an integer downscale ``divisor``
    <= ``1/scaling_factor`` (reading a coarser level than the requested
    scale would LOSE information the full-res run keeps).  Header-only:
    no pixel data is decoded.

    The reference ignores pyramids entirely (``UnMicst1-5.py:794-806``
    reads page planes whole via tifffile) — this is a beyond-parity
    input optimization: at ``--scalingFactor 0.5`` on a pyramidal
    OME-TIFF the decode + host->device bytes drop ~4x per octave.
    """
    if file_type not in TIFF_LIKE:
        return None
    if not scaling_factor or scaling_factor > 0.5:
        return None
    try:
        with TiffFile(image_path) as tf:
            pidx = tiff_plane(tf, channel)
            page = tf.pages[pidx]
            if page.subifds is None or not len(page.subifds):
                return None
            target = 1.0 / float(scaling_factor)
            best = None
            for lvl in range(len(page.subifds)):
                sub = tf.subifd_page(pidx, lvl)
                if not sub.height or not sub.width:
                    continue
                d = round(page.height / sub.height)
                if d < 2:
                    continue
                # accept mild odd-dimension rounding, reject
                # anisotropic or non-integer level geometry
                if (abs(page.height / sub.height - d) > 0.02 * d
                        or abs(page.width / sub.width - d) > 0.02 * d):
                    continue
                if d <= target * (1 + 1e-6) and (
                        best is None or d > best[1]):
                    best = (lvl, d, (page.height, page.width),
                            (sub.height, sub.width))
            return best
    except (ValueError, NotImplementedError, OSError, IndexError):
        return None


def pyramid_plan_multi(image_path: str, file_type: str, channels,
                       scaling_factor: float, max_level_px=None):
    """One consistent ``(level, divisor, full_shape, level_shape)`` plan
    covering EVERY channel's page, or ``None``.

    The per-surface pyramid input paths (CLI ``--usePyramid``, batch
    sweeps, serve ``usePyramid=``) share this so the consistency rules
    cannot drift: every channel must carry a usable stored level at the
    SAME (level, divisor).  When ``max_level_px`` is given, plans whose
    level itself still exceeds it are rejected — such a slide would
    have to stream, which defeats a whole-decoded level (the callers
    pass their streaming bound)."""
    plans = [pyramid_plan(image_path, file_type, c, scaling_factor)
             for c in channels]
    if not plans or any(p is None for p in plans):
        return None
    if len({(p[0], p[1]) for p in plans}) != 1:
        return None
    p = plans[0]
    if max_level_px is not None and p[3][0] * p[3][1] > max_level_px:
        return None
    return p


def read_channel_level(image_path: str, file_type: str, channel: int,
                       level: int) -> np.ndarray:
    """Decode one stored pyramid level of a channel's page (see
    :func:`pyramid_plan`); byte order normalized like ``tiff.imread``."""
    with TiffFile(image_path) as tf:
        arr = tf.read_subifd(tiff_plane(tf, channel), level)
    if arr.dtype.byteorder not in ("=", "|"):
        arr = arr.astype(arr.dtype.newbyteorder("="))
    return arr


def _streamed_int_stats(read_rows, height: int, width: int, dtype,
                        outlier: float, with_max: bool = False):
    """Exact (min, max | percentile[, max]) over a windowed integer source.

    64k-bin histogram over row chunks; percentile uses np.percentile's
    linear interpolation on the exact order statistics (integer values
    make the histogram lossless).  Mirrors the streaming engine's TIFF
    stats path (``runtime/pipeline.py::global_stats``).  ``with_max``
    appends the true max — one histogram pass serves both the rescale
    range and the preview scale (streamed slides are read once less).
    """
    dtype = np.dtype(dtype)
    if outlier != -1 and not 0 <= outlier <= 100:
        # np.percentile (the oracle and the reference's in-memory path)
        # raises for out-of-range q; the streamed path must not silently
        # return a garbage range instead
        raise ValueError(
            f"outlier percentile {outlier} not in [0, 100] (or -1)"
        )
    if dtype == np.int16:
        offset = 32768
    elif dtype in (np.dtype(np.uint8), np.dtype(np.uint16)):
        offset = 0
    else:
        raise NotImplementedError(f"streamed stats for dtype {dtype}")
    hist = np.zeros(65536, np.int64)
    chunk = max(1, (64 << 20) // max(1, width * 2))
    for r0 in range(0, height, chunk):
        rows = read_rows(r0, min(chunk, height - r0))
        if offset:
            # int16 -> shifted uint16 via the two's-complement XOR trick
            # (monotonic, == value + 32768) — no 8-byte temporaries
            rows = rows.view(np.uint16) ^ 0x8000
        hist += np.bincount(rows.ravel(), minlength=65536)[:65536]
    nz = np.nonzero(hist)[0]
    if nz.size == 0:
        raise ValueError("zero-area plane (corrupt or empty source)")
    lo = float(nz[0]) - offset
    vmax = float(nz[-1]) - offset
    if outlier == -1:
        hi = vmax
    else:
        n = int(hist.sum())
        pos = (n - 1) * outlier / 100.0
        k = int(np.floor(pos))
        frac = pos - k
        cum = np.cumsum(hist)
        v_k = float(np.searchsorted(cum, k + 1))
        v_k1 = float(np.searchsorted(cum, k + 2)) if frac > 0 else v_k
        hi = v_k + frac * (v_k1 - v_k) - offset
    return (lo, hi, vmax) if with_max else (lo, hi)


class ChannelSource:
    """Uniform windowed view of one channel — the streaming-engine source
    protocol (``height``/``width``/``dtype``/``read_rows``/``stats``) over
    any supported container.

    Float32 planes are parity-cast to uint16 row-by-row
    (``UnMicst1-5.py:807-808`` semantics, matching the whole-image path).
    """

    def __init__(self, height: int, width: int, dtype, read_rows_fn,
                 closer=None):
        self.height, self.width = int(height), int(width)
        raw_dtype = np.dtype(dtype)
        self._cast = raw_dtype == np.float32
        # rows arrive as self.dtype (post parity-cast); raw_dtype keeps
        # the on-disk dtype for callers that must NOT cast (cyto2)
        self.raw_dtype = raw_dtype
        self.dtype = np.dtype(np.uint16) if self._cast else raw_dtype
        self._read = read_rows_fn
        self._closer = closer

    def read_rows(self, r0: int, nrows: int) -> np.ndarray:
        out = np.zeros((nrows, self.width), self.dtype)
        a, b = max(r0, 0), min(r0 + nrows, self.height)
        if b > a:
            rows = self._read(a, b - a)
            if self._cast:
                rows = rows.astype(np.uint16)
            out[a - r0 : b - r0] = rows[: b - a]
        return out

    def stats(self, outlier: float = -1, with_max: bool = False):
        return _streamed_int_stats(
            lambda r0, n: self.read_rows(r0, n),
            self.height, self.width, self.dtype, outlier,
            with_max=with_max,
        )

    def close(self) -> None:
        if self._closer:
            self._closer()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def preview_u8(src: "ChannelSource", vmax: float = None) -> np.ndarray:
    """uint8(255 * raw/max) preview plane built chunk-wise (1 B/px host
    footprint) — the qc Preview/raw page both CLI streaming and batch
    sweeps attach (``UnMicst1-5.py:845-848`` raw page semantics).

    Integer sources scale through a value lookup table (bit-identical to
    the per-pixel float32 math; the float pass over a 400 Mpx slide costs
    tens of seconds on weak hosts).  ``vmax``: precomputed raw max (e.g.
    from ``stats(..., with_max=True)``) — skips the max pass, reading the
    slide once instead of twice."""
    h, w = src.height, src.width
    chunk = max(1, (64 << 20) // max(1, w * 2))
    if vmax is None:
        vmax = 0.0
        for r0 in range(0, h, chunk):
            vmax = max(
                vmax, float(src.read_rows(r0, min(chunk, h - r0)).max())
            )
    dt = np.dtype(src.dtype)
    lut = None
    lut_off = 0
    if dt in (np.dtype(np.uint8), np.dtype(np.uint16), np.dtype(np.int16)):
        # int16 indexes through a +32768 offset (mirrors
        # _streamed_int_stats); negatives clamp to 0 instead of wrapping
        # through np.uint8 of a negative float.
        lut_off = 32768 if dt == np.dtype(np.int16) else 0
        n = 256 if dt == np.dtype(np.uint8) else 65536
        values = np.arange(n, dtype=np.float32) - lut_off
        lut = np.uint8(255 * np.clip(values / max(vmax, 1e-12), 0.0, 1.0))
    out = np.empty((h, w), np.uint8)
    for r0 in range(0, h, chunk):
        rows = src.read_rows(r0, min(chunk, h - r0))
        if lut is not None:
            idx = rows.astype(np.int32) + lut_off if lut_off else rows
            out[r0 : r0 + rows.shape[0]] = lut[idx]
        else:
            out[r0 : r0 + rows.shape[0]] = np.uint8(255 * np.clip(
                rows.astype(np.float32) / max(vmax, 1e-12), 0.0, 1.0
            ))
    return out


def open_channel_source(image_path: str, file_type: str,
                        channel: int) -> ChannelSource:
    """Windowed streaming source for one channel of any supported format.

    The underlying reader is closed if per-channel setup fails after the
    open (bad channel index, unsupported compression, ...) — no fd leaks
    for long-lived callers (serve, batch sweeps).
    """
    if channel < 0:
        raise IndexError(f"channel {channel} out of range")
    if file_type in TIFF_LIKE:
        tf = TiffFile(image_path)
        try:
            plane = tiff_plane(tf, channel)
            page = tf.pages[plane]
            # eager 1-row probe: unsupported codec/predictor/planar must
            # fail HERE (the documented setup contract), not mid-stream
            # after the engine compiled
            tf.read_region(plane, 0, 0, 1, page.width)
            return ChannelSource(
                page.height, page.width, page.dtype,
                lambda r0, n: tf.read_region(plane, r0, 0, n, page.width),
                closer=tf.close,
            )
        except Exception:
            tf.close()
            raise
    if file_type == "czi":
        from unmicst_tpu.io.czi import CziFile

        czi = CziFile(image_path)
        try:
            h, w = czi.channel_shape(channel)
            probe = czi.read_rows(channel, 0, 1)
            return ChannelSource(
                h, w, probe.dtype,
                lambda r0, n: czi.read_rows(channel, r0, n),
                closer=czi.close,
            )
        except Exception:
            czi.close()
            raise
    if file_type == "nd2":
        from unmicst_tpu.io.nd2 import Nd2File

        nd2 = Nd2File(image_path)
        try:
            nd2.read_rows(channel, 0, 1)  # validate the channel eagerly
            return ChannelSource(
                nd2.height, nd2.width, nd2.dtype,
                lambda r0, n: nd2.read_rows(channel, r0, n),
                closer=nd2.close,
            )
        except Exception:
            nd2.close()
            raise
    raise NotImplementedError(
        f"Don't know how to stream image with extension .{file_type}"
    )



def n_channels(image_path: str) -> int:
    """Channel count: OME SizeC when consistent OME-XML is present, else
    the page count (the reference's implicit page==channel model)."""
    from unmicst_tpu.io import ome

    with TiffFile(image_path) as tf:
        desc = tf.pages[0].description if tf.pages else ""
        return ome.channel_count(desc, len(tf.pages))


def channel_names(image_path: str, file_type: str):
    """Declared channel names of any supported container, or None.

    OME-TIFF: the ``<Channel Name=...>`` elements (``io/ome.py``);
    CZI: ``Image/Dimensions/Channels`` of the ZISRAWMETADATA XML
    (``io/czi.py``).  ND2 carries no name support here (the vendored
    reader parses the chunk map only)."""
    if file_type in TIFF_LIKE:
        from unmicst_tpu.io import ome

        with TiffFile(image_path) as tf:
            desc = tf.pages[0].description if tf.pages else ""
        return ome.channel_names(desc)
    if file_type == "czi":
        from unmicst_tpu.io.czi import CziFile

        with CziFile(image_path) as cz:
            return cz.channel_names()
    return None


def resolve_channel_names(image_path: str, file_type: str, names):
    """Channel *names* -> 0-based indexes for any supported container.

    ValueError when the container declares no names or a name doesn't
    resolve (message lists the available channels)."""
    from unmicst_tpu.io import ome

    declared = channel_names(image_path, file_type)
    if declared is None:
        raise ValueError(
            f"this .{file_type} input carries no channel names — "
            "use a channel index instead"
        )
    return [ome.resolve_name(declared, n) for n in names]
