"""Streaming whole-slide inference pipeline — host IO overlapped with TPU.

The reference processes slides fully in RAM with a synchronous
``Session.run`` per 16-32 patches (``UnMicst.py:530-541``).  This engine
streams arbitrarily tall slides through the chip with bounded memory and
the host<->device link as the only serialized resource:

* the slide is cut into **independent overlapping mega-stripes** of ``S``
  tile-rows; a stripe re-computes one boundary tile-row of its predecessor
  (compute overhead ``1/S``) so that every output row is *finished* by
  exactly one stripe — no cross-stripe accumulation, no ordering
  constraints;
* one jit serves every stripe of a given width (the stripe row-index enters
  as a traced scalar), so compile cost is independent of slide height;
* dispatch is asynchronous: stripe ``s+k`` uploads/computes while stripe
  ``s`` downloads (``k`` = in-flight window), hiding compute and one
  transfer direction behind the other;
* per-stripe output is finished uint8 (all classes), so the link carries
  2 B/px in (uint16) and ``K`` B/px out;
* input can be a numpy array or a :class:`unmicst_tpu.io.tiff.TiffFile`
  page (windowed region reads — the slide never fully materializes in
  host RAM).

Preprocessing parity: ``rescale_intensity(in=(min, max|percentile),
out=(0, 0.983))`` + ``im2double`` (``UnMicst1-5.py:817-821``) with the
global statistics computed on host and applied on device.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from unmicst_tpu.core import tiler
from unmicst_tpu.core.hp import HParams, ModelBundle
from unmicst_tpu.core.unet import Params, apply
from unmicst_tpu.utils.batching import chunked_forward
from unmicst_tpu.utils.progcache import ProgramCache


# im2double/img_as_float dtype scale (io/preprocess.py semantics)
_IM2DOUBLE_SCALE = {
    np.dtype(np.uint8): 255.0,
    np.dtype(np.uint16): 65535.0,
    np.dtype(np.int16): 32767.0,
    np.dtype(np.uint32): 4294967295.0,
}


def _source_dims(src) -> Tuple[int, int]:
    """(height, width) of any streaming source kind."""
    if hasattr(src, "read_rows"):
        return src.height, src.width
    if isinstance(src, np.ndarray):
        return src.shape
    tf, page = src
    return tf.pages[page].height, tf.pages[page].width


def _check_classes(classes, n_classes: int):
    """Normalize + validate: jit gathers CLAMP out-of-range static
    indexes (and Python wraps negatives), silently returning the wrong
    class map — mirror InferenceEngine._check_classes."""
    if classes is None:
        return None
    classes = tuple(int(c) for c in classes)
    bad = [c for c in classes if not 0 <= c < n_classes]
    if bad:
        raise ValueError(
            f"class index(es) {bad} out of range for a "
            f"{n_classes}-class model"
        )
    return classes


def _check_rescale_dtype(in_dtype, rescale: bool) -> None:
    """rescale=False needs a known scale — uint8/uint16 (im2double) or
    float32 (UNIT-scale convention: virtual sources like ResampledSource
    emit [0,1] floats, inv_scale 1.0).  Raw float32 ndarrays/pages never
    reach here as float32 (parity-cast to uint16 first); int16/uint32/
    float64 would silently feed wrong-scale values, so they raise.  One
    policy across infer, infer_stack, and the sharded variants."""
    if not rescale and np.dtype(in_dtype) not in (
        np.dtype(np.uint8), np.dtype(np.uint16), np.dtype(np.float32)
    ):
        raise ValueError(
            f"streaming with rescale=False requires uint8/uint16 (or "
            f"unit-float virtual) input, got {np.dtype(in_dtype)}"
        )


def _source_dtype(src) -> np.dtype:
    """dtype the source's rows actually arrive as (after the float32
    parity cast applied to raw arrays/TIFF pages)."""
    if hasattr(src, "read_rows"):
        return np.dtype(src.dtype)
    dt = np.dtype(
        src.dtype if isinstance(src, np.ndarray) else src[0].pages[src[1]].dtype
    )
    return np.dtype(np.uint16) if dt == np.float32 else dt


@dataclasses.dataclass
class _StripePlan:
    height: int
    width: int
    S: int  # finished tile-rows per stripe
    n_stripes: int
    grid: tiler.TileGrid
    in_rows: int  # raw input rows fed per stripe
    band_rows: int  # finished output rows per stripe (S*sub)


class StreamingEngine:
    """Pipelined raw-slide inference: uint16 in, uint8 maps out."""

    def __init__(
        self,
        hp: HParams,
        params: Params,
        variant: str,
        mean: float,
        std: float,
        *,
        compute_dtype=jnp.bfloat16,
        precision=None,
        tile_batch: Optional[int] = None,
        stripe_tile_rows: Optional[int] = None,
        in_flight: int = 4,
        quantized: bool = False,
        calibration_percentile: float = 99.99,
        quant_bias_correct: bool = True,
    ):
        self.hp = hp
        # one batched host->device transfer at construction: the
        # loaders return host arrays (per-leaf device puts pay a
        # tunnel round-trip each), and numpy params passed to a
        # jitted call would re-upload on EVERY call
        self.params = jax.device_put(params)
        self.variant = variant
        self.mean = float(mean)
        self.std = float(std)
        self.compute_dtype = compute_dtype
        self.precision = precision
        from unmicst_tpu.infer import default_tile_batch

        self.tile_batch = int(
            tile_batch or default_tile_batch(hp.im_size, compute_dtype)
        )
        self.stripe_tile_rows = stripe_tile_rows
        self.in_flight = in_flight
        # int8 PTQ fast mode (core/quant.py), mirroring InferenceEngine:
        # calibrated lazily from the first source (activation scales are
        # standardized-input-stable, so one calibration serves the
        # engine's lifetime); host params kept for host-side weight
        # quantization
        self.quantized = bool(quantized)
        self.calibration_percentile = float(calibration_percentile)
        self.quant_bias_correct = bool(quant_bias_correct)
        self._params_host = params if quantized else None
        self._quant = None
        # bounded + locked: serving routes mega-slides here, one compiled
        # program per geometry must not accumulate forever
        self._compiled = ProgramCache(max_entries=16)

    @classmethod
    def from_bundle(cls, bundle: ModelBundle, params: Params, **kw):
        return cls(
            bundle.hp, params, bundle.variant, bundle.mean, bundle.std, **kw
        )

    # -- planning ------------------------------------------------------------

    def _plan(self, height: int, width: int) -> _StripePlan:
        if height <= 0 or width <= 0:
            raise ValueError(f"empty image: {height}x{width}")
        hp = self.hp
        grid = tiler.make_grid(height, width, hp.im_size, hp.margin)
        sub = grid.sub
        if self.stripe_tile_rows is not None:
            S = self.stripe_tile_rows
        else:
            # aim for >= tile_batch tiles and >= ~1024 rows per stripe
            S = max(1, self.tile_batch // max(1, grid.npc), -(-1024 // sub))
            # nudge S so the per-stripe forward ((S+1)*npc tiles) splits
            # into full tile_batch chunks plus a sliver remainder — full
            # chunks are ~25% faster per tile (BASELINE.md stripe-autotune
            # landscape); bigger stripes also amortize host round-trips
            if grid.npc:
                # candidates capped at npr so the clamp below never
                # discards the minimized pick for short slides
                lo = min(S, grid.npr)
                S = min(
                    range(lo, min(S + 4, grid.npr + 1)),
                    key=lambda s: ((s + 1) * grid.npc) % self.tile_batch
                    / ((s + 1) * grid.npc),
                )
        S = min(S, grid.npr)
        # stripes must cover every VALID padded row [margin, margin+height):
        # the last tile-row's window tail extends margin rows past npr*sub,
        # so ceil(npr/S) under-covers whenever height mod sub > sub - margin
        # (regression: the final margin rows of output were never drained).
        n_stripes = -(-(grid.margin + height) // (S * sub))
        # stripe s finishes output band rows [s*S*sub, (s+1)*S*sub) of the
        # padded canvas, computing tile rows s*S-1 .. (s+1)*S-1 inclusive.
        in_rows = (S + 1) * sub + 2 * grid.margin
        return _StripePlan(
            height=height, width=width, S=S, n_stripes=n_stripes, grid=grid,
            in_rows=in_rows, band_rows=S * sub,
        )

    # -- per-stripe jit ------------------------------------------------------

    def _build(self, plan: _StripePlan, in_dtype, rescale: bool, classes=None):
        hp = self.hp
        inv_scale = 1.0 / _IM2DOUBLE_SCALE.get(np.dtype(in_dtype), 1.0)
        patch, margin = hp.im_size, hp.margin
        grid = plan.grid
        sub = grid.sub
        S = plan.S
        npc = grid.npc
        rows_tiles = S + 1
        n_tiles = rows_tiles * npc
        chunk = min(self.tile_batch, n_tiles)
        n_ch, n_cls = hp.n_channels, hp.n_classes
        mean, std = self.mean, self.std
        compute_dtype = self.compute_dtype
        precision = self.precision
        variant = self.variant
        band_grid = tiler.make_grid(rows_tiles * sub, plan.width, patch, margin)
        canvas_w = grid.padded_width
        arange_rows = np.arange(rows_tiles)

        def forward(params, t, quant=None):
            return apply(params, t, hp, variant, compute_dtype=compute_dtype,
                         precision=precision, quant=quant)

        def run(params, raw_stripe, s0, lo, hi, win, quant=None):
            # raw_stripe: (in_rows, canvas_w, n_ch) raw dtype, already
            # laid out in padded-canvas columns (margin offset, zero fill).
            # s0: first tile row of this stripe minus 1 (may be -1).
            x = raw_stripe.astype(jnp.float32)
            if rescale:
                # lo/hi arrive in raw units; the rescale formula is
                # affine-invariant so this matches the [0,1]-unit host path
                x = jnp.clip(x, lo, hi)
                x = (x - lo) / jnp.maximum(hi - lo, 1e-12) * 0.983
            else:
                x = x * inv_scale  # im2double only (the v2-solo quirk)
            norm = (x - mean) / std
            tiles = tiler.unfold(norm, band_grid)  # (S+1, npc, P, P, C)
            flat = tiles.reshape(n_tiles, patch, patch, n_ch)
            # full chunks + one static remainder: zero forward padding
            probs = chunked_forward(
                lambda t: forward(params, t, quant), flat, chunk
            )
            probs = probs.reshape(rows_tiles, npc, patch, patch, n_cls)
            row_ids = s0 + arange_rows
            mask = ((row_ids >= 0) & (row_ids < grid.npr)).astype(jnp.float32)
            w = win[None, None, :, :, None] * mask[:, None, None, None, None]
            strip = tiler.fold(probs * w, band_grid)
            wcount = tiler.fold(
                jnp.broadcast_to(
                    w[..., 0], (rows_tiles, npc, patch, patch)
                ),
                band_grid,
            )
            # finished band = strip rows [sub, sub + S*sub)
            band = strip[sub : sub + S * sub]
            cband = wcount[sub : sub + S * sub]
            pm = band / jnp.maximum(cband[..., None], 1e-12)
            if classes is not None:
                pm = pm[..., list(classes)]
            return (pm * 255.0).astype(jnp.uint8)

        return jax.jit(run)

    def _get(self, plan: _StripePlan, in_dtype, rescale: bool, classes=None):
        classes = _check_classes(classes, self.hp.n_classes)
        _check_rescale_dtype(in_dtype, rescale)
        key = (plan.height, plan.width, plan.S, np.dtype(in_dtype), rescale,
               classes)
        return self._compiled.get_or_build(
            key, lambda: self._build(plan, in_dtype, rescale, classes)
        )

    # -- host-side stripe assembly ------------------------------------------

    @staticmethod
    def _cast_raw(arr: np.ndarray) -> np.ndarray:
        """float32 slides truncate to uint16 first — the reference parity
        cast (``UnMicst1-5.py:807-808``), matching the whole-image path."""
        if arr.dtype == np.float32:
            return arr.astype(np.uint16)
        return arr

    def _read_rows(self, source, r0: int, nrows: int) -> np.ndarray:
        """Rows [r0, r0+nrows) of the raw slide, zero-padded outside."""
        from unmicst_tpu.io.tiff import TiffFile

        if hasattr(source, "read_rows"):  # virtual source (ResampledSource)
            return source.read_rows(r0, nrows)
        if isinstance(source, np.ndarray):
            source = self._cast_raw(source)
            h, w = source.shape
            out = np.zeros((nrows, w), source.dtype)
            a, b = max(r0, 0), min(r0 + nrows, h)
            if b > a:
                out[a - r0 : b - r0] = source[a:b]
            return out
        tf, page = source
        h, w = tf.pages[page].height, tf.pages[page].width
        dtype = np.uint16 if tf.pages[page].dtype == np.float32 else tf.pages[page].dtype
        out = np.zeros((nrows, w), dtype)
        a, b = max(r0, 0), min(r0 + nrows, h)
        if b > a:
            out[a - r0 : b - r0] = self._cast_raw(
                tf.read_region(page, a, 0, b - a, w)
            )
        return out

    def _stripe_canvas(
        self, source, plan: _StripePlan, s: int
    ) -> np.ndarray:
        grid = plan.grid
        m = grid.margin
        sub = grid.sub
        # stripe computes tile rows sS-1 .. (s+1)S-1; first input padded row
        # = (sS-1)*sub; raw row = padded row - margin.
        raw_r0 = (s * plan.S - 1) * sub - m
        rows = self._read_rows(source, raw_r0, plan.in_rows)
        canvas = np.zeros(
            (plan.in_rows, grid.padded_width, self.hp.n_channels), rows.dtype
        )
        canvas[:, m : m + plan.width, :] = rows[:, :, None]
        return canvas

    # -- int8 PTQ calibration --------------------------------------------------

    def _quant_for_stream(self, sources, lo, hi, rescale: bool, in_dtype):
        """QuantState for the streaming paths (first call only — one
        calibration serves the engine's lifetime, like InferenceEngine).

        Calibration tiles are drawn through :meth:`_read_rows`, so TIFF
        windows / virtual resampled sources never fully materialize, and
        preprocessed with the engine's OWN global stats — the exact
        per-stripe device formula (zero-fill first, then rescale /
        im2double, then standardize), not the whole-image path's
        decimated re-estimate.

        ``sources``: one per net channel (callers replicate a single
        source, matching the stripe-canvas broadcast); ``lo``/``hi``:
        scalar or per-channel raw-unit ranges.
        """
        if not self.quantized:
            return None
        if self._quant is not None:
            return self._quant
        from unmicst_tpu.core import quant as _q

        hp = self.hp
        height, width = _source_dims(sources[0])
        s = hp.im_size
        n_ch = hp.n_channels
        inv_scale = 1.0 / _IM2DOUBLE_SCALE.get(np.dtype(in_dtype), 1.0)
        lo = np.broadcast_to(np.asarray(lo, np.float32), (n_ch,))
        hi = np.broadcast_to(np.asarray(hi, np.float32), (n_ch,))
        # 64 tiles spread over the slide on a jittered grid (seeded:
        # same slide -> same scales, cache-friendly), one row-band read
        # per grid row per channel
        grid_n = 8
        rng = np.random.RandomState(0)
        tiles = np.zeros((grid_n * grid_n, s, s, n_ch), np.float32)
        k = 0
        for gi in range(grid_n):
            r0 = 0 if height <= s else int(
                np.clip(gi * (height - s) / (grid_n - 1)
                        + rng.randint(-s // 4, s // 4 + 1), 0, height - s)
            )
            rows = [
                self._read_rows(src, r0, s).astype(np.float32)
                for src in sources
            ]
            for gj in range(grid_n):
                c0 = 0 if width <= s else int(
                    np.clip(gj * (width - s) / (grid_n - 1)
                            + rng.randint(-s // 4, s // 4 + 1), 0, width - s)
                )
                for ci, r in enumerate(rows):
                    blk = r[:, c0 : c0 + s]
                    tiles[k, :, : blk.shape[1], ci] = blk
                k += 1
        if rescale:
            x = np.clip(tiles, lo, hi)
            x = (x - lo) / np.maximum(hi - lo, 1e-12) * 0.983
        else:
            x = tiles * inv_scale
        self._quant = _q.calibrate(
            self._params_host, (x - self.mean) / self.std, hp, self.variant,
            percentile=self.calibration_percentile,
            bias_correct=self.quant_bias_correct,
        )
        return self._quant

    # -- public API ----------------------------------------------------------

    def global_stats(
        self, source, outlier: float = -1
    ) -> Tuple[float, float]:
        """Host pass for the rescale range (min, max|percentile).

        Streams TIFF sources in row chunks (a histogram gives the exact
        ``np.percentile`` linear-interpolated value for integer pixels), so
        the slide never fully materializes in host RAM.
        """
        if hasattr(source, "stats"):  # virtual source computes its own
            return source.stats(outlier)
        if isinstance(source, np.ndarray):
            arr = self._cast_raw(source)
            lo = float(arr.min())
            hi = (
                float(np.percentile(arr, outlier))
                if outlier != -1
                else float(arr.max())
            )
            return lo, hi  # raw units (the device rescale is affine-invariant)

        # TIFF (file, page) tuple: delegate to the shared windowed
        # histogram implementation (io/slides.py), with the float32
        # parity cast applied per chunk
        from unmicst_tpu.io.slides import _streamed_int_stats

        tf, page = source
        h, w = tf.pages[page].height, tf.pages[page].width
        page_dtype = np.dtype(tf.pages[page].dtype)
        dtype = np.uint16 if page_dtype == np.float32 else page_dtype

        def read_rows(r0, n):
            return self._cast_raw(tf.read_region(page, r0, 0, n, w))

        return _streamed_int_stats(read_rows, h, w, dtype, outlier)

    def infer(
        self,
        source: Union[np.ndarray, Tuple],
        outlier: float = -1,
        rescale: bool = True,
        out: Optional[np.ndarray] = None,
        classes=None,
        stats: Optional[Tuple[float, float]] = None,
    ) -> np.ndarray:
        """Stream the slide; returns uint8 [K, H, W] (or fills ``out``).

        ``classes``: optional tuple of class indexes to emit (that order).
        ``stats``: precomputed (lo, hi) in raw units — skips the
        global-stats pass (callers sharing one histogram pass with the
        preview, see ``io/slides.py::_streamed_int_stats``).
        """
        if isinstance(source, np.ndarray):
            source = self._cast_raw(source)  # once, not per stripe
        height, width = _source_dims(source)
        in_dtype = _source_dtype(source)
        plan = self._plan(height, width)
        jitted = self._get(plan, in_dtype, rescale, classes)
        if rescale:
            lo, hi = (
                stats if stats is not None
                else self.global_stats(source, outlier)
            )
        else:
            lo, hi = 0.0, 1.0
        qs = self._quant_for_stream(
            [source] * self.hp.n_channels, lo, hi, rescale, in_dtype
        )
        win = jnp.asarray(tiler.ramp_window(self.hp.im_size, self.hp.margin))
        grid = plan.grid
        m = grid.margin
        n_out = len(classes) if classes is not None else self.hp.n_classes
        if out is None:
            out = np.empty((n_out, height, width), np.uint8)

        # async pipeline: keep `in_flight` stripes dispatched ahead
        pending = []
        for s in range(plan.n_stripes):
            canvas = self._stripe_canvas(source, plan, s)
            dev = jitted(
                self.params, jnp.asarray(canvas), jnp.int32(s * plan.S - 1),
                jnp.float32(lo), jnp.float32(hi), win, quant=qs,
            )
            pending.append((s, dev))
            if len(pending) >= self.in_flight:
                self._drain(pending.pop(0), out, plan, m)
        while pending:
            self._drain(pending.pop(0), out, plan, m)
        return out

    def infer_stack(
        self,
        sources,
        outlier: float = -1,
        rescale: bool = True,
        out: Optional[np.ndarray] = None,
        classes=None,
        stats=None,
    ) -> np.ndarray:
        """Multi-channel (duo) streaming: one source per net channel.

        Each channel is intensity-rescaled with its own global range, the
        duo contract (``UnMicst2.py:784-788``).  ``sources``: list of numpy
        arrays or ``(TiffFile, page)`` pairs, length ``hp.n_channels``.
        """
        if len(sources) != self.hp.n_channels:
            raise ValueError(
                f"model expects {self.hp.n_channels} channels, got "
                f"{len(sources)}"
            )

        sources = [
            self._cast_raw(s) if isinstance(s, np.ndarray) else s
            for s in sources
        ]
        height, width = _source_dims(sources[0])
        for s in sources[1:]:
            if _source_dims(s) != (height, width):
                raise ValueError("channel sources must share dimensions")
        plan = self._plan(height, width)
        dtypes = {_source_dtype(s) for s in sources}
        if len(dtypes) != 1:
            raise ValueError(f"channel sources disagree on dtype: {dtypes}")
        canvas_dtype = dtypes.pop()
        # validate BEFORE compiling (a rejected request must not build and
        # pin a program in the bounded cache); _get re-checks for the
        # other entry points
        _check_rescale_dtype(canvas_dtype, rescale)
        jitted = self._get(plan, canvas_dtype, rescale, classes)
        if rescale:
            # stats: optional precomputed per-channel (lo, hi) list
            ranges = (
                stats if stats is not None
                else [self.global_stats(s, outlier) for s in sources]
            )
            if len(ranges) != len(sources):
                raise ValueError(
                    f"stats has {len(ranges)} ranges for {len(sources)} "
                    "channels (a short list would numpy-broadcast channel "
                    "0's range onto every channel)"
                )
            lo = np.asarray([a for a, _ in ranges], np.float32)
            hi = np.asarray([b for _, b in ranges], np.float32)
        else:
            lo = np.zeros(len(sources), np.float32)
            hi = np.ones(len(sources), np.float32)
        qs = self._quant_for_stream(sources, lo, hi, rescale, canvas_dtype)
        win = jnp.asarray(tiler.ramp_window(self.hp.im_size, self.hp.margin))
        grid = plan.grid
        m = grid.margin
        n_out = len(classes) if classes is not None else self.hp.n_classes
        if out is None:
            out = np.empty((n_out, height, width), np.uint8)
        pending = []
        for s in range(plan.n_stripes):
            canvas = np.zeros(
                (plan.in_rows, grid.padded_width, self.hp.n_channels),
                canvas_dtype,
            )
            raw_r0 = (s * plan.S - 1) * grid.sub - m
            for c, src in enumerate(sources):
                canvas[:, m : m + width, c] = self._read_rows(
                    src, raw_r0, plan.in_rows
                )
            dev = jitted(
                self.params, jnp.asarray(canvas), jnp.int32(s * plan.S - 1),
                jnp.asarray(lo), jnp.asarray(hi), win, quant=qs,
            )
            pending.append((s, dev))
            if len(pending) >= self.in_flight:
                self._drain(pending.pop(0), out, plan, m)
        while pending:
            self._drain(pending.pop(0), out, plan, m)
        return out

    # -- column-sharded streaming (pod-scale mega-slides) ---------------------

    def _build_sharded(self, plan: _StripePlan, mesh, axis: str,
                       in_dtype, rescale: bool, classes=None):
        """Per-stripe jit with the tile grid COLUMN-sharded over
        ``mesh[axis]`` — rows stream stripe-by-stripe (bounded memory),
        columns scale over devices with 2*margin halo seams exchanged via
        ``ppermute`` (the width-direction transpose of
        :func:`unmicst_tpu.runtime.halo.spatial_infer`).  All devices
        cooperate on ONE slide: the production layout for 100k-class
        slides on a pod slice.
        """
        try:  # public API since jax 0.8 (halo.py keeps the same fallback)
            from jax import shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        hp = self.hp
        inv_scale = 1.0 / _IM2DOUBLE_SCALE.get(np.dtype(in_dtype), 1.0)
        patch, margin = hp.im_size, hp.margin
        grid = plan.grid
        sub = grid.sub
        S = plan.S
        npc = grid.npc
        n_dev = mesh.shape[axis]
        npc_pad = -(-npc // n_dev) * n_dev
        c_dev = npc_pad // n_dev  # tile columns per device
        rows_tiles = S + 1
        tiles_dev = rows_tiles * c_dev
        chunk = min(self.tile_batch, tiles_dev)
        n_ch, n_cls = hp.n_channels, hp.n_classes
        mean, std = self.mean, self.std
        compute_dtype = self.compute_dtype
        precision = self.precision
        variant = self.variant
        two_m = 2 * margin
        body_w = npc_pad * sub
        dev_grid = tiler.make_grid(rows_tiles * sub, c_dev * sub, patch, margin)
        arange_rows = np.arange(rows_tiles)
        arange_cols = np.arange(c_dev)
        band_h = S * sub

        def forward(params, t, quant=None):
            return apply(params, t, hp, variant, compute_dtype=compute_dtype,
                         precision=precision, quant=quant)

        def band_fn(params, block, tail, s0, lo, hi, win, quant=None):
            # block: (in_rows, body_w / n_dev, C) raw; tail: (in_rows, 2m, C)
            d = jax.lax.axis_index(axis)
            # input halo FIRST, in the raw dtype (2 B/px over ICI for
            # uint16): first 2m columns of the RIGHT neighbor's block;
            # the last device takes the replicated global tail
            halo_in = jax.lax.ppermute(
                block[:, :two_m], axis,
                [(j, (j - 1) % n_dev) for j in range(n_dev)],
            )
            halo_in = jnp.where(d == n_dev - 1, tail, halo_in)
            x = jnp.concatenate([block, halo_in], axis=1).astype(jnp.float32)
            if rescale:
                x = jnp.clip(x, lo, hi)
                x = (x - lo) / jnp.maximum(hi - lo, 1e-12) * 0.983
            else:
                x = x * inv_scale
            norm = (x - mean) / std

            tiles = tiler.unfold(norm, dev_grid)  # (S+1, c_dev, P, P, C)
            flat = tiles.reshape(tiles_dev, patch, patch, n_ch)
            probs = chunked_forward(
                lambda t: forward(params, t, quant), flat, chunk
            )
            probs = probs.reshape(rows_tiles, c_dev, patch, patch, n_cls)
            row_ids = s0 + arange_rows
            col_ids = d * c_dev + arange_cols
            rmask = ((row_ids >= 0) & (row_ids < grid.npr)).astype(jnp.float32)
            cmask = (col_ids < npc).astype(jnp.float32)
            w = (
                win[None, None, :, :, None]
                * rmask[:, None, None, None, None]
                * cmask[None, :, None, None, None]
            )
            strip = tiler.fold(probs * w, dev_grid)
            wcount = tiler.fold(
                jnp.broadcast_to(
                    w[..., 0], (rows_tiles, c_dev, patch, patch)
                ),
                dev_grid,
            )
            acc = jnp.concatenate([strip, wcount[..., None]], axis=-1)
            # output halo: this device's fold tail (last 2m columns) lands
            # on the RIGHT neighbor's head
            tail_out = acc[:, c_dev * sub :]
            recv = jax.lax.ppermute(
                tail_out, axis, [(j, (j + 1) % n_dev) for j in range(n_dev)]
            )
            recv = jnp.where(d == 0, jnp.zeros_like(recv), recv)
            acc = acc.at[:, :two_m].add(recv)

            def quantize(a):
                pm = a[..., :n_cls] / jnp.maximum(a[..., n_cls:], 1e-12)
                if classes is not None:
                    pm = pm[..., list(classes)]
                return (pm * 255.0).astype(jnp.uint8)

            # finished band rows [sub, sub + S*sub); the last device's
            # tail columns are real output (canvas cols [body_w, +2m))
            band = acc[sub : sub + band_h]
            return quantize(band[:, : c_dev * sub]), quantize(
                band[:, c_dev * sub :]
            )

        # the QuantState (when the engine is quantized) rides as one more
        # replicated arg — a closure constant would pay a device fetch per
        # leaf at lowering time on tunneled links
        in_specs = (P(), P(None, axis, None), P(), P(), P(), P(), P())
        if self.quantized:
            in_specs = in_specs + (P(),)
        fn = shard_map(
            band_fn,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(None, axis, None), P(None, axis, None)),
        )
        jitted = jax.jit(fn)
        return jitted, body_w, c_dev, n_dev

    def infer_sharded(
        self,
        source,
        mesh,
        axis: str = "data",
        outlier: float = -1,
        rescale: bool = True,
        out: Optional[np.ndarray] = None,
        classes=None,
        stats: Optional[Tuple[float, float]] = None,
    ) -> np.ndarray:
        """Stream the slide with each stripe column-sharded over
        ``mesh[axis]``; returns uint8 [K, H, W] like :meth:`infer`.
        ``stats``: precomputed (lo, hi) in SOURCE units, like
        :meth:`infer` (pinned-range callers)."""
        if rescale:
            lo, hi = (
                stats if stats is not None
                else self.global_stats(source, outlier)
            )
        else:
            lo, hi = 0.0, 1.0
        return self._run_sharded(
            [source] * self.hp.n_channels, mesh, axis, rescale,
            np.float32(lo), np.float32(hi), out, classes,
            broadcast=True,
        )

    def infer_sharded_stack(
        self,
        sources,
        mesh,
        axis: str = "data",
        outlier: float = -1,
        rescale: bool = True,
        out: Optional[np.ndarray] = None,
        classes=None,
        stats=None,
    ) -> np.ndarray:
        """Multi-channel (duo) column-sharded streaming — per-channel
        global ranges (``UnMicst2.py:784-788``), otherwise
        :meth:`infer_sharded` semantics.  ``stats``: per-channel
        (lo, hi) pairs in source units, like :meth:`infer_stack`."""
        if len(sources) != self.hp.n_channels:
            raise ValueError(
                f"model expects {self.hp.n_channels} channels, got "
                f"{len(sources)}"
            )
        if rescale:
            if stats is None:
                stats = [self.global_stats(s, outlier) for s in sources]
            lo = np.asarray([a for a, _ in stats], np.float32)
            hi = np.asarray([b for _, b in stats], np.float32)
        else:
            lo = np.zeros(len(sources), np.float32)
            hi = np.ones(len(sources), np.float32)
        return self._run_sharded(
            list(sources), mesh, axis, rescale, lo, hi, out, classes,
            broadcast=False,
        )

    def _run_sharded(self, sources, mesh, axis, rescale, lo, hi, out,
                     classes, *, broadcast: bool) -> np.ndarray:
        sources = [
            self._cast_raw(s) if isinstance(s, np.ndarray) else s
            for s in sources
        ]
        height, width = _source_dims(sources[0])
        for s in sources[1:]:
            if _source_dims(s) != (height, width):
                raise ValueError("channel sources must share dimensions")
        dtypes = {_source_dtype(s) for s in sources}
        if len(dtypes) != 1:
            raise ValueError(f"channel sources disagree on dtype: {dtypes}")
        in_dtype = dtypes.pop()
        classes = _check_classes(classes, self.hp.n_classes)
        _check_rescale_dtype(in_dtype, rescale)
        plan = self._plan(height, width)
        # cache per (geometry, mesh, dtype, ...): serving calls this
        # repeatedly and a re-trace+compile per request is minutes on
        # tunneled links.  Device ids pin the key to the actual mesh.
        cache_key = (
            "sharded", plan.height, plan.width, plan.S, axis,
            tuple(int(d.id) for d in mesh.devices.flat),
            np.dtype(in_dtype), rescale, classes,
        )
        jitted, body_w, c_dev, n_dev = self._compiled.get_or_build(
            cache_key,
            lambda: self._build_sharded(
                plan, mesh, axis, in_dtype, rescale, classes
            ),
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        # Multi-process meshes (jax.distributed): every argument must be a
        # GLOBAL array.  Each process holds the full host-side data (the
        # stripe loop is SPMD across hosts), so any process can serve any
        # shard; results come back via process_allgather.
        mp_mode = any(
            d.process_index != jax.process_index()
            for d in mesh.devices.flat
        )
        if mp_mode:
            from jax.experimental import multihost_utils

            def _put(x, spec):
                x = np.asarray(x)
                return jax.make_array_from_callback(
                    x.shape, NamedSharding(mesh, spec),
                    lambda idx: x[idx],
                )

            def _fetch(arr):
                return np.asarray(
                    multihost_utils.process_allgather(arr, tiled=True)
                )

            params_g = jax.tree_util.tree_map(
                lambda p: _put(p, P()), self.params
            )
        else:
            def _put(x, spec):
                del spec
                return jnp.asarray(x)

            _fetch = np.asarray
            params_g = self.params
        body_spec = P(None, axis, None)
        win = _put(
            tiler.ramp_window(self.hp.im_size, self.hp.margin), P()
        )
        grid = plan.grid
        m = grid.margin
        n_out = len(classes) if classes is not None else self.hp.n_classes
        if out is None:
            out = np.empty((n_out, height, width), np.uint8)
        two_m = 2 * m

        def assemble(s):
            raw_r0 = (s * plan.S - 1) * grid.sub - m
            canvas = np.zeros(
                (plan.in_rows, body_w + two_m, self.hp.n_channels),
                in_dtype,
            )
            if broadcast:
                rows = self._read_rows(sources[0], raw_r0, plan.in_rows)
                canvas[:, m : m + width, :] = rows[:, :, None]
            else:
                for c, src in enumerate(sources):
                    canvas[:, m : m + width, c] = self._read_rows(
                        src, raw_r0, plan.in_rows
                    )
            return canvas

        def finish(item):
            s, band_dev, tails_dev = item
            band = np.concatenate(
                [_fetch(band_dev), _fetch(tails_dev)[:, -two_m:]], axis=1
            )
            self._drain((s, band), out, plan, m)

        qs = self._quant_for_stream(sources, lo, hi, rescale, in_dtype)
        extra = ()
        if qs is not None:
            extra = (jax.tree_util.tree_map(lambda a: _put(a, P()), qs),)

        # async pipeline (single-process; process_allgather is a collective
        # barrier, so mp keeps the serial order all hosts agree on)
        window_depth = 1 if mp_mode else self.in_flight
        pending = []
        for s in range(plan.n_stripes):
            canvas = assemble(s)
            band, tails = jitted(
                params_g, _put(canvas[:, :body_w], body_spec),
                _put(canvas[:, body_w:], P()),
                _put(np.int32(s * plan.S - 1), P()),
                _put(lo, P()), _put(hi, P()), win, *extra,
            )
            pending.append((s, band, tails))
            if len(pending) >= window_depth:
                finish(pending.pop(0))
        while pending:
            finish(pending.pop(0))
        return out

    def _drain(self, item, out, plan: _StripePlan, m: int) -> None:
        s, dev = item
        band = np.asarray(dev)  # (S*sub, W', K)
        # padded band rows [s*S*sub, ...); valid output rows are
        # padded rows [m, m+height)
        p0 = s * plan.band_rows
        a = max(p0, m)
        b = min(p0 + plan.band_rows, m + plan.height)
        if b <= a:
            return
        sl = band[a - p0 : b - p0, m : m + plan.width]
        out[:, a - m : b - m, :] = np.moveaxis(sl, -1, 0)
