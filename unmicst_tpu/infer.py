"""Whole-slide tiled inference — the ``singleImageInference`` successor.

Reference behavior (``UnMicst.py:520-541``, ``UnMicst1-5.py:687-710``):
tile the image (patch ``imSize``, margin ``imSize//8``), normalize each patch
by dataset mean/std, run ``batchSize`` patches per ``Session.run``, blend one
softmax plane with the ramp window, and re-run the whole network once per
requested class (2-3 full passes per slide, ``UnMicst.py:651-677``).

TPU-first redesign, one jitted call per slide:

* the padded canvas lives in HBM; normalization is fused on device;
* a ``lax.scan`` walks row-stripes of tiles; each stripe is gathered
  (unfold), batch-forwarded through the UNet (inner ``lax.map`` chunks keep
  activation memory bounded), window-weighted and overlap-added (fold) into
  the output canvas — **all classes in one pass** (the 2-3x per-class
  redundancy of the reference is eliminated);
* phantom tiles introduced by stripe padding are masked to zero weight, so
  results are identical to the exact grid;
* division by the blend-count and cropping happen on device; a single D2H
  transfer returns the finished probability maps.

Parity note: the reference accumulates in float16 (``PartitionOfImage.py:
86-90``); we accumulate in float32, which only reduces blend error.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unmicst_tpu.core import tiler
from unmicst_tpu.core.hp import HParams, ModelBundle
from unmicst_tpu.core.unet import Params, apply
from unmicst_tpu.utils.batching import chunked_forward
from unmicst_tpu.utils.batching import round_up as _round_up
from unmicst_tpu.utils.progcache import ProgramCache


def default_tile_batch(im_size: int, compute_dtype=None) -> int:
    """Measured MXU-optimal forward batch (BASELINE.md sweeps on v5e).

    256 everywhere except 64^2-tile models in bf16, where 128 wins
    (118.8 vs 108.1 TFLOP/s at 8192^2); in the HIGH parity mode the same
    model prefers 256 again (47.6 vs 45.7 TFLOP/s) — the optimum depends
    on both tile size and MXU pass count.  Callers pass tile_batch=None
    to get this."""
    if im_size <= 64 and compute_dtype == jnp.bfloat16:
        return 128
    return 256


def _normalize_in_range(in_range, n: int) -> np.ndarray:
    """Validate a pinned rescale range -> float64 [n, 2] raw-unit array.

    Accepts one ``(lo, hi)`` pair (broadcast over ``n`` channels) or a
    per-channel sequence of pairs; every pair must be finite with
    ``lo < hi`` (a degenerate range would divide by ~0 on device and
    emit garbage maps instead of an error).
    """
    arr = np.asarray(in_range, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[None]
    if arr.shape == (1, 2) and n > 1:
        arr = np.repeat(arr, n, axis=0)
    if arr.shape != (n, 2):
        raise ValueError(
            f"in_range must be one (lo, hi) pair or {n} pairs, got "
            f"shape {arr.shape}"
        )
    if not np.all(np.isfinite(arr)) or not np.all(arr[:, 0] < arr[:, 1]):
        raise ValueError(
            f"in_range pairs must be finite with lo < hi, got "
            f"{arr.tolist()}"
        )
    return arr


def _range_args(ir: np.ndarray, in_dtype) -> list:
    """Pinned [C, 2] raw-unit range -> the two traced [C, 1, 1] device
    arguments of a ``fixed_range`` slide program (im2double units — the
    program divides integer pixels by the dtype scale before rescale)."""
    dscale = {
        np.dtype(np.uint8): 255.0, np.dtype(np.uint16): 65535.0
    }.get(np.dtype(in_dtype))
    if dscale is not None:
        ir = ir / dscale
    c = ir.shape[0]
    return [
        jnp.asarray(ir[:, 0].reshape(c, 1, 1), jnp.float32),
        jnp.asarray(ir[:, 1].reshape(c, 1, 1), jnp.float32),
    ]


def plan_stripes(npr: int, npc: int, tile_batch: int) -> tuple:
    """Choose the stripe geometry: (R tile-rows per stripe, forward chunk).

    The r1 policy (R = tile_batch // npc, forward chunks padded up to
    tile_batch) left 10-40% of the device-resident wall on the table
    (BASELINE.md stripe-autotune table): chunk padding (16k legacy: 171
    tiles/stripe in chunks of 128 pads to 256, +33% forward FLOPs),
    phantom stripe rows (npr % R), and sub-full chunks (the measured
    per-tile rate at chunk 256 is ~25% better than at 171).

    The engine runs each stripe as full tile_batch-sized ``lax.map``
    chunks plus ONE static remainder batch (`utils/batching.py`), so
    chunk padding is zero by construction.  The R policy is fit to the
    v5e A/B table in BASELINE.md rather than a cost model — the measured
    landscape is: one whole-image "stripe" wins while total tiles fit a
    small multiple of tile_batch (no scan, no carried-canvas RMW); beyond
    that, the SMALLEST R whose remainder batch is at most ~20% of stripe
    tiles wins, and growing stripes further always lost (presumably
    unfold/probs buffers start evicting the canvas from HBM locality).
    Verified picks: 4k->whole, 8k->R3, 12k->R2, 16k->R3, 20k->R3 on the
    legacy net at tile_batch 256 (in BOTH precision modes for the
    threshold-deciding 20k case).
    """
    if npr * npc <= 8 * tile_batch:
        return npr, min(tile_batch, npr * npc)
    r0 = max(1, -(-tile_batch // npc))  # smallest R reaching a full chunk
    best = None
    for r in range(r0, min(r0 + 3, npr) + 1):
        tiles = r * npc
        rem_frac = (tiles % tile_batch) / tiles
        # 0.20: at 20k legacy, R3 (18% remainder) measured 6% faster than
        # R4 (8%) in BOTH precision modes — small stripes beat remainder
        # waste up to about a fifth of the stripe
        if rem_frac <= 0.20:
            return r, tile_batch
        if best is None or rem_frac < best[0]:
            best = (rem_frac, r)
    return best[1], tile_batch


class InferenceEngine:
    """Compiled whole-image inference for one loaded model.

    ``channel_mode``:
      * ``'broadcast'`` — one 2D image copied into every net channel
        (solo/legacy/cyto plumbing, ``UnMicst1-5.py:700-702``)
      * ``'stack'`` — a [C, H, W] stack feeds the channels directly
        (duo plumbing, ``UnMicst2.py:679-681``)
    """

    def __init__(
        self,
        hp: HParams,
        params: Params,
        variant: str,
        mean: float,
        std: float,
        *,
        compute_dtype=None,
        precision=None,
        tile_batch: Optional[int] = None,
        accum_dtype=jnp.float32,
        stack_fold_max_bytes: int = 1 << 30,
        quantized: bool = False,
        calibration_percentile: float = 99.99,
        quant_bias_correct: bool = True,
        s2d: bool = False,
    ):
        self.hp = hp
        # space-to-depth level-0 refold (core/s2d.py): exact weight
        # transformation that runs the narrow full-res level packed at
        # half resolution with 4x channels — an MXU occupancy lever for
        # the legacy nets (measured verdict: BASELINE.md).  The packed
        # kernels ride INSIDE the params pytree so every jitted program
        # receives them as traced arguments (closure-captured device
        # constants cost ~35 s each at lowering through the tunnel).
        self.s2d = bool(s2d)
        if self.s2d and quantized:
            raise ValueError(
                "s2d and int8 quantization cannot combine (the int8 site "
                "calibration is keyed to the standard layout)"
            )
        if self.s2d:
            from unmicst_tpu.core import s2d as _s2d

            params = {
                "base": params,
                "s2d": _s2d.refold_params(params, hp, variant),
            }
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
        self.tile_batch = int(
            tile_batch or default_tile_batch(hp.im_size, compute_dtype)
        )
        self.accum_dtype = accum_dtype
        self.stack_fold_max_bytes = int(stack_fold_max_bytes)
        # int8 PTQ fast mode (core/quant.py): calibrated lazily on the
        # first input (activation scales are standardized-input-stable, so
        # one calibration serves the engine's lifetime); host params kept
        # for host-side weight quantization
        self.quantized = bool(quantized)
        self.calibration_percentile = float(calibration_percentile)
        self.quant_bias_correct = bool(quant_bias_correct)
        self._params_host = params if quantized else None
        self._quant = None
        # bounded, thread-safe program cache: long-running services see
        # many slide geometries; each compiled program holds host+HBM
        # memory, so evict FIFO beyond the cache bound
        self._compiled = ProgramCache(max_entries=16)

    @classmethod
    def from_bundle(cls, bundle: ModelBundle, params: Params, **kw):
        return cls(
            bundle.hp, params, bundle.variant, bundle.mean, bundle.std, **kw
        )

    # -- jitted core ---------------------------------------------------------

    def _build(self, height: int, width: int):
        hp = self.hp
        patch, margin = hp.im_size, hp.margin
        grid = tiler.make_grid(height, width, patch, margin)
        sub = grid.sub
        npc = grid.npc
        R, chunk = plan_stripes(grid.npr, npc, self.tile_batch)
        npr_pad = _round_up(grid.npr, R)
        n_stripes = npr_pad // R
        stripe_grid = tiler.make_grid(R * sub, width, patch, margin)
        tiles_per_stripe = R * npc
        canvas_h = npr_pad * sub + 2 * margin  # >= grid.padded_height
        canvas_w = grid.padded_width
        n_ch, n_cls = hp.n_channels, hp.n_classes
        mean, std = self.mean, self.std
        compute_dtype = self.compute_dtype
        precision = self.precision
        variant = self.variant
        accum_dtype = self.accum_dtype

        if self.s2d:
            from unmicst_tpu.core import s2d as _s2d

            def forward(params, t, quant=None):
                return _s2d.apply(
                    params["base"], params["s2d"], t, hp, variant,
                    compute_dtype=compute_dtype, precision=precision,
                )
        else:

            def forward(params, t, quant=None):
                return apply(
                    params, t, hp, variant, compute_dtype=compute_dtype,
                    precision=precision, quant=quant,
                )

        stripe_rows = R * sub + 2 * margin
        arange_r = np.arange(R)  # numpy: embeds as a literal, never D2H
        # Fold strategy: stacking all per-stripe strips and overlap-adding
        # after the scan is ~10% faster at small canvases (no carried
        # read-modify-write), but materializes extra canvas-sized buffers
        # that blew HBM at 16k/20k.  Accumulating into a carried canvas is
        # bounded-memory; pick by canvas footprint (~1 GB of stacked f32).
        elem = np.dtype(accum_dtype).itemsize
        stack_bytes = n_stripes * stripe_rows * canvas_w * (n_cls + 1) * elem
        use_stack = stack_bytes <= self.stack_fold_max_bytes

        # NOTE: no device-array constants may be captured below — on
        # tunneled TPU runtimes every captured device array costs a
        # device->host fetch at lowering time (observed 35s per constant).
        # The blend window therefore enters as a traced argument and the
        # count map is computed on-device from it.
        def run(params, canvas, win, quant=None):
            # canvas: (canvas_h, canvas_w, C) raw float32 (zero padded).
            # In bf16 mode, normalize once and store the canvas bf16: the
            # first conv rounds its input to bf16 anyway, so this halves
            # the unfold's HBM traffic with bit-identical results.
            if compute_dtype is not None:
                canvas = ((canvas - mean) / std).astype(compute_dtype)
            # Pre-split into overlapping stripes with pure reshapes; the
            # scan consumes them as xs.
            stripes = tiler._unfold_axis(canvas, n_stripes, R * sub, stripe_rows)
            win_a = win.astype(accum_dtype)

            def stripe_fold(s, stripe):
                """One stripe's weighted fold; blend count fused as the
                last channel -> (stripe_rows, canvas_w, n_cls + 1)."""
                norm = (
                    stripe if compute_dtype is not None
                    else (stripe - mean) / std
                )
                tiles = tiler.unfold(norm, stripe_grid)  # (R,npc,P,P,C)
                flat = tiles.reshape(tiles_per_stripe, patch, patch, n_ch)
                probs = chunked_forward(
                    lambda t: forward(params, t, quant), flat, chunk
                )
                probs = probs.reshape(R, npc, patch, patch, n_cls)
                row_ids = s * R + arange_r
                mask = (row_ids < grid.npr).astype(accum_dtype)
                w = win_a[None, None, :, :, None] * mask[:, None, None, None, None]
                strip = tiler.fold(probs.astype(accum_dtype) * w, stripe_grid)
                cstrip = tiler.fold(
                    jnp.broadcast_to(w[..., 0], (R, npc, patch, patch)),
                    stripe_grid,
                )
                return jnp.concatenate([strip, cstrip[..., None]], axis=-1)

            if use_stack:
                def stripe_step(s, stripe):
                    return s + 1, stripe_fold(s, stripe)

                _, strips = jax.lax.scan(
                    stripe_step, jnp.int32(0), stripes
                )
                acc = tiler._fold_axis(strips, R * sub)
            else:
                acc0 = jnp.zeros(
                    (canvas_h, canvas_w, n_cls + 1), accum_dtype
                )

                def stripe_step(carry, stripe):
                    s, acc = carry
                    both = stripe_fold(s, stripe)
                    idx = s * (R * sub)
                    cur = jax.lax.dynamic_slice(
                        acc, (idx, 0, 0),
                        (stripe_rows, canvas_w, n_cls + 1),
                    )
                    acc = jax.lax.dynamic_update_slice(
                        acc, cur + both, (idx, 0, 0)
                    )
                    return (s + 1, acc), None

                (_, acc), _ = jax.lax.scan(
                    stripe_step, (jnp.int32(0), acc0), stripes
                )
            out = acc[: grid.padded_height, :, :n_cls]
            count = acc[: grid.padded_height, :, n_cls]
            valid = out / count[..., None]
            m = margin
            return valid[m : m + height, m : m + width].astype(jnp.float32)

        jitted = jax.jit(run)
        return jitted, grid, canvas_h, canvas_w

    def _check_classes(self, classes):
        if classes is None:
            return None
        classes = tuple(int(c) for c in classes)
        bad = [c for c in classes if not 0 <= c < self.hp.n_classes]
        if bad:
            # jit gathers CLAMP out-of-range static indices (and Python
            # wraps negatives), silently returning the wrong class map —
            # validate here instead
            raise ValueError(
                f"class index(es) {bad} out of range for a "
                f"{self.hp.n_classes}-class model"
            )
        return classes

    def _get(self, height: int, width: int):
        if height <= 0 or width <= 0:
            raise ValueError(f"empty image: {height}x{width}")
        return self._compiled.get_or_build(
            (height, width), lambda: self._build(height, width)
        )

    # -- int8 PTQ calibration ------------------------------------------------

    def _calibrate(self, tiles: np.ndarray):
        """Build the engine's QuantState from sample tiles (first call
        only — one calibration serves the engine's lifetime, see
        ``core/quant.py`` for the scheme)."""
        if self._quant is None:
            from unmicst_tpu.core import quant as _q

            self._quant = _q.calibrate(
                self._params_host, tiles, self.hp, self.variant,
                percentile=self.calibration_percentile,
                bias_correct=self.quant_bias_correct,
            )
        return self._quant

    def _quant_for_normalized(self, image: np.ndarray):
        """QuantState for the pre-normalized paths (infer/make_canvas),
        calibrating from the image itself on first use."""
        if not self.quantized:
            return None
        if self._quant is None:
            from unmicst_tpu.core import quant as _q

            self._calibrate(_q.sample_tiles(
                np.asarray(image), self.hp, self.mean, self.std
            ))
        return self._quant

    def _quant_for_raw(self, raw: np.ndarray, outlier, rescale: bool,
                       scaling_factor: float = 1.0, in_range=None):
        """QuantState for the raw-slide paths, mirroring the device-side
        preprocessing (im2double/rescale) when drawing calibration tiles.
        At ``scaling_factor != 1`` the calibration tiles sample a host-
        resized plane (one-time cost), so they see the SCALED net-input
        distribution the device program feeds the int8 kernels.
        ``in_range``: pinned raw-unit rescale range (see infer_slide) —
        calibration normalizes with it instead of decimated-pass stats."""
        if not self.quantized:
            return None
        if self._quant is None:
            from unmicst_tpu.core import quant as _q

            if scaling_factor != 1.0:
                from unmicst_tpu.io import preprocess as _pp

                planes = raw if raw.ndim == 3 else raw[None]
                H, W = planes.shape[-2], planes.shape[-1]
                sh = int(float(H) * float(scaling_factor))
                sw = int(float(W) * float(scaling_factor))
                # calibration needs ~1% representative statistics, not
                # the whole resized slide: resize only ~8 tile-height
                # row BANDS spread over the scaled image (block-exact
                # resize_rows reads just the raw rows under each band)
                # and let the sampler draw its windows from that mosaic.
                # resize_rows includes img_as_float, so values are
                # already im2double'd unit-scale (scale=None below).
                s_tile, grid = self.hp.im_size, 8
                starts = sorted({
                    0 if sh <= s_tile else min(
                        gi * (sh - s_tile) // max(grid - 1, 1),
                        sh - s_tile,
                    )
                    for gi in range(grid)
                })  # deduped: a short slide collapses to ONE band
                bands = []
                for ci in range(planes.shape[0]):
                    rows = [
                        _pp.resize_rows(
                            lambda a, b, _p=planes[ci]: _p[a:b],
                            (H, W), (sh, sw), r0, min(s_tile, sh),
                        )
                        for r0 in starts
                    ]
                    bands.append(
                        np.concatenate(rows, axis=0).astype(np.float32)
                    )
                ir = None
                if in_range is not None:
                    # the resize_rows bands are img_as_float unit-scale:
                    # convert the raw-unit pinned range to match
                    dscale = {
                        np.dtype(np.uint8): 255.0,
                        np.dtype(np.uint16): 65535.0,
                    }.get(np.dtype(planes.dtype))
                    ir = np.asarray(in_range, np.float64).reshape(-1, 2)
                    if dscale is not None:
                        ir = ir / dscale
                self._calibrate(_q.sample_tiles_raw(
                    np.stack(bands), self.hp, self.mean, self.std,
                    scale=None, outlier=outlier, rescale=rescale,
                    in_range=ir,
                ))
                return self._quant
            scale = {
                np.dtype(np.uint8): 255.0, np.dtype(np.uint16): 65535.0
            }.get(np.dtype(raw.dtype))
            self._calibrate(_q.sample_tiles_raw(
                raw, self.hp, self.mean, self.std,
                scale=scale, outlier=outlier, rescale=rescale,
                in_range=in_range,
            ))
        return self._quant

    # -- public API ----------------------------------------------------------

    def make_canvas(
        self, image: np.ndarray, channel_mode: str = "broadcast"
    ) -> np.ndarray:
        """Assemble the zero-padded [H'', W', C] float32 canvas on host."""
        hp = self.hp
        if image.ndim == 2:
            planes = [image] * (hp.n_channels if channel_mode == "broadcast" else 1)
        elif image.ndim == 3:
            if channel_mode == "broadcast":
                if image.shape[0] != 1:
                    raise ValueError("broadcast mode expects a single plane")
                planes = [image[0]] * hp.n_channels
            else:
                planes = list(image)
        else:
            raise ValueError("image must be [H, W] or [C, H, W]")
        if len(planes) != hp.n_channels:
            raise ValueError(
                f"model expects {hp.n_channels} channels, got {len(planes)}"
            )
        height, width = planes[0].shape
        _, grid, canvas_h, canvas_w = self._get(height, width)
        canvas = np.zeros((canvas_h, canvas_w, hp.n_channels), np.float32)
        m = grid.margin
        for c, p in enumerate(planes):
            canvas[m : m + height, m : m + width, c] = p
        return canvas

    def infer(
        self, image: np.ndarray, channel_mode: str = "broadcast"
    ) -> np.ndarray:
        """Run tiled inference.  Returns [K, H, W] float32 probability maps."""
        height, width = image.shape[-2:]
        jitted, _, _, _ = self._get(height, width)
        canvas = self.make_canvas(image, channel_mode)
        window = tiler.ramp_window(self.hp.im_size, self.hp.margin)
        qs = self._quant_for_normalized(image)
        probs = jitted(
            self.params, jnp.asarray(canvas), jnp.asarray(window), quant=qs
        )
        return np.moveaxis(np.asarray(probs), -1, 0)

    # -- device-side end-to-end slide path -----------------------------------

    def _build_slide(self, height: int, width: int, in_dtype, outlier,
                     rescale: bool, classes=None, n_in: int = 0,
                     scaling_factor: float = 1.0,
                     fixed_range: bool = False,
                     plane_shape: Optional[Tuple[int, int]] = None,
                     trim_hw: Optional[Tuple[int, int]] = None):
        """Jitted raw-slide pipeline: uint8/uint16 in, uint8 maps out.

        Fuses the host preprocessing (``UnMicst1-5.py:817-821``:
        ``rescale_intensity(in=(min, max|percentile), out=(0, 0.983))`` +
        ``im2double``) and the output quantization (``uint8(255*pm)``)
        onto the device, so the host link carries raw pixels in (2 B/px)
        and uint8 maps out (K B/px) instead of float32 both ways — the
        dominant cost on PCIe/tunnel-attached hosts.

        ``scaling_factor != 1`` additionally fuses the resize (gaussian
        anti-alias + bilinear, ``core/resize_dev.py``) AND the output
        map upscale-back with the reference's double quantization
        (``uint8(255*pm)`` -> resize -> ``uint8(255*r)``,
        ``UnMicst1-5.py:848-854``) into the same program — the entire
        ``--scalingFactor`` pipeline on-chip.

        ``n_in == 0``: a single [H, W] plane broadcast into every net
        channel (solo/legacy/cyto).  ``n_in > 0``: an [n_in, H, W] stack
        with per-channel intensity ranges (duo, ``UnMicst2.py:760-788``).

        ``fixed_range``: the rescale (lo, hi) ride as TRACED [C0, 1, 1]
        arguments (im2double units) instead of being computed from the
        data — windowed/ROI requests normalized with a pinned global
        range match a full-slide run's normalization exactly, and every
        pinned range shares one compiled program.

        ``plane_shape``: device-resident slide mode — the raw argument is
        the FULL pinned (plane_h, plane_w) plane (or [n_in, ...] stack)
        already living in HBM, and ``run`` takes traced (r0, c0) offsets:
        the (height, width) band is cut with ``dynamic_slice`` ON DEVICE,
        so a viewer pan costs zero host->device pixel traffic.  Offsets
        being traced, every same-sized window shares one program.

        ``trim_hw`` (plane mode only): the output maps are cropped ON
        DEVICE to a (th, tw) window at traced (tr, tc) band-relative
        offsets before they ride the link — a viewer pan that needs a
        512^2 view out of a context band fetches th*tw*K bytes instead
        of the whole band (the band D2H was the dominant cached-pan
        cost on tunnel-attached hosts, scripts/pan_latency_report.json).
        """
        from unmicst_tpu.core.resize_dev import ResizePlan

        hp = self.hp
        # scaled net-input dims, matching preprocess_channel
        sh = int(float(height) * float(scaling_factor))
        sw = int(float(width) * float(scaling_factor))
        grid = tiler.make_grid(sh, sw, hp.im_size, hp.margin)  # validates
        fwd_plan = ResizePlan((height, width), (sh, sw))
        back_plan = ResizePlan((sh, sw), (height, width))
        scale = {np.dtype(np.uint8): 255.0, np.dtype(np.uint16): 65535.0}.get(
            np.dtype(in_dtype)
        )
        if scale is None and not rescale:
            # with rescale the data-derived (lo, hi) normalizes any dtype;
            # without it the im2double scale must be known (the streaming
            # engine applies the same guard)
            raise ValueError(
                f"device slide path (rescale=False) requires uint8/uint16 "
                f"input, got {np.dtype(in_dtype)}"
            )
        core, _, canvas_h, canvas_w = self._get(sh, sw)
        n_ch = hp.n_channels
        m = grid.margin

        # the percentile q rides as a TRACED argument (default 0.0 when
        # unused): distinct ?outlier= values share one compiled program
        # instead of recompiling + churning the FIFO program cache
        has_outlier = outlier != -1

        def body(params, raw, win, quant, lo=None, hi=None,
                 q=jnp.float32(0.0)):
            x = raw.astype(jnp.float32)
            if scale is not None:
                x = x / scale  # im2double
            planes = x[None] if n_in == 0 else x  # [C0, H, W]
            planes = fwd_plan.apply(planes)  # [C0, sh, sw] (no-op at sf 1)
            if rescale:
                if lo is None:  # data-derived range (the reference default)
                    lo = jnp.min(planes, axis=(1, 2), keepdims=True)
                    hi = (
                        jnp.percentile(planes, q, axis=(1, 2), keepdims=True)
                        if has_outlier
                        else jnp.max(planes, axis=(1, 2), keepdims=True)
                    )
                planes = jnp.clip(planes, lo, hi)
                planes = (planes - lo) / jnp.maximum(hi - lo, 1e-12) * 0.983
            body = jnp.moveaxis(planes, 0, -1)  # [sh, sw, C0]
            if body.shape[-1] != n_ch:
                body = jnp.broadcast_to(
                    body[..., :1], (sh, sw, n_ch)
                )
            canvas = jnp.zeros((canvas_h, canvas_w, n_ch), jnp.float32)
            canvas = jax.lax.dynamic_update_slice(canvas, body, (m, m, 0))
            probs = core(params, canvas, win, quant)  # (sh,sw,K) f32
            if classes is not None:
                # only the requested planes ride the link back (non-stack
                # mode needs 2 of 3 — a third less D2H)
                probs = probs[..., list(classes)]
            q8 = (probs * 255.0).astype(jnp.uint8)
            if back_plan.identity:
                return q8
            # reference back-half double quantization (postprocess_pm)
            r = back_plan.apply(
                jnp.moveaxis(q8, -1, 0).astype(jnp.float32) / 255.0
            )
            return jnp.moveaxis((r * 255.0).astype(jnp.uint8), 0, -1)

        if plane_shape is not None:

            def cut(plane, r0, c0):
                if n_in == 0:
                    return jax.lax.dynamic_slice(
                        plane, (r0, c0), (height, width)
                    )
                return jax.lax.dynamic_slice(
                    plane, (jnp.int32(0), r0, c0), (n_in, height, width)
                )

            if trim_hw is not None:
                th, tw = trim_hw

                def trim(out, tr, tc):
                    # uint8 crop on device: byte-identical to the host
                    # crop, (height*width - th*tw)*K fewer D2H bytes
                    return jax.lax.dynamic_slice(
                        out, (tr, tc, jnp.int32(0)),
                        (th, tw, out.shape[-1]),
                    )

                if fixed_range:

                    def run(params, plane, win, r0, c0, tr, tc, lo, hi,
                            quant=None):
                        return trim(
                            body(params, cut(plane, r0, c0), win, quant,
                                 lo=lo, hi=hi), tr, tc)

                else:

                    def run(params, plane, win, r0, c0, tr, tc,
                            q=jnp.float32(0.0), quant=None):
                        return trim(
                            body(params, cut(plane, r0, c0), win, quant,
                                 q=q), tr, tc)

            elif fixed_range:

                def run(params, plane, win, r0, c0, lo, hi, quant=None):
                    return body(params, cut(plane, r0, c0), win, quant,
                                lo=lo, hi=hi)

            else:

                def run(params, plane, win, r0, c0, q=jnp.float32(0.0),
                        quant=None):
                    return body(params, cut(plane, r0, c0), win, quant,
                                q=q)

        elif fixed_range:

            def run(params, raw, win, lo, hi, quant=None):
                return body(params, raw, win, quant, lo=lo, hi=hi)

        else:

            def run(params, raw, win, q=jnp.float32(0.0), quant=None):
                return body(params, raw, win, quant, q=q)

        return jax.jit(run)

    def infer_slide(
        self,
        raw: np.ndarray,
        outlier: float = -1,
        rescale: bool = True,
        classes=None,
        scaling_factor: float = 1.0,
        in_range=None,
    ) -> np.ndarray:
        """Raw single-channel slide -> uint8 [K, H, W] probability maps.

        Device-side preprocessing parity with the reference CLI (float32
        instead of float64 intermediate; observed output difference <= 1
        uint8 level), including ``scaling_factor != 1`` (resize down,
        infer, resize maps back — all in one jitted program).
        ``classes``: optional tuple of class indexes to return (in that
        order).  ``in_range``: optional pinned ``(lo, hi)`` rescale range
        in raw pixel units (post the float32->uint16 parity cast) —
        overrides the data-derived min/max|percentile so windowed/ROI
        calls normalize identically to a full-slide run; ``outlier`` is
        ignored when pinned.  Note: at ``scaling_factor != 1`` the
        derived range is computed on the RESIZED plane (the reference's
        resize-then-rescale order, ``UnMicst1-5.py:813-821``), so
        pinning raw-plane extremes is close but not bit-equal to the
        derived run — anti-aliasing pulls resized extremes slightly
        inward.
        """
        if raw.dtype == np.float32:
            raw = raw.astype(np.uint16)  # parity cast (UnMicst1-5.py:807-808)
        classes = self._check_classes(classes)
        fixed = in_range is not None
        if fixed:
            if not rescale:
                raise ValueError("in_range requires rescale=True")
            ir = _normalize_in_range(in_range, 1)
        height, width = raw.shape
        key = ("slide", height, width, np.dtype(raw.dtype),
               outlier != -1 and not fixed,
               rescale, classes, float(scaling_factor), fixed)
        jitted = self._compiled.get_or_build(
            key,
            lambda: self._build_slide(
                height, width, raw.dtype, outlier, rescale, classes,
                scaling_factor=scaling_factor, fixed_range=fixed,
            ),
        )
        window = tiler.ramp_window(self.hp.im_size, self.hp.margin)
        qs = self._quant_for_raw(raw, outlier, rescale, scaling_factor,
                                 in_range=in_range)
        args = [self.params, jnp.asarray(raw), jnp.asarray(window)]
        if fixed:
            args.extend(_range_args(ir, raw.dtype))
        elif outlier != -1:
            args.append(jnp.float32(outlier))
        out = jitted(*args, quant=qs)
        return np.moveaxis(np.asarray(out), -1, 0)

    # -- device-resident slide (zero-H2D viewer pans) -------------------------

    def _window_dev(self):
        """The blend window as a cached device array — windowed serving
        calls are otherwise charged one small H2D per request."""
        if getattr(self, "_win_dev", None) is None:
            self._win_dev = jnp.asarray(
                tiler.ramp_window(self.hp.im_size, self.hp.margin)
            )
        return self._win_dev

    def device_plane(self, raw, outlier: float = -1, rescale: bool = True,
                     in_range=None):
        """Pin a raw slide plane ([H, W]) or channel stack ([C, H, W])
        into device HBM for repeated windowed inference.

        Upload ONCE; every :meth:`infer_slide_device` pan after that cuts
        its band with an on-device ``dynamic_slice`` — zero per-pan
        host->device pixel traffic (the reference re-feeds every window
        from host, ``UnMicst.py:520-541``).  float32 planes parity-cast
        to uint16 (``UnMicst1-5.py:807-808``).  An int8-quantized engine
        calibrates from this plane (host side) before the upload, so the
        device path serves quantized too.
        """
        a = np.asarray(raw)
        if a.dtype == np.float32:
            a = a.astype(np.uint16)
        if self.quantized and self._quant is None:
            self._quant_for_raw(a, outlier, rescale, in_range=in_range)
        return jax.device_put(a)

    def _band_checked(self, plane, ndim: int, r0: int, c0: int,
                      height: int, width: int):
        if plane.ndim != ndim:
            raise ValueError(
                f"pinned plane must be {ndim}-D, got shape {plane.shape}"
            )
        ph, pw = plane.shape[-2:]
        r0, c0 = int(r0), int(c0)
        if not (0 <= r0 and 0 <= c0 and r0 + height <= ph
                and c0 + width <= pw):
            # dynamic_slice silently clamps out-of-range starts — the
            # caller would get a shifted window, not an error
            raise ValueError(
                f"band ({r0},{c0})+{height}x{width} outside the "
                f"{ph}x{pw} pinned plane"
            )
        return ph, pw

    @staticmethod
    def _trim_checked(trim, height: int, width: int):
        if trim is None:
            return None
        tr0, tc0, th, tw = (int(v) for v in trim)
        if not (0 <= tr0 and 0 <= tc0 and th > 0 and tw > 0
                and tr0 + th <= height and tc0 + tw <= width):
            # same clamping hazard as _band_checked, output side
            raise ValueError(
                f"trim ({tr0},{tc0})+{th}x{tw} outside the "
                f"{height}x{width} band"
            )
        return th, tw

    def infer_slide_device(
        self,
        plane,
        r0: int,
        c0: int,
        height: int,
        width: int,
        outlier: float = -1,
        rescale: bool = True,
        classes=None,
        scaling_factor: float = 1.0,
        in_range=None,
        trim=None,
    ) -> np.ndarray:
        """Windowed inference against a :meth:`device_plane`-pinned slide:
        uint8 [K, height, width] maps for the band at (r0, c0).

        :meth:`infer_slide` semantics on the band's pixels (byte-identical
        output), but the band never rides the host link — it is cut
        on-device from the pinned plane, and (r0, c0) are traced scalars
        so every same-sized window hits one compiled program.

        ``trim=(tr0, tc0, th, tw)`` (band-relative) crops the output maps
        ON DEVICE before the fetch — returns [K, th, tw], byte-identical
        to ``maps[:, tr0:tr0+th, tc0:tc0+tw]`` of the untrimmed call, at
        th*tw/(height*width) of the D2H bytes.  Offsets are traced; only
        (th, tw) shapes the program.
        """
        if self.quantized and self._quant is None:
            raise RuntimeError(
                "int8 engine is uncalibrated: pin the slide with "
                "device_plane(...) (which calibrates) or run one host-path "
                "request first"
            )
        classes = self._check_classes(classes)
        fixed = in_range is not None
        if fixed:
            if not rescale:
                raise ValueError("in_range requires rescale=True")
            ir = _normalize_in_range(in_range, 1)
        ph, pw = self._band_checked(plane, 2, r0, c0, height, width)
        trim_hw = self._trim_checked(trim, height, width)
        dt = np.dtype(plane.dtype)
        key = ("slide_dev", ph, pw, height, width, dt,
               outlier != -1 and not fixed, rescale, classes,
               float(scaling_factor), fixed, trim_hw)
        jitted = self._compiled.get_or_build(
            key,
            lambda: self._build_slide(
                height, width, dt, outlier, rescale, classes,
                scaling_factor=scaling_factor, fixed_range=fixed,
                plane_shape=(ph, pw), trim_hw=trim_hw,
            ),
        )
        args = [self.params, plane, self._window_dev(),
                jnp.int32(r0), jnp.int32(c0)]
        if trim_hw is not None:
            args.extend([jnp.int32(trim[0]), jnp.int32(trim[1])])
        if fixed:
            args.extend(_range_args(ir, dt))
        elif outlier != -1:
            args.append(jnp.float32(outlier))
        out = jitted(*args, quant=self._quant)
        return np.moveaxis(np.asarray(out), -1, 0)

    def infer_slide_stack_device(
        self,
        planes,
        r0: int,
        c0: int,
        height: int,
        width: int,
        outlier: float = -1,
        rescale: bool = True,
        classes=None,
        scaling_factor: float = 1.0,
        in_range=None,
        trim=None,
    ) -> np.ndarray:
        """:meth:`infer_slide_device` for a pinned [C, H, W] channel stack
        (duo plumbing, per-channel ranges; same ``trim=`` contract)."""
        if self.quantized and self._quant is None:
            raise RuntimeError(
                "int8 engine is uncalibrated: pin the slide with "
                "device_plane(...) (which calibrates) or run one host-path "
                "request first"
            )
        classes = self._check_classes(classes)
        n_in = int(planes.shape[0])
        if n_in != self.hp.n_channels:
            raise ValueError(
                f"model expects {self.hp.n_channels} channels, got {n_in}"
            )
        fixed = in_range is not None
        if fixed:
            if not rescale:
                raise ValueError("in_range requires rescale=True")
            ir = _normalize_in_range(in_range, n_in)
        ph, pw = self._band_checked(planes, 3, r0, c0, height, width)
        trim_hw = self._trim_checked(trim, height, width)
        dt = np.dtype(planes.dtype)
        key = ("slide_stack_dev", ph, pw, height, width, dt,
               outlier != -1 and not fixed, rescale, classes,
               float(scaling_factor), fixed, trim_hw)
        jitted = self._compiled.get_or_build(
            key,
            lambda: self._build_slide(
                height, width, dt, outlier, rescale, classes,
                n_in=n_in, scaling_factor=scaling_factor,
                fixed_range=fixed, plane_shape=(ph, pw),
                trim_hw=trim_hw,
            ),
        )
        args = [self.params, planes, self._window_dev(),
                jnp.int32(r0), jnp.int32(c0)]
        if trim_hw is not None:
            args.extend([jnp.int32(trim[0]), jnp.int32(trim[1])])
        if fixed:
            args.extend(_range_args(ir, dt))
        elif outlier != -1:
            args.append(jnp.float32(outlier))
        out = jitted(*args, quant=self._quant)
        return np.moveaxis(np.asarray(out), -1, 0)

    # -- device-side multi-channel (duo) slide path --------------------------

    def infer_slide_stack(
        self,
        raws,
        outlier: float = -1,
        rescale: bool = True,
        classes=None,
        scaling_factor: float = 1.0,
        in_range=None,
    ) -> np.ndarray:
        """Raw [C] channel planes -> uint8 [K, H, W] maps (duo plumbing,
        per-channel ranges); otherwise :meth:`infer_slide` semantics.
        ``in_range``: one (lo, hi) pair broadcast to every channel, or a
        per-channel sequence of pairs."""
        planes = [
            r.astype(np.uint16) if r.dtype == np.float32 else r for r in raws
        ]
        if len(planes) != self.hp.n_channels:
            raise ValueError(
                f"model expects {self.hp.n_channels} channels, got "
                f"{len(planes)}"
            )
        dtypes = {p.dtype for p in planes}
        if len(dtypes) != 1:
            # np.stack would silently promote (uint8+uint16 -> uint16),
            # im2double-ing the narrow channel by the wrong constant
            raise ValueError(
                f"channel planes disagree on dtype: {sorted(map(str, dtypes))}"
            )
        raw = np.stack(planes)
        classes = self._check_classes(classes)
        _, height, width = raw.shape
        fixed = in_range is not None
        if fixed:
            if not rescale:
                raise ValueError("in_range requires rescale=True")
            ir = _normalize_in_range(in_range, len(planes))
        key = ("slide_stack", height, width, np.dtype(raw.dtype),
               outlier != -1 and not fixed,
               rescale, classes, float(scaling_factor), fixed)
        jitted = self._compiled.get_or_build(
            key,
            lambda: self._build_slide(
                height, width, raw.dtype, outlier, rescale, classes,
                n_in=len(planes), scaling_factor=scaling_factor,
                fixed_range=fixed,
            ),
        )
        window = tiler.ramp_window(self.hp.im_size, self.hp.margin)
        qs = self._quant_for_raw(raw, outlier, rescale, scaling_factor,
                                 in_range=in_range)
        args = [self.params, jnp.asarray(raw), jnp.asarray(window)]
        if fixed:
            args.extend(_range_args(ir, raw.dtype))
        elif outlier != -1:
            args.append(jnp.float32(outlier))
        out = jitted(*args, quant=qs)
        return np.moveaxis(np.asarray(out), -1, 0)
