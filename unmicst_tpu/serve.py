"""Inference service — persistent-model serving for pipeline integration.

The reference is strictly batch CLI (model setup cost paid per invocation,
``UnMicst.py:596``).  For production pipelines (MCMICRO at scale) this
module keeps the model resident and serves slides over HTTP:

* ``POST /infer?model=nucleiDAPI&channel=0[&compress=1|deflate|zstd]
  [&scale=0.5][&usePyramid=1][&roi=r0,c0,h,w][&range=lo,hi]
  [&classes=1,2]`` with a TIFF, CZI, or ND2 body (container sniffed
  from magic bytes; OME-aware channel mapping) -> multi-page TIFF
  response (the ``_Probabilities`` page stack, reversed class order,
  uint8; optionally deflate- or zstd-compressed pages); ``roi=``
  infers only that window (one net-tile of context read around it —
  the interactive-viewer path over mega-slides); ``range=lo,hi`` pins
  the intensity-rescale range (repeat per channel for duo) so windowed
  requests normalize exactly like a full-slide run; ``classes=``
  returns only those class pages (a one-PM viewer pays 1/K of the D2H
  + response bytes — dropped ON DEVICE on every path);
  ``usePyramid=1`` at ``scale <= 0.5`` decodes the nearest stored
  SubIFD level instead of the full-res plane (the CLI's
  ``--usePyramid``; falls through silently when no usable level
  exists, and ``roi=`` requests ignore it — windows read bands);
* ``POST /infer?probe=range&channel=0[&outlier=p]`` -> JSON global
  per-channel (lo, hi) of the body, no inference — viewers call it once,
  then pin ``range=`` on every ROI request;
* ``channel_name=DAPI`` (repeatable for duo) selects channels by their
  declared name instead of index on any of the above (OME-TIFF Channel
  elements; CZI metadata XML);
* ``POST /slides`` with a container body -> ``{"slide_id": ...}`` —
  content-addressed (sha256, dedup), LRU-bounded cache; then body-less
  ``POST /infer?slide=ID&roi=...`` serves every viewer window without
  re-uploading the slide;
* ``DELETE /slides/<id>`` — a viewer closed the slide: frees the disk
  copy and the pinned HBM planes now instead of waiting for LRU
  pressure (defers to the last in-flight reader; 404 on unknown ids);
* ``GET /models`` -> zoo availability;
* ``GET /healthz`` -> liveness + device info;
* ``GET /stats`` -> request/throughput counters (uptime, px processed,
  per-model counts, rejects).

Production posture: bounded in-flight requests (``--maxInflight``, 503 +
``Retry-After`` past the bound — the device serializes inference anyway),
graceful drain on SIGTERM/SIGINT (stop accepting, finish in-flight,
exit), per-request metrics in ``X-UnMicst-Meta``.

Engines are cached per (model, precision); repeated slides of one geometry
hit the compiled program.  Stdlib ``http.server`` keeps the dependency
surface at zero; front with a real proxy for multi-tenant deployments.
"""

from __future__ import annotations

import json
import os
import queue
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np


def _resolve_channel_names(path: str, fmt: str, names) -> list:
    """``channel_name=`` -> 0-based channel indexes via the container's
    declared names (OME-TIFF Channel elements, CZI metadata XML);
    ValueError (-> 400) when absent or unresolvable."""
    from unmicst_tpu.io.slides import resolve_channel_names

    return resolve_channel_names(path, fmt, names)


def _parse_compress(value: str) -> Optional[str]:
    """compress= accepts booleans (bare/1/true -> deflate, the
    any-reader codec) or an explicit codec name ('deflate' | 'zstd')."""
    v = value.lower()
    if v in ("deflate", "zstd"):
        return v
    return "deflate" if _parse_bool(value, "compress") else None


def _parse_classes(q) -> Optional[tuple]:
    """``classes=`` -> tuple of 0-based class indices (repeatable or
    comma-joined); None when absent.  Range-checking happens against the
    model downstream (the engine knows n_classes)."""
    if "classes" not in q:
        return None
    vals = [x for v in q["classes"] for x in v.split(",") if x != ""]
    if not vals:
        raise ValueError(
            "classes parameter present but empty; pass 0-based class "
            "indices, e.g. classes=1,2"
        )
    try:
        return tuple(int(x) for x in vals)
    except ValueError:
        raise ValueError(
            f"classes must be integer indices, got {q['classes']!r}"
        ) from None


def _parse_bool(value: str, name: str) -> bool:
    """Strict query-bool: silent misparse (rescale=false staying ON) is
    worse than a 400."""
    v = value.lower()
    if v in ("1", "true", "yes", "on"):
        return True
    if v in ("0", "false", "no", "off"):
        return False
    raise ValueError(f"{name} must be a boolean, got {value!r}")


class ModelServer:
    def __init__(
        self,
        model_root: Optional[str] = None,
        precision: str = "float32",
        max_body_bytes: int = 2 << 30,
        stream_above_px: int = 64_000_000,
        max_inflight: int = 4,
        queue_timeout_s: float = 30.0,
        max_scaled_px: int = 1 << 30,
        calibration_percentile: float = 99.99,
        slide_cache_bytes: int = 4 << 30,
        device_slide_bytes: int = 2 << 30,
    ):
        self.model_root = model_root
        self.precision = precision
        self.calibration_percentile = float(calibration_percentile)
        self.max_body_bytes = int(max_body_bytes)
        self.stream_above_px = int(stream_above_px)
        # backpressure: the device serializes inference anyway; beyond a
        # small queue each extra request only spools bodies to disk and
        # holds a thread — fail fast with 503 + Retry-After instead
        self.max_inflight = int(max_inflight)
        # upper bound on net-input pixels after an UPSCALING ?scale=
        # resample (one request must not OOM the server via scale > 1)
        self.max_scaled_px = int(max_scaled_px)
        self.queue_timeout_s = float(queue_timeout_s)
        self._inflight = threading.BoundedSemaphore(max(1, self.max_inflight))
        self._zero_inflight = self.max_inflight <= 0  # test hook: always busy
        self._engines: Dict[Tuple[str, str, str], object] = {}
        self._lock = threading.Lock()  # engine cache (held through builds)
        # stats get their own lock: engine construction holds _lock for
        # seconds-to-minutes (checkpoint load through the device link),
        # and counters/backpressure must never queue behind it
        self._stats_lock = threading.Lock()
        self._started = time.time()
        self.stats = {
            "requests": 0, "ok": 0, "client_error": 0, "server_error": 0,
            "busy_rejected": 0, "px_processed": 0, "infer_s_total": 0.0,
            "slide_uploads": 0, "slide_hits": 0, "slide_drops": 0,
            "by_model": {},
            "prewarmed": 0, "prewarm_errors": 0, "prewarm_pending": 0,
            "prewarm_dropped": 0,
            "device_pins": 0, "device_pans": 0,
        }
        # prewarm runs on ONE worker with a small bounded queue: repeated
        # prewarm uploads must never accumulate threads that each camp on
        # the inflight semaphore and starve interactive /infer traffic
        # (each queued entry is also capped by _PREWARM_SEM_TIMEOUT_S per
        # geometry inside prewarm_slide)
        self._prewarm_queue: "queue.Queue" = queue.Queue(maxsize=4)
        self._prewarm_worker: Optional[threading.Thread] = None
        # content-addressed slide cache (POST /slides): interactive
        # viewers upload a slide ONCE and issue body-less roi= requests
        # against its id instead of re-uploading per window
        self.slide_cache_bytes = int(slide_cache_bytes)
        self._slide_lock = threading.Lock()
        self._slides: Dict[str, dict] = {}  # id -> {path,bytes,used,refs}
        self._slide_total = 0
        self._slide_dir: Optional[str] = None
        # device-RESIDENT plane cache: an 8k^2 uint16 slide is 128 MB —
        # it fits in HBM whole, so pin it there once and let every roi=
        # pan cut its band ON DEVICE (dynamic_slice, traced offsets):
        # zero per-pan host->device pixel traffic, where the host path
        # re-uploads a ~MB raw band through a ~20 MB/s link per pan
        self.device_slide_bytes = int(device_slide_bytes)
        self._dev_lock = threading.Lock()
        # (slide_id, channels) -> {event,plane,bytes,used,error}
        self._dev_planes: Dict[tuple, dict] = {}
        self._dev_total = 0

    def _count(self, **deltas) -> None:
        with self._stats_lock:
            for k, v in deltas.items():
                if k == "by_model":
                    self.stats["by_model"][v] = (
                        self.stats["by_model"].get(v, 0) + 1
                    )
                else:
                    self.stats[k] += v

    def snapshot(self) -> dict:
        with self._stats_lock:
            out = dict(self.stats, by_model=dict(self.stats["by_model"]))
        out["uptime_s"] = round(time.time() - self._started, 1)
        out["max_inflight"] = self.max_inflight
        with self._slide_lock:
            out["slides_cached"] = len(self._slides)
            out["slide_cache_bytes_used"] = self._slide_total
        with self._dev_lock:
            out["device_planes_pinned"] = len(self._dev_planes)
            out["device_plane_bytes_used"] = self._dev_total
        return out

    # -- slide cache (upload once, infer many) -------------------------------

    def register_slide(self, spool_path: str, nbytes: int,
                       digest: str) -> dict:
        """Adopt a spooled upload into the content-addressed cache.

        ``digest`` is the body's sha256 (computed while spooling) — a
        re-upload of the same bytes dedups to the existing entry.  The
        cache is LRU-bounded by ``slide_cache_bytes``; entries with
        in-flight readers are never evicted (refcounted)."""
        import shutil

        sid = digest[:32]
        with self._slide_lock:
            if self._slide_dir is None:
                import atexit

                self._slide_dir = tempfile.mkdtemp(prefix="unmicst-slides-")
                atexit.register(
                    shutil.rmtree, self._slide_dir, ignore_errors=True
                )
            ent = self._slides.get(sid)
            if ent is not None:
                # a re-upload revives an entry DELETEd while readers
                # were still in flight (same bytes, same disk copy)
                ent.pop("doomed", None)
                ent["used"] = time.time()
                os.unlink(spool_path)
                return {"slide_id": sid, "bytes": ent["bytes"],
                        "deduplicated": True}
            dest = os.path.join(self._slide_dir, sid)
            os.replace(spool_path, dest)
            self._slides[sid] = {"path": dest, "bytes": nbytes,
                                 "used": time.time(), "refs": 0}
            self._slide_total += nbytes
            # LRU eviction, skipping entries a request currently reads
            while self._slide_total > self.slide_cache_bytes:
                victims = sorted(
                    (e["used"], i) for i, e in self._slides.items()
                    if e["refs"] == 0 and i != sid
                )
                if not victims:
                    break
                _, vid = victims[0]
                v = self._slides.pop(vid)
                self._slide_total -= v["bytes"]
                try:
                    os.unlink(v["path"])
                except OSError:
                    pass
                self._drop_device_planes(vid)
        self._count(slide_uploads=1)
        return {"slide_id": sid, "bytes": nbytes, "deduplicated": False}

    def acquire_slide(self, slide_id: str) -> str:
        """Path of a cached slide; pins it against eviction until
        :meth:`release_slide`.  FileNotFoundError (-> 404) if unknown
        (or explicitly dropped via ``DELETE /slides/<id>``)."""
        with self._slide_lock:
            ent = self._slides.get(slide_id)
            if ent is None or ent.get("doomed"):
                raise FileNotFoundError(
                    f"unknown slide id {slide_id!r} (expired or never "
                    "uploaded — POST the body to /slides first)"
                )
            ent["refs"] += 1
            ent["used"] = time.time()
            return ent["path"]

    def release_slide(self, slide_id: str) -> None:
        with self._slide_lock:
            ent = self._slides.get(slide_id)
            if ent is not None and ent["refs"] > 0:
                ent["refs"] -= 1
                if ent["refs"] == 0 and ent.get("doomed"):
                    self._finalize_drop(slide_id)

    def _finalize_drop(self, slide_id: str) -> None:
        """Remove a cache entry: disk copy unlinked, HBM planes
        released.  Caller holds ``_slide_lock``."""
        ent = self._slides.pop(slide_id, None)
        if ent is None:
            return
        self._slide_total -= ent["bytes"]
        try:
            os.unlink(ent["path"])
        except OSError:
            pass
        self._drop_device_planes(slide_id)

    def drop_slide(self, slide_id: str) -> bool:
        """Explicit removal (``DELETE /slides/<id>`` — a viewer closed
        the slide): frees the disk copy AND the pinned HBM planes now
        instead of waiting for LRU pressure.  With readers in flight the
        drop defers to the last :meth:`release_slide` (their pinned
        paths/arrays stay valid); new requests 404 immediately.  False
        when the id is unknown."""
        with self._slide_lock:
            ent = self._slides.get(slide_id)
            if ent is None or ent.get("doomed"):
                # a doomed entry is logically gone: repeated DELETEs 404
                # like any other post-drop request, and slide_drops
                # counts removals, not retries
                return False
            if ent["refs"] > 0:
                ent["doomed"] = True
            else:
                self._finalize_drop(slide_id)
        self._count(slide_drops=1)
        return True

    # -- device-resident planes (zero-H2D viewer pans) ------------------------

    def _drop_device_planes(self, slide_id: str) -> None:
        """Release the HBM planes of an evicted slide (in-flight pans
        keep the arrays alive via their local references; the HBM frees
        when the last one drops)."""
        with self._dev_lock:
            for k in [k for k in self._dev_planes if k[0] == slide_id]:
                v = self._dev_planes.pop(k)
                if v["event"].is_set() and v["error"] is None:
                    self._dev_total -= v["bytes"]

    def _device_plane_for(self, slide_key, srcs, eng):
        """The pinned HBM plane(s) ([H, W] or [C, H, W]) for a cached
        slide, uploading ONCE on first use — or None when the device
        cache is disabled, the slide exceeds ``device_slide_bytes``, or
        an int8 engine has not calibrated yet (the first request then
        rides the host path, which calibrates; later pans go device).

        Keyed by (slide_id, channel tuple): the pixels are engine-
        independent (``ChannelSource`` already parity-casts float32
        sources to uint16 at read time), so every model shares one
        upload.  LRU-bounded; concurrent first pans wait on the one
        builder instead of double-uploading.  Build failures fall back
        to the host path (which surfaces the real IO error)."""
        if slide_key is None or self.device_slide_bytes <= 0:
            return None
        if eng.quantized and eng._quant is None:
            return None
        h, w = srcs[0].height, srcs[0].width
        nbytes = sum(
            h * w * np.dtype(s.dtype).itemsize for s in srcs
        )
        if nbytes > self.device_slide_bytes:
            return None
        with self._dev_lock:
            ent = self._dev_planes.get(slide_key)
            if ent is None:
                ent = {"event": threading.Event(), "plane": None,
                       "bytes": nbytes, "used": time.time(), "error": None}
                self._dev_planes[slide_key] = ent
                builder = True
            else:
                ent["used"] = time.time()
                builder = False
        if builder:
            try:
                raw = (srcs[0].read_rows(0, h) if len(srcs) == 1
                       else np.stack([s.read_rows(0, h) for s in srcs]))
                ent["plane"] = eng.device_plane(raw)
            except BaseException as e:  # noqa: BLE001 — non-fatal cache
                ent["error"] = e
                with self._dev_lock:
                    self._dev_planes.pop(slide_key, None)
                ent["event"].set()
                return None
            ent["event"].set()
            self._count(device_pins=1)
            with self._dev_lock:
                self._dev_total += nbytes
                while self._dev_total > self.device_slide_bytes:
                    victims = sorted(
                        (e["used"], k)
                        for k, e in self._dev_planes.items()
                        if e is not ent and e["event"].is_set()
                        and e["error"] is None
                    )
                    if not victims:
                        break
                    _, vk = victims[0]
                    v = self._dev_planes.pop(vk)
                    self._dev_total -= v["bytes"]
        else:
            ent["event"].wait()
            if ent["error"] is not None:
                return None
        return ent["plane"]

    def prewarm_slide(self, slide_id: str, model: str, roi_h: int,
                      roi_w: int, channel=0, rescale: bool = True,
                      outlier: float = -1.0, scale: float = 1.0,
                      in_range=None, channel_names=None,
                      classes=None) -> int:
        """Compile every ``roi=`` band geometry a viewer will hit on a
        cached slide, BEFORE the first pan.

        Band snapping (:meth:`_infer_roi`) means a (slide, window-size)
        pair uses at most FOUR XLA programs — interior, bottom edge,
        right edge, corner.  This runs one tiny ROI inference at each of
        the four extreme offsets (deduped when the slide is small), each
        through the normal in-flight semaphore so prewarm never
        oversubscribes the device past the configured bound.  Outputs
        are discarded; the XLA executable cache is the product.

        Returns the number of geometries warmed.  Called from the
        ``POST /slides?prewarm=1&...`` background worker; also usable
        synchronously (tests, embedding apps)."""
        from unmicst_tpu.io.slides import open_channel_source, sniff_format

        path = self.acquire_slide(slide_id)
        try:
            fmt = sniff_format(path)
            first = (channel_names[0] if channel_names is not None
                     else (channel[0] if isinstance(channel, (list, tuple))
                           else channel))
            if channel_names is not None:
                first = _resolve_channel_names(path, fmt, [first])[0]
            with open_channel_source(path, fmt, first) as src:
                hh, ww = src.height, src.width
            if roi_h > hh or roi_w > ww:
                raise ValueError(
                    f"prewarm roi {roi_h}x{roi_w} exceeds the "
                    f"{hh}x{ww} slide"
                )
            offsets = sorted({
                (r0, c0)
                for r0 in (0, hh - roi_h)
                for c0 in (0, ww - roi_w)
            })
            warmed = 0
            for r0, c0 in offsets:
                # short timeout: prewarm yields to live traffic — a busy
                # device means the cache is getting warmed by real pans
                # anyway, so give up rather than camp on the semaphore
                if not self._inflight.acquire(timeout=30.0):
                    break
                try:
                    self.infer_tiff_path(
                        path, model, channel, rescale, outlier,
                        scale=scale, roi=(r0, c0, roi_h, roi_w),
                        in_range=in_range, channel_names=channel_names,
                        slide_id=slide_id, classes=classes,
                    )
                finally:
                    self._inflight.release()
                warmed += 1
                self._count(prewarmed=1)
            return warmed
        finally:
            self.release_slide(slide_id)

    def schedule_prewarm(self, slide_id: str, **kwargs) -> str:
        """Enqueue an upload-time prewarm on the single bounded worker.

        Returns ``"scheduled"``, or ``"dropped"`` when the queue is full
        (counted in stats) — prewarm is a latency optimization, so under
        a burst of uploads the excess warms are shed rather than letting
        each hold a thread against the inflight semaphore (which would
        starve interactive ``/infer`` traffic with 503-less waits)."""
        try:
            self._prewarm_queue.put_nowait((slide_id, kwargs))
        except queue.Full:
            self._count(prewarm_dropped=1)
            return "dropped"
        self._count(prewarm_pending=1)
        with self._stats_lock:
            worker = self._prewarm_worker
            if worker is None or not worker.is_alive():
                worker = threading.Thread(
                    target=self._prewarm_worker_loop,
                    name="prewarm-worker", daemon=True,
                )
                self._prewarm_worker = worker
                worker.start()
        return "scheduled"

    def _prewarm_worker_loop(self) -> None:
        """Drain the prewarm queue; semantic failures (unknown model,
        roi larger than the slide) land in stats as ``prewarm_errors`` —
        the upload already returned 200 and the viewer's pans still
        work, just without the warm cache.  Exits when idle (restarted
        on the next schedule)."""
        while True:
            try:
                slide_id, kwargs = self._prewarm_queue.get(timeout=5.0)
            except queue.Empty:
                # exit decision under the same lock schedule_prewarm uses
                # to test liveness, so a concurrent enqueue either lands
                # before this check (we continue) or restarts the worker
                with self._stats_lock:
                    if self._prewarm_queue.empty():
                        self._prewarm_worker = None
                        return
                continue
            try:
                self.prewarm_slide(slide_id, **kwargs)
            except Exception as e:  # noqa: BLE001 — background: record, don't die
                self._count(prewarm_errors=1)
                with self._stats_lock:
                    self.stats["last_prewarm_error"] = (
                        f"{type(e).__name__}: {e}"
                    )
            finally:
                self._count(prewarm_pending=-1)

    def engine(self, model: str, kind: str = "whole"):
        """Cached engine, built OUTSIDE the cache lock: a cold build
        takes seconds-to-minutes (checkpoint over the device link) and
        must not block cache hits for other models — with max_inflight
        slots held by waiters, that would cascade into spurious 503s.
        Concurrent requests for the SAME key wait on the builder."""
        key = (model, self.precision, kind)
        with self._lock:
            ent = self._engines.get(key)
            if ent is None:
                ent = {"event": threading.Event(), "value": None,
                       "error": None}
                self._engines[key] = ent
                builder = True
            else:
                builder = False
        if builder:
            try:
                from unmicst_tpu.cli import (
                    precision_mode, resolve_model_dir,
                )
                from unmicst_tpu.core.checkpoint import (
                    load_params_for_bundle,
                )
                from unmicst_tpu.core.hp import load_model_dir
                from unmicst_tpu.infer import InferenceEngine
                from unmicst_tpu.runtime.pipeline import StreamingEngine

                bundle = load_model_dir(
                    resolve_model_dir(model, self.model_root)
                )
                params = load_params_for_bundle(bundle)
                dtype, mxu = precision_mode(self.precision)
                cls = (StreamingEngine if kind == "stream"
                       else InferenceEngine)
                ent["value"] = cls.from_bundle(
                    bundle, params, compute_dtype=dtype, precision=mxu,
                    # int8 calibrates on the engine's first slide and the
                    # one QuantState serves every later request (scales
                    # are standardized-input-stable, core/quant.py)
                    quantized=self.precision == "int8",
                    calibration_percentile=self.calibration_percentile,
                )
            except BaseException as e:
                ent["error"] = e
                with self._lock:
                    self._engines.pop(key, None)  # failed builds retry
                raise
            finally:
                ent["event"].set()
        else:
            ent["event"].wait()
            if ent["error"] is not None:
                raise ent["error"]
        return ent["value"]

    def infer_tiff(
        self, body: bytes, model: str, channel: int, rescale: bool,
        outlier: float, compress: Optional[str] = None,
        scale: float = 1.0, pyramid: bool = False,
        roi: Optional[Tuple[int, int, int, int]] = None,
        in_range=None, channel_names=None,
    ) -> Tuple[bytes, dict]:
        """In-memory convenience wrapper over :meth:`infer_tiff_path`."""
        with tempfile.NamedTemporaryFile(suffix=".tif") as tmp:
            tmp.write(body)
            tmp.flush()
            return self.infer_tiff_path(
                tmp.name, model, channel, rescale, outlier,
                compress=compress, scale=scale, pyramid=pyramid, roi=roi,
                in_range=in_range, channel_names=channel_names,
            )

    def infer_tiff_path(
        self, path: str, model: str, channel, rescale: bool,
        outlier: float, compress: Optional[str] = None,
        scale: float = 1.0, pyramid: bool = False,
        roi: Optional[Tuple[int, int, int, int]] = None,
        in_range=None, channel_names=None, slide_id: Optional[str] = None,
        classes=None, use_pyramid: bool = False,
    ) -> Tuple[bytes, dict]:
        """Run channel(s) of any supported container (TIFF/CZI/ND2 —
        sniffed from magic bytes, uploads carry no trustworthy name)
        through the resident model; OME-aware channel mapping like the
        CLI.  ``channel``: one index, or a 2-sequence for duo-style
        2-channel models.  Name kept from when only TIFF bodies were
        accepted.

        ``roi=(r0, c0, h, w)`` infers only that window (interactive
        viewers over mega-slides): a context-clipped, grid-snapped band
        is read and inferred, then trimmed to the ROI (see
        :meth:`_infer_roi`).  At ``scale == 1`` with a pinned ``range=``
        the result is bit-identical to the full-slide run's crop for
        ANY offset.

        ``in_range``: optional pinned per-channel rescale ranges — a list
        of (lo, hi) raw-unit pairs (one pair broadcasts).  Without it an
        ROI request normalizes with BAND-local stats, which drifts
        against the full-slide run and flickers between viewer windows;
        pin the global range (one ``probe=range`` request) to make every
        window normalize identically.  Overrides ``outlier``.

        ``use_pyramid``: at ``scale <= 0.5`` on a pyramidal (SubIFD)
        TIFF, decode the nearest stored level and apply only the
        residual resize — ~4x fewer decode bytes per octave; output is
        upscaled to the full-res contract.  Falls through to the normal
        paths when no usable level exists (non-TIFF, no SubIFDs,
        ``scale > 0.5``, or the level itself still exceeds the
        streaming bound); ``roi=`` requests ignore it.

        ``classes``: optional class-index subset — the response carries
        only those probability-map pages (same page-order contract:
        reversed request order).  The discard happens ON DEVICE on every
        path (``_build_slide`` / the streamed stripe program subset
        before the fetch), so a viewer that renders one PM pays 1/K of
        the device->host bytes as well as 1/K of the response bytes —
        on a 20k^2 3-class streamed slide that is ~2/3 of a ~1.2 GB
        D2H.  Each distinct subset compiles its own stripe program
        (bounded cache), the same tradeoff the whole-image engine
        already makes."""
        import contextlib

        from unmicst_tpu.infer import _normalize_in_range
        from unmicst_tpu.io.slides import open_channel_source, sniff_format

        if compress is True:  # pre-r3s5 boolean callers: True = deflate
            compress = "deflate"
        elif compress is False:
            compress = None
        fmt = sniff_format(path)
        if channel_names is not None:
            channels = _resolve_channel_names(path, fmt, channel_names)
        else:
            channels = (
                list(channel) if isinstance(channel, (list, tuple))
                else [channel]
            )
        if in_range is not None:
            if not rescale:
                raise ValueError("range= requires rescale on")
            # validated HERE so every downstream path (device, streamed,
            # roi) sees well-formed pairs — the streamed engine applies
            # stats unchecked
            in_range = _normalize_in_range(
                in_range, len(channels)
            ).tolist()
        with contextlib.ExitStack() as stack:
            srcs = [
                stack.enter_context(open_channel_source(path, fmt, c))
                for c in channels
            ]
            shape = (srcs[0].height, srcs[0].width)
            if any((s.height, s.width) != shape for s in srcs):
                raise ValueError("channel planes disagree on dimensions")
            if classes is not None:
                classes = tuple(int(c) for c in classes)
                if not classes:
                    raise ValueError(
                        "classes parameter present but empty; pass "
                        "0-based class indices, e.g. classes=1,2"
                    )
            if roi is not None:
                return self._infer_roi(
                    srcs, shape, model, roi, rescale, outlier,
                    compress=compress, scale=scale, pyramid=pyramid,
                    in_range=in_range,
                    slide_key=(
                        (slide_id, tuple(channels))
                        if slide_id is not None else None
                    ),
                    classes=classes,
                )
            if use_pyramid:
                # pyramid INPUT read (the CLI's --usePyramid, serve
                # spelling): at scale <= 0.5 decode the nearest stored
                # SubIFD level and run the whole engine with only the
                # residual resize — ~4x fewer decode bytes per octave.
                # Unusable inputs (no SubIFDs on every channel page,
                # scale > 0.5, level still above the streaming bound,
                # non-TIFF container) fall through to the normal
                # full-resolution paths, the CLI's posture.
                from unmicst_tpu.io import preprocess as _pp
                from unmicst_tpu.io.slides import (
                    pyramid_plan_multi, read_channel_level,
                )

                plan = pyramid_plan_multi(
                    path, fmt, channels, scale,
                    max_level_px=self.stream_above_px,
                )
                if plan is not None:
                    lvl, div, _full, _lshape = plan
                    raws = [read_channel_level(path, fmt, c, lvl)
                            for c in channels]
                    eff = scale * div
                    eng = self.engine(model)
                    t0 = time.perf_counter()
                    if len(raws) > 1:
                        maps = eng.infer_slide_stack(
                            raws, outlier=outlier, rescale=rescale,
                            scaling_factor=eff, in_range=in_range,
                            classes=classes,
                        )
                    else:
                        maps = eng.infer_slide(
                            raws[0], outlier=outlier, rescale=rescale,
                            scaling_factor=eff,
                            in_range=(
                                in_range[0] if in_range is not None
                                else None
                            ),
                            classes=classes,
                        )
                    infer_s = time.perf_counter() - t0
                    # level-resolution maps -> the full-res output
                    # contract every other path honors
                    maps = np.stack(
                        [_pp.upscale_pm(m, shape) for m in maps]
                    )
                    return self._encode(
                        maps, model, shape, shape[0] * shape[1],
                        infer_s, compress=compress, pyramid=pyramid,
                        in_range=in_range, class_indices=classes,
                    )
            if (scale > 1
                    and shape[0] * shape[1] * scale * scale
                    > self.max_scaled_px):
                # only UPSCALES amplify work/memory beyond what the same
                # slide at scale 1 already costs (downscales shrink the
                # net input, and the raw-resolution output maps are a
                # scale-independent property of the slide) — so the
                # bound applies to scale > 1 only, and huge slides at
                # scale <= 1 keep streaming as before
                raise ValueError(
                    f"scaled pixel count {shape[0] * shape[1]} x "
                    f"{scale}^2 exceeds the server bound "
                    f"{self.max_scaled_px}"
                )
            if shape[0] * shape[1] > self.stream_above_px:
                # mega-slide POST: bounded memory, windowed reads from the
                # spooled temp file.  t0 starts after engine lookup in both
                # branches so infer_s excludes first-request construction.
                eng = self.engine(model, "stream")
                t0 = time.perf_counter()
                if scale != 1:
                    # virtual resized slide + raw-resolution upscale at
                    # encode, exactly the CLI streaming contract
                    from unmicst_tpu.io import preprocess as _pp

                    ins = [_pp.ResampledSource(s, scale) for s in srcs]
                else:
                    ins = srcs
                # range= pins are raw-unit; at scale != 1 the sources
                # stream img_as_float units, so convert per source
                from unmicst_tpu.io.preprocess import (
                    pinned_to_source_units as _p2s,
                )

                if len(ins) > 1:
                    maps = eng.infer_stack(
                        ins, outlier=outlier, rescale=rescale,
                        classes=classes,
                        stats=(
                            [_p2s(tuple(p), s)
                             for p, s in zip(in_range, ins)]
                            if in_range is not None else None
                        ),
                    )
                else:
                    maps = eng.infer(
                        ins[0], outlier=outlier, rescale=rescale,
                        classes=classes,
                        stats=(
                            _p2s(tuple(in_range[0]), ins[0])
                            if in_range is not None else None
                        ),
                    )
                # maps already carries ONLY the requested classes (the
                # stripe program subsets on device before the fetch), so
                # dropped classes skip the D2H and the host-side resize
                if scale != 1:
                    maps = np.stack(
                        [_pp.upscale_pm(m, shape) for m in maps]
                    )
            else:
                raws = [s.read_rows(0, shape[0]) for s in srcs]
                # meta's infer_s/mpx_per_s time only engine work — not the
                # container decode above nor first-request engine
                # construction (same placement as the streaming branch)
                eng = self.engine(model)
                t0 = time.perf_counter()
                if len(raws) > 1:
                    maps = eng.infer_slide_stack(
                        raws, outlier=outlier, rescale=rescale,
                        scaling_factor=scale, in_range=in_range,
                        classes=classes,
                    )
                else:
                    maps = eng.infer_slide(
                        raws[0], outlier=outlier, rescale=rescale,
                        scaling_factor=scale,
                        in_range=(
                            in_range[0] if in_range is not None else None
                        ),
                        classes=classes,
                    )
            infer_s = time.perf_counter() - t0
        return self._encode(
            maps, model, shape, shape[0] * shape[1], infer_s,
            compress=compress, pyramid=pyramid, in_range=in_range,
            class_indices=classes,
        )

    def _infer_roi(self, srcs, shape, model: str, roi, rescale: bool,
                   outlier: float, compress: Optional[str] = None,
                   scale: float = 1.0, pyramid: bool = False,
                   in_range=None, slide_key=None,
                   classes=None) -> Tuple[bytes, dict]:
        """Windowed inference for ``roi=(r0, c0, h, w)``: read a window
        with one net-tile of context on ALL FOUR sides, infer it on the
        whole-image engine, trim to the ROI.

        The band is clipped in both axes — a 512^2 window of a
        100k-wide slide infers ~(512+2t)^2 pixels, not a 100k-wide row
        band (the row IO still reads full-width rows, which is how
        TIFF strips are laid out anyway; only the compute window
        shrinks).

        Band extents are snapped to the full-slide tile grid and
        bucketed to multiples of 2 sub-strides, which buys two things:
        (1) arbitrary viewer pans reuse a handful of compiled programs
        instead of paying a fresh 10-200 s XLA compile per window
        geometry, and (2) at ``scale == 1`` the band shares the
        full-slide grid origin, so a pinned ``range=`` makes EVERY ROI
        bit-identical to the full-run crop (not only luckily-aligned
        ones)."""
        r0, c0, h, w = (int(v) for v in roi)
        if not (0 <= r0 < shape[0] and 0 <= c0 < shape[1]
                and h > 0 and w > 0
                and r0 + h <= shape[0] and c0 + w <= shape[1]):
            raise ValueError(
                f"roi {roi} outside the {shape[0]}x{shape[1]} slide"
            )
        eng = self.engine(model)
        pad = int(eng.hp.im_size)
        sub = int(eng.hp.im_size) - 2 * int(eng.hp.margin)
        step = 2 * sub

        def expand(lo, hi, limit):
            # bucket size from the ROI extent ALONE (+ one sub-stride of
            # alignment slack): every same-sized window shares one band
            # geometry no matter where it pans, so the compiled-program
            # cache is hit instead of paying XLA per offset
            size = -(-(hi - lo + sub) // step) * step
            lo = (max(0, lo) // sub) * sub  # full-grid-aligned start
            hi = min(limit, lo + size)
            lo = max(0, hi - size)
            return (lo // sub) * sub, hi  # re-align after an end clip

        a, b = expand(r0 - pad, r0 + h + pad, shape[0])
        ca, cb = expand(c0 - pad, c0 + w + pad, shape[1])
        if (b - a) * (cb - ca) > self.stream_above_px:
            raise ValueError(
                f"roi window of {(b - a)}x{(cb - ca)} px (incl. context) "
                f"exceeds the windowed-inference bound "
                f"{self.stream_above_px}; request a smaller window or "
                "drop roi= to stream the whole slide"
            )
        plane = self._device_plane_for(slide_key, srcs, eng)
        if plane is not None:
            # cached-slide fast path: the band is dynamic_slice'd from
            # the pinned HBM plane — no read_rows, no per-pan H2D; the
            # traced offsets make every same-sized window one program.
            # trim= crops the maps to the ROI ON DEVICE too: only
            # h*w*K uint8 bytes ride D2H, not the whole context band
            # (the band fetch dominated the measured pan latency,
            # scripts/pan_latency_report.json)
            t0 = time.perf_counter()
            trim = (r0 - a, c0 - ca, h, w)
            if len(srcs) > 1:
                maps = eng.infer_slide_stack_device(
                    plane, a, ca, b - a, cb - ca, outlier=outlier,
                    rescale=rescale, scaling_factor=scale,
                    in_range=in_range, trim=trim, classes=classes,
                )
            else:
                maps = eng.infer_slide_device(
                    plane, a, ca, b - a, cb - ca, outlier=outlier,
                    rescale=rescale, scaling_factor=scale,
                    in_range=(
                        in_range[0] if in_range is not None else None
                    ),
                    trim=trim, classes=classes,
                )
            infer_s = time.perf_counter() - t0
            maps = np.ascontiguousarray(maps)
            self._count(device_pans=1)
        else:
            bands = [
                # read_rows takes (start, COUNT) — passing b read b rows
                # (zero-padded past EOF): correct pixels but an inflated
                # band and a fresh compile per offset
                np.ascontiguousarray(s.read_rows(a, b - a)[:, ca:cb])
                for s in srcs
            ]
            t0 = time.perf_counter()
            if len(bands) > 1:
                maps = eng.infer_slide_stack(
                    bands, outlier=outlier, rescale=rescale,
                    scaling_factor=scale, in_range=in_range,
                    classes=classes,
                )
            else:
                maps = eng.infer_slide(
                    bands[0], outlier=outlier, rescale=rescale,
                    scaling_factor=scale,
                    in_range=(
                        in_range[0] if in_range is not None else None
                    ),
                    classes=classes,
                )
            infer_s = time.perf_counter() - t0
            # host path infers the whole band: crop here (the device
            # path already returned the ROI crop via trim=)
            maps = np.ascontiguousarray(
                maps[:, r0 - a : r0 - a + h, c0 - ca : c0 - ca + w]
            )
        return self._encode(
            maps, model, (h, w), h * w, infer_s,
            compress=compress, pyramid=pyramid, in_range=in_range,
            class_indices=classes,
        )

    def probe_range(self, path: str, channel, outlier: float,
                    channel_names=None) -> dict:
        """Global per-channel rescale range of an upload, NO inference —
        one bounded-memory histogram pass per channel (the streaming
        engine's stats machinery, ``io/slides.py::_streamed_int_stats``).

        An interactive viewer calls this once per slide, then pins
        ``range=lo,hi`` on every ROI request so all windows normalize
        exactly like a full-slide run would."""
        import contextlib

        from unmicst_tpu.io.slides import open_channel_source, sniff_format

        fmt = sniff_format(path)
        if channel_names is not None:
            channels = _resolve_channel_names(path, fmt, channel_names)
        else:
            channels = (
                list(channel) if isinstance(channel, (list, tuple))
                else [channel]
            )
        with contextlib.ExitStack() as stack:
            srcs = [
                stack.enter_context(open_channel_source(path, fmt, c))
                for c in channels
            ]
            shape = (srcs[0].height, srcs[0].width)
            if any((s.height, s.width) != shape for s in srcs):
                raise ValueError("channel planes disagree on dimensions")
            return {
                "shape": list(shape),
                "outlier": outlier,
                "channels": channels,
                "range": [list(s.stats(outlier)) for s in srcs],
            }

    def _encode(self, maps, model: str, shape, raw_size: int,
                infer_s: float, compress: Optional[str] = None,
                pyramid: bool = False, in_range=None,
                class_indices=None) -> Tuple[bytes, dict]:
        from unmicst_tpu.io.tiff import TiffWriter

        buf = tempfile.NamedTemporaryFile(suffix=".tif", delete=False)
        buf.close()
        try:
            with TiffWriter(
                buf.name, bigtiff=True,
                compression=compress or None,
            ) as tw:
                for k in range(maps.shape[0] - 1, -1, -1):  # reversed order
                    if pyramid:
                        tw.write_pyramid(maps[k])
                    else:
                        tw.write(maps[k])
            with open(buf.name, "rb") as f:
                out = f.read()
        finally:
            os.unlink(buf.name)
        meta = {
            "model": model,
            "shape": list(shape),
            "classes": int(maps.shape[0]),
            "infer_s": round(infer_s, 3),
            "mpx_per_s": round(raw_size / 1e6 / infer_s, 2),
        }
        if class_indices is not None:
            # which class each response page is (reversed, like the
            # page order itself)
            meta["class_indices"] = [int(c) for c in class_indices]
        if in_range is not None:
            meta["in_range"] = [list(p) for p in in_range]
        return out, meta


def make_handler(server: ModelServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj: dict, headers: dict = None):
            blob = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/healthz":
                import jax

                self._json(200, {
                    "status": "ok",
                    "devices": [str(d) for d in jax.devices()],
                })
            elif url.path == "/stats":
                self._json(200, server.snapshot())
            elif url.path == "/models":
                from unmicst_tpu.cli import DEFAULT_MODEL_ROOTS
                from unmicst_tpu.models.zoo import available_models

                root = server.model_root or next(
                    (r for r in DEFAULT_MODEL_ROOTS if r and os.path.isdir(r)), ""
                )
                self._json(200, available_models(root) if root else {})
            else:
                self._json(404, {"error": "not found"})

        def do_DELETE(self):
            url = urlparse(self.path)
            if url.path.startswith("/slides/"):
                server._count(requests=1)
                sid = url.path[len("/slides/"):]
                if server.drop_slide(sid):
                    server._count(ok=1)
                    self._json(200, {"dropped": sid})
                else:
                    server._count(client_error=1)
                    self._json(404, {
                        "error": f"unknown slide id {sid!r}"
                    })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path == "/slides":
                server._count(requests=1)
                self._upload_slide(url)
                return
            if url.path != "/infer":
                self._json(404, {"error": "not found"})
                return
            server._count(requests=1)
            got_slot = (
                not server._zero_inflight
                and server._inflight.acquire(
                    timeout=server.queue_timeout_s
                )
            )
            if not got_slot:
                server._count(busy_rejected=1)
                # drain a bounded amount of the unread body first so the
                # client sees the 503 + Retry-After instead of a TCP RST
                # mid-upload (unread data on close resets the socket)
                try:
                    remaining = min(
                        int(self.headers.get("Content-Length", "0") or 0),
                        64 << 20,
                    )
                    while remaining > 0:
                        chunk = self.rfile.read(min(remaining, 1 << 20))
                        if not chunk:
                            break
                        remaining -= len(chunk)
                except (OSError, ValueError):
                    pass  # malformed header: still send the 503 below
                self._json(503, {
                    "error": f"server busy ({server.max_inflight} "
                    "requests in flight); retry later"
                }, headers={"Retry-After": "5"})
                return
            try:
                self._infer(url)
            finally:
                server._inflight.release()

        def _upload_slide(self, url):
            """POST /slides: spool the body (sha256 while spooling) and
            adopt it into the content-addressed cache -> {"slide_id"}.

            ``?prewarm=1&model=M&roi=H,W`` (plus the usual channel /
            channel_name / range / rescale / outlier / scale params)
            schedules a background worker that compiles all <=4 ``roi=``
            band geometries for that window size before the viewer's
            first pan — progress lands in ``/stats`` as ``prewarmed`` /
            ``prewarm_pending`` / ``prewarm_errors``."""
            import hashlib

            q = parse_qs(url.query)
            prewarm = None
            try:
                if _parse_bool(q.get("prewarm", ["0"])[0], "prewarm"):
                    model = q.get("model", ["nucleiDAPI"])[0]
                    if (os.path.isabs(model) or os.sep in model
                            or (os.altsep and os.altsep in model)
                            or ".." in model):
                        raise ValueError(
                            "model must be a plain model name"
                        )
                    if "roi" not in q:
                        raise ValueError(
                            "prewarm=1 requires roi=H,W (the pan "
                            "window size to compile for)"
                        )
                    parts = q["roi"][0].split(",")
                    if len(parts) == 1:
                        parts = parts * 2  # roi=512 -> square window
                    if len(parts) != 2:
                        raise ValueError(
                            f"prewarm roi must be H,W — got {q['roi'][0]!r}"
                        )
                    roi_h, roi_w = (int(v) for v in parts)
                    if roi_h <= 0 or roi_w <= 0:
                        raise ValueError(
                            f"prewarm roi must be positive, got "
                            f"{roi_h},{roi_w}"
                        )
                    chan_vals = [
                        int(x)
                        for v in q.get("channel", ["0"])
                        for x in v.split(",") if x != ""
                    ]
                    if not 1 <= len(chan_vals) <= 2:
                        raise ValueError(
                            "channel must be one index or two (duo)"
                        )
                    channel_names = q.get("channel_name")
                    if channel_names is not None and (
                            not all(channel_names)
                            or len(channel_names) > 2):
                        raise ValueError(
                            "channel_name must be 1-2 non-empty names"
                        )
                    in_range = None
                    if "range" in q:
                        in_range = []
                        for v in q["range"]:
                            lo_hi = v.split(",")
                            if len(lo_hi) != 2:
                                raise ValueError(
                                    f"range must be lo,hi — got {v!r}"
                                )
                            in_range.append(
                                (float(lo_hi[0]), float(lo_hi[1]))
                            )
                    scale = float(q.get("scale", ["1"])[0])
                    if not 0.01 <= scale <= 16:
                        raise ValueError(
                            f"scale must be in [0.01, 16], got {scale}"
                        )
                    prewarm = dict(
                        model=model, roi_h=roi_h, roi_w=roi_w,
                        channel=(chan_vals[0] if len(chan_vals) == 1
                                 else chan_vals),
                        rescale=_parse_bool(
                            q.get("rescale", ["1"])[0], "rescale"
                        ),
                        outlier=float(q.get("outlier", ["-1"])[0]),
                        scale=scale, in_range=in_range,
                        channel_names=channel_names,
                        classes=_parse_classes(q),
                    )
            except ValueError as e:
                server._count(client_error=1)
                self._json(400, {"error": f"bad parameter: {e}"})
                return

            length = int(self.headers.get("Content-Length", "0") or 0)
            if length <= 0:
                server._count(client_error=1)
                self._json(411, {"error": "Content-Length required"})
                return
            if length > server.max_body_bytes:
                server._count(client_error=1)
                self._json(413, {
                    "error": f"request body {length} B exceeds the "
                    f"{server.max_body_bytes} B limit"
                })
                return
            h = hashlib.sha256()
            tmp = tempfile.NamedTemporaryFile(
                suffix=".slide", delete=False
            )
            try:
                remaining = length
                while remaining:
                    chunk = self.rfile.read(min(remaining, 16 << 20))
                    if not chunk:
                        raise ConnectionError("client hung up mid-body")
                    h.update(chunk)
                    tmp.write(chunk)
                    remaining -= len(chunk)
                tmp.close()
                res = server.register_slide(
                    tmp.name, length, h.hexdigest()
                )
            except ConnectionError:
                tmp.close()
                os.unlink(tmp.name)
                server._count(client_error=1)
                return
            except Exception as e:  # noqa: BLE001 — surface, don't die
                tmp.close()
                try:
                    os.unlink(tmp.name)
                except OSError:
                    pass
                server._count(server_error=1)
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if prewarm is not None:
                res = dict(res, prewarm=server.schedule_prewarm(
                    res["slide_id"], **prewarm
                ))
            server._count(ok=1)
            self._json(200, res)

        def _infer(self, url):
            q = parse_qs(url.query)
            model = q.get("model", ["nucleiDAPI"])[0]
            if (os.path.isabs(model) or os.sep in model
                    or (os.altsep and os.altsep in model)
                    or ".." in model):
                # the model param reaches resolve_model_dir, which accepts
                # filesystem paths — remote clients must not traverse the
                # host filesystem or probe directories
                server._count(client_error=1)
                self._json(400, {
                    "error": "model must be a plain model name"
                })
                return
            try:
                rescale = _parse_bool(
                    q.get("rescale", ["1"])[0], "rescale"
                )
                # repeated channel params or "0,1" select a 2-channel
                # (duo) read
                chan_vals = [
                    int(x)
                    for v in q.get("channel", ["0"])
                    for x in v.split(",") if x != ""
                ]
                if not chan_vals:
                    server._count(client_error=1)
                    self._json(400, {
                        "error": "channel parameter present but empty; "
                        "pass one index or two (duo), e.g. channel=0,1"
                    })
                    return
                if len(chan_vals) > 2:
                    server._count(client_error=1)
                    self._json(400, {
                        "error": f"{len(chan_vals)} channels requested; "
                        "at most 2 (duo) are supported"
                    })
                    return
                channel = chan_vals[0] if len(chan_vals) == 1 else chan_vals
                channel_names = q.get("channel_name")
                if channel_names is not None:
                    if not all(channel_names):
                        raise ValueError(
                            "channel_name parameter present but empty"
                        )
                    if len(channel_names) > 2:
                        raise ValueError(
                            f"{len(channel_names)} channel names "
                            "requested; at most 2 (duo) are supported"
                        )
                outlier = float(q.get("outlier", ["-1"])[0])
                if outlier != -1 and not 0 <= outlier <= 100:
                    # jitted jnp.percentile silently clamps/NaN-propagates
                    # out-of-range q; the streamed path raises — make both
                    # a 400 at the door
                    raise ValueError(
                        f"outlier must be -1 or in [0, 100], got {outlier}"
                    )
                compress = _parse_compress(q.get("compress", ["0"])[0])
                scale = float(q.get("scale", ["1"])[0])
                pyramid = _parse_bool(
                    q.get("pyramid", ["0"])[0], "pyramid"
                )
                use_pyramid = _parse_bool(
                    q.get("usePyramid", ["0"])[0], "usePyramid"
                )
                roi = None
                if "roi" in q:
                    parts = q["roi"][0].split(",")
                    if len(parts) != 4:
                        raise ValueError(
                            f"roi must be r0,c0,h,w — got {q['roi'][0]!r}"
                        )
                    roi = tuple(int(v) for v in parts)
                classes = _parse_classes(q)
                in_range = None
                if "range" in q:
                    in_range = []
                    for v in q["range"]:
                        parts = v.split(",")
                        if len(parts) != 2:
                            raise ValueError(
                                f"range must be lo,hi — got {v!r}"
                            )
                        in_range.append(
                            (float(parts[0]), float(parts[1]))
                        )
                probe = q.get("probe", [None])[0]
                if probe is not None and probe != "range":
                    raise ValueError(
                        f"probe supports only 'range', got {probe!r}"
                    )
                slide_id = q.get("slide", [None])[0]
                if slide_id is not None and (
                        not slide_id
                        or any(c not in "0123456789abcdef"
                               for c in slide_id)):
                    raise ValueError(
                        f"slide must be a hex id from POST /slides, "
                        f"got {slide_id!r}"
                    )
                if not 0.01 <= scale <= 16:
                    raise ValueError(
                        f"scale must be in [0.01, 16], got {scale}"
                    )
                length = int(self.headers.get("Content-Length", "0"))
            except ValueError as e:
                server._count(client_error=1)
                self._json(400, {"error": f"bad parameter: {e}"})
                return
            if slide_id is not None and length > 0:
                server._count(client_error=1)
                self._json(400, {
                    "error": "pass either a body or slide=, not both"
                })
                return
            if slide_id is None and length <= 0:
                server._count(client_error=1)
                self._json(411, {"error": "Content-Length required"})
                return
            if length > server.max_body_bytes:
                server._count(client_error=1)
                self._json(413, {
                    "error": f"request body {length} B exceeds the "
                    f"{server.max_body_bytes} B limit"
                })
                return

            def run_on(path):
                if probe == "range":
                    res = server.probe_range(
                        path, channel, outlier,
                        channel_names=channel_names,
                    )
                    return None, {"model": model, "shape": res["shape"],
                                  "infer_s": 0.0}, res
                out, meta = server.infer_tiff_path(
                    path, model, channel, rescale, outlier,
                    compress=compress, scale=scale,
                    pyramid=pyramid, roi=roi, in_range=in_range,
                    channel_names=channel_names, slide_id=slide_id,
                    classes=classes, use_pyramid=use_pyramid,
                )
                return out, meta, None

            try:
                if slide_id is not None:
                    # body-less request against a cached upload — the
                    # interactive-viewer fast path (the slide rides the
                    # wire once, every roi= window after that is bytes
                    # of query string)
                    path = server.acquire_slide(slide_id)
                    try:
                        out, meta, probe_res = run_on(path)
                    finally:
                        server.release_slide(slide_id)
                    server._count(slide_hits=1)
                else:
                    # spool to disk in chunks: a whole-slide POST must
                    # not occupy RAM twice (body + decoded pixels).
                    # ONLY the spool loop treats ConnectionError as a
                    # client hangup — one from inside inference is a
                    # server fault
                    with tempfile.NamedTemporaryFile(suffix=".tif") as tmp:
                        try:
                            remaining = length
                            while remaining:
                                chunk = self.rfile.read(
                                    min(remaining, 16 << 20)
                                )
                                if not chunk:
                                    raise ConnectionError(
                                        "client hung up mid-body"
                                    )
                                tmp.write(chunk)
                                remaining -= len(chunk)
                            tmp.flush()
                        except ConnectionError:
                            # nothing to write a response to, and not a
                            # server fault
                            server._count(client_error=1)
                            return
                        out, meta, probe_res = run_on(tmp.name)
            except FileNotFoundError as e:
                server._count(client_error=1)
                self._json(404, {"error": str(e)})
                return
            except (ValueError, NotImplementedError, IndexError,
                    EOFError) as e:
                # bad upload: unrecognized/corrupt container, unsupported
                # codec, a channel the file doesn't have, or a
                # truncated stream (EOFError is in the parser contract)
                server._count(client_error=1)
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            except Exception as e:  # surface, don't kill the server
                server._count(server_error=1)
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if out is None:  # probe=range: JSON stats, no pixels inferred
                server._count(ok=1, by_model=meta["model"])
                self._json(200, probe_res)
                return
            server._count(
                ok=1, px_processed=meta["shape"][0] * meta["shape"][1],
                infer_s_total=meta["infer_s"], by_model=meta["model"],
            )
            self.send_response(200)
            self.send_header("Content-Type", "image/tiff")
            self.send_header("Content-Length", str(len(out)))
            self.send_header("X-UnMicst-Meta", json.dumps(meta))
            self.end_headers()
            self.wfile.write(out)

    return Handler


def serve(host: str = "0.0.0.0", port: int = 8800, preload=None,
          **kw) -> None:
    import signal

    server = ModelServer(**kw)
    # --preload: pay checkpoint load + device placement BEFORE the port
    # opens, so the first request of each named model is compile-only
    # (and a bad model name fails the deploy loudly, not request #1)
    for name in (preload or []):
        t0 = time.perf_counter()
        server.engine(name)
        print(f"preloaded {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)
    httpd = ThreadingHTTPServer((host, port), make_handler(server))
    # graceful drain: stop accepting on SIGTERM/SIGINT, finish in-flight
    # requests (ThreadingHTTPServer joins non-daemon handler threads in
    # server_close), then return
    httpd.daemon_threads = False

    def _drain(signum, frame):
        print(f"signal {signum}: draining in-flight requests...")
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _drain)
        except ValueError:
            pass  # non-main thread (tests)
    # report the BOUND port (port=0 asks the OS to pick)
    print(f"unmicst-tpu serving on {host}:{httpd.server_address[1]}",
          flush=True)
    try:
        httpd.serve_forever()
    finally:
        httpd.server_close()
    print("drained; bye")


def main(argv=None) -> int:
    from unmicst_tpu.utils.compcache import enable as enable_cache

    enable_cache()  # a server restart must not re-pay 10-200 s compiles

    import argparse

    p = argparse.ArgumentParser(prog="unmicst-tpu-serve")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8800)
    p.add_argument("--modelRoot")
    p.add_argument(
        "--precision", choices=["float32", "highest", "bfloat16", "int8"],
        default="float32",  # parity mode (<=1 uint8 level); bf16/int8 = fast
    )
    p.add_argument(
        "--maxBodyBytes", type=int, default=2 << 30,
        help="reject request bodies beyond this size (HTTP 413)",
    )
    p.add_argument(
        "--calibrationPercentile", type=float, default=99.99,
        help="int8 activation-scale clipping percentile; 99.99 is "
        "hot-pixel-robust, 100 suits curated clean inputs "
        "(BASELINE.md int8 section)",
    )
    def _positive(v):
        iv = int(v)
        if iv < 1:
            raise argparse.ArgumentTypeError(
                "--maxInflight must be >= 1"
            )
        return iv

    p.add_argument(
        "--maxInflight", type=_positive, default=4,
        help="concurrent /infer bound (>= 1); excess gets 503 + "
        "Retry-After",
    )
    p.add_argument(
        "--slideCacheBytes", type=int, default=4 << 30,
        help="byte bound of the POST /slides content-addressed cache "
        "(LRU eviction; viewers upload once, then issue body-less "
        "slide=ID requests)",
    )
    p.add_argument(
        "--deviceSlideBytes", type=int, default=2 << 30,
        help="HBM byte bound for device-RESIDENT cached-slide planes: "
        "roi= pans against slide=ID cut their band on-device (zero "
        "per-pan host->device pixel traffic). 0 disables",
    )
    p.add_argument(
        "--preload", default=None,
        help="comma-separated model names to construct at startup "
        "(checkpoint load + device placement) before the port opens — "
        "the first request then pays only the geometry compile, and a "
        "bad name fails the deploy instead of request #1",
    )
    args = p.parse_args(argv)
    serve(args.host, args.port, model_root=args.modelRoot,
          precision=args.precision, max_body_bytes=args.maxBodyBytes,
          max_inflight=args.maxInflight,
          calibration_percentile=args.calibrationPercentile,
          slide_cache_bytes=args.slideCacheBytes,
          device_slide_bytes=args.deviceSlideBytes,
          preload=(args.preload.split(",") if args.preload else None))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
