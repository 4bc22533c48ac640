"""Batch slide sweeps — the ``batchUnMicst.py`` successor, resumable + shardable.

Reference behavior (``batchUnMicst.py:533-588``): set up the model once,
glob ``<root>/exemplar*``, per sample take ``dearray/*.tif`` minus
``TMA_MAP.tif`` (``--TMA``) or ``registration/*ome.tif``, run per-class
inference, write ``prob_maps/<stem>_{ContoursPM,NucleiPM}_<chan+1>.tif``.
(The lab-path variants ``batchUNet2DtCycif.py:507-553`` /
``batchUNet2DTMACycif.py:507-594`` are the same loop with hard-coded roots.)

TPU rebuild additions (SURVEY #5 failure-detection row):

* one engine, one compile, all slides; all classes in one pass;
* a JSON cursor file per output dir makes sweeps resumable after
  preemption (slides already finished are skipped);
* multi-host sharding: with ``shard_index/num_shards`` each process takes
  every N-th slide — the work-queue analogue of slide-level DP over DCN;
* per-slide failures are recorded and skipped, not fatal (the reference
  aborts the whole sweep).
"""

from __future__ import annotations

import fnmatch
import json
import os
import time
import traceback
from dataclasses import dataclass, field
from typing import List, Optional, Union

import numpy as np


@dataclass
class BatchReport:
    completed: List[str] = field(default_factory=list)
    skipped: List[str] = field(default_factory=list)
    failed: List[str] = field(default_factory=list)
    mpx_total: float = 0.0
    wall_s: float = 0.0


def discover_slides(
    root: str, tma: bool = False, sample_glob: str = "exemplar*"
) -> List[str]:
    """Slide discovery (``batchUnMicst.py:548-556``)."""
    slides: List[str] = []
    for sample in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        if not fnmatch.fnmatch(sample, sample_glob):
            continue
        sample_dir = os.path.join(root, sample)
        if tma:
            sub = os.path.join(sample_dir, "dearray")
            if os.path.isdir(sub):
                for f in sorted(os.listdir(sub)):
                    # TMA_MAP exclusion: batchUnMicst.py:553
                    if f.endswith(".tif") and f != "TMA_MAP.tif":
                        slides.append(os.path.join(sub, f))
        else:
            sub = os.path.join(sample_dir, "registration")
            if os.path.isdir(sub):
                for f in sorted(os.listdir(sub)):
                    if f.endswith("ome.tif"):
                        slides.append(os.path.join(sub, f))
    return slides


def _cursor_path(out_dir: str, shard_index: int = 0) -> str:
    # per-shard cursor files: concurrent shards sweeping into one output
    # dir never rewrite each other's completion records
    suffix = f".{shard_index}" if shard_index else ""
    return os.path.join(out_dir, f".unmicst-tpu-cursor{suffix}.json")


def _load_done(out_dir: str) -> set:
    """Union of every shard's completion records in this output dir."""
    import glob as _glob

    done = set()
    for path in _glob.glob(os.path.join(out_dir, ".unmicst-tpu-cursor*.json")):
        try:
            with open(path) as f:
                done.update(json.load(f).get("done", []))
        except (OSError, ValueError):
            pass
    return done


def _save_cursor(out_dir: str, cursor: dict, shard_index: int = 0) -> None:
    path = _cursor_path(out_dir, shard_index)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cursor, f)
    os.replace(tmp, path)


def _record_done(my_done: dict, done_cache: dict, out_dir: str,
                 shard_index: int, slide: str) -> None:
    """Append a completed slide to this shard's resumable cursor file."""
    if out_dir not in my_done:
        # seed with this shard's prior records so a resumed run
        # doesn't truncate its own cursor file
        try:
            with open(_cursor_path(out_dir, shard_index)) as f:
                my_done[out_dir] = list(json.load(f).get("done", []))
        except (OSError, ValueError):
            my_done[out_dir] = []
    my_done[out_dir].append(slide)
    done_cache.setdefault(out_dir, set()).add(slide)
    _save_cursor(out_dir, {"done": my_done[out_dir]}, shard_index)


def run_sweep(
    slides: List[str],
    model_dir: str,
    out_dir: Optional[str] = None,
    *,
    channel: int = 0,
    channel_name=None,
    scaling_factor: float = 1.0,
    outlier: float = -1,
    mean: float = -1,
    std: float = -1,
    compute_dtype=None,
    precision: Optional[str] = None,
    tile_batch: Optional[int] = None,
    shard_index: int = 0,
    num_shards: int = 1,
    resume: bool = True,
    verbose: bool = True,
    stream_above_px: int = 64_000_000,
    compress_output: Union[bool, str, None] = False,
    pyramid_output: bool = False,
    in_range=None,
    mesh=None,
    use_pyramid: bool = False,
) -> BatchReport:
    """Run the sweep over this shard's slides; resumable via cursor file.

    Slides above ``stream_above_px`` pixels go through the bounded-memory
    :class:`~unmicst_tpu.runtime.pipeline.StreamingEngine` (the CLI's auto
    policy) instead of being materialized whole — at any scalingFactor
    (off-scale mega-slides stream against a virtual resized source and the
    maps upscale back at write).  Both engines share one MXU precision:
    the CLI's parity default (HIGH) unless overridden.

    ``in_range``: optional pinned (lo, hi) intensity-rescale range in raw
    pixel units, applied to EVERY slide of the sweep instead of each
    slide's own min/max|percentile — TMA cores or serial sections from
    one scan then normalize identically (the reference normalizes
    strictly per image); overrides ``outlier``.

    ``channel_name``: select the channel by its declared OME name,
    resolved PER SLIDE (channel order may differ between files); slides
    without the name fail individually (``report.failed``) while the
    sweep continues.  Output suffixes carry the resolved index.

    ``mesh``: a ``jax.sharding.Mesh`` with a ``data`` axis — streamed
    slides then column-shard every stripe over it (multi-chip halo
    inference, ``runtime/pipeline.py::infer_sharded``); the CLI's
    ``--engine sharded`` builds one via ``runtime.mesh.make_mesh``.
    """
    import functools

    from unmicst_tpu.core.checkpoint import load_params_for_bundle
    from unmicst_tpu.core.hp import load_model_dir
    from unmicst_tpu.infer import InferenceEngine
    from unmicst_tpu.io import preprocess as pp
    from unmicst_tpu.io.tiff import imwrite as _imwrite
    from unmicst_tpu.runtime.pipeline import StreamingEngine

    # compress_output: True/"deflate" -> deflate, "zstd" -> zstd
    codec = ("deflate" if compress_output is True else
             compress_output or None)
    imwrite = functools.partial(_imwrite, compression=codec,
                                pyramid=pyramid_output)

    if in_range is not None:
        from unmicst_tpu.infer import _normalize_in_range

        in_range = tuple(_normalize_in_range(in_range, 1)[0])

    bundle = load_model_dir(model_dir, mean, std)
    params = load_params_for_bundle(bundle)
    if precision is None and compute_dtype is None:
        precision = "high"  # the CLI parity default (cli.precision_mode)
    engine = InferenceEngine.from_bundle(
        bundle, params, compute_dtype=compute_dtype, precision=precision,
        tile_batch=tile_batch,
    )
    stream_engine = StreamingEngine.from_bundle(
        bundle, params, compute_dtype=compute_dtype, precision=precision,
        tile_batch=tile_batch,
    )

    if not 0 <= shard_index < num_shards:
        # an out-of-range index would silently drop some slides and
        # double-process others (overlapping strided views)
        raise ValueError(
            f"shard_index {shard_index} out of range for "
            f"{num_shards} shard(s)"
        )
    if bundle.hp.n_classes < 3:
        # the sweep writes the hardcoded contour+nuclei planes (classes
        # 1, 2); fail before reading any slide, not per slide after
        raise ValueError(
            f"batch sweeps need a 3-class model (contours+nuclei); "
            f"{os.path.basename(model_dir)} has {bundle.hp.n_classes}"
        )

    report = BatchReport()
    t_start = time.perf_counter()
    my_done: dict = {}
    done_cache: dict = {}  # other shards' records matter only at startup
    my_slides = slides[shard_index::num_shards]
    for slide in my_slides:
        slide_dir = os.path.dirname(slide)
        this_out = out_dir or os.path.join(os.path.dirname(slide_dir), "prob_maps")
        os.makedirs(this_out, exist_ok=True)
        if resume:
            if this_out not in done_cache:
                done_cache[this_out] = _load_done(this_out)
            done = done_cache[this_out]
        else:
            done = set()
        if slide in done:
            report.skipped.append(slide)
            continue
        stem = os.path.basename(slide).split(os.extsep, 1)[0]
        try:
            from unmicst_tpu.io.slides import (
                open_channel_source, preview_u8, tiff_plane,
            )
            from unmicst_tpu.io.tiff import TiffFile

            chan = channel
            if channel_name is not None:
                # resolved PER SLIDE (channel order may differ between
                # files of one sweep); unresolvable names land in
                # report.failed like any other per-slide fault
                from unmicst_tpu.io.slides import resolve_channel_names

                chan = resolve_channel_names(
                    slide, "tif", [channel_name]
                )[0]
            if use_pyramid and scaling_factor <= 0.5 and mesh is None:
                # pyramid INPUT read (the CLI's --usePyramid, per slide):
                # decode the nearest stored SubIFD level instead of the
                # full-res plane — ~4x fewer decode bytes per octave,
                # and a mega-slide whose level fits the whole engine
                # skips streaming entirely.  No usable level (flat file,
                # scale > 0.5, level still too big) falls through to the
                # normal paths below; mesh sweeps stream by design.
                from unmicst_tpu.io.slides import (
                    pyramid_plan_multi, read_channel_level,
                )

                plan = pyramid_plan_multi(
                    slide, "tif", [chan], scaling_factor,
                    max_level_px=stream_above_px,
                )
                if plan is not None:
                    lvl, div, full_shape, _lshape = plan
                    lvl_raw = read_channel_level(slide, "tif", chan, lvl)
                    t0 = time.perf_counter()
                    contours, nuclei = engine.infer_slide(
                        lvl_raw, outlier=outlier, classes=(1, 2),
                        scaling_factor=scaling_factor * div,
                        in_range=in_range,
                    )
                    # full-res output contract, like the CLI's pyr path
                    contours = pp.upscale_pm(contours, full_shape)
                    nuclei = pp.upscale_pm(nuclei, full_shape)
                    preview = pp.upscale_pm(
                        pp.preview_u8_from_raw(lvl_raw), full_shape
                    )
                    dt = time.perf_counter() - t0
                    cfile = os.path.join(
                        this_out, f"{stem}_ContoursPM_{chan + 1}.tif"
                    )
                    imwrite(cfile, contours)
                    imwrite(cfile, preview, append=True)
                    imwrite(
                        os.path.join(
                            this_out, f"{stem}_NucleiPM_{chan + 1}.tif"
                        ),
                        nuclei,
                    )
                    mpx = full_shape[0] * full_shape[1] / 1e6
                    report.mpx_total += mpx
                    report.completed.append(slide)
                    _record_done(
                        my_done, done_cache, this_out, shard_index, slide
                    )
                    if verbose:
                        print(
                            f"[sweep {shard_index}/{num_shards}] {slide} "
                            f"(pyramid 1/{div}): {mpx:.1f} Mpx in "
                            f"{dt:.2f}s"
                        )
                    continue
            with TiffFile(slide) as tf_probe:
                page = tf_probe.pages[tiff_plane(tf_probe, chan)]
                slide_px = page.height * page.width
                # streamed stats need an exact integer histogram (the CLI
                # applies the same gate); other dtypes take the whole
                # path, which handles any dtype under rescale
                page_dtype = np.dtype(page.dtype)
                streamable = (
                    np.dtype(np.uint16) if page_dtype == np.float32
                    else page_dtype
                ) in (np.dtype(np.uint8), np.dtype(np.uint16),
                      np.dtype(np.int16))
            if (slide_px > stream_above_px or mesh is not None) \
                    and streamable:
                # mega-slide: bounded memory end to end (any scale — the
                # virtual resized source streams off-scale slides too)
                t0 = time.perf_counter()
                with open_channel_source(slide, "tif", chan) as src:
                    if scaling_factor == 1:
                        # one histogram pass serves the rescale range AND
                        # the preview max (one less full-slide read)
                        lo_s, hi_s, vm_s = src.stats(outlier, with_max=True)
                        if mesh is not None:
                            contours, nuclei = stream_engine.infer_sharded(
                                src, mesh, outlier=outlier, classes=(1, 2),
                                stats=in_range or (lo_s, hi_s),
                            )
                        else:
                            contours, nuclei = stream_engine.infer(
                                src, outlier=outlier, classes=(1, 2),
                                stats=in_range or (lo_s, hi_s),
                            )
                        raw_norm8 = preview_u8(src, vmax=vm_s)
                    else:
                        net_src = pp.ResampledSource(src, scaling_factor)
                        # raw-unit pin -> img_as_float source units
                        s_stats = pp.pinned_to_source_units(
                            in_range, net_src
                        )
                        if mesh is not None:
                            contours, nuclei = stream_engine.infer_sharded(
                                net_src, mesh, outlier=outlier,
                                classes=(1, 2), stats=s_stats,
                            )
                        else:
                            contours, nuclei = stream_engine.infer(
                                net_src, outlier=outlier, classes=(1, 2),
                                stats=s_stats,
                            )
                        raw_shape = (src.height, src.width)
                        contours = pp.upscale_pm(contours, raw_shape)
                        nuclei = pp.upscale_pm(nuclei, raw_shape)
                        raw_norm8 = preview_u8(src)
                dt = time.perf_counter() - t0
                cfile = os.path.join(
                    this_out, f"{stem}_ContoursPM_{chan + 1}.tif"
                )
                imwrite(cfile, contours)
                imwrite(cfile, raw_norm8, append=True)
                imwrite(
                    os.path.join(
                        this_out, f"{stem}_NucleiPM_{chan + 1}.tif"
                    ),
                    nuclei,
                )
                mpx = slide_px / 1e6
                report.mpx_total += mpx
                report.completed.append(slide)
                _record_done(
                    my_done, done_cache, this_out, shard_index, slide
                )
                if verbose:
                    print(
                        f"[sweep {shard_index}/{num_shards}] {slide} "
                        f"(streamed): {mpx / dt:.1f} Mpx/s"
                    )
                continue
            from unmicst_tpu.io.slides import read_channel

            raw = read_channel(slide, "tif", chan)  # OME-plane-aware
            t0 = time.perf_counter()
            # device-side preprocess + uint8 maps: the link carries
            # raw uint16 up and 2 uint8 planes down (~3x less than the
            # f32 host path); any scalingFactor (the resize and map
            # upscale-back ride the same jitted program)
            contours, nuclei = engine.infer_slide(
                raw, outlier=outlier, classes=(1, 2),
                scaling_factor=scaling_factor, in_range=in_range,
            )
            preview = pp.preview_u8_from_raw(raw)  # parity-casts float32
            dt = time.perf_counter() - t0
            # batch walker output contract (batchUnMicst.py:570-587):
            # ContoursPM is a 2-page stack [contours PM, normalized raw]
            cfile = os.path.join(this_out, f"{stem}_ContoursPM_{chan + 1}.tif")
            imwrite(cfile, contours)
            imwrite(cfile, preview, append=True)
            imwrite(
                os.path.join(this_out, f"{stem}_NucleiPM_{chan + 1}.tif"),
                nuclei,
            )
            mpx = raw.shape[0] * raw.shape[1] / 1e6
            report.mpx_total += mpx
            report.completed.append(slide)
            _record_done(my_done, done_cache, this_out, shard_index, slide)
            if verbose:
                print(f"[sweep] {slide}: {mpx:.1f} Mpx in {dt:.2f}s")
        except Exception:
            report.failed.append(slide)
            if verbose:
                print(f"[sweep] FAILED {slide}\n{traceback.format_exc()}")
    report.wall_s = time.perf_counter() - t_start
    return report


def batch_main(argv=None) -> int:
    """CLI for sweeps — the ``batchUnMicst.py`` surface, modernized.

    ``unmicst-tpu-batch ROOT --model M [--TMA] [--channel N] ...``
    """
    from unmicst_tpu.utils.compcache import enable as enable_cache

    enable_cache()  # sweeps re-invoked per shard share compiled programs
    import argparse

    p = argparse.ArgumentParser(prog="unmicst-tpu-batch")
    p.add_argument("imagePath", help="root containing exemplar*/ sample dirs")
    p.add_argument("--model", default="nucleiDAPI")
    p.add_argument("--modelRoot")
    p.add_argument("--outputPath", help="override per-sample prob_maps dirs")
    p.add_argument("--TMA", action="store_true", help="dearray/*.tif layout")
    p.add_argument("--channel", type=int, default=0, help="0-based channel")
    p.add_argument("--channelName", metavar="NAME",
                   help="select the channel by its declared name per "
                   "slide (OME-XML Channel elements) instead of a fixed "
                   "index; takes precedence over --channel; slides "
                   "without that name fail individually and are "
                   "recorded, the sweep continues")
    p.add_argument("--scalingFactor", type=float, default=1)
    p.add_argument("--outlier", type=float, default=-1)
    p.add_argument("--mean", type=float, default=-1)
    p.add_argument("--std", type=float, default=-1)
    p.add_argument("--shardIndex", type=int, default=0)
    p.add_argument("--numShards", type=int, default=1)
    p.add_argument("--noResume", action="store_true")
    p.add_argument("--precision", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--compressOutput", nargs="?", const="deflate",
                   default=None, choices=["deflate", "zstd"],
                   help="compress output TIFF pages (bare flag = deflate)")
    p.add_argument("--usePyramid", action="store_true",
                   help="with --scalingFactor <= 0.5: decode the nearest "
                   "stored SubIFD level per slide instead of full res "
                   "(falls through per slide when no usable level)")
    p.add_argument("--pyramidOutput", action="store_true",
                   help="write tiled SubIFD-pyramid output pages")
    p.add_argument("--intensityRange", metavar="LO,HI",
                   help="pin one intensity-rescale range (raw pixel "
                   "units) for EVERY slide of the sweep — TMA cores or "
                   "serial sections from one scan normalize identically "
                   "instead of per-image; overrides --outlier")
    p.add_argument("--engine", choices=["auto", "sharded"], default="auto",
                   help="sharded: stream every (streamable) slide with "
                   "its stripes column-sharded over the device mesh "
                   "(multi-chip halo inference)")
    p.add_argument("--meshShape", type=int, metavar="N",
                   help="with --engine sharded: devices along the "
                   "column-shard axis (default: every visible device)")
    args = p.parse_args(argv)

    in_range = None
    if args.intensityRange:
        parts = args.intensityRange.split(",")
        try:
            if len(parts) != 2:
                raise ValueError(
                    f"expected LO,HI — got {args.intensityRange!r}"
                )
            in_range = (float(parts[0]), float(parts[1]))
        except ValueError as e:
            raise SystemExit(f"--intensityRange: {e}")

    import jax.numpy as jnp

    from unmicst_tpu.cli import resolve_model_dir

    mesh = None
    if args.engine == "sharded":
        if args.usePyramid:
            # mirror the single-image CLI's posture (cli.py): pyramid
            # input decodes a stored level whole — it does not combine
            # with the column-sharded streaming engine.  Silent
            # fall-through would quietly run 4-21x slower decodes.
            raise SystemExit(
                "--usePyramid decodes stored levels whole (the whole "
                "engine); it does not combine with --engine sharded"
            )
        from unmicst_tpu.runtime.mesh import make_mesh

        mesh = make_mesh(data=args.meshShape or None, model=1)

    slides = discover_slides(args.imagePath, tma=args.TMA)
    if not slides:
        print(f"no slides found under {args.imagePath}")
        return 1
    report = run_sweep(
        slides,
        resolve_model_dir(args.model, args.modelRoot),
        args.outputPath,
        channel=args.channel,
        channel_name=args.channelName,
        scaling_factor=args.scalingFactor,
        outlier=args.outlier,
        mean=args.mean,
        std=args.std,
        compute_dtype=jnp.bfloat16 if args.precision == "bfloat16" else None,
        shard_index=args.shardIndex,
        num_shards=args.numShards,
        resume=not args.noResume,
        compress_output=args.compressOutput,
        pyramid_output=args.pyramidOutput,
        in_range=in_range,
        mesh=mesh,
        use_pyramid=args.usePyramid,
    )
    print(
        f"[sweep] done: {len(report.completed)} completed, "
        f"{len(report.skipped)} skipped, {len(report.failed)} failed, "
        f"{report.mpx_total:.1f} Mpx in {report.wall_s:.1f}s"
    )
    return 2 if report.failed else 0


def deploy_folder(
    im_path: str,
    n_images: int,
    model_dir: str,
    pm_path: str,
    pm_index: int = 1,
    mean: float = -1,
    std: float = -1,
) -> None:
    """``UNet2D.deploy`` equivalent (``UnMicst.py:417-487``): run the net on
    ``I%05d_Img.tif`` crops and write ``I%05d_{Im,PM}.png`` pairs."""
    from PIL import Image

    import jax.numpy as jnp

    from unmicst_tpu.core import unet
    from unmicst_tpu.core.checkpoint import load_params_for_bundle
    from unmicst_tpu.core.hp import load_model_dir
    from unmicst_tpu.io import preprocess as pp
    from unmicst_tpu.io.tiff import imread

    bundle = load_model_dir(model_dir, mean, std)
    params = load_params_for_bundle(bundle)
    hp = bundle.hp
    os.makedirs(pm_path, exist_ok=True)
    import jax

    fwd = jax.jit(
        # the repo-wide parity default (CLI/sweep use the same HIGH mode)
        lambda p, x: unet.apply(p, x, hp, bundle.variant, precision="high")
    )
    for i in range(n_images):
        im = pp.im2double(imread(os.path.join(im_path, f"I{i:05d}_Img.tif")))
        x = ((im - bundle.mean) / bundle.std).astype(np.float32)
        # reference deploy zero-fills channels >= 1 (UnMicst.py:435-445:
        # Data = np.zeros(...); Data[..., 0] = im) — NOT a broadcast
        zx = np.zeros((1,) + x.shape + (hp.n_channels,), np.float32)
        zx[..., 0] = x
        x = zx
        probs = np.asarray(fwd(params, jnp.asarray(x)))[0]
        norm = (im - im.min()) / max(im.max() - im.min(), 1e-12)
        Image.fromarray(np.uint8(255 * np.sqrt(norm))).save(
            os.path.join(pm_path, f"I{i + 1:05d}_Im.png")
        )
        Image.fromarray(np.uint8(255 * probs[..., pm_index])).save(
            os.path.join(pm_path, f"I{i + 1:05d}_PM.png")
        )
