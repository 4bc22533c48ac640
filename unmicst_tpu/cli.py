"""Unified CLI — the ``unmicstWrapper.py`` surface without the exec hop.

The reference dispatches via ``os.execvp`` to four near-identical scripts
(``unmicstWrapper.py:40-90``); here every tool is a code path over the same
engine, and inference runs **once** for all classes (the reference re-runs
the full network per output class, ``UnMicst.py:651-677``).

Flag surface (1-based channels/classOrder exactly like the wrapper,
``unmicstWrapper.py:6-22``; ``--GPU`` is a 0-based device index with -1 =
auto-pick, the upstream ``UnMicst.py:577-595`` semantics)::

    unmicst-tpu IMAGE --tool {unmicst-solo,unmicst-duo,unmicst-legacy,
                              UnMicstCyto2}
        --model M --outputPath P --channel N [N2] --classOrder A B C
        --mean F --std F --scalingFactor F --stackOutput --GPU N
        --outlier F --verbose

Framework additions: ``--modelRoot`` (zoo location), ``--precision``
(float32 parity | bfloat16 TPU fast path), ``--tileBatch``, ``--stats``.

Output contract parity (verified against the reference sources):

* solo/duo/legacy: ``<stem>_Probabilities_<chan+1>.tif`` (reversed
  classOrder pages) + ``qc/<stem>_Preview_<chan+1>.tif``; without
  ``--stackOutput``: ``<stem>_ContoursPM_<chan+1>.tif`` (2 pages: PM, raw)
  and ``<stem>_NucleiPM_<chan+1>.tif`` (``UnMicst1-5.py:845-875``)
* Cyto2 deviates: 0-based channel suffix, Preview beside the maps (not
  under ``qc/``) (``UnMicstCyto2.py`` output block), and NO
  float32->uint16 parity cast (alone among the tools, UnMicstCyto2.py
  reads float input as-is — ``preprocess_channel(cast_float32=False)``;
  float32 cyto slides always take the host path)
* legacy/duo/cyto2 parse the file stem at the first dot
  (``fileName.split(os.extsep, 1)``, ``UnMicst.py:603``); solo handles
  ``.ome`` stems properly (``UnMicst1-5.py:783-792``)
* the v2 solo tool feeds the resized-but-not-rescaled image to the network
  (``UnMicst1-5.py:815-816,848``); the others feed the rescaled image
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List, Optional

import numpy as np

DEFAULT_MODEL_ROOTS = [
    os.environ.get("UNMICST_TPU_MODEL_ROOT", ""),
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "models"),
    "/root/reference/models",
]

TOOL_DEFAULT_MODEL = {
    "unmicst-legacy": "nucleiDAPI",  # UnMicst.py:547
    "unmicst-solo": "nucleiDAPI1-5",  # UnMicst1-5.py:716
    "unmicst-duo": "nucleiDAPILAMIN",  # UnMicst2.py:695
    "UnMicstCyto2": "nucleiDAPI",  # UnMicstCyto2.py:695
}


def _resolve_channel_names(image_path: str, file_type: str, names):
    """``--channelName`` -> 0-based channel indexes via the container's
    declared names (OME-TIFF Channel elements, CZI metadata XML); loud
    SystemExit when names are absent or don't resolve."""
    from unmicst_tpu.io.slides import resolve_channel_names

    try:
        return resolve_channel_names(image_path, file_type, names)
    except ValueError as e:
        raise SystemExit(f"--channelName: {e}")


def _pinned_ranges(args, tool: str, n: int):
    """``--intensityRange`` -> list of ``n`` (lo, hi) raw-unit pairs, or
    None.  Rejected for unmicst-solo, whose net input the reference
    deliberately leaves un-rescaled (``UnMicst1-5.py:817-821`` computes
    the rescale but ``:700-702`` feeds the raw resize) — a silently
    ignored flag would be worse than an error."""
    if not getattr(args, "intensityRange", None):
        return None
    if tool == "unmicst-solo":
        raise SystemExit(
            "--intensityRange has no effect on unmicst-solo: its net "
            "input is deliberately un-rescaled (the reference quirk) — "
            "drop the flag or pick another --tool"
        )
    pairs = []
    for s in args.intensityRange:
        parts = s.split(",")
        try:
            if len(parts) != 2:
                raise ValueError(f"expected LO,HI — got {s!r}")
            pairs.append((float(parts[0]), float(parts[1])))
        except ValueError as e:
            raise SystemExit(f"--intensityRange: {e}")
    from unmicst_tpu.infer import _normalize_in_range

    try:
        arr = _normalize_in_range(pairs, n)
    except ValueError as e:
        raise SystemExit(f"--intensityRange: {e}")
    return [tuple(p) for p in arr.tolist()]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="unmicst-tpu",
        description="TPU-native UnMICST: probability maps for cell segmentation",
    )
    p.add_argument(
        "imagePath", nargs="?", help="path to the image (.tif/.ome.tif/.btf)"
    )
    p.add_argument("--tool", default="unmicst-solo", choices=list(TOOL_DEFAULT_MODEL))
    p.add_argument("--model", help="model directory name (or absolute path)")
    p.add_argument("--outputPath", help="output path of probability map")
    p.add_argument(
        "--channel", nargs="+", type=int, default=[1],
        help="channel(s) to perform inference on, 1-based",
    )
    p.add_argument(
        "--channelName", nargs="+", metavar="NAME",
        help="select channel(s) by OME-XML Channel Name instead of index "
        "(framework extension — the reference is index-only); takes "
        "precedence over --channel; exact match, with a unique "
        "case-insensitive fallback; OME-TIFF inputs only",
    )
    p.add_argument(
        "--classOrder", nargs="+", type=int, default=-1,
        help="background, contours, foreground (1-based)",
    )
    p.add_argument("--mean", type=float, default=-1)
    p.add_argument("--std", type=float, default=-1)
    p.add_argument("--scalingFactor", type=float, default=1)
    p.add_argument("--stackOutput", action="store_true")
    p.add_argument(
        "--GPU", type=int, default=-1,
        help="device index; -1 auto-picks the accelerator with the most "
        "free memory (UnMicst.py:577-595 fallback chain)",
    )
    p.add_argument("--outlier", type=float, default=-1)
    p.add_argument("--verbose", action="store_true")
    # framework additions
    p.add_argument("--modelRoot", help="directory containing model subdirs")
    p.add_argument(
        "--precision", choices=["float32", "highest", "bfloat16", "int8"],
        default="float32",
        help="float32 = parity mode (3-pass MXU, <=1 uint8 level vs the "
        "reference, ~1.8x faster than 'highest'); highest = full-f32 MXU; "
        "bfloat16 = fast path (~2x float32; drifts up to ~27 levels on "
        "extreme pixels — the single-pass MXU rounding, distributed "
        "across layers, see scripts/precision_bisect_report.json); "
        "int8 = post-training-quantized convs (core/quant.py; drifts up "
        "to ~5 levels; calibrated per slide)",
    )
    p.add_argument(
        "--tileBatch", type=int, default=0,
        help="tiles per forward batch; 0 = per-model optimum (measured: "
        "256 for 128-px tiles, 128 for 64-px tiles, BASELINE.md)",
    )
    p.add_argument(
        "--calibrationPercentile", type=float, default=99.99,
        help="int8 activation-scale clipping percentile (only with "
        "--precision int8).  99.99 (default) is robust to hot pixels; "
        "100 measures slightly fewer argmax flips on curated clean "
        "slides but degrades 2x with 0.01%% saturated pixels "
        "(BASELINE.md int8 section)",
    )
    p.add_argument("--stats", action="store_true", help="print stage timings + Mpx/s")
    p.add_argument(
        "--engine", choices=["auto", "whole", "streaming", "sharded"],
        default="auto",
        help="auto: stream slides > 64 Mpx (bounded memory); whole: "
        "single device-resident pass; sharded: stream with each stripe "
        "column-sharded over the device mesh (multi-chip halo "
        "inference; see --meshShape)",
    )
    p.add_argument(
        "--meshShape", type=int, metavar="N",
        help="with --engine sharded: devices along the column-shard "
        "axis (default: every visible device)",
    )
    p.add_argument(
        "--usePyramid", action="store_true",
        help="with --scalingFactor <= 0.5 on a pyramidal (SubIFD) "
        "TIFF: decode the nearest stored level + residual device "
        "resize instead of the full-res plane (~4x fewer decode/"
        "transfer bytes per octave; stored levels are the writer's "
        "box means, not the full-res bilinear chain — maps can differ "
        "slightly from a full-res run)",
    )
    p.add_argument(
        "--trace", metavar="DIR",
        help="capture a jax.profiler trace of the inference into DIR",
    )
    p.add_argument(
        "--check-numerics", action="store_true",
        help="scan params and probability maps for NaN/Inf",
    )
    p.add_argument(
        "--listModels", action="store_true",
        help="print model zoo availability and exit",
    )
    p.add_argument(
        "--fetchModels", nargs="*", metavar="NAME",
        help="download the published checkpoint blobs (the reference's "
        "Dockerfile S3 fetches) for the named zoo models — or, with no "
        "names, every model currently in 'needs-blob' state — then exit",
    )
    p.add_argument(
        "--compressOutput", nargs="?", const="deflate", default=None,
        choices=["deflate", "zstd"],
        help="compress output TIFF pages (probability maps shrink ~5-10x; "
        "the reference writes uncompressed).  Bare flag = deflate (any "
        "TIFF reader decodes it); 'zstd' is faster and smaller but needs "
        "a zstd-aware reader (tifffile/libtiff, or this package)",
    )
    p.add_argument(
        "--pyramidOutput", action="store_true",
        help="write outputs as tiled SubIFD pyramids (viewer-ready for "
        "QuPath/Minerva-class tools; flat-page readers still see the "
        "full-resolution pages; the reference writes flat strips)",
    )
    p.add_argument(
        "--intensityRange", nargs="+", metavar="LO,HI",
        help="pin the intensity-rescale range (raw pixel units; one "
        "lo,hi pair, or one per duo channel) instead of the per-image "
        "min/max|outlier — every slide in a sweep then normalizes "
        "identically (e.g. TMA cores of one scan); overrides --outlier. "
        "No effect on unmicst-solo (its net input is un-rescaled — the "
        "reference quirk), which rejects the flag loudly",
    )
    return p


def precision_mode(name: str):
    """(compute_dtype, mxu_precision) per --precision choice.

    'float32' uses Precision.HIGH (3 bf16 MXU passes): measured <=1 uint8
    level vs the reference golden outputs at ~1.8x the throughput of
    HIGHEST.  The 26-level bf16/DEFAULT drift is distributed over all conv
    sites (per-site bisect on real TPU), so there is no cheaper mixed mode.
    """
    import jax.numpy as jnp

    return {
        "float32": (None, "high"),
        "highest": (None, "highest"),
        "bfloat16": (jnp.bfloat16, None),
        # int8: quantized convs; everything not quantized (transpose
        # convs, top conv, BN/softmax glue) runs bf16
        "int8": (jnp.bfloat16, None),
    }[name]


def resolve_model_dir(model: str, model_root: Optional[str]) -> str:
    if os.path.isabs(model) and os.path.isdir(model):
        return model
    roots = [model_root] if model_root else [r for r in DEFAULT_MODEL_ROOTS if r]
    for root in roots:
        cand = os.path.join(root, model)
        if os.path.isdir(cand):
            return cand
    raise FileNotFoundError(
        f"model dir '{model}' not found under {roots}; set --modelRoot"
    )


def parse_stem(file_name: str, tool: str):
    """Stem/extension parsing, per-tool parity."""
    if tool == "unmicst-solo":
        parts = file_name.split(os.extsep)  # UnMicst1-5.py:783-792
        if len(parts) < 2:
            raise ValueError("Input filename has no extension")
        if parts[-2] == "ome":
            return os.extsep.join(parts[:-2]), os.extsep.join(parts[-2:])
        return os.extsep.join(parts[:-1]), parts[-1]
    parts = file_name.split(os.extsep, 1)  # UnMicst.py:603-605
    return parts[0], parts[1] if len(parts) > 1 else ""


def read_channel(image_path: str, file_type: str, channel: int) -> np.ndarray:
    """Format dispatch (``UnMicst1-5.py:794-806``) — see
    :mod:`unmicst_tpu.io.slides`."""
    from unmicst_tpu.io.slides import read_channel as _read

    return _read(image_path, file_type, channel)


def _duo_chans(channels0, dapi_channel):
    """Duo channel fallback (unmicstWrapper.py forwards channel[0]
    unless exactly 2 are given) — one definition for both engines."""
    return channels0 if len(channels0) == 2 else [dapi_channel, dapi_channel]


def _classes_subset(args, class_order):
    """Non-stack output needs only the contour+nuclei planes; fetching
    just those cuts a third of the device->host traffic."""
    return (
        None if args.stackOutput or len(class_order) < 3
        else (class_order[1], class_order[2])
    )


def _device_slide_ok(args, planes) -> bool:
    """Gate for the device-side slide path (shared by the solo/legacy/
    cyto and duo branches): on-chip preprocessing needs a known
    im2double dtype; --check-numerics must see float maps (uint8 would
    quantize NaN/Inf away), so it pins the float path.  Any
    ``--scalingFactor`` rides the device path (the resize + map
    upscale-back fuse into the jitted program, ``core/resize_dev.py``;
    int8 calibrates on a host-resized plane,
    ``InferenceEngine._quant_for_raw``)."""
    return (
        not args.check_numerics
        and all(p.dtype in (np.uint8, np.uint16) for p in planes)
        # mixed-bit-depth duo stacks go through the float host path
        and len({p.dtype for p in planes}) == 1
    )


def _write_outputs(args, stem, out_path, cyto, dapi_channel, class_order,
                   get_page, raw_preview_u8) -> None:
    """The output-file contract, shared by both engines.

    ``get_page(i_class) -> uint8 [H, W]``; ``raw_preview_u8``: the
    normalized raw page for previews.
    """
    import functools

    from unmicst_tpu.io.tiff import imwrite as _imwrite

    imwrite = functools.partial(
        _imwrite,
        compression=getattr(args, "compressOutput", None) or None,
        pyramid=getattr(args, "pyramidOutput", False),
    )
    chan_suffix = str(dapi_channel if cyto else dapi_channel + 1)
    qc_dir = out_path if cyto else os.path.join(out_path, "qc")

    def out_file(kind: str) -> str:
        return os.path.join(out_path, f"{stem}_{kind}_{chan_suffix}.tif")

    if args.stackOutput:
        prob_file = out_file("Probabilities")
        preview_file = os.path.join(qc_dir, f"{stem}_Preview_{chan_suffix}.tif")
        for slice_idx, i_class in enumerate(class_order[::-1]):
            pm = get_page(i_class)
            imwrite(prob_file, pm, bigtiff=True, append=slice_idx > 0)
            if slice_idx == 1:
                imwrite(preview_file, pm, bigtiff=True, append=False)
                imwrite(preview_file, raw_preview_u8, bigtiff=True, append=True)
    else:
        if len(class_order) < 3:
            raise SystemExit(
                "non-stack output needs 3 classes (contours+nuclei); this "
                "model has fewer — use --stackOutput (the reference tool "
                "crashes with an IndexError here)"
            )
        f = out_file("ContoursPM")
        imwrite(f, get_page(class_order[1]), bigtiff=True, append=False)
        imwrite(f, raw_preview_u8, bigtiff=True, append=True)
        imwrite(
            out_file("NucleiPM"), get_page(class_order[2]), bigtiff=True,
            append=False,
        )


def _run_streaming(args, bundle, tool, dapi_channel, channels0, class_order,
                   file_type, stem, out_path, cyto, t_start) -> int:
    """Large-slide path: StreamingEngine, bounded memory, uint8 end-to-end."""
    from unmicst_tpu.core.checkpoint import load_params_for_bundle
    from unmicst_tpu.io import preprocess as pp
    from unmicst_tpu.io.slides import open_channel_source, preview_u8
    from unmicst_tpu.runtime.pipeline import StreamingEngine

    params = load_params_for_bundle(bundle)
    compute_dtype, mxu_precision = precision_mode(args.precision)
    stream = StreamingEngine.from_bundle(
        bundle, params, compute_dtype=compute_dtype,
        precision=mxu_precision, tile_batch=args.tileBatch or None,
        quantized=args.precision == "int8",
        calibration_percentile=args.calibrationPercentile,
    )
    # non-stack output needs only the contour+nuclei planes; fetching just
    # those cuts a third of the device->host traffic
    classes = _classes_subset(args, class_order)
    import contextlib

    if args.trace:
        from unmicst_tpu.utils.profiling import trace as profiler_trace

        trace_ctx = profiler_trace(args.trace)
    else:
        trace_ctx = contextlib.nullcontext()
    t0 = time.perf_counter()
    sf = args.scalingFactor
    mesh = None
    if args.engine == "sharded":
        # column-shard every stripe over the device mesh: each chip
        # infers a vertical band, halo columns ride ppermute (SURVEY
        # §2.6 halo-CP as a framework capability, not library-only)
        from unmicst_tpu.runtime.mesh import make_mesh

        mesh = make_mesh(data=args.meshShape or None, model=1)
        if args.verbose or args.stats:
            print(
                f"[unmicst-tpu] sharded engine: "
                f"{mesh.shape['data']} device(s) on the column axis",
                file=sys.stderr,
            )
    pinned = _pinned_ranges(args, tool,
                            2 if tool == "unmicst-duo" else 1)
    if tool == "unmicst-duo":
        chans = _duo_chans(channels0, dapi_channel)
    else:
        chans = [dapi_channel]
    srcs = {}
    try:
        for c in dict.fromkeys(chans):
            srcs[c] = open_channel_source(args.imagePath, file_type, c)
        # at scale 1 one histogram pass per channel yields BOTH the rescale
        # range and the preview max — the slide is read once less (matters
        # for multi-hundred-Mpx streams on slow disks)
        shared_stats, vmaxes = {}, {}
        if sf == 1 and tool != "unmicst-solo":
            for c, s in srcs.items():
                lo_c, hi_c, vm_c = s.stats(args.outlier, with_max=True)
                shared_stats[c] = (lo_c, hi_c)
                vmaxes[c] = vm_c
        with trace_ctx:
            # --scalingFactor != 1: stream against a virtual resized slide
            # (row-exact resize_rows blocks, UnMicst1-5.py:813-815
            # semantics); maps upscale back to raw resolution at write.
            wrap = (
                (lambda src: pp.ResampledSource(src, sf)) if sf != 1
                else (lambda src: src)
            )
            if tool == "unmicst-duo":
                net_srcs = [wrap(srcs[c]) for c in chans]
                # pinned ranges are raw-unit; ResampledSource streams
                # img_as_float units, so convert per source
                duo_stats = (
                    [pp.pinned_to_source_units(p, s)
                     for p, s in zip(pinned, net_srcs)]
                    if pinned else (
                        [shared_stats[c] for c in chans]
                        if shared_stats else None
                    )
                )
                if mesh is not None:
                    maps = stream.infer_sharded_stack(
                        net_srcs, mesh, outlier=args.outlier,
                        classes=classes, stats=duo_stats,
                    )
                else:
                    maps = stream.infer_stack(
                        net_srcs, outlier=args.outlier,
                        classes=classes, stats=duo_stats,
                    )
            else:
                net_src = wrap(srcs[dapi_channel])
                solo_stats = (
                    pp.pinned_to_source_units(pinned[0], net_src)
                    if pinned
                    else shared_stats.get(dapi_channel)
                )
                rescale = tool != "unmicst-solo"  # the v2-solo quirk
                if mesh is not None:
                    maps = stream.infer_sharded(
                        net_src, mesh, outlier=args.outlier,
                        rescale=rescale, classes=classes,
                        stats=solo_stats,
                    )
                else:
                    maps = stream.infer(
                        net_src,
                        outlier=args.outlier,
                        rescale=rescale,
                        classes=classes,
                        stats=solo_stats,
                    )
            t_infer = time.perf_counter()
            raw_src = srcs[chans[-1]]  # duo preview = last channel
            raw_shape = (raw_src.height, raw_src.width)
            raw_u8 = preview_u8(raw_src, vmax=vmaxes.get(chans[-1]))
    finally:
        for s in srcs.values():
            s.close()
    if args.check_numerics:
        from unmicst_tpu.utils.profiling import check_numerics

        check_numerics(params, "params")

    idx = (
        {c: i for i, c in enumerate(classes)} if classes is not None
        else {c: c for c in class_order}
    )
    fetch = (
        (lambda c: pp.upscale_pm(maps[idx[c]], raw_shape)) if sf != 1
        else (lambda c: maps[idx[c]])
    )
    _write_outputs(
        args, stem, out_path, cyto, dapi_channel, class_order,
        fetch, raw_u8,
    )
    if args.stats or args.verbose:
        h, w = raw_shape
        infer_s = t_infer - t0
        print(
            f"[unmicst-tpu] streaming infer {infer_s:.2f}s "
            f"({h * w / 1e6 / infer_s:.1f} Mpx/s) | total "
            f"{time.perf_counter() - t_start:.2f}s",
            file=sys.stderr,
        )
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    t_start = time.perf_counter()

    if args.listModels:
        from unmicst_tpu.models.zoo import available_models

        roots = [args.modelRoot] if args.modelRoot else [
            r for r in DEFAULT_MODEL_ROOTS if r and os.path.isdir(r)
        ]
        bad = [r for r in roots if not os.path.isdir(r)]
        if bad or not roots:
            raise SystemExit(
                f"no such model root: {bad or DEFAULT_MODEL_ROOTS}"
            )
        for root in roots:
            print(f"{root}:")
            for name, status in sorted(available_models(root).items()):
                print(f"  {name}: {status}")
        return 0
    if args.fetchModels is not None:
        from unmicst_tpu.models.zoo import (
            available_models, fetch_model, stage_sidecars,
        )

        roots = [args.modelRoot] if args.modelRoot else [
            r for r in DEFAULT_MODEL_ROOTS if r and os.path.isdir(r)
        ]
        if not roots:
            raise SystemExit(f"no model root found: {DEFAULT_MODEL_ROOTS}")
        # Blobs land in the first (writable) root; sidecars are staged
        # from whichever root carries the entry dir — the zoo indexes
        # typically sit in a checkout's models/ tree, which may be
        # read-only or later in the list.  A bare flag sweeps every root
        # for needs-blob entries; explicit names resolve the same way.
        dest = roots[0]
        if args.fetchModels:
            names = list(args.fetchModels)
        else:
            names = sorted({
                n for root in roots
                for n, st in available_models(root).items()
                if st.startswith("needs-blob (")  # has a published URL
            })
        if not names:
            print(f"{', '.join(roots)}: nothing to fetch (all entries "
                  "ready or blob-less)")
            return 0
        rc = 0
        for name in names:
            try:
                if not os.path.isdir(os.path.join(dest, name)):
                    src = next(
                        (r for r in roots[1:]
                         if os.path.isdir(os.path.join(r, name))), None
                    )
                    if src is not None:
                        stage_sidecars(name, src, dest)
                print(f"{name} [{dest}]: {fetch_model(name, dest)}")
            except (OSError, ValueError) as e:
                print(f"{name} [{dest}]: FAILED — {e}", file=sys.stderr)
                rc = 1
        return rc
    if not args.imagePath:
        raise SystemExit("imagePath is required (or use --listModels)")

    from unmicst_tpu.core.checkpoint import load_params_for_bundle
    from unmicst_tpu.core.hp import load_model_dir
    from unmicst_tpu.infer import InferenceEngine
    from unmicst_tpu.io import preprocess as pp
    from unmicst_tpu.utils.compcache import enable as enable_cache

    enable_cache()

    # --GPU: explicit index or auto-pick (most free memory), the
    # GPUselect.py:4-22 / UnMicst.py:577-595 semantics.  Pinning the JAX
    # default device scopes every array creation and compile below.
    import jax

    from unmicst_tpu.runtime.devices import select_device

    device = select_device(args.GPU)
    jax.config.update("jax_default_device", device)
    print(f"Using device {device}")

    tool = args.tool
    model_name = args.model or TOOL_DEFAULT_MODEL[tool]
    model_dir = resolve_model_dir(model_name, args.modelRoot)
    bundle = load_model_dir(model_dir, args.mean, args.std)
    hp = bundle.hp

    # wrapper 1-based -> 0-based (unmicstWrapper.py:35-38)
    channels0 = [c - 1 for c in args.channel]
    dapi_channel = channels0[0]
    if args.classOrder == -1:
        class_order = list(range(hp.n_classes))
    else:
        class_order = [c - 1 for c in args.classOrder]
    if not args.stackOutput and len(class_order) < 3:
        # fail in milliseconds, not after minutes of inference
        # (_write_outputs re-checks with the same message)
        raise SystemExit(
            "non-stack output needs 3 classes (contours+nuclei); this "
            "model has fewer — use --stackOutput (the reference tool "
            "crashes with an IndexError here)"
        )

    file_name = os.path.basename(args.imagePath)
    stem, file_type = parse_stem(file_name, tool)
    if args.channelName:
        channels0 = _resolve_channel_names(
            args.imagePath, file_type, args.channelName
        )
        dapi_channel = channels0[0]
    parent = os.path.dirname(os.path.dirname(args.imagePath))
    out_path = args.outputPath or os.path.join(parent, "probability_maps")
    os.makedirs(out_path, exist_ok=True)
    cyto = tool == "UnMicstCyto2"
    if not cyto:
        os.makedirs(os.path.join(out_path, "qc"), exist_ok=True)
    pinned = _pinned_ranges(args, tool,
                            2 if tool == "unmicst-duo" else 1)

    # ---- pyramid input plan (--usePyramid) --------------------------------
    pyr = None  # (level, divisor, full_shape, level_shape)
    if args.usePyramid:
        from unmicst_tpu.io.slides import pyramid_plan_multi

        pyr_chans = list(dict.fromkeys(
            _duo_chans(channels0, dapi_channel)
            if tool == "unmicst-duo" else [dapi_channel]
        ))
        pyr = pyramid_plan_multi(args.imagePath, file_type, pyr_chans,
                                 args.scalingFactor)
        if pyr is not None:
            if args.engine in ("streaming", "sharded"):
                raise SystemExit(
                    f"--usePyramid decodes a stored level whole (the "
                    f"whole engine); it does not combine with --engine "
                    f"{args.engine}"
                )
            if args.verbose or args.stats:
                print(
                    f"[unmicst-tpu] pyramid: stored level {pyr[0]} "
                    f"(1/{pyr[1]}) + residual scale "
                    f"{args.scalingFactor * pyr[1]:.3f}",
                    file=sys.stderr,
                )
        else:
            print(
                "[unmicst-tpu] --usePyramid: no usable stored level "
                "(needs SubIFDs on every channel page and "
                "--scalingFactor <= 0.5) — reading full resolution",
                file=sys.stderr,
            )
    sf_eff = args.scalingFactor * pyr[1] if pyr else args.scalingFactor

    # ---- read + preprocess ------------------------------------------------
    t_read = time.perf_counter()
    from unmicst_tpu.io.slides import TIFF_LIKE

    use_streaming = False
    if file_type in TIFF_LIKE + ("czi", "nd2"):
        from unmicst_tpu.io.slides import open_channel_source

        try:
            probe_chans = (
                list(dict.fromkeys(_duo_chans(channels0, dapi_channel)))
                if tool == "unmicst-duo" else [dapi_channel]
            )
            probe_dtypes, probe_raw_dtypes = [], []
            for pc_ in probe_chans:
                with open_channel_source(
                    args.imagePath, file_type, pc_
                ) as probe:
                    slide_px = probe.height * probe.width
                    probe_dtypes.append(np.dtype(probe.dtype))
                    probe_raw_dtypes.append(
                        np.dtype(getattr(probe, "raw_dtype", probe.dtype))
                    )
            if tool == "unmicst-solo":
                # solo streams with rescale=False: needs a known
                # im2double scale on device
                stream_ok = probe_dtypes[0] in (
                    np.dtype(np.uint8), np.dtype(np.uint16)
                )
                why = (f"rescale-free streaming needs uint8/uint16, got "
                       f"{probe_dtypes[0]}")
            else:
                # streamed global stats need an exact integer histogram
                stream_ok = all(
                    d in (np.dtype(np.uint8), np.dtype(np.uint16),
                          np.dtype(np.int16))
                    for d in probe_dtypes
                ) and len(set(probe_dtypes)) == 1
                why = (f"streamed stats need one integer dtype across "
                       f"channels, got {sorted(map(str, probe_dtypes))}")
            if cyto and any(d == np.float32 for d in probe_raw_dtypes):
                # the reference Cyto2 never float32->uint16 casts
                # (UnMicstCyto2.py has no :807-style cast); the streaming
                # sources do, so float32 cyto slides take the host path
                stream_ok = False
                why = "Cyto2 float32 input must not take the parity cast"
            explicit_stream = args.engine in ("streaming", "sharded")
            if not stream_ok:
                if explicit_stream:
                    raise SystemExit(
                        f"--engine {args.engine}: {why}; use --engine whole"
                    )
                use_streaming = False
            else:
                # a usable stored level shrinks what the whole engine
                # must materialize — gate auto-streaming on LEVEL pixels
                eff_px = pyr[3][0] * pyr[3][1] if pyr else slide_px
                use_streaming = explicit_stream or (
                    args.engine == "auto" and eff_px > 64_000_000
                )
            if use_streaming and args.check_numerics:
                # the streaming path quantizes maps on device; the float
                # scan needs the whole engine (auto re-routes, explicit
                # choice honored with a loud note)
                if args.engine == "auto":
                    use_streaming = False
                else:
                    print(
                        f"note: --check-numerics under --engine "
                        f"{args.engine} scans params only (maps are "
                        "uint8 on device)"
                    )
        except (ValueError, NotImplementedError, IndexError, OSError):
            use_streaming = args.engine in ("streaming", "sharded")
    elif args.engine in ("streaming", "sharded"):
        raise SystemExit(
            f"--engine {args.engine} supports TIFF/CZI/ND2 inputs"
        )

    if use_streaming:
        return _run_streaming(args, bundle, tool, dapi_channel, channels0,
                              class_order, file_type, stem, out_path, cyto,
                              t_start)

    if pyr is not None:
        from unmicst_tpu.io.slides import read_channel_level

        def _read_plane(c):
            return read_channel_level(args.imagePath, file_type, c, pyr[0])
    else:
        def _read_plane(c):
            return read_channel(args.imagePath, file_type, c)

    if tool == "unmicst-duo":
        chans = _duo_chans(channels0, dapi_channel)
        raw_by_chan = {
            c: _read_plane(c) for c in dict.fromkeys(chans)
        }
        raw_planes = [raw_by_chan[c] for c in chans]
        use_rescaled = True  # the un-rescaled-input quirk is solo-only
        if _device_slide_ok(args, raw_planes):
            # device-side stack path: per-channel ranges computed on-chip
            slide_raw = raw_planes
            net_image, raw_shape = raw_planes[-1], raw_planes[-1].shape
            # duo preview shows the LAST channel read (UnMicst2.py:776,792)
            preview = pp.preview_u8_from_raw(raw_planes[-1])
        else:
            slide_raw = None
            planes, raw_norm = [], None
            for i, c in enumerate(chans):
                pc = pp.preprocess_channel(
                    raw_by_chan[c], sf_eff, args.outlier,
                    cast_float32=not cyto,
                    in_range=pinned[i] if pinned else None,
                )
                planes.append(pc.net_input)
                raw_norm, raw_shape = pc.raw_norm, pc.raw_shape  # last wins
            net_image = np.stack(planes).astype(np.float32)
            preview = np.uint8(255 * raw_norm)
        channel_mode = "stack"
    else:
        raw = _read_plane(dapi_channel)
        use_rescaled = tool != "unmicst-solo"  # the v2-solo quirk
        # scale-1 integer slides take the device-side path: preprocessing
        # and uint8 quantization run on-chip, so the host link carries raw
        # uint16 up and uint8 maps down (~3x fewer bytes than the float32
        # canvas/probs round trip); measured <= 1 uint8 level vs the host
        # path and vs the reference goldens
        slide_raw = raw if _device_slide_ok(args, [raw]) else None
        if slide_raw is not None:
            preview = pp.preview_u8_from_raw(raw)  # LUT path, no float64 pass
            net_image, raw_shape = raw, raw.shape
            channel_mode = "broadcast"
        else:
            pc = pp.preprocess_channel(
                raw, sf_eff, args.outlier,
                use_rescaled=use_rescaled, cast_float32=not cyto,
                in_range=pinned[0] if pinned else None,
            )
            net_image = pc.net_input.astype(np.float32)
            raw_shape = pc.raw_shape
            channel_mode = "broadcast"
            preview = np.uint8(255 * pc.raw_norm)

    # ---- inference (single pass, all classes) -----------------------------
    t_pre = time.perf_counter()
    params = load_params_for_bundle(bundle)
    compute_dtype, mxu_precision = precision_mode(args.precision)
    engine = InferenceEngine.from_bundle(
        bundle, params, compute_dtype=compute_dtype,
        precision=mxu_precision, tile_batch=args.tileBatch or None,
        quantized=args.precision == "int8",
        calibration_percentile=args.calibrationPercentile,
    )
    t_load = time.perf_counter()

    def run_inference():
        if slide_raw is not None:
            # non-stack output needs only contours+nuclei; fetching just
            # those planes cuts a third of the D2H bytes
            classes = _classes_subset(args, class_order)
            if channel_mode == "stack":
                maps = engine.infer_slide_stack(
                    slide_raw, outlier=args.outlier, classes=classes,
                    scaling_factor=sf_eff, in_range=pinned,
                )
            else:
                maps = engine.infer_slide(
                    slide_raw, outlier=args.outlier, rescale=use_rescaled,
                    classes=classes, scaling_factor=sf_eff,
                    in_range=pinned[0] if pinned else None,
                )
            idx = (
                {c: i for i, c in enumerate(classes)} if classes else None
            )
            return maps, (lambda c: maps[idx[c] if idx else c])
        probs = engine.infer(net_image, channel_mode)
        return probs, (lambda c: pp.postprocess_pm(probs[c], raw_shape))

    if args.trace:
        from unmicst_tpu.utils.profiling import trace as profiler_trace

        with profiler_trace(args.trace):
            probs, get_page = run_inference()
    else:
        probs, get_page = run_inference()
    if args.check_numerics:
        from unmicst_tpu.utils.profiling import check_numerics

        check_numerics(params, "params")
        check_numerics(probs, "probability maps")
    t_infer = time.perf_counter()

    if pyr is not None:
        # level-resolution maps/preview -> full-resolution pages (the
        # output contract is always raw dims, UnMicst1-5.py:848-854)
        _get_page_lvl = get_page
        get_page = lambda c: pp.upscale_pm(_get_page_lvl(c), pyr[2])  # noqa: E731
        preview = pp.upscale_pm(preview, pyr[2])

    # ---- outputs ----------------------------------------------------------
    _write_outputs(
        args, stem, out_path, cyto, dapi_channel, class_order,
        get_page,
        preview,
    )
    t_write = time.perf_counter()

    if args.stats or args.verbose:
        h, w = net_image.shape[-2:]
        mpx = h * w / 1e6
        infer_s = t_infer - t_load
        print(
            f"[unmicst-tpu] read+pre {t_pre - t_read:.2f}s | model load "
            f"{t_load - t_pre:.2f}s | infer {infer_s:.2f}s "
            f"({mpx / infer_s:.1f} Mpx/s, all {hp.n_classes} classes) | "
            f"write {t_write - t_infer:.2f}s | total {t_write - t_start:.2f}s",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
