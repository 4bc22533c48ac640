"""Reproduce the BASELINE.md native-codec throughput table.

Usage: ``python scripts/codec_bench.py`` (CPU-only; ~1 min).  Measures
decode/encode throughput of the in-repo TIFF codec stack against PIL as
the independent reference decoder on a 4096^2 uint16 plane, round-trip
verified.  Writes ``scripts/codec_bench_report.json``.
"""

import json
import os
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unmicst_tpu.io import _native, tiff  # noqa: E402

SIZE = 4096
REPS = 5


def best(fn, reps=REPS):
    out, t = None, float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        t = min(t, time.perf_counter() - t0)
    return out, t


def mbps(nbytes, dt):
    return round(nbytes / dt / 1e6, 1)


def pil_read(path):
    with Image.open(path) as im:
        return np.asarray(im)


def main():
    rng = np.random.RandomState(0)
    img = (rng.rand(SIZE, SIZE) * 400).astype(np.uint16)
    tmp = "/tmp/unmicst_codec_bench"
    os.makedirs(tmp, exist_ok=True)
    report = {
        "plane": f"{SIZE}x{SIZE} uint16",
        "native_lib_loaded": _native.get_lib() is not None,
    }

    # fixtures written by PIL so the decode side is exercised on
    # independently-produced streams
    cases = {
        "uncompressed": "raw",
        "deflate": "tiff_adobe_deflate",
        "lzw": "tiff_lzw",
    }
    for name, pil_codec in cases.items():
        path = os.path.join(tmp, f"{name}.tif")
        Image.fromarray(img).save(path, compression=pil_codec)
        tf = tiff.TiffFile(path)
        ours, dt = best(lambda: tf.read_page(0))
        assert np.array_equal(ours, img), name
        theirs, dt_pil = best(lambda: pil_read(path))
        assert np.array_equal(theirs, img), name
        report[f"{name}_decode"] = {
            "ours_mb_s": mbps(img.nbytes, dt),
            "pil_mb_s": mbps(img.nbytes, dt_pil),
        }

    # deflate again with the native lib masked: isolates the native
    # inflate's contribution vs the pure-zlib fallback path
    lib, failed = _native._lib, _native._load_failed
    try:
        _native._lib, _native._load_failed = None, True
        tf = tiff.TiffFile(os.path.join(tmp, "deflate.tif"))
        ours, dt = best(lambda: tf.read_page(0))
        assert np.array_equal(ours, img)
        report["deflate_decode"]["zlib_fallback_mb_s"] = mbps(img.nbytes, dt)
    finally:
        _native._lib, _native._load_failed = lib, failed

    # encode (deflate is the one compressed writer codec)
    enc_path = os.path.join(tmp, "enc.tif")
    _, dt = best(
        lambda: tiff.imwrite(enc_path, img, bigtiff=True,
                             compression="deflate")
    )
    assert np.array_equal(tiff.imread(enc_path), img)
    report["deflate_encode"] = {"ours_mb_s": mbps(img.nbytes, dt)}

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "codec_bench_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
