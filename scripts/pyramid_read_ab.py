"""Measured decode-bytes / wall saving of pyramid-aware input reads.

``--usePyramid`` (CLI/batch/serve) decodes the nearest stored SubIFD
level instead of the full-res plane when effective scale <= 0.5.  The
decode wall and bytes are HOST properties — measured here on the same
box that runs the readers in production; the H2D saving is the same
ratio (the level plane is what rides the link).

Fixture: 8192^2 uint16 random-texture plane, deflate-compressed
pyramidal OME-TIFF (2 stored levels) — the compression MCMICRO
pipelines typically write.  Times are min-of-3 steady state.

Run: python scripts/pyramid_read_ab.py   (CPU-only, no jax)
Report: scripts/pyramid_read_report.json
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from unmicst_tpu.io.slides import (  # noqa: E402
    pyramid_plan, read_channel, read_channel_level,
)
from unmicst_tpu.io.tiff import TiffWriter  # noqa: E402

SIDE = 8192
rng = np.random.RandomState(0)
img = (rng.rand(SIDE, SIDE) * 60000).astype(np.uint16)

report = {}
with tempfile.TemporaryDirectory() as td:
    path = os.path.join(td, "pyr.ome.tif")
    t0 = time.perf_counter()
    with TiffWriter(path, bigtiff=True, compression="deflate") as tw:
        n_levels = tw.write_pyramid(img, tile=(256, 256), min_size=1024)
    report["write_s"] = round(time.perf_counter() - t0, 2)
    report["levels"] = n_levels
    report["file_mb"] = round(os.path.getsize(path) / 1e6, 1)

    def timed(fn, reps=3):
        fn()
        best = min(
            (lambda t: (fn(), time.perf_counter() - t)[1])(
                time.perf_counter()
            )
            for _ in range(reps)
        )
        return best

    full_wall = timed(lambda: read_channel(path, "tif", 0))
    plan = pyramid_plan(path, "tif", 0, 0.5)
    assert plan is not None, "no usable level"
    lvl, div, full_shape, lshape = plan
    lvl_wall = timed(lambda: read_channel_level(path, "tif", 0, lvl))
    report["full_read"] = {
        "shape": list(full_shape),
        "decoded_mb": round(img.nbytes / 1e6, 1),
        "wall_s": round(full_wall, 3),
    }
    report["level_read"] = {
        "level": lvl, "divisor": div, "shape": list(lshape),
        "decoded_mb": round(lshape[0] * lshape[1] * 2 / 1e6, 1),
        "wall_s": round(lvl_wall, 3),
    }
    report["wall_ratio"] = round(full_wall / lvl_wall, 2)
    report["bytes_ratio"] = round(
        img.nbytes / (lshape[0] * lshape[1] * 2), 2
    )
    # scale 0.25 uses the deeper level when present
    plan25 = pyramid_plan(path, "tif", 0, 0.25)
    if plan25 is not None and plan25[0] != lvl:
        l2_wall = timed(
            lambda: read_channel_level(path, "tif", 0, plan25[0])
        )
        report["level2_read"] = {
            "level": plan25[0], "divisor": plan25[1],
            "wall_s": round(l2_wall, 3),
            "wall_ratio_vs_full": round(full_wall / l2_wall, 2),
        }

out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "pyramid_read_report.json")
with open(out, "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report))
