"""On-chip golden re-pin through the r3-session-5 host/device paths
(r3 verdict weak item 2: the ≤1-uint8 golden claim predates the LUT
pre/post fast paths, the separable-lerp resize, and the fused
device-resize program — CPU tests cover them; this pins them on the
real chip).

Legs (all full `cli.main` runs, the exact user surface):
  1. legacy nucleiDAPI on 105.tif, scale 1 (LUT pre/post + device
     scale-1 slide path) -> each PM page within ±1 uint8 of the golden
     fixtures (`UNet sample data/prob_maps/105_*_1.tif`).
  2. same run with --scalingFactor 0.5 (fused device any-scale path)
     vs the same run with --check-numerics (pins the float HOST chain):
     ≤1 uint8 p999 and <2% mismatched pixels between the two.
  3. --compressOutput zstd + --pyramidOutput variant of leg 1: output
     pages bit-identical to leg 1's (encode path must not touch pixels).

Run on chip:  python - < scripts/golden_onchip_tpu.py
CPU smoke:    GOLDEN_ONCHIP_SMOKE=1 python - < scripts/golden_onchip_tpu.py
Writes scripts/golden_onchip_report.json.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

SMOKE = os.environ.get("GOLDEN_ONCHIP_SMOKE", "0") == "1"
if SMOKE:
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))) if "__file__" in dir() else "/root/repo")

from unmicst_tpu import cli  # noqa: E402
from unmicst_tpu.io.tiff import TiffFile, imread  # noqa: E402
from unmicst_tpu.utils.compcache import enable as enable_cache  # noqa: E402

enable_cache()
REF = "/root/reference"
SRC = os.path.join(REF, "UNet sample data/registration/105.tif")
GOLD = os.path.join(REF, "UNet sample data/prob_maps")

report = {"smoke": SMOKE, "legs": {}}


def run_cli(outdir, *extra):
    t0 = time.time()
    rc = cli.main([SRC, "--tool", "unmicst-legacy", "--model", "nucleiDAPI",
                   "--outputPath", outdir, "--channel", "1", *extra])
    assert rc in (0, None), rc
    return time.time() - t0


def pm_pages(outdir):
    out = {}
    for f in sorted(os.listdir(outdir)):
        if f.endswith(".tif"):
            with TiffFile(os.path.join(outdir, f)) as tf:
                out[f] = [tf.read_page(i) for i in range(len(tf.pages))]
    return out


with tempfile.TemporaryDirectory() as tmp:
    d1 = os.path.join(tmp, "scale1")
    os.makedirs(d1)
    wall1 = run_cli(d1)
    pages = pm_pages(d1)
    # leg 1: vs golden fixtures (NucleiPM page 0; ContoursPM page 0 of 2)
    leg1 = {"wall_s": round(wall1, 2)}
    for stem, cls in (("105_NucleiPM_1.tif", "nuclei"),
                      ("105_ContoursPM_1.tif", "contours")):
        gold = imread(os.path.join(GOLD, stem))
        got = pages[stem][0]
        diff = np.abs(got.astype(int) - gold.astype(int))
        leg1[cls] = {"max": int(diff.max()),
                     "p999": float(np.percentile(diff, 99.9)),
                     "frac_gt1": float((diff > 1).mean())}
    leg1["pass"] = all(v["max"] <= 1 for v in
                       (leg1["nuclei"], leg1["contours"]))
    report["legs"]["golden_scale1"] = leg1

    # leg 2: device any-scale vs host float chain at 0.5
    d2a, d2b = os.path.join(tmp, "s05dev"), os.path.join(tmp, "s05host")
    os.makedirs(d2a)
    os.makedirs(d2b)
    wall2a = run_cli(d2a, "--scalingFactor", "0.5")
    wall2b = run_cli(d2b, "--scalingFactor", "0.5", "--check-numerics")
    pa, pb = pm_pages(d2a), pm_pages(d2b)
    leg2 = {"wall_dev_s": round(wall2a, 2), "wall_host_s": round(wall2b, 2)}
    worst_p999, worst_frac = 0.0, 0.0
    for f in pa:
        for i, (x, y) in enumerate(zip(pa[f], pb[f])):
            diff = np.abs(x.astype(int) - y.astype(int))
            worst_p999 = max(worst_p999, float(np.percentile(diff, 99.9)))
            worst_frac = max(worst_frac, float((diff > 1).mean()))
    leg2.update(p999=worst_p999, frac_gt1=worst_frac,
                **{"pass": worst_p999 <= 1 and worst_frac < 0.02})
    report["legs"]["devscale05_vs_host"] = leg2

    # leg 3: zstd + pyramid output pixels identical to leg 1
    d3 = os.path.join(tmp, "zstdpyr")
    os.makedirs(d3)
    wall3 = run_cli(d3, "--compressOutput", "zstd", "--pyramidOutput")
    p3 = pm_pages(d3)
    same = all(
        len(p3[f]) == len(pages[f])
        and all((a == b).all() for a, b in zip(p3[f], pages[f]))
        for f in pages
    )
    report["legs"]["zstd_pyramid_bitident"] = {
        "wall_s": round(wall3, 2), "pass": bool(same)}

report["pass"] = all(v.get("pass") for v in report["legs"].values())
out = "scripts/golden_onchip_report.json"
with open(out, "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report))
