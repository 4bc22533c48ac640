"""Precision experiment 2: HIGH-precision mode + per-conv-site bisect.

profile_tpu.py established that the 26-level drift comes from single-pass
bf16 MXU rounding (f32-DEFAULT == bf16 drift).  This script measures:

1. Precision.HIGH (3-pass f32 emulation): drift on the golden fixture and
   device-resident throughput at 4096^2 — candidate parity default.
2. A bisect over conv call sites in DEFAULT mode: each of the legacy net's
   14 conv/transpose sites can individually be forced to HIGH to find
   whether the drift concentrates in a few layers (cheap mixed mode) or is
   distributed (then HIGH-everywhere is the answer).

Run: python - < scripts/precision_bisect_tpu.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from unmicst_tpu.core import tiler, unet
from unmicst_tpu.core.checkpoint import load_params_for_bundle
from unmicst_tpu.core.hp import load_model_dir
from unmicst_tpu.infer import InferenceEngine
from unmicst_tpu.io import preprocess as pp
from unmicst_tpu.io.tiff import imread
from unmicst_tpu.utils.compcache import enable as enable_cache
from unmicst_tpu.utils.flops import slide_flops

enable_cache()

bundle = load_model_dir("/root/reference/models/nucleiDAPI")
params = load_params_for_bundle(bundle)
hp = bundle.hp
img = imread("/root/reference/UNet sample data/registration/105.tif")
pc = pp.preprocess_channel(img, 1.0, -1)
net_in = pc.net_input.astype(np.float32)
golden = {
    name: imread(
        f"/root/reference/UNet sample data/prob_maps/105_{name}_1.tif"
    )
    for name in ("ContoursPM", "NucleiPM")
}

report = {}


def drift_of(engine):
    probs = engine.infer(net_in)
    out = {
        "ContoursPM": pp.postprocess_pm(probs[1], pc.raw_shape),
        "NucleiPM": pp.postprocess_pm(probs[2], pc.raw_shape),
    }
    return max(
        int(np.abs(out[n].astype(int) - golden[n].astype(int)).max())
        for n in golden
    )


# ---- 1. HIGH mode: drift + resident speed --------------------------------
eng_high = InferenceEngine.from_bundle(bundle, params, precision="high",
                                       tile_batch=256)
d_high = drift_of(eng_high)
print("HIGH drift vs golden:", d_high)
report["high_drift_vs_golden"] = d_high

SIZE = 4096
rng = np.random.RandomState(0)
slide = (rng.rand(SIZE, SIZE) * 60000).astype(np.uint16)
raw_dev = jnp.asarray(slide)
win_dev = jnp.asarray(tiler.ramp_window(hp.im_size, hp.margin))
fl = slide_flops(hp, SIZE, SIZE, "legacy")
speeds = {}
for label, kw in [("high", dict(precision="high")),
                  ("default", dict(precision="default"))]:
    eng = InferenceEngine.from_bundle(bundle, params, tile_batch=256, **kw)
    jitted = eng._build_slide(SIZE, SIZE, np.uint16, -1, True, None)
    out = jitted(eng.params, raw_dev, win_dev)
    out.block_until_ready()
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = jitted(eng.params, raw_dev, win_dev)
        out.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    speeds[label] = {
        "mpx_s": round(SIZE * SIZE / 1e6 / best, 1),
        "tflop_s": round(fl / best / 1e12, 1),
    }
    print("resident", label, speeds[label])
report["resident_4096"] = speeds

# ---- 2. bisect conv sites in DEFAULT mode ---------------------------------
# instrument unet.conv/conv_transpose: per-apply call counter chooses the
# precision per site index
orig_conv, orig_convT = unet.conv, unet.conv_transpose
SITE = {"i": 0, "high": frozenset()}


def counting_conv(x, k, compute_dtype=None, precision=None):
    i = SITE["i"]
    SITE["i"] += 1
    p = "high" if i in SITE["high"] else "default"
    return orig_conv(x, k, compute_dtype, p)


def counting_convT(x, k, s, compute_dtype=None, precision=None):
    i = SITE["i"]
    SITE["i"] += 1
    p = "high" if i in SITE["high"] else "default"
    return orig_convT(x, k, s, compute_dtype, p)


def drift_with_sites(high_sites):
    SITE["high"] = frozenset(high_sites)
    SITE["i"] = 0
    unet.conv, unet.conv_transpose = counting_conv, counting_convT
    try:
        eng = InferenceEngine.from_bundle(bundle, params, tile_batch=256)
        return drift_of(eng)
    finally:
        unet.conv, unet.conv_transpose = orig_conv, orig_convT


# count sites
SITE["high"] = frozenset()
SITE["i"] = 0
unet.conv, unet.conv_transpose = counting_conv, counting_convT
_ = unet.apply(params, jnp.zeros((1, hp.im_size, hp.im_size, 1)), hp, "legacy")
n_sites = SITE["i"]
unet.conv, unet.conv_transpose = orig_conv, orig_convT
print("conv sites per forward:", n_sites)
report["n_sites"] = n_sites

bisect = {}
bisect["none_high"] = drift_with_sites([])
bisect["all_high"] = drift_with_sites(range(n_sites))
half = n_sites // 2
bisect["first_half_high"] = drift_with_sites(range(half))
bisect["second_half_high"] = drift_with_sites(range(half, n_sites))
print("bisect coarse:", bisect)
# per-site leave-one-out at DEFAULT: force each single site HIGH
per_site = {}
for i in range(n_sites):
    per_site[i] = drift_with_sites([i])
    print(f"  site {i} HIGH -> drift {per_site[i]}")
bisect["single_site_high"] = per_site
report["bisect"] = bisect

with open("/root/repo/scripts/precision_bisect_report.json", "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report))
