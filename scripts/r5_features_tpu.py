"""On-chip validation of the r5 serving/quant levers.

Three legs:
  1. pan_classes  — device-cached 512^2 pans (trim=) fetching all 3
                    classes vs classes=(1,): D2H drops 3x, so the
                    ~33 ms 3-class fetch (pan_latency_report.json)
                    should shed ~2/3.
  2. int8_bias    — device-resident v2 int8 throughput with the now-
                    default bias correction vs without: the shift is a
                    fused per-channel add, expected within noise.
  3. int8_calib   — one-time calibration wall with/without bias
                    correction (it pays one extra float+int8 conv per
                    site).

Run alone: python - < scripts/r5_features_tpu.py
Report: scripts/r5_features_report.json
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

from unmicst_tpu.core import unet
from unmicst_tpu.core.checkpoint import load_params_for_bundle
from unmicst_tpu.core.hp import HParams, load_model_dir
from unmicst_tpu.infer import InferenceEngine
from unmicst_tpu.utils.compcache import enable as enable_cache

enable_cache()
print("device:", jax.devices()[0], flush=True)
report = {"device": str(jax.devices()[0])}


def timed(thunk, reps=12, warmups=2):
    for _ in range(warmups):
        thunk()
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        thunk()
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return {"p50_ms": round(walls[len(walls) // 2] * 1e3, 1),
            "min_ms": round(walls[0] * 1e3, 1)}


# -- leg 1: cached pans, class subset ------------------------------------
SIDE, ROI = 8192, 512
bundle = load_model_dir("/root/reference/models/nucleiDAPI")
params = load_params_for_bundle(bundle)
eng = InferenceEngine.from_bundle(bundle, params)
rng = np.random.RandomState(0)
plane = eng.device_plane((rng.rand(SIDE, SIDE) * 60000).astype(np.uint16))
kw = dict(in_range=(0, 60000), trim=(128, 128, ROI, ROI))

report["pan_3cls"] = timed(
    lambda: eng.infer_slide_device(plane, 896, 1408, 1024, 1024, **kw))
report["pan_1cls"] = timed(
    lambda: eng.infer_slide_device(plane, 896, 1408, 1024, 1024,
                                   classes=(1,), **kw))
print("pan_3cls", report["pan_3cls"], flush=True)
print("pan_1cls", report["pan_1cls"], flush=True)

# -- legs 2+3: int8 bias-correct throughput + calibration wall -----------
HP_V2 = HParams(
    im_size=64, n_channels=1, n_classes=3, n_out0=80, feat_maps_fact=2,
    down_samp_fact=2, ks=3, n_extra_convs=0, std_dev0=0.03, n_layers=4,
    batch_size=32,
)
params_v2 = unet.init_params(jax.random.PRNGKey(0), HP_V2, "v2")
slide = (rng.rand(SIDE, SIDE) * 60000).astype(np.uint16)
px = SIDE * SIDE

for label, bias in [("int8_bias_on", True), ("int8_bias_off", False)]:
    q = InferenceEngine(HP_V2, params_v2, "v2", 0.3, 0.2, tile_batch=128,
                        quantized=True, quant_bias_correct=bias)
    t0 = time.perf_counter()
    pl = q.device_plane(slide)  # calibrates
    calib_s = time.perf_counter() - t0

    def once(q=q, pl=pl):
        # full-slide resident pass, 1-element fetch like the bench
        out = q.infer_slide_device(pl, 0, 0, SIDE, SIDE,
                                   in_range=(0, 60000),
                                   trim=(0, 0, 8, 8))
        return out

    once()
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        once()
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    report[label] = {"calib_s": round(calib_s, 1),
                     "wall_s": round(best, 3),
                     "mpx_s": round(px / 1e6 / best, 1)}
    print(label, report[label], flush=True)

a, b = report["int8_bias_on"], report["int8_bias_off"]
report["bias_throughput_ratio"] = round(a["mpx_s"] / b["mpx_s"], 3)
with open("/root/repo/scripts/r5_features_report.json", "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report), flush=True)
