"""int8 PTQ bias-correction accuracy A/B (accept/kill, VERDICT r4 #7).

Methodology matches the r4 percentile study (BASELINE.md int8 section):
full 105.tif slide, REAL legacy nucleiDAPI weights, CPU execution of the
identical quantized graph (the int8 kernels are jit-compiled the same
way on any backend), reference = f32 Precision.HIGH.  Metrics are the
distributional contract: argmax-flip %, mean abs uint8 levels, p99
levels — max pixel diff is meaningless (softmax-0.5 boundary pixels
legitimately flip).

Current record at the shipped default (percentile 99.99, no bias
correction): 0.88% flips / 1.34 mean levels.  ``quant_bias_correct=True``
adds a per-output-channel mean-shift measured on the calibration tiles
(core/quant.py); this script decides whether it ships as default-on,
stays opt-in, or dies.

Run: python scripts/int8_bias_ab.py   (CPU; ~10-20 min on the 1-core box)
Report: scripts/int8_bias_ab_report.json
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from unmicst_tpu.core.checkpoint import load_params_for_bundle
from unmicst_tpu.core.hp import load_model_dir
from unmicst_tpu.infer import InferenceEngine
from unmicst_tpu.io.tiff import imread

bundle = load_model_dir("/root/reference/models/nucleiDAPI")
params = load_params_for_bundle(bundle)
img = imread("/root/reference/UNet sample data/registration/105.tif")
raw = np.asarray(img)
print("slide:", raw.shape, raw.dtype, flush=True)


def run(**kw):
    eng = InferenceEngine.from_bundle(bundle, params, **kw)
    return eng.infer_slide(raw).astype(np.int16)  # [K, H, W] uint8


ref = run(precision="high")
ref_arg = np.argmax(ref, axis=0)
report = {"slide": "105.tif (full)", "weights": "nucleiDAPI (real)",
          "reference": "f32 Precision.HIGH", "modes": {}}
for label, kw in [
    ("int8_p9999", dict(quantized=True, quant_bias_correct=False)),
    ("int8_p9999_bias_correct", dict(quantized=True,
                                     quant_bias_correct=True)),
]:
    out = run(**kw)
    d = np.abs(out - ref)
    row = {
        "argmax_flips_pct": round(
            float((np.argmax(out, axis=0) != ref_arg).mean()) * 100, 3),
        "mean_abs_levels": round(float(d.mean()), 3),
        "p99_levels": int(np.percentile(d, 99)),
    }
    report["modes"][label] = row
    print(label, json.dumps(row), flush=True)

a = report["modes"]["int8_p9999"]
b = report["modes"]["int8_p9999_bias_correct"]
better = (b["argmax_flips_pct"] <= a["argmax_flips_pct"]
          and b["mean_abs_levels"] < a["mean_abs_levels"])
worse = (b["argmax_flips_pct"] > a["argmax_flips_pct"]
         and b["mean_abs_levels"] > a["mean_abs_levels"])
report["verdict"] = ("ACCEPT (make default-on)" if better
                     else "KILL" if worse else "KEEP OPT-IN (mixed)")
with open("/root/repo/scripts/int8_bias_ab_report.json", "w") as f:
    json.dump(report, f, indent=1)
print("VERDICT:", report["verdict"], flush=True)
