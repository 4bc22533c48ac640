"""Real-TPU validation of the device-side any-scale slide path.

Compiles the fused resize + infer + map-upscale-back program
(`infer.py::_build_slide(scaling_factor=...)`, r3 session 5) on the
real chip, pins it against the host float64 chain (<= 1 uint8 level),
and reports walls for scale 0.5 / 1.0 on the real ``nucleiDAPI``
weights.  Pre-staged while the dev tunnel was down (8 probe timeouts,
2026-08-18) so the check is one command when hardware returns:

    python - < scripts/scale_device_tpu.py

Writes scripts/scale_device_tpu_report.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from unmicst_tpu.utils.compcache import enable as _enable_cache

_enable_cache()  # tunnel compiles are minutes; cache across invocations

import jax

from unmicst_tpu.core.checkpoint import load_params_for_bundle
from unmicst_tpu.core.hp import load_model_dir
from unmicst_tpu.infer import InferenceEngine
from unmicst_tpu.io import preprocess as pp
from unmicst_tpu.io.tiff import imread

SIZE = int(os.environ.get("SCALE_BENCH_SIZE", "2048"))

dev = jax.devices()[0]
print(f"device: {dev}", flush=True)

bundle = load_model_dir("/root/reference/models/nucleiDAPI")
params = load_params_for_bundle(bundle)
eng = InferenceEngine.from_bundle(bundle, params)

report = {"device": str(dev), "size": SIZE, "legs": {}}

# golden-input parity leg (real weights, real slide)
img = imread("/root/reference/UNet sample data/registration/105.tif")
t0 = time.perf_counter()
dev_maps = eng.infer_slide(img, scaling_factor=0.5)
compile_s = time.perf_counter() - t0
pc = pp.preprocess_channel(img, 0.5, -1)
probs = eng.infer(pc.net_input.astype(np.float32))
host = np.stack(
    [pp.postprocess_pm(probs[k], pc.raw_shape) for k in range(3)]
)
diff = np.abs(dev_maps.astype(int) - host.astype(int))
report["legs"]["parity_105_scale05"] = {
    "max_diff": int(diff.max()),
    "flip_frac": float((diff > 0).mean()),
    "first_call_s": round(compile_s, 1),
}
assert diff.max() <= 1, diff.max()

# wall comparison on a synthetic slide: device-scale vs host-resize path
rng = np.random.RandomState(0)
slide = (rng.rand(SIZE, SIZE) * 60000).astype(np.uint16)
for sf in (1.0, 0.5):
    eng.infer_slide(slide, scaling_factor=sf)  # compile
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = eng.infer_slide(slide, scaling_factor=sf)
        best = min(best, time.perf_counter() - t0)
    report["legs"][f"wall_scale{sf}"] = {
        "s": round(best, 3),
        "mpx_s": round(SIZE * SIZE / 1e6 / best, 2),
    }

# host-path wall at 0.5 for the comparison row
best = np.inf
for _ in range(3):
    t0 = time.perf_counter()
    pc = pp.preprocess_channel(slide, 0.5, -1)
    probs = eng.infer(pc.net_input.astype(np.float32))
    for k in (1, 2):
        pp.postprocess_pm(probs[k], pc.raw_shape)
    best = min(best, time.perf_counter() - t0)
report["legs"]["wall_scale0.5_hostpath"] = {
    "s": round(best, 3),
    "mpx_s": round(SIZE * SIZE / 1e6 / best, 2),
}

out_path = os.path.join("/root/repo/scripts", "scale_device_tpu_report.json")
with open(out_path, "w") as f:
    json.dump(report, f, indent=2)
print(json.dumps(report, indent=2))
