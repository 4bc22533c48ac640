"""Decompose the cached-pan latency (serve roi_cached_pans p50 ~229 ms).

The r5 device-resident slide cache removed the per-pan band upload
(server counters prove 0 per-pan H2D), yet the measured pan wall barely
moved vs r4's host path.  This script splits the residual into:

  1. dispatch floor   — trivial jitted op + 1-element fetch (the axon
                        tunnel's per-call round-trip cost; on a
                        directly-attached TPU this is ~0.1 ms)
  2. pan compute      — the actual infer_slide_device program,
                        1-element fetch (adds device compute)
  3. full D2H         — same program + full [K,512,512] uint8 fetch
                        (adds the 786 KB result transfer)
  4. classes=(1,)     — fetch one class instead of three (D2H / 3)

Whatever (1) eats is environment latency, not framework work — the
serving protocol's own overhead is (4)-(1) for a minimal viewer pan.

Run: python - < scripts/pan_latency_decompose_tpu.py
Report: scripts/pan_latency_report.json
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from unmicst_tpu.core.checkpoint import load_params_for_bundle
from unmicst_tpu.core.hp import load_model_dir
from unmicst_tpu.infer import InferenceEngine
from unmicst_tpu.utils.compcache import enable as enable_cache

enable_cache()

SIDE, ROI = 8192, 512
REPS = 12

bundle = load_model_dir("/root/reference/models/nucleiDAPI")
params = load_params_for_bundle(bundle)
eng = InferenceEngine.from_bundle(bundle, params)
rng = np.random.RandomState(0)
slide = (rng.rand(SIDE, SIDE) * 60000).astype(np.uint16)
plane = eng.device_plane(slide)
print("device:", jax.devices()[0], flush=True)


def timed(thunk, warmups=2):
    for _ in range(warmups):
        thunk()
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        thunk()
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return {"p50_ms": round(walls[len(walls) // 2] * 1e3, 1),
            "min_ms": round(walls[0] * 1e3, 1)}


report = {"device": str(jax.devices()[0]), "slide": SIDE, "roi": ROI}

# 1. dispatch floor: trivial program, 1-element fetch
tiny = jax.device_put(np.ones((8,), np.float32))
triv = jax.jit(lambda x: x + 1.0)
np.asarray(triv(tiny)[0])
report["dispatch_floor"] = timed(lambda: np.asarray(triv(tiny)[0]))

# 1b. big-argument floor: dynamic_slice-only program over the pinned
# 128 MB plane — isolates per-call argument handling of a large
# device-resident arg from the UNet compute (if this is >> the
# dispatch floor, the tunnel charges per-call cost proportional to
# argument size even for resident arrays)
cut = jax.jit(lambda p, r, c: jax.lax.dynamic_slice(p, (r, c), (ROI, ROI)))
np.asarray(cut(plane, jnp.int32(1), jnp.int32(2))[0, 0])
report["big_arg_slice_floor"] = timed(
    lambda: np.asarray(cut(plane, jnp.int32(977), jnp.int32(1499))[0, 0]))

# pan thunks (grid-snapped interior geometry, pinned range like serve)
kw = dict(in_range=(0, 60000))


def pan(classes=None, fetch_full=True):
    out = eng.infer_slide_device(plane, 977, 1499, ROI, ROI,
                                 classes=classes, **kw)
    # infer_slide_device already np.asarray()s the maps (full D2H)
    return out


def pan_one_elem():
    # bypass the full fetch: call the cached jitted slide_dev program
    # directly (ProgramCache stores _build_slide's jitted fn verbatim)
    key = [k for k in eng._compiled._entries if k[0] == "slide_dev"][0]
    jitted = eng._compiled._entries[key]
    from unmicst_tpu.infer import _normalize_in_range, _range_args
    ir = _normalize_in_range((0, 60000), 1)
    args = [eng.params, plane, eng._window_dev(),
            jnp.int32(977), jnp.int32(1499)] + _range_args(ir, np.uint16)
    out = jitted(*args, quant=None)
    np.asarray(out[0, 0, 0])


pan()  # compile
report["pan_compute_1elem"] = timed(pan_one_elem)
report["pan_full_3cls"] = timed(lambda: pan())
report["pan_full_1cls"] = timed(lambda: pan(classes=(1,)))

report["attribution"] = {
    "tunnel_rtt_floor_ms": report["dispatch_floor"]["p50_ms"],
    "device_compute_ms": round(
        report["pan_compute_1elem"]["p50_ms"]
        - report["dispatch_floor"]["p50_ms"], 1),
    "d2h_3cls_ms": round(
        report["pan_full_3cls"]["p50_ms"]
        - report["pan_compute_1elem"]["p50_ms"], 1),
}
with open("/root/repo/scripts/pan_latency_report.json", "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report, indent=1), flush=True)
