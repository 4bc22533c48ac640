"""Compile-check + numerics of the decoupled RDMA halo on real TPU.

One physical chip is available here, so the ring degenerates to a
self-copy — which still exercises the COMPILED decoupled kernels
(semaphore outputs, cross-kernel DMA wait, buffer aliasing) that the CPU
suite can only run in synchronous interpret fallback.  On a multi-chip
slice this same script measures the overlap win: run it with
``halo_impl`` pallas vs pallas_overlap and compare walls (the experiment
docs/PALLAS.md describes).

Run: python - < scripts/halo_overlap_tpu.py
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
import jax.numpy as jnp
from jax.sharding import Mesh

from unmicst_tpu.core import unet
from unmicst_tpu.core.hp import HParams
from unmicst_tpu.runtime import halo

devs = jax.devices()
mesh = Mesh(np.array(devs), ("d",))
n_dev = len(devs)
print(f"devices: {n_dev} x {devs[0].device_kind}")

# flagship-shaped geometry (128 px tiles, ks=5, extra convs) at a size
# giving R >= 3 tile rows per band so the interior/seam split is real;
# kept small enough that three programs compile through the dev tunnel
hp = HParams(im_size=128, n_channels=1, n_classes=3, n_out0=8, ks=5,
             n_extra_convs=1, n_layers=2, batch_size=16, std_dev0=0.03)
params = unet.init_params(jax.random.PRNGKey(0), hp, "legacy")
H = W = 640
rng = np.random.RandomState(0)
img = rng.rand(H, W).astype(np.float32)
canvas = jnp.asarray(halo.build_canvas(img, hp, n_dev))
kw = dict(mean=0.3, std=0.2, axis="d", tile_batch=32)

results = {}
outs = {}
_IMPLS = os.environ.get("HALO_IMPLS", "ppermute,pallas,pallas_overlap")
for impl in _IMPLS.split(","):
    fn = jax.jit(lambda p, c, impl=impl: halo.spatial_infer(
        p, c, H, W, hp, "legacy", mesh, halo_impl=impl, **kw))
    t0 = time.perf_counter()
    out = fn(params, canvas)
    _ = np.asarray(out[0, 0])  # force completion
    compile_s = time.perf_counter() - t0
    print(f"{impl}: compiled+ran in {compile_s:.1f}s", flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(params, canvas)
        _ = np.asarray(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    outs[impl] = np.asarray(out)
    results[impl] = {"compile_s": round(compile_s, 1),
                     "wall_s": round(best, 4)}
    print(impl, results[impl])

REPORT = "/root/repo/scripts/halo_overlap_tpu_report.json"
merged = {"n_dev": n_dev, "geometry": f"{H}x{W} ks5 nec1 128px",
          "results": {}}
if os.path.exists(REPORT):
    with open(REPORT) as f:
        prev = json.load(f)
    if prev.get("geometry") == merged["geometry"]:
        merged["results"] = prev.get("results", {})
# cross-impl numerics: compare against the ppermute output, persisted to
# /tmp so split HALO_IMPLS invocations can still pin numerics
ref_npy = "/tmp/halo_ref_ppermute.npy"
if "ppermute" in outs:
    np.save(ref_npy, outs["ppermute"])
ref = (outs.get("ppermute")
       if "ppermute" in outs
       else (np.load(ref_npy) if os.path.exists(ref_npy) else None))
for impl, out in outs.items():
    merged["results"][impl] = results[impl]
    if impl != "ppermute" and ref is not None:
        d = float(np.abs(out - ref).max())
        merged["results"][impl]["max_abs_diff_vs_ppermute"] = d
        print(f"{impl} vs ppermute: max abs diff {d:.3e}")
        assert d <= 1e-5, (impl, d)

with open(REPORT, "w") as f:
    json.dump(merged, f, indent=1)
print(json.dumps(merged["results"]))
