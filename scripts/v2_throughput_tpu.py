"""Device-resident throughput of the v2 solo architecture (the DEFAULT
tool's net: nucleiDAPI1-5 hp — nOut0=80, nLayers=4, patch 64).

Random weights (the S3 data blobs are unfetchable here; throughput does not
depend on values).  Demonstrates MXU utilization when the net is wide
enough to fill the 128 lanes (80..1280 output channels vs legacy's 16..64).

Run: python - < scripts/v2_throughput_tpu.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from unmicst_tpu.core import tiler, unet
from unmicst_tpu.core.hp import HParams
from unmicst_tpu.infer import InferenceEngine
from unmicst_tpu.utils.compcache import enable as enable_cache
from unmicst_tpu.utils.flops import slide_flops, unet_flops_per_tile

enable_cache()

# models/nucleiDAPI1-5/hp.data values
hp = HParams(
    im_size=64, n_channels=1, n_classes=3, n_out0=80, feat_maps_fact=2,
    down_samp_fact=2, ks=3, n_extra_convs=0, std_dev0=0.03, n_layers=4,
    batch_size=32,
)
params = unet.init_params(jax.random.PRNGKey(0), hp, "v2")
SIZE = 2048
fl = slide_flops(hp, SIZE, SIZE, "v2")
print("per-tile GFLOP:", unet_flops_per_tile(hp, "v2") / 1e9,
      "| slide TFLOP:", fl / 1e12)

rng = np.random.RandomState(0)
slide = (rng.rand(SIZE, SIZE) * 60000).astype(np.uint16)
raw_dev = jnp.asarray(slide)
win_dev = jnp.asarray(tiler.ramp_window(hp.im_size, hp.margin))
report = {"hp": "nucleiDAPI1-5 (random weights)", "slide": SIZE,
          "slide_tflop": round(fl / 1e12, 2), "modes": {}}
for label, kw in [("bf16", dict(compute_dtype=jnp.bfloat16)),
                  ("high", dict(precision="high"))]:
    eng = InferenceEngine(hp, params, "v2", 0.3, 0.2, tile_batch=256, **kw)
    jitted = eng._build_slide(SIZE, SIZE, np.uint16, -1, True, None)
    o = jitted(eng.params, raw_dev, win_dev)
    _ = np.asarray(o[0, 0, 0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        o = jitted(eng.params, raw_dev, win_dev)
        # force completion with a 1-element fetch: on the tunneled runtime
        # block_until_ready() can ack before execution finishes for some
        # programs (observed here: 96 us for a 9.6 TFLOP dispatch)
        _ = np.asarray(o[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    report["modes"][label] = {
        "mpx_s": round(SIZE * SIZE / 1e6 / best, 2),
        "tflop_s": round(fl / best / 1e12, 1),
        "mfu_bf16_basis": round(fl / best / 197e12, 3),
        "wall_s": round(best, 3),
    }
    print(label, report["modes"][label])

with open("/root/repo/scripts/v2_throughput_report.json", "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report))
