"""End-to-end device-resident throughput: int8 PTQ engine vs bf16.

The op-level probes (int8_probe_report.json: 1.03-1.21x on flagship conv
shapes; int8_probe2_report.json: 1.39x on a pure matmul chain) bound what
quantization can buy; this measures what it actually delivers through the
full stripe-scan engine (quantize/dequantize elementwise traffic, float
glue ops, transpose convs and the float first block included).

Random weights (throughput does not depend on values).  Run alone:
    python - < scripts/int8_infer_tpu.py
Env: CONFIGS=v2,legacy (default v2)  TBS=128,256 (int8 tile batches)
     SIZE=8192 (override per-config slide size)  BF16_TB=128
"""

import json
import os
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
from unmicst_tpu.utils.flops import slide_flops

enable_cache()
print("device:", jax.devices()[0])

HP_V2 = HParams(  # models/nucleiDAPI1-5/hp.data values
    im_size=64, n_channels=1, n_classes=3, n_out0=80, feat_maps_fact=2,
    down_samp_fact=2, ks=3, n_extra_convs=0, std_dev0=0.03, n_layers=4,
    batch_size=32,
)
HP_LEGACY = HParams(  # models/nucleiDAPI/hp.data values
    im_size=128, n_channels=1, n_classes=3, n_out0=16, feat_maps_fact=2,
    down_samp_fact=2, ks=5, n_extra_convs=1, std_dev0=0.03, n_layers=2,
    batch_size=16,
)
SIZES = {"v2": 2048, "legacy": 4096}
VARIANTS = {"v2": ("v2", HP_V2), "legacy": ("legacy", HP_LEGACY)}


def bench(eng, size, qs=None, reps=3):
    rngl = np.random.RandomState(0)
    slide = (rngl.rand(size, size) * 60000).astype(np.uint16)
    raw_dev = jnp.asarray(slide)
    win_dev = jnp.asarray(tiler.ramp_window(eng.hp.im_size, eng.hp.margin))
    jitted = eng._build_slide(size, size, np.uint16, -1, True, None)
    o = jitted(eng.params, raw_dev, win_dev, quant=qs)
    _ = np.asarray(o[0, 0, 0])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        o = jitted(eng.params, raw_dev, win_dev, quant=qs)
        # 1-element fetch forces completion (block_until_ready can ack
        # early on the tunneled runtime; see v2_throughput_tpu.py)
        _ = np.asarray(o[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


report = {}
for cfg in os.environ.get("CONFIGS", "v2").split(","):
    variant, hp = VARIANTS[cfg]
    size = int(os.environ.get("SIZE", SIZES[cfg]))
    params = unet.init_params(jax.random.PRNGKey(0), hp, variant)
    fl = slide_flops(hp, size, size, variant)
    rows = {}

    bf16_tb = int(os.environ.get("BF16_TB", 256))
    eng = InferenceEngine(hp, params, variant, 0.3, 0.2, tile_batch=bf16_tb,
                          compute_dtype=jnp.bfloat16)
    t = bench(eng, size)
    bf_key = f"bf16_tb{bf16_tb}"
    rows[bf_key] = {"mpx_s": round(size * size / 1e6 / t, 1),
                    "tflop_s": round(fl / t / 1e12, 1)}
    print(cfg, bf_key, rows[bf_key], flush=True)

    for tb in [int(x) for x in os.environ.get("TBS", "256").split(",")]:
        qeng = InferenceEngine(hp, params, variant, 0.3, 0.2, tile_batch=tb,
                               compute_dtype=jnp.bfloat16, quantized=True)
        t0 = time.perf_counter()
        qs = qeng._quant_for_raw(
            (np.random.RandomState(1).rand(size, size) * 60000).astype(
                np.uint16
            ), -1, True,
        )
        calib_s = time.perf_counter() - t0
        t = bench(qeng, size, qs=qs)
        rows[f"int8_tb{tb}"] = {
            "mpx_s": round(size * size / 1e6 / t, 1),
            "tflop_s": round(fl / t / 1e12, 1),
            "calib_s": round(calib_s, 1),
            "speedup_vs_bf16": round(
                (fl / t / 1e12) / rows[bf_key]["tflop_s"], 3
            ),
        }
        print(cfg, f"int8_tb{tb}", rows[f"int8_tb{tb}"], flush=True)
    report[f"{cfg}_{size}"] = {"slide": size,
                               "slide_tflop": round(fl / 1e12, 2),
                               "modes": rows}

# merge into any prior report so size/config sweeps accumulate
path = "/root/repo/scripts/int8_infer_report.json"
try:
    with open(path) as f:
        prior = json.load(f)
except (OSError, ValueError):
    prior = {}
prior.update(report)
with open(path, "w") as f:
    json.dump(prior, f, indent=1)
print(json.dumps(report))
