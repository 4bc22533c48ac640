"""s2d refold throughput across the zoo's other geometries.

The flagship A/B (scripts/s2d_ab_tpu.py: nucleiDAPI ks5/im128, real
weights) measured +9.8% f32-HIGH / +2.2% bf16.  This sweep covers the
remaining shape families to decide whether the refold can default on
(it must NEVER lose) or stays an opt-in:

  * incell  — CytoplasmIncell (REAL weights): legacy ks3 im128 nOut0=24
  * zeiss   — CytoplasmZeissNikon shape (random): legacy ks3 im256
              nOut0=24 3-layer (the 256^2-tile family)
  * v2solo  — nucleiDAPI1-5 shape (random): v2 ks3 im64 nOut0=80
              4-layer (the wide default tool; level 0 is already 80
              channels out)

Throughput-only (min of 3, 1-element fetch); exactness is pinned by
tests/test_s2d.py + the flagship A/B's on-device diff.

Run: python - < scripts/s2d_sweep_tpu.py
Report: scripts/s2d_sweep_report.json
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
from unmicst_tpu.core.checkpoint import load_params_for_bundle
from unmicst_tpu.core.hp import HParams, load_model_dir
from unmicst_tpu.infer import InferenceEngine
from unmicst_tpu.utils.compcache import enable as enable_cache

enable_cache()

SIZE = int(os.environ.get("S2D_SWEEP_SIZE", "8192"))
REPEATS = 3


def real(name):
    b = load_model_dir(f"/root/reference/models/{name}")
    return b.hp, load_params_for_bundle(b), b.variant, b.mean, b.std


def rand(hp, variant):
    return hp, unet.init_params(jax.random.PRNGKey(0), hp, variant), \
        variant, 0.3, 0.2


CONFIGS = {
    "incell": lambda: real("CytoplasmIncell"),
    "zeiss": lambda: rand(HParams(
        im_size=256, n_channels=1, n_classes=3, n_out0=24, ks=3,
        n_extra_convs=1, n_layers=3), "legacy"),
    "v2solo": lambda: rand(HParams(
        im_size=64, n_channels=1, n_classes=3, n_out0=80, ks=3,
        n_extra_convs=0, n_layers=4, batch_size=32), "v2"),
}

rng = np.random.RandomState(0)
slide = (rng.rand(SIZE, SIZE) * 60000).astype(np.uint16)
raw_dev = jnp.asarray(slide)
print("device:", jax.devices()[0], flush=True)
report = {"slide": SIZE, "device": str(jax.devices()[0]), "configs": {}}

for cfg in os.environ.get("S2D_SWEEP_CONFIGS", "incell,zeiss,v2solo").split(","):
    hp, params, variant, mean, std = CONFIGS[cfg]()
    win_dev = jnp.asarray(tiler.ramp_window(hp.im_size, hp.margin))
    rows = {}
    for label, kw in [("bf16", dict(compute_dtype=jnp.bfloat16)),
                      ("f32_high_parity", dict(precision="high"))]:
        row = {}
        for name, extra in [("standard", {}), ("s2d", dict(s2d=True))]:
            eng = InferenceEngine(hp, params, variant, mean, std, **kw,
                                  **extra)
            jitted = eng._build_slide(SIZE, SIZE, np.dtype(np.uint16), -1,
                                      True, None)
            out = jitted(eng.params, raw_dev, win_dev)
            np.asarray(out[0, 0, 0])
            best = np.inf
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                out = jitted(eng.params, raw_dev, win_dev)
                np.asarray(out[0, 0, 0])
                best = min(best, time.perf_counter() - t0)
            row[f"{name}_mpx_s"] = round(SIZE * SIZE / 1e6 / best, 1)
            row[f"{name}_s"] = round(best, 3)
        row["speedup"] = round(row["standard_s"] / row["s2d_s"], 3)
        rows[label] = row
        print(cfg, label, json.dumps(row), flush=True)
    report["configs"][cfg] = rows

with open("/root/repo/scripts/s2d_sweep_report.json", "w") as f:
    json.dump(report, f, indent=1)
losses = [
    (c, m, r["speedup"]) for c, rs in report["configs"].items()
    for m, r in rs.items() if r["speedup"] < 0.99
]
print("LOSSES:", losses if losses else "none", flush=True)
