"""Stripe-plan A/B on the real chip: r1 R-policy vs `infer.plan_stripes`.

Labeling caveat: the "old" arm restores only r1's *R policy*
(R = tile_batch // npc, chunk saturated at tile_batch); the engine's
forward is always the current zero-padding remainder-split, which cannot
reproduce r1's pad-to-full-chunk forwards (e.g. legacy 16k: 171
tiles/stripe -> 2 x 128 = +33% padded FLOPs under true r1).  The "old"
numbers therefore UNDERSTATE the full gain vs the genuine r1 engine; the
true-r1 per-size row lives in BASELINE.md ("Whole-image ceiling removed",
146/164/241/174/218 Mpx/s).

Run on the real chip:  python - < scripts/stripe_autotune_tpu.py
Writes scripts/stripe_autotune_report.json (consumed by BASELINE.md);
the iteration history is scripts/stripe_autotune_history.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from unmicst_tpu.core import tiler
from unmicst_tpu.core.checkpoint import load_params_for_bundle
from unmicst_tpu.core.hp import load_model_dir
from unmicst_tpu import infer as inf
from unmicst_tpu.utils.compcache import enable as enable_cache

enable_cache()
print("device:", jax.devices()[0], flush=True)
bundle = load_model_dir("/root/reference/models/nucleiDAPI")
params = load_params_for_bundle(bundle)
hp = bundle.hp
TB = 256  # the measured MXU-optimal tile batch (BASELINE.md sweep)

new_plan = inf.plan_stripes


def old_plan(npr, npc, tile_batch):
    r = max(1, min(npr, tile_batch // max(1, npc)))
    return r, min(tile_batch, r * npc)


win = jnp.asarray(tiler.ramp_window(hp.im_size, hp.margin))
report = {}


def bench(size, raw, dtype, precision, plan):
    inf.plan_stripes = plan
    try:
        eng = inf.InferenceEngine.from_bundle(
            bundle, params, compute_dtype=dtype, precision=precision,
            tile_batch=TB,
        )
        jitted = eng._build_slide(size, size, np.uint16, -1, True, None)
        out = jitted(params, raw, win)
        np.asarray(out[0, 0, 0])  # force completion (tunnel ack quirk)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = jitted(params, raw, win)
            np.asarray(out[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        return best
    finally:
        inf.plan_stripes = new_plan


for size in (4096, 8192, 12288, 16384, 20000):
    rng = np.random.RandomState(0)
    raw = jnp.asarray((rng.rand(size, size) * 60000).astype(np.uint16))
    grid = tiler.make_grid(size, size, hp.im_size, hp.margin)
    for label, plan in (("old", old_plan), ("new", new_plan)):
        t = bench(size, raw, jnp.bfloat16, None, plan)
        r, chunk = plan(grid.npr, grid.npc, TB)
        key = f"bf16_{size}_{label}"
        report[key] = {
            "mpx_s": round(size * size / 1e6 / t, 1),
            "wall_s": round(t, 4), "R": r, "chunk": chunk,
            "npr": grid.npr, "npc": grid.npc,
        }
        print(key, report[key], flush=True)
    if size in (4096, 16384):
        for label, plan in (("old", old_plan), ("new", new_plan)):
            t = bench(size, raw, None, "high", plan)
            key = f"high_{size}_{label}"
            report[key] = {
                "mpx_s": round(size * size / 1e6 / t, 1),
                "wall_s": round(t, 4),
            }
            print(key, report[key], flush=True)
    del raw

with open("/root/repo/scripts/stripe_autotune_report.json", "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report))
