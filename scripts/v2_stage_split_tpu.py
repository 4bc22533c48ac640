"""Stage split for the v2/default architecture, device-resident.

The legacy flagship's split is published (BASELINE.md: tail = 13% of
resident wall); this measures the same decomposition for the
nucleiDAPI1-5 architecture so the gap between its 63% whole-pipeline
MFU and the MXU peak is attributed, not guessed: batched tile forward
alone vs the full raw-slide program (device preprocess + unfold +
forward + blend + quantize).

Run: python - < scripts/v2_stage_split_tpu.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from unmicst_tpu.utils.compcache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp

from unmicst_tpu.core import tiler, unet
from unmicst_tpu.core.hp import HParams
from unmicst_tpu.infer import InferenceEngine
from unmicst_tpu.utils.flops import slide_flops

PEAK = 197e12
SIZE = 8192
hp = HParams(im_size=64, n_channels=1, n_classes=3, n_out0=80,
             feat_maps_fact=2, down_samp_fact=2, ks=3, n_extra_convs=0,
             std_dev0=0.03, n_layers=4, batch_size=32)
params = unet.init_params(jax.random.PRNGKey(0), hp, "v2")
rng = np.random.RandomState(0)
report = {"slide": SIZE, "modes": {}}

for label, kw in (("bf16", dict(compute_dtype=jnp.bfloat16)),
                  ("high", dict(precision="high"))):
    eng = InferenceEngine(hp, params, "v2", 0.3, 0.2, **kw)
    tb = eng.tile_batch
    # full program
    slide = (rng.rand(SIZE, SIZE) * 60000).astype(np.uint16)
    jitted = eng._build_slide(SIZE, SIZE, np.uint16, -1, True, None)
    raw = jnp.asarray(slide)
    win = jnp.asarray(tiler.ramp_window(hp.im_size, hp.margin))
    _ = np.asarray(jitted(eng.params, raw, win)[0, 0, 0])
    full = np.inf
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jitted(eng.params, raw, win)[0, 0, 0])
        full = min(full, time.perf_counter() - t0)

    # forward only: the same number of tiles, chunked identically
    grid = tiler.make_grid(SIZE, SIZE, hp.im_size, hp.margin)
    n_tiles = grid.num_tiles

    cdt = kw.get("compute_dtype")
    prec = kw.get("precision")

    @jax.jit
    def fwd_all(p, tiles):
        def body(c, t):
            return c, unet.apply(p, t, hp, "v2", compute_dtype=cdt,
                                 precision=prec)

        _, out = jax.lax.scan(body, 0, tiles)
        return out

    # time a representative subset of chunks (the full tile set would
    # cost ~25 s of tunnel H2D alone) and scale per-tile
    n_chunks = min(32, max(1, n_tiles // tb))
    tiles = jnp.asarray(
        rng.rand(n_chunks, tb, hp.im_size, hp.im_size, 1).astype(np.float32)
    )
    _ = np.asarray(fwd_all(eng.params, tiles)[0, 0, 0, 0, 0])
    fwd = np.inf
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(fwd_all(eng.params, tiles)[0, 0, 0, 0, 0])
        fwd = min(fwd, time.perf_counter() - t0)
    fwd_scaled = fwd * (n_tiles / (n_chunks * tb))

    fl = slide_flops(hp, SIZE, SIZE, "v2")
    report["modes"][label] = {
        "tile_batch": tb,
        "full_s": round(full, 4),
        "full_tflop_s": round(fl / full / 1e12, 1),
        "full_mfu": round(fl / full / PEAK, 3),
        "forward_only_s_scaled": round(fwd_scaled, 4),
        "forward_tflop_s": round(fl / fwd_scaled / 1e12, 1),
        "forward_mfu": round(fl / fwd_scaled / PEAK, 3),
        "tail_fraction": round(1 - fwd_scaled / full, 3),
    }
    print(label, report["modes"][label], flush=True)

with open("/root/repo/scripts/v2_stage_split_report.json", "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report))
