"""Benchmark: tiled UNet whole-slide inference throughput on one TPU chip.

Workload: the flagship legacy ``nucleiDAPI`` model (the zoo checkpoint that
ships in-repo) over a synthetic uint16 slide, full pipeline per call —
host canvas assembly, H2D, normalize, unfold, batched forward (bf16 MXU
path), window blend, divide, crop, D2H — all 3 classes in one pass.

Baseline: the reference's execution model (per-class full re-runs, batch-16
feed-dict steps, fp16 numpy blending) reproduced in torch on CPU — the
hardware the reference's own CI uses; it publishes no GPU numbers
(BASELINE.md).  Measured once via ``scripts/baseline_torch.py`` and pinned
below.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# Measured on this host (see BASELINE.md "Measured baselines"):
# reference-style torch CPU executor, 2048x2048 slide, 2 class passes.
BASELINE_CPU_MPX_S = float(os.environ.get("UNMICST_BASELINE_MPX_S", "0.121"))

SIZE = int(os.environ.get("BENCH_SIZE", "4096"))
PRECISION = os.environ.get("BENCH_PRECISION", "float32")
TILE_BATCH = int(os.environ.get("BENCH_TILE_BATCH", "256"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def main() -> None:
    import jax

    from unmicst_tpu.utils.compcache import enable as enable_cache

    enable_cache()

    from unmicst_tpu.core.checkpoint import load_params_for_bundle
    from unmicst_tpu.core.hp import load_model_dir
    from unmicst_tpu.infer import InferenceEngine

    import jax.numpy as jnp

    model_dir = os.environ.get(
        "BENCH_MODEL_DIR", "/root/reference/models/nucleiDAPI"
    )
    bundle = load_model_dir(model_dir)
    params = load_params_for_bundle(bundle)
    # float32/HIGHEST matches the reference's own outputs within one uint8
    # level (bf16 drifts up to ~26 levels); on the link-bound pipeline the
    # accuracy-safe mode costs only ~8% wall-clock.
    compute_dtype = jnp.bfloat16 if PRECISION == "bfloat16" else None
    engine = InferenceEngine.from_bundle(
        bundle, params, compute_dtype=compute_dtype, tile_batch=TILE_BATCH
    )

    rng = np.random.RandomState(0)
    # synthetic uint16 slide (random texture; defeats constant folding)
    slide = (rng.rand(SIZE, SIZE) * 60000).astype(np.uint16)

    # warmup / compile; full raw-slide path (device preprocess + uint8 out)
    maps = engine.infer_slide(slide)
    assert maps.shape == (bundle.hp.n_classes, SIZE, SIZE)
    assert maps.dtype == np.uint8

    best = np.inf
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        maps = engine.infer_slide(slide)
        best = min(best, time.perf_counter() - t0)

    # device-resident figure: same program, inputs already in HBM — the
    # compute ceiling once the host link is out of the picture
    key = ("slide", SIZE, SIZE, np.dtype(slide.dtype), -1, True, None)
    jitted = engine._compiled[key]
    from unmicst_tpu.core import tiler

    raw_dev = jnp.asarray(slide)
    win_dev = jnp.asarray(
        tiler.ramp_window(bundle.hp.im_size, bundle.hp.margin)
    )
    out = jitted(engine.params, raw_dev, win_dev)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = jitted(engine.params, raw_dev, win_dev)
    out.block_until_ready()
    device_s = (time.perf_counter() - t0) / REPEATS

    mpx_s = SIZE * SIZE / 1e6 / best
    result = {
        "metric": "tiled_unet_inference_throughput",
        "value": round(mpx_s, 2),
        "unit": "Mpx/s/chip",
        "vs_baseline": round(mpx_s / BASELINE_CPU_MPX_S, 2),
        "detail": {
            "model": os.path.basename(model_dir),
            "slide": f"{SIZE}x{SIZE}",
            "classes_per_pass": int(bundle.hp.n_classes),
            "wall_s": round(best, 3),
            "device_resident_mpx_s": round(SIZE * SIZE / 1e6 / device_s, 1),
            "device": str(jax.devices()[0]),
            "precision": (
                "bfloat16 compute, f32 accumulate" if PRECISION == "bfloat16"
                else "float32 (HIGHEST) — reference-parity mode"
            ),
            "baseline": "reference-style torch CPU executor "
            f"({BASELINE_CPU_MPX_S} Mpx/s, per-class re-runs)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
