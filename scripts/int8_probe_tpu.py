"""Feasibility probe: int8 MXU throughput on TPU v5e vs bf16.

v5e datasheet: 394 TOPS int8 vs 197 TFLOP/s bf16 — IF XLA routes s8xs8->s32
matmuls/convs onto the MXU's int8 path, a quantized inference mode could
roughly double the device-resident ceiling.  Measures scan-amortized (20
chained iterations inside ONE jit — the tunnel has a ~30 ms dispatch floor
that swamps single ops; see ROADMAP.md "training-throughput measurement"):
  1. peak-shaped matmul, bf16 vs int8
  2. the v2 flagship's conv shapes (nucleiDAPI1-5: 80..1280 channels), both

Run: python - < scripts/int8_probe_tpu.py   (alone; tunnel compiles are
host-bound on the 1-core box)
"""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from unmicst_tpu.utils.compcache import enable as enable_cache

enable_cache()
print("device:", jax.devices()[0])

ITERS = 20


def timeit(fn, *args, reps=3):
    o = fn(*args)
    _ = np.asarray(o.ravel()[0])  # 1-element fetch (tunnel-safe completion)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(*args)
        _ = np.asarray(o.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


report = {}

# --- 1. peak-shaped matmul ---
M = K = N = 4096
A8 = np.random.randint(-127, 127, (M, K), dtype=np.int8)
B8 = np.random.randint(-127, 127, (K, N), dtype=np.int8)


@jax.jit
def mm_bf16(a, b):
    def step(x, _):
        y = jnp.dot(x, b)
        # feed back with a real data dependency, renormalized to avoid
        # inf (values irrelevant, only the MXU schedule matters)
        return (y * jnp.bfloat16(1e-6)).astype(jnp.bfloat16), ()

    out, _ = lax.scan(step, a, None, length=ITERS)
    return out


@jax.jit
def mm_int8(a, b):
    def step(x, _):
        y = lax.dot_general(
            x, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (y & 127).astype(jnp.int8), ()

    out, _ = lax.scan(step, a, None, length=ITERS)
    return out


fl = 2 * M * K * N * ITERS
t = timeit(mm_bf16, jnp.asarray(A8.astype(np.float32), jnp.bfloat16),
           jnp.asarray(B8.astype(np.float32), jnp.bfloat16))
report["matmul_bf16_tflop_s"] = round(fl / t / 1e12, 1)
t = timeit(mm_int8, jnp.asarray(A8), jnp.asarray(B8))
report["matmul_int8_tops"] = round(fl / t / 1e12, 1)
print("matmul:", report)

# --- 2. flagship conv shapes (v2 solo, batch 128) ---
dn = ("NHWC", "HWIO", "NHWC")
for s, c, B in [(64, 80, 128), (16, 320, 128), (4, 1280, 128)]:
    x8 = np.random.randint(-127, 127, (B, s, s, c), dtype=np.int8)
    w8 = np.random.randint(-127, 127, (3, 3, c, c), dtype=np.int8)
    dnum = lax.conv_dimension_numbers(x8.shape, w8.shape, dn)

    @partial(jax.jit, static_argnums=())
    def conv_bf16(x, w, dnum=dnum):
        def step(h, _):
            y = lax.conv_general_dilated(h, w, (1, 1), "SAME",
                                         dimension_numbers=dnum)
            return (y * jnp.bfloat16(1e-3)).astype(jnp.bfloat16), ()

        out, _ = lax.scan(step, x, None, length=ITERS)
        return out

    @partial(jax.jit, static_argnums=())
    def conv_int8(x, w, dnum=dnum):
        def step(h, _):
            y = lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=dnum,
                preferred_element_type=jnp.int32,
            )
            return (y & 127).astype(jnp.int8), ()

        out, _ = lax.scan(step, x, None, length=ITERS)
        return out

    fl = 2 * B * s * s * 9 * c * c * ITERS
    key = f"conv{s}x{s}_c{c}"
    tb = timeit(conv_bf16, jnp.asarray(x8.astype(np.float32), jnp.bfloat16),
                jnp.asarray(w8.astype(np.float32), jnp.bfloat16))
    try:
        ti = timeit(conv_int8, jnp.asarray(x8), jnp.asarray(w8))
        report[key] = {
            "bf16_tflop_s": round(fl / tb / 1e12, 1),
            "int8_tops": round(fl / ti / 1e12, 1),
            "speedup": round(tb / ti, 2),
        }
    except Exception as e:  # int8 conv may be unsupported on this backend
        report[key] = {
            "bf16_tflop_s": round(fl / tb / 1e12, 1),
            "int8_error": repr(e)[:200],
        }
    print(key, report[key])

with open("/root/repo/scripts/int8_probe_report.json", "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report))
