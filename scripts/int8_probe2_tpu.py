"""Second int8 probe: pure MXU chains, minimal feedback elementwise.

bf16 chain: y = x @ B repeated (bf16 in/out — no casts at all).
int8 chain: y = x @ B (s32) -> convert to s8 (one elementwise).
Also checks the HLO: whether the s8 dot survives to the backend or XLA
upcasts it (equal timings + a convert-before-dot would mean no native
int8 MXU path through this stack).

Run: python - < scripts/int8_probe2_tpu.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from unmicst_tpu.utils.compcache import enable as enable_cache

enable_cache()
print("device:", jax.devices()[0])

ITERS = 50
M = K = N = 4096


def timeit(fn, *args, reps=3):
    o = fn(*args)
    _ = np.asarray(o.ravel()[0])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(*args)
        _ = np.asarray(o.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


A = np.random.randint(-3, 3, (M, K)).astype(np.float32)
B = np.random.randint(-127, 127, (K, N), dtype=np.int8)


@jax.jit
def chain_bf16(a, b):
    def step(x, _):
        return jnp.dot(x, b), ()  # bf16 x bf16 -> bf16, no casts

    out, _ = lax.scan(step, a, None, length=ITERS)
    return out


@jax.jit
def chain_int8(a, b):
    def step(x, _):
        y = lax.dot_general(
            x, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return lax.convert_element_type(y, jnp.int8), ()

    out, _ = lax.scan(step, a, None, length=ITERS)
    return out


fl = 2 * M * K * N * ITERS
report = {}
t = timeit(chain_bf16, jnp.asarray(A, jnp.bfloat16),
           jnp.asarray(B.astype(np.float32), jnp.bfloat16))
report["chain_bf16_tflop_s"] = round(fl / t / 1e12, 1)
a8 = jnp.asarray(A.astype(np.int8))
b8 = jnp.asarray(B)
t = timeit(chain_int8, a8, b8)
report["chain_int8_tops"] = round(fl / t / 1e12, 1)
print(report)

# HLO inspection: does the compiled int8 program still contain an s8xs8
# dot, or did XLA insert converts and run it in bf16/f32?
txt = jax.jit(chain_int8).lower(a8, b8).compile().as_text()
has_s8_dot = False
for line in txt.splitlines():
    if ("dot(" in line or "convolution(" in line) and "s8" in line:
        has_s8_dot = True
        print("HLO:", line.strip()[:160])
report["backend_s8_dot"] = has_s8_dot
if not has_s8_dot:
    for line in txt.splitlines():
        if "dot(" in line:
            print("HLO:", line.strip()[:160])
            break

with open("/root/repo/scripts/int8_probe2_report.json", "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report))
