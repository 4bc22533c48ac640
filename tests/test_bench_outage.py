"""bench.py outage hardening (r3 verdict item 1): a TPU-backend outage
must produce ONE parseable JSON line, never a traceback — BENCH_r03.json
was 40 lines of jax internals because the tunnel died at capture time.

These run bench.py as the driver does (``python bench.py``) with the
probe machinery steered via its env knobs.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def run_bench(extra_env: dict, timeout: int = 300):
    env = dict(os.environ)
    env.update(extra_env)
    r = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        timeout=timeout, env=env, cwd=REPO,
    )
    # the contract: rc 0 and a single JSON object on the LAST stdout line
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no stdout; stderr: {r.stderr[-2000:]}"
    return json.loads(lines[-1])


def test_probe_timeout_emits_structured_error():
    out = run_bench({
        "BENCH_PROBES": "1",
        "BENCH_PROBE_TIMEOUT": "2",  # < jax import time: forced timeout
    })
    assert out["error"] == "tpu_backend_unavailable"
    assert out["value"] is None and out["vs_baseline"] is None
    assert out["metric"] == "tiled_unet_inference_throughput"
    assert "timed out" in out["detail"]["last_probe"]
    # the error line must still carry the last driver-recorded figures
    assert out["last_good"]["artifact"] in ("BENCH_r01", "BENCH_r02")
    assert out["last_good"]["value"] is not None


def test_cpu_fallback_is_refused_without_optin():
    """A silent axon->cpu fallback must not masquerade as a TPU number."""
    out = run_bench({
        "BENCH_PROBES": "1",
        "BENCH_FORCE_PLATFORM": "cpu",  # simulate the fallback
        "BENCH_ALLOW_CPU": "0",
    })
    assert out["error"] == "tpu_backend_unavailable"
    assert "cpu" in out["detail"]["last_probe"]


@pytest.mark.slow
def test_happy_path_smoke_on_cpu():
    """The FULL bench path (probe -> engine -> walls -> JSON) must keep
    running off-chip, so a broken bench is caught before round end."""
    out = run_bench({
        "BENCH_FORCE_PLATFORM": "cpu",
        "BENCH_ALLOW_CPU": "1",
        "BENCH_SHOWCASE": "0",  # legacy wall only (device-resident legs
        "BENCH_SIZE": "256",    # are TPU-scale; ~50 s on this box)
        "BENCH_REPEATS": "1",
    }, timeout=540)
    assert "error" not in out
    assert out["value"] > 0 and out["vs_baseline"] > 0
    assert out["detail"]["wall"]["256x256_mpx_s"] > 0


def test_last_good_parses_recorded_artifact():
    sys.path.insert(0, REPO)
    try:
        import bench

        lg = bench._last_good()
    finally:
        sys.path.remove(REPO)
    if lg["artifact"] is not None:  # repo ships BENCH_r01/r02
        assert lg["value"] > 0 and lg["unit"] == "Mpx/s/chip"
