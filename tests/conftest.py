"""Test harness config: CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a simulated 8-device CPU mesh
(``--xla_force_host_platform_device_count``); the real-TPU path is
exercised by ``bench.py`` / the driver.  The site config pins
``JAX_PLATFORMS=axon`` and pre-imports jax, so the platform override must
go through ``jax.config`` rather than the environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Pin the persistent XLA cache to a FRESH per-session dir before any
# test can enable the shared one: ~/.cache/unmicst_tpu_xla persists
# across driver sessions that run on different host CPUs, and XLA
# loads cross-machine CPU AOT entries with a "could lead to execution
# errors" warning — observed once as silently wrong int8 numerics in
# the full suite (test_stream_quantized_matches_whole_quantized,
# 2026-08-20).  compcache.enable() is idempotent, so CLI/serve tests
# that call it later no-op instead of re-pointing at the shared dir;
# within-session caching (the speed win) is preserved.
import tempfile  # noqa: E402

from unmicst_tpu.utils import compcache  # noqa: E402

compcache.enable(tempfile.mkdtemp(prefix="unmicst-test-xla-"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE)


needs_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)
