"""Utility coverage: stage timers, numerics checking, device selection."""

import time

import jax
import numpy as np
import pytest

from unmicst_tpu.runtime.devices import describe, select_device
from unmicst_tpu.utils.profiling import StageTimer, check_numerics


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("read"):
        time.sleep(0.01)
    with t.stage("read"):
        time.sleep(0.01)
    with t.stage("compute"):
        pass
    assert t.totals["read"] >= 0.02
    report = t.report(mpx=1.0)
    assert "read" in report and "Mpx/s" in report


def test_check_numerics_passes_and_raises():
    check_numerics({"a": np.ones(3), "b": [np.zeros(2)]}, "ok-tree")
    with pytest.raises(FloatingPointError) as e:
        check_numerics({"a": np.array([1.0, np.nan])}, "bad-tree")
    assert "bad-tree" in str(e.value)
    # integer leaves are ignored
    check_numerics({"i": np.array([1, 2], np.int32)})


def test_select_device():
    dev = select_device(-1)
    assert dev in jax.local_devices()
    assert select_device(0) == jax.local_devices()[0]
    with pytest.raises(ValueError):
        select_device(10_000)
    assert "[0]" in describe()


def test_unet_flops_cross_checked_vs_xla():
    """Analytic FLOP counts stay within 25% of XLA's own cost analysis
    (XLA counts SAME-padding border effects; we count full taps)."""
    import jax
    import jax.numpy as jnp

    from unmicst_tpu.core import unet
    from unmicst_tpu.core.hp import HParams
    from unmicst_tpu.utils.flops import unet_flops_per_tile

    for variant, hp in [
        ("legacy", HParams(im_size=64, n_channels=1, n_classes=3, n_out0=8,
                           ks=5, n_extra_convs=1, n_layers=2, batch_size=2)),
        ("v2", HParams(im_size=64, n_channels=1, n_classes=3, n_out0=8,
                       ks=3, n_extra_convs=0, n_layers=4, batch_size=2)),
    ]:
        params = unet.init_params(jax.random.PRNGKey(0), hp, variant)
        f = jax.jit(lambda p, x, hp=hp, v=variant: unet.apply(p, x, hp, v))
        x = jnp.zeros((1, hp.im_size, hp.im_size, hp.n_channels))
        xla = f.lower(params, x).compile().cost_analysis().get("flops")
        ours = unet_flops_per_tile(hp, variant)
        assert xla is not None
        assert abs(ours - xla) / xla < 0.25, (variant, ours, xla)


def test_chunked_forward_matches_direct():
    """Full chunks + static remainder == one direct batch, for n < chunk,
    n == k*chunk, and n == k*chunk + rem."""
    import jax.numpy as jnp

    from unmicst_tpu.utils.batching import chunked_forward

    def fwd_pure(t):  # per-element op (UNet forwards are batch-invariant)
        return t * 2.0 + 1.0

    rng = np.random.RandomState(0)
    for n, chunk in [(5, 8), (16, 8), (21, 8), (1, 4), (8, 8)]:
        x = jnp.asarray(rng.rand(n, 3, 3).astype(np.float32))
        got = np.asarray(chunked_forward(fwd_pure, x, chunk))
        np.testing.assert_allclose(got, np.asarray(x) * 2.0 + 1.0, rtol=1e-6)
        assert got.shape == (n, 3, 3)


def test_plan_stripes_policy():
    from unmicst_tpu.infer import plan_stripes

    # whole image in one stripe while tiles fit 8x tile_batch
    assert plan_stripes(43, 43, 256) == (43, 256)
    assert plan_stripes(10, 10, 256) == (10, 100)  # chunk capped at tiles
    # beyond: smallest R with remainder <= 10% of stripe tiles
    assert plan_stripes(86, 86, 256) == (3, 256)    # 258 = 256 + 2
    assert plan_stripes(128, 128, 256) == (2, 256)  # exact
    assert plan_stripes(171, 171, 256) == (3, 256)  # 513 = 2x256 + 1
    assert plan_stripes(209, 209, 256) == (3, 256)  # 627 = 2x256 + 115 (18%)
    # invariants across geometries
    for npr, npc, tb in [(1, 1, 256), (500, 2, 64), (3, 3000, 256),
                         (77, 13, 128), (1024, 7, 256)]:
        r, chunk = plan_stripes(npr, npc, tb)
        assert 1 <= r <= npr
        assert 1 <= chunk <= tb


def test_program_cache_eviction_and_concurrency():
    """FIFO eviction at the bound; hits return the cached object; a key
    evicted and re-requested rebuilds; concurrent first requests build
    once (the lock serializes compiles)."""
    import threading

    from unmicst_tpu.utils.progcache import ProgramCache

    cache = ProgramCache(max_entries=2)
    builds = []

    def make(key):
        return lambda: builds.append(key) or ("prog", key)

    a = cache.get_or_build("a", make("a"))
    assert cache.get_or_build("a", make("a")) is a
    cache.get_or_build("b", make("b"))
    cache.get_or_build("c", make("c"))  # evicts "a" (FIFO)
    assert builds == ["a", "b", "c"]
    cache.get_or_build("a", make("a"))  # rebuild after eviction
    assert builds == ["a", "b", "c", "a"]

    slow_cache = ProgramCache(max_entries=4)
    n_builds = []

    def slow_build():
        n_builds.append(1)
        return object()

    results = []
    threads = [
        threading.Thread(
            target=lambda: results.append(
                slow_cache.get_or_build("k", slow_build)
            )
        )
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(n_builds) == 1 and all(r is results[0] for r in results)


def test_program_cache_hit_not_blocked_by_unrelated_build():
    # regression: the cache used to hold one global lock across the whole
    # build, so a hit blocked behind an unrelated key's 10-200 s compile
    import threading

    from unmicst_tpu.utils.progcache import ProgramCache

    cache = ProgramCache(max_entries=4)
    cache.get_or_build("fast", lambda: "fast-prog")
    release, entered = threading.Event(), threading.Event()

    def slow_build():
        entered.set()
        assert release.wait(10)
        return "slow-prog"

    owner = threading.Thread(
        target=lambda: cache.get_or_build("slow", slow_build)
    )
    owner.start()
    assert entered.wait(10)
    res, done = [], threading.Event()
    reader = threading.Thread(
        target=lambda: (
            res.append(cache.get_or_build("fast", lambda: "dup")),
            done.set(),
        )
    )
    reader.start()
    assert done.wait(5), "cache hit blocked behind an unrelated build"
    assert res == ["fast-prog"]
    release.set()
    owner.join(10)
    reader.join(10)
    assert cache.get_or_build("slow", lambda: "dup") == "slow-prog"


def test_program_cache_build_error_recovers():
    from unmicst_tpu.utils.progcache import ProgramCache

    cache = ProgramCache(max_entries=4)
    with pytest.raises(RuntimeError):
        cache.get_or_build("k", lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    # a failed build must not wedge the key
    assert cache.get_or_build("k", lambda: "ok") == "ok"


def test_describe_indices_are_valid_gpu_flags():
    # describe()'s [i] entries must be valid --GPU arguments: both sides
    # enumerate jax.local_devices() (the global list diverges on multi-host)
    entries = describe().split(", ")
    assert len(entries) == len(jax.local_devices())
    last = len(entries) - 1
    assert select_device(last) is jax.local_devices()[last]
