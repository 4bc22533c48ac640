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
