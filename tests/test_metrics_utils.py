"""Metrics/profiling utility coverage."""
import time

import jax.numpy as jnp
import numpy as np
import pytest

from mr_gnas_tpu.train.metrics import AverageMeter, ScalarLogger, Throughput, calc_time
from mr_gnas_tpu.utils import device_memory_stats, nan_check, timed


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, 2)
    m.update(4.0, 1)
    assert m.avg == pytest.approx(2.0)
    assert m.val == 4.0
    m.reset()
    assert m.count == 0


def test_throughput_warmup():
    t = Throughput(warmup=2)
    t.step(100)
    assert t.edges_per_sec == 0.0
    t.step(100)  # warmup boundary: timer starts
    time.sleep(0.01)
    t.step(100)
    assert t.edges_per_sec > 0


def test_calc_time():
    d = calc_time(90061)
    assert d == {"day": 1, "hour": 1, "minute": 1, "second": 1}


def test_scalar_logger(tmp_path):
    sl = ScalarLogger(str(tmp_path))
    sl.log(0, loss=1.5)
    sl.log(1, loss=1.2, acc=0.8)
    sl.close()
    import json

    recs = [json.loads(l) for l in open(sl.path)]
    assert recs[0]["loss"] == 1.5 and recs[1]["acc"] == 0.8


def test_nan_check():
    nan_check({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        nan_check({"a": jnp.asarray([1.0, np.nan])})


def test_device_memory_stats():
    s = device_memory_stats()
    assert "device" in s


def test_timed_context():
    sink = {}
    with timed(sink, "x"):
        time.sleep(0.005)
    assert sink["x"] >= 0.005


def test_guard_finite_raises_and_saves():
    import numpy as np
    import pytest

    from mr_gnas_tpu.train.metrics import NonFiniteLossError, guard_finite

    guard_finite(1.25, 0)  # finite: no-op
    called = []
    with pytest.raises(NonFiniteLossError):
        guard_finite(np.nan, 7, save_fn=lambda: called.append(1))
    assert called == [1]
    with pytest.raises(NonFiniteLossError):
        guard_finite(np.inf, 8)


def test_packed_fetch_matches_device_get():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mr_gnas_tpu.train.metrics import PackedFetch

    tree = {
        "zero": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "first": jnp.ones((4, 5), jnp.float32) * 0.25,
        "final": jnp.asarray([[1.5, -2.0]], jnp.float32),
    }
    fetch = PackedFetch(tree)
    got = fetch(tree)
    want = jax.device_get(tree)
    assert jax.tree_util.tree_structure(got) == jax.tree_util.tree_structure(want)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_array_equal(a, b)
        assert a.shape == b.shape


def test_packed_fetch_rejects_mixed_dtypes():
    import jax.numpy as jnp
    import pytest

    from mr_gnas_tpu.train.metrics import PackedFetch

    with pytest.raises(AssertionError, match="f32"):
        PackedFetch({"a": jnp.zeros(3, jnp.float32), "b": jnp.zeros(3, jnp.int32)})
