"""Profiling utility tests."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from honerf_tpu.utils.profiling import StepTimer, annotate, force_value, trace


def test_force_value_and_annotate():
    x = jnp.asarray([3.5])
    assert force_value(x) == 3.5
    with annotate("phase"):
        y = jnp.sum(x)
    assert force_value(y) == 3.5


def test_step_timer_measures_steps():
    @jax.jit
    def step(x):
        return x * 1.0001 + 0.1

    x = jnp.ones((64,))
    timer = StepTimer(sync_every=5)
    for _ in range(21):
        x = step(x)
        timer.tick(x)
    s = timer.summary()
    assert s["ms_per_step"] is not None and s["ms_per_step"] >= 0
    assert s["steps_per_sec"] > 0


def test_trace_noop_without_logdir():
    with trace(None):
        pass


def test_packed_fetch_round_trips_mixed_chunks():
    """packed_fetch materializes device scalars, (K,) arrays, and host
    numpy values in one transfer, preserving per-chunk grouping."""
    import numpy as np

    from honerf_tpu.utils.profiling import packed_fetch

    chunks = [
        {"loss": jnp.arange(4.0), "psnr": jnp.asarray(31.5)},
        {"loss": jnp.arange(8.0) * 2.0, "host": np.float32(7.0)},
        {},
    ]
    out = packed_fetch(chunks)
    assert len(out) == 3
    np.testing.assert_allclose(out[0]["loss"], np.arange(4.0))
    np.testing.assert_allclose(out[0]["psnr"], [31.5])
    np.testing.assert_allclose(out[1]["loss"], np.arange(8.0) * 2.0)
    np.testing.assert_allclose(out[1]["host"], [7.0])
    assert out[2] == {}


def test_packed_fetch_empty():
    from honerf_tpu.utils.profiling import packed_fetch

    assert packed_fetch([]) == []
