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
