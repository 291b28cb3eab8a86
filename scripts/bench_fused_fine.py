"""TPU benchmark: hand train step with the differentiable fused fine pass
(ops/fused_fine.py) OFF vs ON, at the reference protocol (441 rays,
64+64 samples, 4 up-sample steps, full 8x256/r7 architecture).

Also sanity-compares the two paths' loss trajectories over a few steps
(same data/keys) and checks gradient finiteness on TPU.

Run: env PYTHONPATH=/root/repo python scripts/bench_fused_fine.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from honerf_tpu.models import (
    ColorConfig, SDFConfig, init_color_params, init_sdf_params,
    init_se3_refine, init_variance_params,
)
from honerf_tpu.render import RenderConfig
from honerf_tpu.train import TrainHyper, init_train_state
from honerf_tpu.train.offline import make_hand_train_step

from __graft_entry__ import _hand_batch


def bench_step(step, state, batch, iters=20, warmup=3):
    key = jax.random.PRNGKey(0)

    def run(state, key):
        key, sub = jax.random.split(key)
        return step(state, batch, sub), key

    for _ in range(warmup):
        (state, metrics), key = run(state, key)
    loss = float(metrics["loss"])  # value-fetch barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        (state, metrics), key = run(state, key)
    final = float(metrics["loss"])  # barrier
    dt = (time.perf_counter() - t0) / iters
    return dt, loss, final, state


def main():
    trunk = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    sdf_cfg = SDFConfig(kind="hand", r_multires=7, trunk_dtype=trunk)
    color_cfg = ColorConfig(kind="hand", r_multires=7, trunk_dtype=trunk)
    rcfg = RenderConfig()
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(8, "hand"),
    }
    batch = _hand_batch(441)
    print(f"backend={jax.default_backend()} trunk={trunk}", flush=True)

    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "off", "xla", "pallas"]
    results = {}
    for mode in modes:
        fine = False if mode == "off" else mode
        tcfg = TrainHyper(batch_size=441, vgg_weight=0.0, fused_fine=fine)
        state = init_train_state(params, tcfg)
        step = jax.jit(make_hand_train_step(sdf_cfg, color_cfg, rcfg, tcfg))
        t0 = time.perf_counter()
        dt, first, final, state = bench_step(step, state, batch)
        print(
            f"fused_fine={mode}: {dt*1e3:.2f} ms/step -> {441/dt:.0f} "
            f"rays/s (warm loss {first:.4f} -> {final:.4f}; total incl "
            f"compile {time.perf_counter()-t0:.0f}s)",
            flush=True,
        )
        assert np.isfinite(final), "non-finite loss"
        results[mode] = dt
    if "off" in results:
        for mode, dt in results.items():
            if mode != "off":
                print(f"{mode}: {results['off']/dt:.2f}x vs off", flush=True)


if __name__ == "__main__":
    main()
