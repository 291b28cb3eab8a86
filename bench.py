"""Benchmark: offline-stage training throughput in rays/sec/chip.

Measures the FULL object-model train step (hierarchical 64+64 sampling with
4 up-sample steps, 128-sample fine pass with eikonal double-backprop,
masked losses, Adam update) at the reference batch size of 441 rays/step —
the workload of `exp_runner.py --mode train` on
confs/wmask_realobj_bean.conf (SURVEY.md §6).

Runs in the bf16-trunk fast mode (bfloat16 activations through the MLP
trunks, f32 matmul accumulation and losses): quality-gated against f32 on
1200-step synthetic-scene runs for both models — PSNR trajectories match
(obj 28.6 vs 28.7, hand 27.6 vs 27.5; scripts/quality_obj_bf16.py,
BENCH_NOTES.md "bf16 trunk fast mode").

Baseline: the reference publishes no throughput numbers (BASELINE.md).  We
normalize against an ESTIMATED 4410 rays/s for the PyTorch reference on its
RTX 3080 Ti (10 train steps/s at 441 rays — ~106k field evals + autograd
double-backprop per step; see BASELINE.md's workload table).  vs_baseline
is measured_rays_per_sec / 4410.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

BASELINE_RAYS_PER_SEC = 4410.0
BATCH = 441
WARMUP = 3
ITERS = 20


def main() -> None:
    from honerf_tpu.models import (
        ColorConfig,
        SDFConfig,
        init_color_params,
        init_sdf_params,
        init_se3_refine,
        init_variance_params,
    )
    from honerf_tpu.render import RenderConfig
    from honerf_tpu.train import TrainHyper, init_train_state, make_obj_train_step
    from honerf_tpu.data.synthetic import look_at_camera

    sdf_cfg = SDFConfig(kind="obj", trunk_dtype="bf16")
    color_cfg = ColorConfig(kind="obj", trunk_dtype="bf16")
    rcfg = RenderConfig()  # 64 + 64, up=4, perturb=1 — reference config
    tcfg = TrainHyper(batch_size=BATCH, vgg_weight=0.0)

    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(64, "obj"),
    }
    state = init_train_state(params, tcfg)
    step = jax.jit(make_obj_train_step(sdf_cfg, color_cfg, rcfg, tcfg))

    rng = np.random.default_rng(0)
    R, T = look_at_camera(np.asarray([0.0, 0.2, -0.9]), np.zeros(3))
    batch = {
        "rays_xy": jnp.asarray(rng.uniform(-0.5, 0.5, (BATCH, 2)).astype(np.float32)),
        "true_rgb": jnp.asarray(rng.uniform(0, 1, (BATCH, 3)).astype(np.float32)),
        "true_mask": jnp.asarray(
            (rng.uniform(0, 1, (BATCH, 1)) > 0.4).astype(np.float32)
        ),
        "cam_R": jnp.asarray(R),
        "cam_T": jnp.asarray(T),
        "focal": jnp.asarray([3.0, 3.0], dtype=jnp.float32),
        "principal": jnp.zeros(2, dtype=jnp.float32),
        "Ro": jnp.eye(3),
        "To": jnp.zeros(3),
        "joints": jnp.zeros((21, 3)),
        "t_pose_21": jnp.zeros((21, 3)),
        "bone_length": jnp.zeros((20,)),
        "index": jnp.asarray(0, dtype=jnp.int32),
    }

    key = jax.random.PRNGKey(0)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
    # force a VALUE fetch: on the tunneled TPU backend block_until_ready
    # returns before the device finishes; only materializing the scalar
    # guarantees completion (and triggers the lazy remote compile)
    assert np.isfinite(float(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
    assert np.isfinite(float(metrics["loss"]))
    dt = time.perf_counter() - t0

    rays_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "offline_obj_train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
