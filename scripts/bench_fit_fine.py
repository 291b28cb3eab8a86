"""TPU bench: single-frame fit '12' device step with the fused
differentiable fine pass OFF vs 'full' (ops/fused_fine_full.py) on the
hand side of the dual render.  make_single_fit_step upgrades 'full' to
the 'full_frozen' no-dW kernel variant (nets are frozen in the fit
step), so the 'full' row measures the frozen backward.

Measured (v5e, bf16): OFF 26.01 ms/step; 'full' WITH wasted dW
23.33 ms; 'full_frozen' (no-dW) — see BENCH_NOTES.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fit_fine.py
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

from honerf_tpu.data.synthetic import canonical_hand_joints, look_at_camera
from honerf_tpu.fit.single import (
    FitHyper, init_pose_params, make_single_fit_step,
)
from honerf_tpu.models import (
    ColorConfig, SDFConfig, init_color_params, init_sdf_params,
    init_variance_params,
)
from honerf_tpu.render import RenderConfig


def main():
    trunk = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    hand_sdf = SDFConfig(kind="hand", r_multires=7, trunk_dtype=trunk)
    hand_col = ColorConfig(kind="hand", r_multires=7, trunk_dtype=trunk)
    obj_sdf = SDFConfig(kind="obj", trunk_dtype=trunk)
    obj_col = ColorConfig(kind="obj", trunk_dtype=trunk)
    nets = {
        "hand": {
            "sdf": init_sdf_params(jax.random.PRNGKey(0), hand_sdf),
            "color": init_color_params(jax.random.PRNGKey(1), hand_col),
            "variance": init_variance_params(0.3),
        },
        "obj": {
            "sdf": init_sdf_params(jax.random.PRNGKey(2), obj_sdf),
            "color": init_color_params(jax.random.PRNGKey(3), obj_col),
            "variance": init_variance_params(0.3),
        },
    }
    rcfg = RenderConfig()
    fcfg = FitHyper(fit_type="12", batch_size=196)
    rng = np.random.default_rng(0)
    joints = canonical_hand_joints(0.35).astype(np.float32)
    R, T = look_at_camera(np.asarray([0.0, 0.2, -0.9]), joints.mean(0))
    batch = {
        "rays_xy": jnp.asarray(
            rng.uniform(-0.5, 0.5, (196, 2)).astype(np.float32)),
        "true_rgb": jnp.asarray(
            rng.uniform(0, 1, (196, 3)).astype(np.float32)),
        "true_mask": jnp.asarray(
            (rng.uniform(0, 1, (196, 1)) > 0.4).astype(np.float32)),
        "cam_R": jnp.asarray(R), "cam_T": jnp.asarray(T),
        "focal": jnp.asarray([3.0, 3.0], jnp.float32),
        "principal": jnp.zeros(2, jnp.float32),
        "joints_pred": jnp.asarray(joints),
        "bone_length": jnp.asarray(np.full(20, 0.03, np.float32)),
        "t_pose_21": jnp.asarray(canonical_hand_joints(0.0)),
        "Ro_pred": jnp.eye(3), "To_pred": jnp.zeros(3),
        "obj_verts": jnp.asarray(
            rng.normal(size=(100, 3)).astype(np.float32) * 0.05),
    }
    print(f"backend={jax.default_backend()} trunk={trunk}", flush=True)
    results = {}
    for fine in (False, "full"):
        step, opt = make_single_fit_step(
            nets, hand_sdf, hand_col, obj_sdf, obj_col, rcfg, fcfg,
            fused_fine=fine,
        )
        step = jax.jit(step)
        pose = init_pose_params()
        state = (pose, opt.init(pose))
        key = jax.random.PRNGKey(0)
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
        loss0 = float(metrics["loss"])
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
        loss1 = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / iters
        assert np.isfinite(loss1)
        print(f"fused_fine={fine}: {dt*1e3:.2f} ms/fit-step "
              f"(loss {loss0:.4f} -> {loss1:.4f})", flush=True)
        results[fine] = dt
    print(f"speedup: {results[False]/results['full']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
