"""Hand-model TPU profiling: where does the step time go?

Measures (with value-fetch barriers — block_until_ready does not wait on
the tunneled backend):
  1. full hand train step (reference arch, 441 rays, 64+64+4up)
  2. hand SDF forward-only throughput (pts/s) at the full architecture
  3. embedding-only throughput (pts/s) — the (N, 1386) feature build
  4. first-layer-only matmul throughput
  5. object SDF forward (for reference)

Run: env PYTHONPATH=/root/repo python scripts/bench_hand.py
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def fetch(x):
    return float(jnp.sum(x))


def bench(fn, *args, iters=20, warmup=2, label=""):
    for _ in range(warmup):
        out = fn(*args)
    fetch(out if isinstance(out, jnp.ndarray) else jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out if isinstance(out, jnp.ndarray) else jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    from honerf_tpu.models import (
        ColorConfig, SDFConfig, init_color_params, init_sdf_params,
        init_se3_refine, init_variance_params,
    )
    from honerf_tpu.models.fields import sdf_hand_apply, sdf_obj_apply
    from honerf_tpu.models.embedding import hand_embedding
    from honerf_tpu.models.mlp import apply_linear
    from honerf_tpu.render import RenderConfig
    from honerf_tpu.train import TrainHyper, init_train_state
    from honerf_tpu.train.offline import make_hand_train_step
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _hand_batch

    sdf_cfg = SDFConfig(kind="hand", r_multires=7)
    color_cfg = ColorConfig(kind="hand", r_multires=7)
    rcfg = RenderConfig()
    tcfg = TrainHyper(batch_size=441, vgg_weight=0.0)
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(8, "hand"),
    }

    rng = np.random.default_rng(0)
    N = 1 << 17  # 131072 points
    pts = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 0.1)
    bt_inv = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32)[None], (21, 1, 1))
        + 0.01 * rng.normal(size=(21, 4, 4)).astype(np.float32)
    )
    t_pose = jnp.asarray(rng.normal(size=(21, 3)).astype(np.float32) * 0.1)

    # 3. embedding only
    emb_fn = jax.jit(lambda p: hand_embedding(p, bt_inv, t_pose, 10, 7)[0])
    dt = bench(emb_fn, pts, label="hand_embedding (131k pts)")
    print(f"  -> {N/dt/1e6:.1f} M pts/s", flush=True)

    # 4. first layer only (on a precomputed feature)
    feat = emb_fn(pts)
    l0 = params["sdf"]["layers"][0]
    l0_fn = jax.jit(lambda f: apply_linear(l0, f))
    dt = bench(l0_fn, feat, label="first layer matmul (131k x 1386 -> 256)")
    print(f"  -> {N/dt/1e6:.1f} M pts/s", flush=True)

    # 2. full hand SDF forward — both embedding builds
    for flat in (True, False):
        c = sdf_cfg._replace(flat_embedding=flat)
        sdf_fn = jax.jit(
            lambda p, c=c: sdf_hand_apply(params["sdf"], c, p, bt_inv, t_pose)[0]
        )
        dt = bench(sdf_fn, pts, label=f"hand SDF fwd flat={flat} (131k pts)")
        print(f"  -> {N/dt/1e6:.1f} M pts/s", flush=True)

    # 5. object SDF forward for comparison
    obj_cfg = SDFConfig(kind="obj")
    obj_params = init_sdf_params(jax.random.PRNGKey(2), obj_cfg)
    obj_fn = jax.jit(lambda p: sdf_obj_apply(obj_params, obj_cfg, p))
    dt = bench(obj_fn, pts, label="obj SDF fwd (131k pts)")
    print(f"  -> {N/dt/1e6:.1f} M pts/s", flush=True)

    # 1. full hand train step
    state = init_train_state(params, tcfg)
    step = jax.jit(make_hand_train_step(sdf_cfg, color_cfg, rcfg, tcfg))
    batch = _hand_batch(441)
    key = jax.random.PRNGKey(0)

    def run(state, key):
        key, sub = jax.random.split(key)
        return step(state, batch, sub), key

    for _ in range(3):
        (state, metrics), key = run(state, key)
    print("warm loss:", float(metrics["loss"]), flush=True)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        (state, metrics), key = run(state, key)
    assert np.isfinite(float(metrics["loss"]))
    dt = (time.perf_counter() - t0) / iters
    print(f"hand train step: {dt*1e3:.2f} ms -> {441/dt:.0f} rays/s", flush=True)


if __name__ == "__main__":
    main()
