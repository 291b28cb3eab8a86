"""Fused obj-SDF Pallas kernel vs XLA at the full architecture.

Run: env PYTHONPATH=/root/repo python scripts/bench_fused.py
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

from honerf_tpu.models import SDFConfig, init_sdf_params
from honerf_tpu.models.fields import sdf_obj_apply
from honerf_tpu.ops.fused_sdf import FusedObjSDF


def bench(fn, *args, iters=30, warmup=3, label=""):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    n = args[0].shape[0]
    print(f"{label}: {dt*1e3:.2f} ms -> {n/dt/1e6:.1f} M pts/s", flush=True)
    return dt


def main():
    cfg = SDFConfig(kind="obj")
    params = init_sdf_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    for N in (56448, 1 << 17):
        pts = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 0.1)
        xla = jax.jit(lambda p: sdf_obj_apply(params, cfg, p)[..., 0])
        ref = np.asarray(xla(pts[:2048]))
        dt_x = bench(xla, pts, label=f"XLA N={N}")
        for block, n_split in [(512, 1), (512, 2), (512, 4), (1024, 2),
                               (1024, 4), (2048, 4)]:
            try:
                fused = FusedObjSDF(params, cfg, block=block, n_split=n_split)
                got = np.asarray(fused(pts[:2048]))
                err = float(np.abs(got - ref).max())
                dt = bench(fused, pts,
                           label=f"pallas block={block} split={n_split} N={N}")
                print(f"    err={err:.2e} speedup_vs_xla={dt_x/dt:.2f}x",
                      flush=True)
            except Exception as e:
                print(f"pallas block={block} split={n_split}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
