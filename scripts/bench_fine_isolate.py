"""Isolate fused-fine kernel costs on TPU: fwd kernel, bwd kernel, and
the XLA trunk fwd/vjp equivalents at the real fine-pass shape
(N = 441*128 rays, E=1386 trunk).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fine_isolate.py
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

from honerf_tpu.models import SDFConfig, init_sdf_params
from honerf_tpu.models.mlp import linear_weight
from honerf_tpu.ops import fused_fine as FF


def bench(fn, *args, iters=20, warmup=3, label=""):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    cfg = SDFConfig(kind="hand", r_multires=7, trunk_dtype="bf16")
    params = init_sdf_params(jax.random.PRNGKey(0), cfg)
    meta = FF.TrunkMeta(emb_width=cfg.input_width, d_hidden=256,
                        n_layers=9, skip=4, d_out=257, dtype="bf16")
    ws = tuple(linear_weight(l).T for l in params["layers"])
    bs = tuple(l["b"] for l in params["layers"])
    N = 441 * 128
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.normal(size=(N, meta.emb_width)).astype(np.float32))
    dout = jnp.asarray(rng.normal(size=(N, meta.d_out)).astype(np.float32))
    du = jnp.asarray(rng.normal(size=(N, meta.emb_width)).astype(np.float32))
    print(f"backend={jax.default_backend()} N={N}", flush=True)

    # fused fwd (includes pad + cast)
    f_fwd = jax.jit(lambda e_: FF._fwd_pad_call(e_, ws, bs, meta, 256, False))
    bench(f_fwd, e, label="fused fwd (out,u)")

    # fused bwd (includes pads)
    f_bwd = jax.jit(lambda e_, do_, du_: FF._vjp_bwd(
        meta, 256, False, (e_, ws, bs), (do_, du_)))
    bench(f_bwd, e, dout, du, label="fused bwd (de,dW,db)")

    # XLA equivalents: trunk fwd, fwd+u (vjp), and grad of scalarized obj
    def xla_fwd(e_):
        return FF.trunk_sdf_u_ref(e_, list(ws), list(bs), meta._replace(dtype="f32"))[0]

    bench(jax.jit(xla_fwd), e, label="XLA trunk fwd only (f32 ref)")

    def xla_full(e_):
        out, u = FF.trunk_sdf_u_ref(e_, list(ws), list(bs), meta)
        return out, u

    bench(jax.jit(xla_full), e, label="XLA fwd+u (ref impl)")

    def xla_grad(e_, do_, du_):
        def obj(e__, ws__, bs__):
            out, u = FF.trunk_sdf_u_ref(e__, list(ws__), list(bs__), meta)
            return jnp.sum(out * do_) + jnp.sum(u * du_)
        return jax.grad(obj, argnums=(0, 1, 2))(e_, ws, bs)

    bench(jax.jit(xla_grad), e, dout, du, label="XLA grad of (out,u) obj")


if __name__ == "__main__":
    main()
