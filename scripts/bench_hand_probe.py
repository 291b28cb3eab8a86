"""Stage-by-stage cost probe of the hand embedding at N=131072.

Run: env PYTHONPATH=/root/repo python scripts/bench_hand_probe.py
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

from honerf_tpu.models.embedding import BONE_CUTOFFS, CUTOFF_TAU


def fetch(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, *args, iters=30, warmup=3, label=""):
    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    N = 1 << 17
    big = jnp.asarray(rng.normal(size=(N, 1386)).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 0.1)
    bt_inv = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32)[None], (21, 1, 1))
        + 0.01 * rng.normal(size=(21, 4, 4)).astype(np.float32)
    )
    t_pose = jnp.asarray(rng.normal(size=(21, 3)).astype(np.float32) * 0.1)

    bench(jax.jit(lambda x: x + 1.0), big, label="add (N,1386)")
    bench(jax.jit(lambda x: jnp.sin(x)), big, label="sin (N,1386)")
    bench(jax.jit(lambda x: jnp.sin(x) + jnp.cos(x)), big,
          label="sin+cos fused (N,1386)")
    bench(jax.jit(lambda x: jax.nn.sigmoid(x)), big, label="sigmoid (N,1386)")

    def qvrh(p):
        rot = bt_inv[:, :3, :3]
        trans = bt_inv[:, :3, 3]
        q = jnp.einsum("jab,nb->nja", rot, p) + trans - t_pose
        v2 = jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24
        v = jnp.sqrt(v2)
        r = q / v
        h = 1.0 - jax.nn.sigmoid(CUTOFF_TAU * (v - BONE_CUTOFFS[:, None]))
        return v, r, h

    bench(jax.jit(lambda p: qvrh(p)[1]), pts, label="q/v/r/h only (N,21,*)")

    # spectrum + sin/cos of the r part only: (N,21,3,7)
    def r_pe(p):
        v, r, h = qvrh(p)
        fr = 2.0 ** jnp.arange(7, dtype=p.dtype)
        sr = r[..., None] * fr
        return jnp.concatenate([jnp.sin(sr), jnp.cos(sr)], axis=-1)

    bench(jax.jit(r_pe), pts, label="r PE (N,21,3,14)")

    # full embedding but WITHOUT sin/cos (copy spectrum through)
    def emb_nosin(p):
        v, r, h = qvrh(p)
        fv = 2.0 ** jnp.arange(10, dtype=p.dtype)
        sv = v * fv
        fr = 2.0 ** jnp.arange(7, dtype=p.dtype)
        sr = (r[..., None] * fr).reshape(N, 21, 21)
        feat = jnp.concatenate([v, sv, sv, r, sr, sr], axis=-1) * h
        return feat.reshape(N, -1)

    bench(jax.jit(emb_nosin), pts, label="emb shape-only (no sin/cos)")

    # doubling-recurrence PE embedding (exact layout)
    def pe_rec(x, L):
        # x: (..., C); returns (..., C, 2L) as [sin f0..fL-1, cos f0..fL-1]
        s = jnp.sin(x)
        c = jnp.cos(x)
        sins = [s]
        coss = [c]
        for _ in range(L - 1):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            sins.append(s)
            coss.append(c)
        return jnp.stack(sins + coss, axis=-1)

    def emb_rec(p):
        v, r, h = qvrh(p)
        v_pe = pe_rec(v[..., 0], 10).reshape(N, 21, 20)
        r_pe_ = pe_rec(r, 7).reshape(N, 21, 42)
        feat = jnp.concatenate([v, v_pe, r, r_pe_], axis=-1) * h
        return feat.reshape(N, -1)

    bench(jax.jit(emb_rec), pts, label="emb doubling-recurrence")

    # recurrence accuracy vs direct
    def pe_direct(x, L):
        f = 2.0 ** jnp.arange(L, dtype=x.dtype)
        sp = x[..., None] * f
        return jnp.concatenate([jnp.sin(sp), jnp.cos(sp)], axis=-1)

    xs = jnp.asarray(rng.normal(size=(4096,)).astype(np.float32))
    a = np.asarray(jax.jit(lambda x: pe_rec(x, 10))(xs))
    b = np.asarray(jax.jit(lambda x: pe_direct(x, 10))(xs))
    print("recurrence max abs err (L=10):", float(np.abs(a - b).max()),
          flush=True)


if __name__ == "__main__":
    main()
