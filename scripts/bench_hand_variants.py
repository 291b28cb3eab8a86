"""Alternate XLA formulations of the hand embedding (+ first layer).

All variants must produce the SAME values as the current implementation
(channel order preserved) — asserted before timing.

Run: env PYTHONPATH=/root/repo python scripts/bench_hand_variants.py
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
from honerf_tpu.models.embedding import BONE_CUTOFFS, CUTOFF_TAU, hand_embedding
from honerf_tpu.models.mlp import apply_linear, linear_weight


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


def emb_v1(pts, bt_inv, t_pose, vL, rL, dtype=None):
    """Single-expression contiguous build, reference channel order:
    per bone [v, sin(v f0..fL), cos(v f0..fL), r, rx_sin.., rx_cos..,
    ry_sin.., ...] gated by h."""
    rot = bt_inv[:, :3, :3]
    trans = bt_inv[:, :3, 3]
    q = jnp.einsum("jab,nb->nja", rot, pts) + trans - t_pose
    v2 = jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24
    v = jnp.sqrt(v2)
    r = q / v
    h = 1.0 - jax.nn.sigmoid(CUTOFF_TAU * (v - BONE_CUTOFFS[:, None]))
    fv = 2.0 ** jnp.arange(vL, dtype=pts.dtype)
    sv = v * fv  # (n, 21, vL)
    fr = 2.0 ** jnp.arange(rL, dtype=pts.dtype)
    sr = r[..., None] * fr  # (n, 21, 3, rL)
    n = pts.shape[0]
    r_sc = jnp.concatenate([jnp.sin(sr), jnp.cos(sr)], axis=-1)  # (n,21,3,2rL)
    feat = jnp.concatenate(
        [v, jnp.sin(sv), jnp.cos(sv), r, r_sc.reshape(n, 21, 3 * 2 * rL)],
        axis=-1,
    ) * h
    if dtype is not None:
        feat = feat.astype(dtype)
    return feat  # (n, 21, 66)


def main():
    rng = np.random.default_rng(0)
    N = 1 << 17
    pts = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 0.1)
    bt_inv = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32)[None], (21, 1, 1))
        + 0.01 * rng.normal(size=(21, 4, 4)).astype(np.float32)
    )
    t_pose = jnp.asarray(rng.normal(size=(21, 3)).astype(np.float32) * 0.1)

    cfg = SDFConfig(kind="hand", r_multires=7)
    params = init_sdf_params(jax.random.PRNGKey(0), cfg)
    l0 = params["sdf"]["layers"][0] if "sdf" in params else params["layers"][0]
    W = linear_weight(l0)  # (256, 1386)
    b = l0["b"]

    # correctness: v1 channel order == current implementation
    ref = jax.jit(lambda p: hand_embedding(p, bt_inv, t_pose, 10, 7)[0])(pts[:512])
    got = jax.jit(lambda p: emb_v1(p, bt_inv, t_pose, 10, 7).reshape(512, -1))(
        pts[:512]
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-5,
                               atol=1e-6)
    print("v1 channel order OK", flush=True)

    # V0: current embedding + layer0
    v0 = jax.jit(
        lambda p: apply_linear(l0, hand_embedding(p, bt_inv, t_pose, 10, 7)[0])
    )
    bench(v0, pts, label="V0 current emb+l0")

    # V1: contiguous build f32 + matmul
    v1 = jax.jit(
        lambda p: emb_v1(p, bt_inv, t_pose, 10, 7).reshape(p.shape[0], -1)
        @ W.T + b
    )
    bench(v1, pts, label="V1 contiguous f32")

    # V2: contiguous build bf16 + bf16 matmul (f32 accum)
    Wbf = W.astype(jnp.bfloat16)
    v2 = jax.jit(
        lambda p: jax.lax.dot_general(
            emb_v1(p, bt_inv, t_pose, 10, 7, jnp.bfloat16).reshape(p.shape[0], -1),
            Wbf.T,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b
    )
    bench(v2, pts, label="V2 contiguous bf16")

    # V3: per-bone einsum contraction, f32
    W3 = W.reshape(256, 21, 66)
    v3 = jax.jit(
        lambda p: jnp.einsum(
            "nkf,okf->no", emb_v1(p, bt_inv, t_pose, 10, 7), W3
        ) + b
    )
    bench(v3, pts, label="V3 per-bone einsum f32")

    # V4: per-bone einsum bf16
    W3bf = W3.astype(jnp.bfloat16)
    v4 = jax.jit(
        lambda p: jnp.einsum(
            "nkf,okf->no",
            emb_v1(p, bt_inv, t_pose, 10, 7, jnp.bfloat16),
            W3bf,
            preferred_element_type=jnp.float32,
        ) + b
    )
    bench(v4, pts, label="V4 per-bone einsum bf16")

    # V5: embedding only, contiguous f32 / bf16 (no matmul)
    bench(jax.jit(lambda p: emb_v1(p, bt_inv, t_pose, 10, 7)), pts,
          label="V5 emb only f32")
    bench(jax.jit(lambda p: emb_v1(p, bt_inv, t_pose, 10, 7, jnp.bfloat16)),
          pts, label="V5b emb only bf16")

    # numerical sanity of bf16 path
    a = np.asarray(v1(pts[:2048]))
    c = np.asarray(v2(pts[:2048]))
    print("bf16 max abs err on l0 out:", float(np.abs(a - c).max()),
          "rel:", float(np.abs(a - c).max() / (np.abs(a).max() + 1e-9)),
          flush=True)


if __name__ == "__main__":
    main()
