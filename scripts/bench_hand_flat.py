"""Flat-build hand-embedding variants: avoid (N,21,66)-shaped intermediates
entirely (TPU tiling pads the 66-wide minor dim to 128 -> every
materialization is ~1.4 GB and the final reshape is a relayout copy).

Run: env PYTHONPATH=/root/repo python scripts/bench_hand_flat.py
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

VL, RL = 10, 7
PER_BONE = 1 + 2 * VL + 3 + 6 * RL  # 66


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


def qvrh_flat(pts, bt_inv, t_pose):
    """v (N,21), r (N,21,3) -> flat (N,63), h (N,21)."""
    rot = bt_inv[:, :3, :3]
    trans = bt_inv[:, :3, 3]
    q = jnp.einsum("jab,nb->nja", rot, pts) + trans - t_pose  # (N,21,3)
    v2 = jnp.sum(q * q, axis=-1) + 1e-24  # (N,21)
    v = jnp.sqrt(v2)
    r = q / v[..., None]
    h = 1.0 - jax.nn.sigmoid(CUTOFF_TAU * (v - BONE_CUTOFFS))
    return v, r.reshape(pts.shape[0], 63), h


def channel_major_perm():
    """Permutation p with flat_channel_major[:, p] == bone_major reference
    order; i.e. ref_feat = cm_feat[:, p] -> W_cm = W_ref[:, inv(p)]...
    We instead compute indices of each channel-major column in the
    bone-major layout and gather weight columns accordingly."""
    # channel-major build order (our F2 concat):
    #   v (21) | sin(v f0) (21) .. sin(v f9) | cos(v f0) .. cos(v f9)
    #   | r (63) | sin(r f0) (63) .. sin(r f6) | cos(r f0) .. cos(r f6)
    # bone-major reference order, per bone b:
    #   [v, sinv*10, cosv*10, rx ry rz, rx_sin7, rx_cos7, ry_sin7, ...]
    dest = []  # dest[i] = bone-major index of channel-major column i
    for b in range(21):
        dest.append(b * PER_BONE + 0)  # v
    for l in range(VL):
        for b in range(21):
            dest.append(b * PER_BONE + 1 + l)  # sin(v f_l)
    for l in range(VL):
        for b in range(21):
            dest.append(b * PER_BONE + 1 + VL + l)  # cos(v f_l)
    for b in range(21):
        for c in range(3):
            dest.append(b * PER_BONE + 1 + 2 * VL + c)  # r
    for l in range(RL):
        for b in range(21):
            for c in range(3):
                dest.append(b * PER_BONE + 1 + 2 * VL + 3 + c * 2 * RL + l)
    for l in range(RL):
        for b in range(21):
            for c in range(3):
                dest.append(b * PER_BONE + 1 + 2 * VL + 3 + c * 2 * RL + RL + l)
    return np.asarray(dest)


def emb_f1(pts, bt_inv, t_pose):
    """Bone-major flat concat: 21 x 8 pieces, all 2D."""
    N = pts.shape[0]
    v, r63, h = qvrh_flat(pts, bt_inv, t_pose)
    r = r63.reshape(N, 21, 3)
    fv = 2.0 ** jnp.arange(VL, dtype=pts.dtype)
    fr = 2.0 ** jnp.arange(RL, dtype=pts.dtype)
    pieces = []
    for b in range(21):
        vb = v[:, b:b + 1]  # (N,1)
        hb = h[:, b:b + 1]
        sv = vb * fv  # (N,10)
        pieces += [vb * hb, jnp.sin(sv) * hb, jnp.cos(sv) * hb]
        rb = r[:, b]  # (N,3)
        pieces.append(rb * hb)
        for c in range(3):
            src = rb[:, c:c + 1] * fr  # (N,7)
            pieces += [jnp.sin(src) * hb, jnp.cos(src) * hb]
    return jnp.concatenate(pieces, axis=1)


def emb_f2(pts, bt_inv, t_pose, recurrence=False):
    """Channel-major flat concat (36-ish pieces); needs permuted weights."""
    N = pts.shape[0]
    v, r63, h = qvrh_flat(pts, bt_inv, t_pose)
    h3 = jnp.repeat(h, 3, axis=1)  # (N,63) bone gate per r channel
    pieces = [v * h]
    if recurrence:
        s, c = jnp.sin(v), jnp.cos(v)
        sins, coss = [s], [c]
        for _ in range(VL - 1):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            sins.append(s)
            coss.append(c)
        pieces += [x * h for x in sins] + [x * h for x in coss]
        pieces.append(r63 * h3)
        s, c = jnp.sin(r63), jnp.cos(r63)
        sins, coss = [s], [c]
        for _ in range(RL - 1):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            sins.append(s)
            coss.append(c)
        pieces += [x * h3 for x in sins] + [x * h3 for x in coss]
    else:
        for l in range(VL):
            pieces.append(jnp.sin(v * (2.0 ** l)) * h)
        for l in range(VL):
            pieces.append(jnp.cos(v * (2.0 ** l)) * h)
        pieces.append(r63 * h3)
        for l in range(RL):
            pieces.append(jnp.sin(r63 * (2.0 ** l)) * h3)
        for l in range(RL):
            pieces.append(jnp.cos(r63 * (2.0 ** l)) * h3)
    return jnp.concatenate(pieces, axis=1)


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
    l0 = params["layers"][0]
    W = linear_weight(l0)  # (256, 1386)
    b0 = l0["b"]
    dest = channel_major_perm()
    W_cm = W[:, dest]  # column k of cm build multiplies W_ref[:, dest[k]]

    # correctness on small N
    small = pts[:512]
    ref = jax.jit(lambda p: hand_embedding(p, bt_inv, t_pose, VL, RL)[0])(small)
    f1 = jax.jit(lambda p: emb_f1(p, bt_inv, t_pose))(small)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(f1), rtol=2e-5,
                               atol=1e-6)
    print("F1 order OK", flush=True)
    f2 = jax.jit(lambda p: emb_f2(p, bt_inv, t_pose))(small)
    back = np.zeros_like(np.asarray(ref))
    back[:, dest] = np.asarray(f2)
    np.testing.assert_allclose(np.asarray(ref), back, rtol=2e-5, atol=1e-6)
    print("F2 permutation OK", flush=True)
    # matmul equivalence: f2 @ W_cm.T == ref @ W.T
    a = np.asarray(jax.jit(lambda p: emb_f2(p, bt_inv, t_pose) @ W_cm.T + b0)(small))
    r_ = np.asarray(jax.jit(lambda p: apply_linear(
        l0, hand_embedding(p, bt_inv, t_pose, VL, RL)[0]))(small))
    np.testing.assert_allclose(a, r_, rtol=2e-4, atol=2e-5)
    print("F2 matmul equivalence OK", flush=True)

    bench(jax.jit(lambda p: apply_linear(
        l0, hand_embedding(p, bt_inv, t_pose, VL, RL)[0])), pts,
        label="V0 current emb+l0")
    bench(jax.jit(lambda p: emb_f1(p, bt_inv, t_pose) @ W.T + b0), pts,
          label="F1 bone-major flat + l0")
    bench(jax.jit(lambda p: emb_f2(p, bt_inv, t_pose) @ W_cm.T + b0), pts,
          label="F2 channel-major flat + l0")
    bench(jax.jit(lambda p: emb_f2(p, bt_inv, t_pose, True) @ W_cm.T + b0),
          pts, label="F3 channel-major recurrence + l0")
    bench(jax.jit(lambda p: emb_f2(p, bt_inv, t_pose)), pts,
          label="F2 emb only")
    bench(jax.jit(lambda p: emb_f2(p, bt_inv, t_pose).astype(jnp.bfloat16)),
          pts, label="F2 emb only bf16 out")

    # fwd+bwd cost (the training path): grad of sum(l0 out) wrt pts
    def loss_v0(p):
        return jnp.sum(apply_linear(l0, hand_embedding(p, bt_inv, t_pose, VL, RL)[0]))

    def loss_f2(p):
        return jnp.sum(emb_f2(p, bt_inv, t_pose) @ W_cm.T + b0)

    bench(jax.jit(jax.grad(loss_v0)), pts, label="V0 emb+l0 grad")
    bench(jax.jit(jax.grad(loss_f2)), pts, label="F2 emb+l0 grad")


if __name__ == "__main__":
    main()
