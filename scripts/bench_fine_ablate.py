"""Ablate the fully-fused fine-pass BACKWARD kernel cost on TPU
(round-4 lever selection, NEXT.md #1).

The round-3 trace pins the bwd kernel at 11.78 ms of the 21.2 ms hand
train step but gives no intra-kernel breakdown (one fused op).  This
script times kernel variants with pieces surgically disabled
(monkeypatched block bodies — numerics are garbage, timing is not):

  fwd              the forward kernel (baseline)
  bwd-full         the production backward (want_dw=True)
  bwd-frozen       want_dw=False            -> dW matmuls + VMEM accums
  bwd-no-embT      embedding transposes off -> rev-transpose + fwd-transpose
  bwd-cheap-splitu _split_u -> 128-lane views -> the ~130 unaligned
                   21/63-lane slice/pad ops
  bwd-no-embrev    u-chain reverse off      -> _emb_rev_block (fwd recompute
                   side)

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fine_ablate.py [N]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import honerf_tpu.ops.fused_fine as FT
import honerf_tpu.ops.fused_fine_full as FFF
from honerf_tpu.models import SDFConfig, init_sdf_params
from honerf_tpu.models.fields import _fine_trunk_weights

BLOCK = 128
INTERP = bool(os.environ.get("HONERF_ABLATE_INTERPRET"))  # CPU smoke


def bench(fn, args, label, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][:1])  # value-fetch barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def fresh_bwd():
    """A fresh jit wrapper around the raw _bwd_call body so monkeypatched
    block bodies re-trace (the module-level jit caches by meta only)."""
    return jax.jit(FFF._bwd_call.__wrapped__,
                   static_argnames=("meta", "block", "interpret"))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 441 * 192
    Np = ((N + BLOCK - 1) // BLOCK) * BLOCK
    cfg = SDFConfig(kind="hand", r_multires=7, trunk_dtype="bf16")
    params = init_sdf_params(jax.random.PRNGKey(0), cfg)
    ws, bs = _fine_trunk_weights(params, cfg)
    meta = FFF.FineMeta(
        v_multires=10, r_multires=7, d_hidden=256, n_layers=9, skip=4,
        d_out=257, dtype="bf16", with_color=True, c_hidden=256, c_layers=5,
        grad_L=4, want_dw=True,
    )
    rng = np.random.default_rng(0)
    cws = tuple(
        jnp.asarray(rng.normal(size=d, scale=0.02).astype(np.float32))
        for d in meta.color_dims
    )
    cbs = tuple(
        jnp.asarray(np.zeros(d[1], np.float32)) for d in meta.color_dims
    )
    wps, bps = FT._pad_weights(ws, bs, meta.trunk_meta)
    cwps, cbps = FFF._pad_color_weights(cws, cbs, meta)

    p8 = jnp.asarray(
        np.pad(rng.normal(size=(Np, 3), scale=0.05), ((0, 0), (0, 5))
               ).astype(np.float32))
    dpack = jnp.asarray(rng.normal(size=(Np, 8)).astype(np.float32))
    rotT = jnp.asarray(
        np.pad(rng.normal(size=(3, 63)), ((0, 5), (0, 65))
               ).astype(np.float32))
    off = jnp.asarray(
        np.pad(rng.normal(size=(1, 63), scale=0.1), ((0, 0), (0, 65))
               ).astype(np.float32))
    from honerf_tpu.models.embedding import BONE_CUTOFFS
    cut = jnp.pad(jnp.asarray(BONE_CUTOFFS), (0, 128 - 21)
                  )[None, :].astype(jnp.float32)

    print(f"backend={jax.default_backend()} N={Np} block={BLOCK}",
          flush=True)
    common = (rotT, off, cut, wps, bps, cwps, cbps)

    bench(jax.jit(FFF._fwd_call.__wrapped__,
                  static_argnames=("meta", "block", "interpret")),
          (p8, *common, meta, BLOCK, INTERP), "fwd")

    # --- slot layout (round 4) A/B: same workload, lane-aligned slots ---
    smeta = meta._replace(layout="slot")
    swps, sbps = FFF._pad_weights_slots(ws, bs, smeta)
    scws = tuple(
        jnp.asarray(rng.normal(size=d, scale=0.02).astype(np.float32))
        for d in smeta.color_dims
    )
    scbs = tuple(
        jnp.asarray(np.zeros(d[1], np.float32)) for d in smeta.color_dims
    )
    scwps, scbps = FFF._pad_color_weights(scws, scbs, smeta)
    scommon = (rotT, off, cut, swps, sbps, scwps, scbps)
    bench(jax.jit(FFF._fwd_call.__wrapped__,
                  static_argnames=("meta", "block", "interpret")),
          (p8, *scommon, smeta, BLOCK, INTERP), "fwd-slot")
    bench(fresh_bwd(), (p8, dpack, None, None, *scommon, smeta, BLOCK,
                        INTERP), "bwd-slot")
    bench(fresh_bwd(), (p8, dpack, None, None, *scommon,
                        smeta._replace(want_dw=False), BLOCK, INTERP),
          "bwd-slot-frozen")
    # block=256: halves the dW-accumulator read-modify-write traffic;
    # was a dead end for the piece layout (VMEM pressure) — retry with
    # the slot layout's lower register pressure
    if Np % 256 == 0 and not INTERP:
        variants = [
            ("bwd-slot-b256", scommon, smeta, 256),
            ("bwd-piece-b256", common, meta, 256),
            ("bwd-slot-b256-ns2", scommon, smeta._replace(n_split=2), 256),
            ("bwd-slot-frozen-b256", scommon,
             smeta._replace(want_dw=False), 256),
        ]
        for label, args_c, m, blk in variants:
            try:  # a VMEM overflow at block 256 must not kill the rest
                bench(fresh_bwd(), (p8, dpack, None, None, *args_c, m,
                                    blk, INTERP), label)
            except Exception as e:
                print(f"{label}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)

    bwd_args = (p8, dpack, None, None, *common)
    t_full = bench(fresh_bwd(), (*bwd_args, meta, BLOCK, INTERP), "bwd-full")
    t_frozen = bench(
        fresh_bwd(),
        (*bwd_args, meta._replace(want_dw=False), BLOCK, INTERP),
        "bwd-frozen",
    )
    print(f"  -> dW matmuls + accumulators: {1e3 * (t_full - t_frozen):.2f} "
          "ms", flush=True)

    # --- no-embT: both embedding transposes return zeros ---
    orig_revT = FFF._emb_rev_transpose_block
    orig_fwdT = FFF._emb_fwd_transpose_block
    vL, rL = meta.v_multires, meta.r_multires

    def zero_revT(st, ch, rotT_, u, t8, m):
        B = u.shape[0]
        z = jnp.zeros((B, 128), jnp.float32)
        adj = dict(dq=z, dv=z, dsc=z, dw3=z, drr=z, dh=z, dh3=z,
                   dsv=[z] * vL, dcv=[z] * vL, dsr=[z] * rL, dcr=[z] * rL)
        return jnp.zeros_like(u), adj, jnp.zeros((8, 128), jnp.float32)

    def zero_fwdT(st, de, adj, cut_, m):
        return jnp.zeros((de.shape[0], 128), jnp.float32)

    FFF._emb_rev_transpose_block = zero_revT
    FFF._emb_fwd_transpose_block = zero_fwdT
    t_noT = bench(fresh_bwd(), (*bwd_args, meta, BLOCK, INTERP),
                  "bwd-no-embT")
    FFF._emb_rev_transpose_block = orig_revT
    FFF._emb_fwd_transpose_block = orig_fwdT
    print(f"  -> embedding transposes: {1e3 * (t_full - t_noT):.2f} ms",
          flush=True)

    # --- cheap _split_u: no 21/63-lane slices, just 128-lane views ---
    orig_split = FFF._split_u

    def cheap_split(u, m):
        view = u[:, :128]
        return (view, [view] * vL, [view] * vL, view, [view] * rL,
                [view] * rL)

    FFF._split_u = cheap_split
    t_cheap = bench(fresh_bwd(), (*bwd_args, meta, BLOCK, INTERP),
                    "bwd-cheap-splitu")
    FFF._split_u = orig_split
    print(f"  -> _split_u slice/pad cost: {1e3 * (t_full - t_cheap):.2f} "
          "ms", flush=True)

    # --- no emb-rev: the u-chain reverse (also runs in fwd recompute) ---
    orig_rev = FFF._emb_rev_block

    def zero_rev(st, rotT_, u, m):
        B = u.shape[0]
        z = jnp.zeros((B, 128), jnp.float32)
        chain = dict(phi_v=z, a_v=z, b_h=z, phi_r=z, c_rr=z, d_h3=z,
                     f_q=z, m_vrep=z, n_v2p=z)
        return jnp.zeros((B, 8), jnp.float32), chain

    FFF._emb_rev_block = zero_rev
    t_norev = bench(fresh_bwd(), (*bwd_args, meta, BLOCK, INTERP),
                    "bwd-no-embrev")
    FFF._emb_rev_block = orig_rev
    print(f"  -> emb reverse chain: {1e3 * (t_full - t_norev):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
