"""Residual-stash A/B for the fused fine pass (round 5).

The bwd kernel rematerializes the whole forward per block (embedding +
trunk + u-chain + color = ~1/3 of its MXU work).  stash mode
(FineMeta.stash) has the VJP forward emit those residuals (~29 KB/row)
and the backward stream them back, trading recompute FLOPs for HBM
traffic that should pipeline under the remaining compute (the kernels
are compute-bound; HBM is nearly idle).  Expected from the device
profile (BENCH_NOTES round-5): bwd 11.84 -> ~8 ms if the reads hide,
fwd 4.80 + write cost; net -2.5..-4 ms on the 21.3 ms hand step.

All variants differ in STATIC args (meta.stash / block), so the
jit-cache gotcha (BENCH_NOTES RETRACTION) does not apply; fresh
function objects are used anyway, matching bench_fine_ablate3.py.

Run: env PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/bench_fine_stash.py [N]
CPU smoke: HONERF_ABLATE_INTERPRET=1 ... [small N]
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

INTERP = bool(os.environ.get("HONERF_ABLATE_INTERPRET"))  # CPU smoke


def bench(fn, args, label, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def fresh_fwd():
    raw = FFF._fwd_call.__wrapped__

    def f(*a, meta, block, interpret, stash):
        return raw(*a, meta=meta, block=block, interpret=interpret,
                   stash=stash)

    return jax.jit(f, static_argnames=("meta", "block", "interpret",
                                       "stash"))


def fresh_bwd():
    raw = FFF._bwd_call.__wrapped__

    def f(*a, meta, block, interpret, stash):
        return raw(*a, meta=meta, block=block, interpret=interpret,
                   stash=stash)

    return jax.jit(f, static_argnames=("meta", "block", "interpret"))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 441 * 128
    cfg = SDFConfig(kind="hand", r_multires=7, trunk_dtype="bf16")
    params = init_sdf_params(jax.random.PRNGKey(0), cfg)
    ws, bs = _fine_trunk_weights(params, cfg)
    rng = np.random.default_rng(0)

    Np = ((N + 255) // 256) * 256  # divisible by both 128 and 256
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

    print(f"backend={jax.default_backend()} N={Np}", flush=True)

    layouts = tuple((sys.argv[2] if len(sys.argv) > 2
                     else "piece,slot").split(","))
    for layout in layouts:
        base = FFF.FineMeta(
            v_multires=10, r_multires=7, d_hidden=256, n_layers=9, skip=4,
            d_out=257, dtype="bf16", with_color=True, c_hidden=256,
            c_layers=5, grad_L=4, want_dw=True, layout=layout,
        )
        cws = tuple(
            jnp.asarray(rng.normal(size=d, scale=0.02).astype(np.float32))
            for d in base.color_dims
        )
        cbs = tuple(
            jnp.asarray(np.zeros(d[1], np.float32))
            for d in base.color_dims
        )
        if layout == "slot":
            wps, bps = FFF._pad_weights_slots(ws, bs, base)
        else:
            wps, bps = FT._pad_weights(ws, bs, base.trunk_meta)
        cwps, cbps = FFF._pad_color_weights(cws, cbs, base)
        common = (rotT, off, cut, wps, bps, cwps, cbps)
        fargs = (p8, *common)
        bargs = (p8, dpack, None, None, *common)

        fwd_blocks = (256, 128) if not INTERP else (128,)
        bwd_blocks = (128,) if not INTERP else (128,)

        # --- forward: with vs without stash emission ---
        for blk in fwd_blocks:
            for stash in (False, True):
                label = f"fwd-{layout}-b{blk}" + ("-stash" if stash else "")
                try:
                    fn = fresh_fwd()
                    bench(
                        lambda *a, _fn=fn, _m=base, _b=blk, _s=stash: _fn(
                            *a, meta=_m, block=_b, interpret=INTERP,
                            stash=_s),
                        fargs, label)
                except Exception as e:
                    print(f"  {label} failed: {type(e).__name__}: "
                          f"{str(e)[:160]}", flush=True)

        # --- stash operands (values irrelevant for timing; finite) ---
        fwd_s = fresh_fwd()
        outs = fwd_s(*fargs, meta=base._replace(stash=True),
                     block=fwd_blocks[0], interpret=INTERP, stash=True)
        stash_full = tuple(jax.tree.leaves(outs)[1:])
        outs_f = fwd_s(*fargs,
                       meta=base._replace(stash=True, want_dw=False),
                       block=fwd_blocks[0], interpret=INTERP, stash=True)
        stash_frozen = tuple(jax.tree.leaves(outs_f)[1:])

        # --- backward: recompute vs stash ---
        for blk in bwd_blocks:
            for want_dw, st, stash_ops in (
                (True, False, ()),
                (True, True, stash_full),
                (False, False, ()),
                (False, True, stash_frozen),
            ):
                meta = base._replace(want_dw=want_dw, stash=st)
                mode = "full" if want_dw else "frozen"
                label = (f"bwd-{mode}-{layout}-b{blk}"
                         + ("-stash" if st else ""))
                try:
                    fn = fresh_bwd()
                    bench(
                        lambda *a, _fn=fn, _m=meta, _b=blk, _so=stash_ops:
                        _fn(*a, meta=_m, block=_b, interpret=INTERP,
                            stash=_so),
                        bargs, label)
                except Exception as e:
                    print(f"  {label} failed: {type(e).__name__}: "
                          f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
