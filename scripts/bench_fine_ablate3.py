"""Block-size / VMEM-cap sweep for the fine fwd+bwd kernels (round 5).

The round-5 decomposition (bench_fine_ablate2.py) left one anomaly: at
block=256 the FROZEN bwd gets faster (slot 12.96 -> 12.26 ms) while the
FULL bwd gets disproportionately slower (17.60 -> 19.19) — the dW
portion grows from 4.6 to 6.9 ms even though per-block dW accumulate
passes HALVE.  If that anomaly is a VMEM ceiling (the round-4 cap is
64M; b256 doubles block intermediates on top of the ~8M f32 dW refs),
raising the cap should recover it — and a working b256/b512 full bwd is
worth ~3 ms/step, the single biggest remaining lever toward the 5x hand
target (441 rays / 20.0 ms).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fine_ablate3.py [N]
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


def fresh(fn):
    """Fresh function object per variant: jax's jit cache keys on the
    UNDERLYING function identity, so jitting fn.__wrapped__ directly
    would re-time the first executable when only a module global (the
    vmem cap) changed — the exact artifact BENCH_NOTES retracted."""
    raw = fn.__wrapped__

    def f(*a, meta, block, interpret):
        return raw(*a, meta=meta, block=block, interpret=interpret)

    jitted = jax.jit(f, static_argnames=("meta", "block", "interpret"))
    return lambda *a: jitted(*a[:-3], meta=a[-3], block=a[-2],
                             interpret=a[-1])


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 441 * 128
    cfg = SDFConfig(kind="hand", r_multires=7, trunk_dtype="bf16")
    params = init_sdf_params(jax.random.PRNGKey(0), cfg)
    ws, bs = _fine_trunk_weights(params, cfg)
    rng = np.random.default_rng(0)

    blocks = (128, 256, 512) if not INTERP else (128, 256)
    Np = N
    for b in blocks:
        Np = ((Np + b - 1) // b) * b  # divisible by every tested block

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

    for layout in ("slot", "piece"):
        meta = FFF.FineMeta(
            v_multires=10, r_multires=7, d_hidden=256, n_layers=9, skip=4,
            d_out=257, dtype="bf16", with_color=True, c_hidden=256,
            c_layers=5, grad_L=4, want_dw=True, layout=layout,
        )
        cws = tuple(
            jnp.asarray(rng.normal(size=d, scale=0.02).astype(np.float32))
            for d in meta.color_dims
        )
        cbs = tuple(
            jnp.asarray(np.zeros(d[1], np.float32))
            for d in meta.color_dims
        )
        if layout == "slot":
            wps, bps = FFF._pad_weights_slots(ws, bs, meta)
        else:
            wps, bps = FT._pad_weights(ws, bs, meta.trunk_meta)
        cwps, cbps = FFF._pad_color_weights(cws, cbs, meta)
        common = (rotT, off, cut, wps, bps, cwps, cbps)
        fargs = (p8, *common)
        bargs = (p8, dpack, None, None, *common)

        for blk in blocks:
            for vmem_mb in (64, 112):
                if vmem_mb != 64 and blk == 128:
                    continue  # b128 fits comfortably; sweep only larger
                FFF._VMEM_LIMIT = vmem_mb * 1024 * 1024
                try:
                    bench(fresh(FFF._fwd_call), (*fargs, meta, blk, INTERP),
                          f"fwd-{layout}-b{blk}-v{vmem_mb}")
                    bench(fresh(FFF._bwd_call), (*bargs, meta, blk, INTERP),
                          f"bwd-full-{layout}-b{blk}-v{vmem_mb}")
                    bench(fresh(FFF._bwd_call),
                          (*bargs, meta._replace(want_dw=False), blk, INTERP),
                          f"bwd-frozen-{layout}-b{blk}-v{vmem_mb}")
                except Exception as e:  # e.g. VMEM OOM at b512
                    print(f"  b{blk}/v{vmem_mb} {layout} failed: "
                          f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                finally:
                    FFF._VMEM_LIMIT = 64 * 1024 * 1024


if __name__ == "__main__":
    main()
