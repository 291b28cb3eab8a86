"""Decompose the fine-bwd kernel's dW cost (round-5 lever selection).

Round-5 ablation (bench_fine_ablate.py) measured dW = full - frozen =
4.36 ms — the only remaining item big enough to cross 5x on hand — but
not WHERE it goes: the 23 X^T dY matmuls (256 GFLOP bf16, ~1.3 ms at
MXU speed-of-light, plus any dim-0-contraction operand relayout Mosaic
inserts) vs the 23 f32 VMEM output-ref read-modify-writes per grid step
(~6 MB read + 6 MB write x 662 steps).  Variants (numerics garbage
where noted, timing is the point):

  bwd-full        production backward
  bwd-frozen      want_dw=False: no dW work at all
  bwd-dw-assign   _DW_ACCUM='assign': matmuls + writes, no accumulator
                  READ+add (garbage dW)
  bwd-dw-cheapmm  FT._mm_tn -> scalar-broadcast stand-in: accumulators
                  kept, matmuls (and their operand relayouts) removed
                  (garbage dW)

Derived:  full-assign = RMW read half;  full-cheapmm = matmul cost;
cheapmm-frozen = accumulator traffic + db sums.  Both layouts.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fine_ablate2.py [N]
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
    """Fresh jit so monkeypatched bodies / module globals re-trace.

    CRITICAL: jax's jit cache is keyed on the UNDERLYING function
    identity, not the wrapper — `jax.jit(raw)` twice shares one trace
    cache, so a module-global flip between calls silently re-times the
    FIRST executable (this bug invalidated the first round-5
    assign/cheapmm/scratch numbers; BENCH_NOTES correction).  A fresh
    lambda per call forces a fresh cache key."""
    raw = FFF._bwd_call.__wrapped__

    def fresh(*a, meta, block, interpret):
        return raw(*a, meta=meta, block=block, interpret=interpret)

    jitted = jax.jit(fresh, static_argnames=("meta", "block", "interpret"))
    return lambda *a: jitted(*a[:-3], meta=a[-3], block=a[-2],
                             interpret=a[-1])


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 441 * 192
    Np = ((N + BLOCK - 1) // BLOCK) * BLOCK
    cfg = SDFConfig(kind="hand", r_multires=7, trunk_dtype="bf16")
    params = init_sdf_params(jax.random.PRNGKey(0), cfg)
    ws, bs = _fine_trunk_weights(params, cfg)
    rng = np.random.default_rng(0)

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

    orig_mm_tn = FT._mm_tn

    def cheap_mm_tn(meta, x, y):
        # not DCE-able, no matmul, right shape/dtype.  NOTE: Mosaic
        # cannot broadcast a vector<1x1> to 2D ("broadcast in both
        # sublanes and lanes") — splat from a SCALAR instead.
        s = (x[:1, :1].astype(jnp.float32) * y[:1, :1].astype(jnp.float32)
             )[0, 0]  # Mosaic: only 32-bit elements convert to scalars
        return jnp.zeros((x.shape[1], y.shape[1]), jnp.float32) + s

    results = {}
    for layout in ("piece", "slot"):
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
        args = (p8, dpack, None, None, *common)

        t_full = bench(fresh_bwd(), (*args, meta, BLOCK, INTERP),
                       f"bwd-full-{layout}")
        t_frozen = bench(
            fresh_bwd(),
            (*args, meta._replace(want_dw=False), BLOCK, INTERP),
            f"bwd-frozen-{layout}")
        FFF._DW_ACCUM = "assign"
        try:
            t_assign = bench(fresh_bwd(), (*args, meta, BLOCK, INTERP),
                             f"bwd-dw-assign-{layout}")
        finally:
            FFF._DW_ACCUM = "add"
        # staged bf16 accumulators (production candidate; ~0.5% dW
        # rounding, dp/pose grads bit-identical) — run FIRST so the
        # decision numbers land even if a later stand-in fails to
        # compile
        for S in (8, 16, 32):
            FFF._DW_STAGE = S
            try:
                t_staged = bench(fresh_bwd(), (*args, meta, BLOCK, INTERP),
                                 f"bwd-dw-staged{S}-{layout}")
                print(f"  [{layout}] staged-bf16 S={S} vs out: "
                      f"{1e3 * (t_staged - t_full):+.2f} ms", flush=True)
            except Exception as e:
                print(f"  staged{S} {layout} failed: {str(e)[:120]}",
                      flush=True)
            finally:
                FFF._DW_STAGE = 0
        # numerics-identical: VMEM-scratch accumulators, outputs written
        # once at the last grid step
        FFF._DW_PLACE = "scratch"
        try:
            t_scratch = bench(fresh_bwd(), (*args, meta, BLOCK, INTERP),
                              f"bwd-dw-scratch-{layout}")
            print(f"  [{layout}] scratch-accum vs out: "
                  f"{1e3 * (t_scratch - t_full):+.2f} ms", flush=True)
        except Exception as e:
            print(f"  scratch {layout} failed: {str(e)[:120]}", flush=True)
        finally:
            FFF._DW_PLACE = "out"
        FT._mm_tn = cheap_mm_tn
        try:
            t_cheap = bench(fresh_bwd(), (*args, meta, BLOCK, INTERP),
                            f"bwd-dw-cheapmm-{layout}")
        except Exception as e:
            t_cheap = float("nan")
            print(f"  cheapmm {layout} failed: {str(e)[:120]}", flush=True)
        finally:
            FT._mm_tn = orig_mm_tn
        print(f"  [{layout}] dW total (full-frozen): "
              f"{1e3 * (t_full - t_frozen):.2f} ms", flush=True)
        print(f"  [{layout}] accumulator READ+add (full-assign): "
              f"{1e3 * (t_full - t_assign):.2f} ms", flush=True)
        print(f"  [{layout}] dW matmuls+operand relayout (full-cheapmm): "
              f"{1e3 * (t_full - t_cheap):.2f} ms", flush=True)
        print(f"  [{layout}] accum traffic + db sums (cheapmm-frozen): "
              f"{1e3 * (t_cheap - t_frozen):.2f} ms", flush=True)
        results[layout] = (t_full, t_frozen, t_assign, t_cheap)
    return results


if __name__ == "__main__":
    main()
