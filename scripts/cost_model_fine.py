"""Micro-cost model of the fused fine BACKWARD kernel: piece vs slot.

VERDICT r4 asked for the piece/slot A/B to have a *prediction* before the
measurement lands (task #7a): trace the per-block backward body
(`ops/fused_fine_full._fine_bwd_block`) for both layouts at the REAL hand
architecture (v_multires=10, r_multires=7, 9x256 trunk + 4x256 color,
confs/wmask_realhand_hand1.conf) and count what each block actually does:

* MXU work: dot_general FLOPs (bf16 vs f32 rated separately);
* VPU transcendentals: sin/cos/exp/tanh/logistic element counts;
* VPU elementwise: all other vector-op elements;
* RELAYOUT RISK: pads / concatenates / slices / reshapes whose minor
  (lane) dimension boundaries are not 128-aligned — each is a cross-lane
  shuffle Mosaic must emit as sublane/lane copy ops.  This is the class
  the slot layout was built to eliminate (~130/block in piece, measured
  11.78 ms bwd kernel, BENCH_NOTES round 4).

The model then converts the counts into a predicted piece/slot time ratio
with v5e rate constants, calibrated so the PIECE prediction reproduces the
measured 11.78 ms bwd kernel (441 rays x 128 pts = 56448 points, block
128 => 441 blocks).  The slot number that comes out is the PREDICTION the
TPU A/B (scripts/bench_fine_ablate.py, tpu_queue.sh) confirms or refutes.

Reference workload being modeled: the hand fine pass of
/root/reference/utils/fields.py:56-177 under the render loss of
utils/renderer.py:107-177 (its backward is the flagship step's hot op).

Pure CPU/trace-time analysis — no TPU needed; runs in seconds.
"""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from honerf_tpu.ops import fused_fine_full as FFF
from honerf_tpu.ops import fused_fine as FT  # trunk machinery

LANE = 128
BLOCK = 128

# v5e single-chip rate constants (measured in BENCH_NOTES "platform
# characterization"; the absolute scale cancels in the ratio — only the
# MXU:VPU:relayout ratios matter, and the piece calibration absorbs the
# rest).
MXU_BF16 = 123e12       # measured peak bf16 FLOP/s
MXU_F32 = MXU_BF16 / 4  # f32 dots run as 3-6 bf16 passes; 4 is the model
VPU_ELEMS = 0.9e12      # ~8x128 lanes * 940 MHz, minus issue overheads
TRANS_COST = 6.0        # one sin/cos/exp ~ this many VPU element-ops
# One unaligned-lane relayout op (pad/slice/concat piece at a non-128
# boundary) costs roughly a full-register shuffle sequence regardless of
# the piece width — model it as a fixed op cost times the block rows.
RELAYOUT_ELEM_COST = 4.0   # per element moved, in VPU element-ops
RELAYOUT_OP_COST = 3e3     # fixed per-op cost (instruction seq, in elems)


def real_meta(layout: str, want_dw: bool = True) -> FFF.FineMeta:
    return FFF.FineMeta(
        v_multires=10, r_multires=7, d_hidden=256, n_layers=9, skip=4,
        d_out=257, dtype="bf16", with_color=True, c_hidden=256,
        c_layers=5, grad_L=4, want_dw=want_dw, layout=layout,
    )


def _block_args(meta: FFF.FineMeta, key=0):
    """Kernel-layout block operands with the exact shapes/dtypes the
    pallas kernel sees (matches _bwd_call's specs)."""
    k = jax.random.PRNGKey(key)
    ks = jax.random.split(k, 8)
    p8 = jax.random.normal(ks[0], (BLOCK, 8), jnp.float32)
    rotT = jax.random.normal(ks[1], (8, LANE), jnp.float32)
    off = jax.random.normal(ks[2], (1, LANE), jnp.float32)
    cut = jnp.pad(jnp.linspace(0.5, 2.0, 21), (0, LANE - 21))[None, :]
    tm = meta.trunk_meta
    ws_l, bs_l = [], []
    for (d_in, d_out) in FT_dims(tm):
        ws_l.append(jax.random.normal(ks[3], (d_in, d_out), jnp.float32)
                    * 0.05)
        bs_l.append(jnp.zeros((d_out,), jnp.float32))
    if meta.layout == "slot":
        wps, bps = FFF._pad_weights_slots(ws_l, bs_l, meta)
    else:
        wps, bps = FT_pad_weights(ws_l, bs_l, tm)
    cws_l, cbs_l = [], []
    for (d_in, d_out) in meta.color_dims:
        cws_l.append(jax.random.normal(ks[4], (d_in, d_out), jnp.float32)
                     * 0.05)
        cbs_l.append(jnp.zeros((d_out,), jnp.float32))
    cwps, cbps = FFF._pad_color_weights(cws_l, cbs_l, meta)
    OUTp = FFF._round_up(meta.d_out, LANE)
    dout = jax.random.normal(ks[5], (BLOCK, OUTp), jnp.float32)
    dg8 = jax.random.normal(ks[6], (BLOCK, 8), jnp.float32)
    dthird = jax.random.normal(ks[7], (BLOCK, 8 * 8), jnp.float32)
    # with_color: dthird is the dcolor cotangent, padded to out_pad
    cp = FFF._round_up(3, LANE)
    dthird = jnp.pad(dthird, ((0, 0), (0, cp - dthird.shape[1])))
    return p8, rotT, off, cut, wps, bps, dout, dg8, dthird, cwps, cbps


def FT_dims(tm):
    return FT._dims(tm)


def FT_pad_weights(ws, bs, tm):
    return FT._pad_weights(ws, bs, tm)


def _aligned(sz) -> bool:
    return sz % LANE == 0


def classify(jaxpr, counts=None, depth=0):
    """Walk a (closed) jaxpr, category-count every eqn."""
    if counts is None:
        counts = {
            "mxu_flops_bf16": 0.0, "mxu_flops_f32": 0.0,
            "transcendental_elems": 0.0, "vector_elems": 0.0,
            "relayout_ops": 0, "relayout_elems": 0.0,
            "dots": 0, "eqns": 0,
        }
    TRANS = {"sin", "cos", "exp", "tanh", "logistic", "log", "log1p",
             "expm1", "rsqrt", "pow", "integer_pow"}
    MOVE = {"pad", "concatenate", "slice", "dynamic_slice",
            "dynamic_update_slice", "gather", "rev", "transpose",
            "reshape"}
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        counts["eqns"] += 1
        sub = None
        for v in ("jaxpr", "call_jaxpr", "body_jaxpr", "cond_jaxpr"):
            if v in eqn.params:
                sub = eqn.params[v]
                break
        if name in ("pjit", "custom_jvp_call", "custom_vjp_call",
                    "custom_vjp_call_jaxpr", "remat", "checkpoint",
                    "closed_call") and sub is not None:
            classify(sub.jaxpr if hasattr(sub, "jaxpr") else sub,
                     counts, depth + 1)
            continue
        if name == "dot_general":
            a, b = eqn.invars[0].aval, eqn.invars[1].aval
            dnums = eqn.params["dimension_numbers"]
            (lc, rc), (lb, rb) = dnums
            m = math.prod(d for i, d in enumerate(a.shape)
                          if i not in set(lc) | set(lb))
            n = math.prod(d for i, d in enumerate(b.shape)
                          if i not in set(rc) | set(rb))
            kk = math.prod(a.shape[i] for i in lc)
            bb = math.prod(a.shape[i] for i in lb)
            fl = 2.0 * m * n * kk * bb
            if a.dtype == jnp.bfloat16 and b.dtype == jnp.bfloat16:
                counts["mxu_flops_bf16"] += fl
            else:
                counts["mxu_flops_f32"] += fl
            counts["dots"] += 1
            continue
        out_elems = sum(math.prod(ov.aval.shape) for ov in eqn.outvars
                        if hasattr(ov.aval, "shape"))
        if name in TRANS:
            counts["transcendental_elems"] += out_elems
            continue
        if name in MOVE:
            # only flag lane-UNALIGNED movement: minor-dim size (and for
            # slices, minor-dim start) not a multiple of 128
            unaligned = False
            moved = out_elems
            if name == "pad":
                lo = eqn.params["padding_config"][-1][0]
                in_minor = eqn.invars[0].aval.shape[-1] if \
                    eqn.invars[0].aval.shape else 1
                unaligned = not (_aligned(in_minor) and _aligned(lo))
            elif name == "concatenate":
                if eqn.params["dimension"] == len(
                        eqn.outvars[0].aval.shape) - 1:
                    offs = 0
                    for iv in eqn.invars:
                        if not _aligned(offs):
                            unaligned = True
                        offs += iv.aval.shape[-1]
                else:
                    unaligned = False
            elif name in ("slice",):
                st = eqn.params["start_indices"][-1]
                sz = eqn.outvars[0].aval.shape[-1] if \
                    eqn.outvars[0].aval.shape else 1
                unaligned = not (_aligned(st) and
                                 (_aligned(sz) or sz ==
                                  eqn.invars[0].aval.shape[-1] - st))
            elif name in ("dynamic_slice", "dynamic_update_slice",
                          "gather"):
                unaligned = True  # dynamic minor indexing: assume worst
            elif name == "transpose":
                perm = eqn.params["permutation"]
                unaligned = perm[-1] != len(perm) - 1  # minor dim moves
                moved = out_elems
            elif name == "reshape":
                ish = eqn.invars[0].aval.shape
                osh = eqn.outvars[0].aval.shape
                # minor-preserving reshapes are free
                unaligned = not (ish and osh and ish[-1] == osh[-1])
            elif name == "rev":
                unaligned = (len(eqn.outvars[0].aval.shape) - 1
                             in eqn.params["dimensions"])
            if unaligned:
                counts["relayout_ops"] += 1
                counts["relayout_elems"] += moved
            else:
                counts["vector_elems"] += 0  # aligned moves ~free (views)
            continue
        # everything else: elementwise / reduction vector work
        counts["vector_elems"] += out_elems
    return counts


def predict_seconds(counts, n_blocks):
    """Per-STEP prediction from per-block counts."""
    t_mxu = (counts["mxu_flops_bf16"] / MXU_BF16
             + counts["mxu_flops_f32"] / MXU_F32)
    vpu_elems = (counts["vector_elems"]
                 + TRANS_COST * counts["transcendental_elems"]
                 + RELAYOUT_ELEM_COST * counts["relayout_elems"]
                 + RELAYOUT_OP_COST * counts["relayout_ops"])
    t_vpu = vpu_elems / VPU_ELEMS
    # in-kernel serialization: Mosaic overlaps MXU and VPU imperfectly;
    # model as mostly-serial (matches the measured "~40% of bf16 matmul
    # floor" observation for the piece bwd kernel)
    return n_blocks * (t_mxu + t_vpu)


def main():
    # measured anchor: piece-layout bwd kernel = 11.78 ms/step at
    # 441 rays x 128 samples (N=56448) block=128 => 441 grid blocks
    N_STEP = 56448
    n_blocks = N_STEP // BLOCK
    measured_piece_s = 11.78e-3

    results = {}
    for layout in ("piece", "slot"):
        meta = real_meta(layout)
        (p8, rotT, off, cut, wps, bps, dout, dg8, dthird,
         cwps, cbps) = _block_args(meta)

        def f(p8, rotT, off, cut, wps, bps, dout, dg8, dthird,
              cwps, cbps, meta=meta):
            return FFF._fine_bwd_block(
                meta, p8, rotT, off, cut, list(wps), list(bps),
                dout, dg8, dthird, list(cwps), list(cbps))

        jaxpr = jax.make_jaxpr(f)(p8, rotT, off, cut, wps, bps, dout,
                                  dg8, dthird, cwps, cbps)
        counts = classify(jaxpr.jaxpr)
        raw_pred = predict_seconds(counts, n_blocks)
        results[layout] = {"counts": counts, "raw_pred_s": raw_pred}

    # calibrate so piece reproduces its measurement; apply the same
    # scale to slot — the RATIO is the falsifiable prediction
    scale = measured_piece_s / results["piece"]["raw_pred_s"]
    for layout in results:
        results[layout]["pred_ms"] = (
            results[layout]["raw_pred_s"] * scale * 1e3)

    print(f"{'':22s}{'piece':>14s}{'slot':>14s}")
    keys = ["mxu_flops_bf16", "mxu_flops_f32", "transcendental_elems",
            "vector_elems", "relayout_ops", "relayout_elems", "dots",
            "eqns"]
    for k in keys:
        p, s = results["piece"]["counts"][k], results["slot"]["counts"][k]
        print(f"{k:22s}{p:14.3g}{s:14.3g}")
    pp = results["piece"]["pred_ms"]
    ps = results["slot"]["pred_ms"]
    print(f"\npredicted bwd kernel ms/step (calibrated on piece="
          f"{measured_piece_s*1e3:.2f}):")
    print(f"  piece {pp:.2f}  slot {ps:.2f}  ratio slot/piece "
          f"{ps/pp:.3f}")

    # Sensitivity: the per-op relayout cost is the one guessed constant
    # (everything else is counted or measured).  Re-calibrating piece to
    # 11.78 ms at each assumed cost yields a FAMILY of slot predictions;
    # the measured A/B point identifies which regime Mosaic is actually
    # in.  (At cost->0 the layouts differ only by their counted
    # MXU/VPU work; as cost grows, piece's 211 ops/block absorb more of
    # its calibrated time and slot's predicted win grows toward it.)
    global RELAYOUT_OP_COST
    print("\nsensitivity (relayout op cost -> predicted slot ms, ratio):")
    base = RELAYOUT_OP_COST
    sens = {}
    for c in (0.0, 1e3, 3e3, 1e4, 3e4, 1e5):
        RELAYOUT_OP_COST = c
        rp = predict_seconds(results["piece"]["counts"], n_blocks)
        rs = predict_seconds(results["slot"]["counts"], n_blocks)
        ms = rs / rp * measured_piece_s * 1e3
        sens[c] = round(ms, 2)
        print(f"  cost={c:8.0f}: slot {ms:6.2f} ms  ratio {ms/11.78:.3f}")
    RELAYOUT_OP_COST = base
    print(json.dumps({
        "metric": "fine_bwd_cost_model_slot_over_piece",
        "value": round(ps / pp, 4), "unit": "ratio",
        "pred_piece_ms": round(pp, 2), "pred_slot_ms": round(ps, 2),
        "piece_relayout_ops": results["piece"]["counts"]["relayout_ops"],
        "slot_relayout_ops": results["slot"]["counts"]["relayout_ops"],
    }))


if __name__ == "__main__":
    main()
