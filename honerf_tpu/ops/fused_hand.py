"""Pallas TPU kernel: fused pose-conditioned hand-SDF inference.

The hand SDF forward (reference `SDFNetwork.forward`, utils/fields.py:
132-156: 21-bone A-NeRF embedding -> 9-layer weight-normed MLP with the
widen-input skip at layer 4) is the hot op of the offline hand model's
up-sample ladder, grid extraction, and penetration queries.  The XLA path
materializes the (N, 1386) embedding in HBM (measured 14.2 ms per 131k
pts on v5e — the dominant hand-step cost, BENCH_NOTES.md) because the
bone-major (N, 21, 3)/(N, 21, 66) intermediates pad their minor dims to
the 128-lane tile.

This kernel computes the embedding IN-REGISTER per point block, entirely
channel-major (embedding.hand_embedding_flat order), with every per-bone
reduction/broadcast expressed as a tiny MXU matmul against iota-built
selection matrices:

  q   (B, 63)  = pts @ [R_0^T .. R_20^T] + (T_j - tpose_j)   one matmul
  v2  (B, 21)  = (q*q) @ S,      S[i, j] = [i//3 == j]        one matmul
  r   (B, 63)  = q * rsqrt(v2p @ S^T)                         one matmul
  feat(B,1386) = [v h | sin(v f_l) h | cos | r h3 | sin(r f_l) h3 | cos]

Stored checkpoint weights stay bone-major; layer 0 and the skip layer's
embedding columns are gathered to channel-major at pack time
(fields._cm_index), exactly like the XLA flat path.  Weights are bf16
(f32 accumulation), matching the obj kernel; inference-only — the
differentiable fine pass stays in XLA so eikonal double-backprop is
exact.

STATUS (measured, TPU v5e, full hand net r_multires=7,
scripts/bench_fused_hand.py): 131k pts 5.0 ms = 26 M pts/s vs XLA
bone-major 19.3 ms (6.8 M) — **3.9x**; 1M pts 30.3 ms = 34.6 M pts/s vs
146.7 ms (7.1 M) — **4.8x**; max |err| vs f32 XLA 3.6e-4 (bf16 weights).
Three ingredients, in measured order of importance: one-dispatch calls
(_fused_call — separate pose-pack/pad/slice ops cost ~17 ms of tunnel
dispatches at ladder scale), the double-angle PE recurrence (~8x fewer
VPU transcendentals; 27.8 -> 18.3 ms), and sub-block interleaving.
Wired into hand mesh extraction and (bf16 trunk mode) the offline
train/eval ladder.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from honerf_tpu.models.embedding import BONE_CUTOFFS, CUTOFF_TAU
from honerf_tpu.models.fields import SDFConfig, _cm_index, _gather_cols
from honerf_tpu.models.mlp import linear_weight

BLOCK = 512
_LANE = 128

#: Opt-in for running the fused ladder on multi-device meshes.  The
#: pallas_call inside a shard_map per-device body is validated on the CPU
#: interpret path (tests/test_pallas_ops.py::test_fused_hand_under_shard_map)
#: but pallas_call under GSPMD jit-with-shardings remains unexercised on
#: real multi-chip hardware — hence opt-in, not default (VERDICT r2 #9).
MULTIDEV_ENV = "HONERF_FUSED_LADDER_MULTIDEV"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fused_ladder_allowed(interpret: bool = False) -> bool:
    """Whether the fused Pallas ladder may run here: interpreter mode
    anywhere (tests/debug); a single non-CPU device always; multi-device
    only with the MULTIDEV_ENV opt-in; never compiled on the CPU backend
    (no Mosaic)."""
    if interpret:
        return True
    if jax.default_backend() == "cpu":
        return False
    if len(jax.devices()) == 1:
        return True
    return os.environ.get(MULTIDEV_ENV, "") == "1"


def assert_fused_ladder_ok(interpret: bool = False) -> None:
    """Loud contract check (VERDICT r2 #4): refuse configurations where the
    fused ladder would silently misbehave instead of relying on docstring
    warnings."""
    if not fused_ladder_allowed(interpret):
        raise RuntimeError(
            "fused hand ladder requested on an unsupported configuration "
            f"(backend={jax.default_backend()}, "
            f"n_devices={len(jax.devices())}): it needs a single non-CPU "
            f"device, or {MULTIDEV_ENV}=1 to opt in on meshes "
            "(pallas_call under GSPMD is unexercised on real multi-chip "
            "hardware).  Use the XLA path instead."
        )


def _assert_not_batched(pts) -> None:
    """Refuse vmap misuse at trace time: the fused call severs gradients
    and its batching semantics are unexercised — the frame-batched fit
    step must use the XLA ladder (fit/single.py).

    ADVISORY, not a guarantee (ADVICE r3): this catches a BatchTracer from
    direct `vmap(fn)` tracing, but `vmap(jit(fn))` batches through the
    pjit rule without a BatchTracer ever reaching this frame.  The
    runners never build that composition (the batched fit step selects
    the XLA ladder before jitting), so the check is a tripwire for new
    call sites, not the enforcement mechanism."""
    try:  # moved to a private module in newer jax; fall back to the name
        from jax._src.interpreters.batching import BatchTracer
        is_batched = isinstance(pts, BatchTracer)
    except Exception:
        is_batched = type(pts).__name__ == "BatchTracer"
    if is_batched:
        raise ValueError(
            "FusedHandSDF must not be placed under vmap (the batched fit "
            "step uses the XLA ladder): pallas_call batching is not "
            "exercised here and the fused ladder severs gradients."
        )


class HandKernelMeta(NamedTuple):
    """Hashable static description (jit static arg)."""

    n_layers: int
    emb_width: int
    skip_in: Tuple[int, ...]
    dims: Tuple[int, ...]
    v_multires: int
    r_multires: int
    # 'slot' (round 4): lane-aligned embedding slots — shared machinery
    # with the differentiable fine pass (fused_fine_full.py); kills the
    # 36-piece unaligned concat in `embed`.
    layout: str = "piece"


def pack_hand_sdf_weights(params: Dict[str, Any], cfg: SDFConfig,
                          layout: str = "piece"):
    """Materialize padded bf16 (in, out) weights (channel-major embedding
    columns; layout='slot' additionally permutes the embedding ROWS into
    the lane-aligned slot order) + f32 biases for the kernel.  The FINAL
    layer keeps only the sdf output column (the kernel returns sdf, not
    the 256 features)."""
    dims = cfg.dims
    layers = list(params["layers"])
    layers[0] = _gather_cols(
        layers[0], _cm_index(cfg.v_multires, cfg.r_multires, 0, 0)
    )
    for s in cfg.skip_in:
        layers[s] = _gather_cols(
            layers[s], _cm_index(cfg.v_multires, cfg.r_multires, cfg.d_hidden, 0)
        )
    if layout == "slot":
        from honerf_tpu.ops.fused_fine_full import (
            _slot_gather_rows,
            slot_channel_map_lr,
        )

        cmap = slot_channel_map_lr(cfg.v_multires, cfg.r_multires)
    ws: List[jnp.ndarray] = []
    bs: List[jnp.ndarray] = []
    n_layers = len(dims) - 1
    for li, layer in enumerate(layers):
        w = linear_weight(layer).T  # (in, out)
        b = layer["b"]
        if li == n_layers - 1:
            w = w[:, :1]  # sdf column only
            b = b[:1]
        if layout == "slot" and li == 0:
            w = _slot_gather_rows(w, cmap)
        elif layout == "slot" and li in cfg.skip_in:
            w = jnp.concatenate(
                [w[:cfg.d_hidden], _slot_gather_rows(w[cfg.d_hidden:], cmap)],
                axis=0,
            )
        in_pad = _round_up(w.shape[0], _LANE)
        out_pad = _round_up(w.shape[1], _LANE)
        w = jnp.pad(w, ((0, in_pad - w.shape[0]), (0, out_pad - w.shape[1])))
        b = jnp.pad(b, (0, out_pad - b.shape[0]))
        ws.append(w.astype(jnp.bfloat16))
        bs.append(b.astype(jnp.float32)[None, :])
    meta = HandKernelMeta(
        n_layers=n_layers,
        emb_width=cfg.input_width,
        skip_in=tuple(cfg.skip_in),
        dims=tuple(dims),
        v_multires=cfg.v_multires,
        r_multires=cfg.r_multires,
        layout=layout,
    )
    return tuple(ws), tuple(bs), meta


def pack_hand_pose(bt_inv: jnp.ndarray, t_pose_21: jnp.ndarray):
    """(21,4,4) inverse bone transforms + (21,3) T-pose ->
    (rotT (8,128) [rows 0-2: concat of R_j^T], off (1,128), cut (1,128))
    padded f32 operands for the kernel."""
    rot = bt_inv[:, :3, :3]  # (21, 3, 3): q_j = R_j p + T_j - tpose_j
    trans = bt_inv[:, :3, 3] - t_pose_21  # (21, 3)
    # q_flat[n, 3j+c] = sum_a p[n, a] * rotT[a, 3j+c] with
    # rotT[a, 3j+c] = rot[j, c, a]
    rotT = jnp.transpose(rot, (2, 0, 1)).reshape(3, 63)
    rotT = jnp.pad(rotT, ((0, 5), (0, _LANE - 63)))  # (8, 128)
    off = jnp.pad(trans.reshape(63), (0, _LANE - 63))[None, :]  # (1, 128)
    cut = jnp.pad(BONE_CUTOFFS, (0, _LANE - 21))[None, :]  # (1, 128)
    return (rotT.astype(jnp.float32), off.astype(jnp.float32),
            cut.astype(jnp.float32))


def _sel_matrices(dtype=jnp.float32):
    """Iota-built selection matrices (captured constants are rejected by
    Mosaic; iota comparisons are not):
      S  (128, 128): S[i, j]  = [i < 63][j < 21][i // 3 == j]  (sum r->v)
      ST (128, 128): ST[j, i] = [j < 21][i < 63][i // 3 == j]  (repeat v->r)
    """
    ii = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    S = ((ii < 63) & (jj < 21) & (ii // 3 == jj)).astype(dtype)
    ST = ((ii < 21) & (jj < 63) & (jj // 3 == ii)).astype(dtype)
    return S, ST


def _pe_pieces(x, gate, L):
    """Gated [sin(2^l x) g]_l + [cos(2^l x) g]_l in the channel-major
    (l-major) layout via the double-angle recurrence: only the l=0 pair
    costs transcendentals; sin/cos(2^l x) = (2 s c, c^2 - s^2).  Direct
    evaluation is ~2 L x more VPU transcendental work — the whole-kernel
    bottleneck (1302 sin/cos per point at vL=10, rL=7).  Absolute error
    grows ~2^l * eps_f32, still far below the bf16 feature precision."""
    s, c = jnp.sin(x), jnp.cos(x)
    sins, coss = [], []
    for l in range(L):
        if l:
            s, c = 2.0 * s * c, (c - s) * (c + s)
        sins.append((s * gate).astype(jnp.bfloat16))
        coss.append((c * gate).astype(jnp.bfloat16))
    return sins, coss


def _make_kernel(meta: HandKernelMeta, n_split: int = 4):
    """The point block is split into `n_split` interleaved sub-blocks so
    the Mosaic scheduler can overlap one sub-block's VPU embedding
    (sin/cos/sigmoid) with another's MXU layer chain (same rationale as
    the object kernel, ops/fused_sdf.py)."""
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    vL, rL = meta.v_multires, meta.r_multires
    W = meta.emb_width  # 21 * (1 + 2 vL + 3 + 6 rL)
    w_pad = _round_up(W, _LANE)
    beta = 100.0
    if meta.layout == "slot":
        from honerf_tpu.ops import fused_fine_full as FFF

        smeta = FFF.FineMeta(
            v_multires=vL, r_multires=rL, d_hidden=meta.dims[1],
            n_layers=meta.n_layers, skip=meta.skip_in[0], d_out=1,
            layout="slot", with_color=True,
        )
        w_pad = smeta.e_kernel_width

    def kernel(pts_ref, rotT_ref, off_ref, cut_ref, *refs):
        n_layers = meta.n_layers
        ws = refs[:n_layers]
        bs = refs[n_layers:2 * n_layers]
        out_ref = refs[2 * n_layers]
        B = pts_ref.shape[0]
        sub = B // n_split
        S, ST = _sel_matrices()

        def embed(p3):
            p = jnp.pad(p3, ((0, 0), (0, 8 - 3)))  # (b, 8)
            if meta.layout == "slot":
                st = FFF._emb_fwd_block_slots(
                    p, rotT_ref[:, :], off_ref[:, :], cut_ref[:, :], smeta)
                return st["e"].astype(jnp.bfloat16)
            q = (
                jnp.dot(p, rotT_ref[:, :], preferred_element_type=jnp.float32)
                + off_ref[0, :]
            )  # (b, 128; 63 real)
            v2 = jnp.dot(q * q, S, preferred_element_type=jnp.float32)
            v2p = v2 + 1e-24
            v = jnp.sqrt(v2p)  # (b, 128; 21 real)
            h = 1.0 - jax.nn.sigmoid(CUTOFF_TAU * (v - cut_ref[0, :]))
            vrep = jnp.dot(v2p, ST, preferred_element_type=jnp.float32)
            r = q * jax.lax.rsqrt(vrep + 1e-24)  # (b, 128; 63 real)
            h3 = jnp.dot(h, ST, preferred_element_type=jnp.float32)
            v21, h21 = v[:, :21], h[:, :21]
            r63, h63 = r[:, :63], h3[:, :63]
            sv, cv = _pe_pieces(v21, h21, vL)
            sr, cr = _pe_pieces(r63, h63, rL)
            feat = jnp.concatenate(
                [(v21 * h21).astype(jnp.bfloat16)] + sv + cv
                + [(r63 * h63).astype(jnp.bfloat16)] + sr + cr,
                axis=-1,
            )  # (b, W) channel-major
            return jnp.pad(feat, ((0, 0), (0, w_pad - W)))

        feats = [
            embed(pts_ref[i * sub:(i + 1) * sub, :]) for i in range(n_split)
        ]
        xs = list(feats)
        for l in range(n_layers):
            if l in meta.skip_in:
                # widen_input skip (hand net): concat(x, embedding)/sqrt(2);
                # dims[l] IS the pre-skip hidden width (the skip layer's
                # weight eats d_hidden + W columns)
                d_prev = meta.dims[l]
                e_w = w_pad if meta.layout == "slot" else W
                xs = [
                    jnp.pad(
                        jnp.concatenate(
                            [x[:, :d_prev], f[:, :e_w]], axis=-1
                        ) * jnp.bfloat16(inv_sqrt2),
                        ((0, 0), (0, ws[l].shape[0] - (d_prev + e_w))),
                    )
                    for x, f in zip(xs, feats)
                ]
            ys = [
                jnp.dot(
                    x.astype(jnp.bfloat16), ws[l][:],
                    preferred_element_type=jnp.float32,
                ) + bs[l][0, :]
                for x in xs
            ]
            if l < n_layers - 1:
                d_out = meta.dims[l + 1]
                acts = []
                for y in ys:
                    y = jnp.logaddexp(beta * y, 0.0) / beta
                    if d_out % _LANE != 0:
                        mask = (
                            jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
                            < d_out
                        )
                        y = jnp.where(mask, y, 0.0)
                    acts.append(y.astype(jnp.bfloat16))
                xs = acts
            else:
                xs = ys  # (b, 128) f32; col 0 = sdf
        for i in range(n_split):
            out_ref[i * sub:(i + 1) * sub, :] = xs[i]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("meta", "block", "n_split", "interpret")
)
def _fused_call(pts, bt_inv, t_pose_21, ws, bs, meta: HandKernelMeta,
                block: int = BLOCK, n_split: int = 4,
                interpret: bool = False):
    """pose pack + pad + kernel + slice as ONE program: issuing them as
    separate ops costs ~9 tunnel dispatches per call, which dominated the
    kernel at ladder scale (21.9 ms measured vs 4.2 ms of kernel time at
    131k pts).

    Inference-only BY CONSTRUCTION: all inputs are stop_gradient'ed so the
    pallas_call (which has no autodiff rule) never sees tangents even when
    invoked inside a differentiated program — the ladder it serves is
    non-differentiable anyway (reference runs up-sampling under no_grad;
    sampling.hierarchical_z_vals ends in stop_gradient)."""
    pts, bt_inv, t_pose_21, ws, bs = jax.lax.stop_gradient(
        (pts, bt_inv, t_pose_21, ws, bs)
    )
    rotT, off, cut = pack_hand_pose(bt_inv, t_pose_21)
    n = pts.shape[0]
    n_pad = _round_up(max(n, block), block)
    pts_pad = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
    out = _run_kernel(pts_pad, rotT, off, cut, ws, bs, meta,
                      block=block, n_split=n_split, interpret=interpret)
    return out[:n, 0]


def _run_kernel(pts_pad, rotT, off, cut, ws, bs, meta: HandKernelMeta,
                block: int = BLOCK, n_split: int = 4,
                interpret: bool = False):
    n = pts_pad.shape[0]
    flops = 2 * n * (
        sum(w.shape[0] * w.shape[1] for w in ws) + 8 * _LANE + 3 * _LANE * _LANE
    )
    transcendentals = n * (2 * (21 * meta.v_multires + 63 * meta.r_multires)
                           + 21 + sum(meta.dims[1:-1]))
    in_specs = [
        pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    for w in ws:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    for b in bs:
        in_specs.append(
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        _make_kernel(meta, n_split),
        out_shape=jax.ShapeDtypeStruct((n, _LANE), jnp.float32),
        grid=(n // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n * (3 + _LANE) * 4,
            transcendentals=transcendentals,
        ),
        interpret=interpret,
    )(pts_pad, rotT, off, cut, *ws, *bs)


class FusedHandSDF:
    """Callable (N, 3) -> (N,) fused pose-conditioned hand SDF.

    Weights are packed once per parameter snapshot; the pose operands
    (bt_inv, t_pose) are packed per call (tiny jit work), so one instance
    serves every pose:
        fused = FusedHandSDF(params['sdf'], cfg)
        sdf = fused(pts, bt_inv, t_pose_21)
    """

    def __init__(self, sdf_params: Dict[str, Any], cfg: SDFConfig,
                 block: int = BLOCK, n_split: int = 4,
                 interpret: bool = False, layout: str = None):
        assert cfg.kind == "hand"
        if layout is None:
            # the ladder kernel's own switch, falling back to the shared
            # fine-pass one (models/fields.py) — the round-5 ablation
            # showed the layouts can win on DIFFERENT kernels (slot wins
            # the fine bwd, piece the forward-only paths), so the sites
            # are independently overridable.
            layout = os.environ.get(
                "HONERF_LADDER_LAYOUT",
                os.environ.get("HONERF_FINE_LAYOUT", "piece"),
            )
        self.ws, self.bs, self.meta = pack_hand_sdf_weights(
            sdf_params, cfg, layout=layout)
        self.block = block
        self.n_split = n_split
        self.interpret = interpret

    def __call__(self, pts: jnp.ndarray, bt_inv: jnp.ndarray,
                 t_pose_21: jnp.ndarray) -> jnp.ndarray:
        _assert_not_batched(pts)
        return _fused_call(pts, bt_inv, t_pose_21, self.ws, self.bs,
                           self.meta, block=self.block,
                           n_split=self.n_split, interpret=self.interpret)


def best_hand_sdf_fn(sdf_params: Dict[str, Any], cfg: SDFConfig,
                     bt_inv: jnp.ndarray, t_pose_21: jnp.ndarray):
    """Fastest (N, 3) -> (N,) hand-SDF evaluator for this backend: the
    fused Pallas kernel on a single TPU chip, the XLA bone-major path
    elsewhere (multi-device meshes fall back too, same guard as every
    other fused-ladder site — ADVICE r2)."""
    from honerf_tpu.models.fields import sdf_hand_apply

    if not fused_ladder_allowed():
        fwd_cfg = cfg._replace(flat_embedding=False)

        def xla_fn(pts):
            out, _, _, _ = sdf_hand_apply(
                sdf_params, fwd_cfg, pts, bt_inv, t_pose_21
            )
            return out[..., 0]

        return jax.jit(xla_fn)
    fused = FusedHandSDF(sdf_params, cfg)
    return lambda pts: fused(pts, bt_inv, t_pose_21)
