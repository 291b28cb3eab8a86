"""FULLY-fused differentiable hand fine pass: embedding + trunk +
spatial gradient in ONE custom-VJP Pallas op.

Round-3 profiling showed the partially-fused trunk op (fused_fine.py)
loses its kernel win to integration overhead: with the embedding left in
XLA, the program materializes dozens of (N, 21/63/256/1386)-wide
intermediates in HBM (embedding fwd, its vjp for the spatial grad, the
second-order embedding backward, the e/u operands of the trunk op), and
the step is slower than the XLA baseline.  The fix is to move the WHOLE
differentiable fine pass into the kernel:

    (pts, rotT, off, W) -> (out257, g, e)
       out  = trunk(e(pts; pose))          sdf + 256 features
       g    = d sdf / d pts                the NeuS/eikonal spatial grad
       e    = the 1386-ch channel-major embedding (for the color net)

computed per point block entirely in VMEM:

  fwd  = embedding stages -> trunk forward -> u-chain (u = d sdf/d e)
         -> embedding REVERSE chain with cotangent u  =>  g
  bwd  (cotangents dout, dg, de_ext) =
         R-TRANSPOSE of the reverse chain (yields the u-cotangent du and
         second-order stage adjoints)
         -> the existing trunk backward (fused_fine._make_bwd-style
            statements) with du
         -> embedding-FORWARD transpose (merges trunk de, external de,
            and the R stage adjoints) => dq_total
         -> dp = dq @ rotT^T;  drotT += p^T dq (+ the direct tangent
            row term t^T f from the R-transpose);  doff += sum dq

Pose gradients (se3_refine through bt_inv) flow through the small
differentiable (rotT, off) operands — pack_hand_pose stays XLA autodiff.
All statements exist first as pure-jnp block bodies (shared by the
kernels and the CPU tests) and are validated stage-by-stage against
jax autodiff; the integrated op is validated against the XLA
sdf_hand_value_feat_grad path at <=1e-3 in f32 mode.

Reference workload: utils/fields.py:132-177 (forward + autograd
double-backprop), utils/renderer.py:107-177 (fine pass consumer).
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
from honerf_tpu.ops import fused_fine as FT  # trunk machinery
from honerf_tpu.ops.fused_hand import pack_hand_pose, _sel_matrices

_LANE = 128
INV_SQRT2 = FT.INV_SQRT2
BETA = FT.BETA
EPS_V2 = 1e-24  # matches hand_embedding_flat's v2 epsilon


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class FineMeta(NamedTuple):
    """Static architecture of the fused fine pass (hashable).

    with_color adds the 4x256 hand color net (relu + sigmoid,
    input = [e | feat | grad | PE(grad)]) to the op: outputs become
    (sdf, g, color) and the embedding/features never leave VMEM."""

    v_multires: int         # 10
    r_multires: int         # 7
    d_hidden: int           # 256
    n_layers: int           # 9 linear layers
    skip: int               # 4
    d_out: int              # 257
    dtype: str = "bf16"     # 'bf16' fast / 'f32' validation
    with_color: bool = False
    c_hidden: int = 256
    c_layers: int = 5       # linear layers of the color net
    grad_L: int = 4         # grad-PE frequencies
    # sub-blocks per kernel block: independent row groups the Mosaic
    # scheduler can interleave (same trick as ops/fused_hand.py); parity
    # at n_split=2 validated on the interpret path, but measured NO win
    # for this op on v5e (27.4 vs 26.1 ms at equal sub-size) — default 1
    n_split: int = 1
    # want_dw=False: FROZEN-NETS backward (the pose-fitting stage) —
    # the bwd kernel skips every dW = X^T dY matmul (18 trunk + 5 color)
    # and drops the large f32 dW accumulators from VMEM, emitting only
    # (dp, drotT, doff).  The custom VJP then returns ZERO cotangents
    # for ws/bs/cws/cbs — callers must not differentiate w.r.t. the
    # weights in this mode (the fit stage never does).
    want_dw: bool = True
    # layout='slot' (round 4): the embedding lives in lane-ALIGNED
    # 128-wide slots instead of the packed channel-major order.  Stage
    # values are replicated across lane groups by the constant selection
    # matmuls (the MXU does the cross-lane movement for free) and each
    # slot is produced by ONE full-width sin/cos with per-lane frequency
    # constants — eliminating the ~130 unaligned 21/63-lane slices and
    # the 37-piece concats of the piece layout.  Trunk/color weight ROWS
    # are permuted host-side to match (slot_channel_map), so the op's
    # public semantics are unchanged.  with_color only (the slot e is
    # never exposed).
    layout: str = "piece"
    # stash=True (round 5): the VJP forward additionally emits the
    # trunk/u-chain/color residuals to HBM and the backward kernel
    # STREAMS them back instead of rematerializing the whole forward
    # per block — removing the trunk-fwd + u-chain + color-fwd matmuls
    # (~1/3 of the bwd kernel's MXU work) at the price of ~29 KB/row of
    # HBM traffic that pipelines under the remaining compute.  The
    # embedding stages (VPU-only, overlapped with the MXU) are still
    # recomputed.  The rewrite is EXACT math: f32 stash for values
    # consumed by f32 elementwise math (ss, cs, u, sigmoid), trunk/color
    # activations stashed in their in-kernel cast dtype (they only ever
    # feed matmul operands, which cast identically) — block-level
    # bit-exactness is pinned by test_stash_block_body_bit_exact.  The
    # integrated op may differ from the recompute path by compiler
    # scheduling rounding only (different programs => XLA/Mosaic may
    # reassociate f32 chains differently; measured ~1e-7 relative, far
    # below the op's bf16 matmul noise).  Public semantics unchanged;
    # the primal (non-VJP) forward never emits the stash.  with_color
    # only.
    stash: bool = False

    @property
    def emb_width(self) -> int:
        return 21 * (1 + 2 * self.v_multires) + 63 * (1 + 2 * self.r_multires)

    # --- slot-layout geometry (layout='slot') ---
    # v-family: (1 + 2 v_multires) pieces of 21 lanes, 6 per 128-slot;
    # r-family: (1 + 2 r_multires) pieces of 63 lanes, 2 per 128-slot.
    @property
    def v_pieces(self) -> int:
        return 1 + 2 * self.v_multires

    @property
    def r_pieces(self) -> int:
        return 1 + 2 * self.r_multires

    @property
    def v_slots(self) -> int:
        return -(-self.v_pieces // 6)

    @property
    def r_slots(self) -> int:
        return -(-self.r_pieces // 2)

    @property
    def n_slots(self) -> int:
        return self.v_slots + self.r_slots

    @property
    def e_kernel_width(self) -> int:
        """Width of the e section in KERNEL layout: the aligned slot
        width for layout='slot', the logical width otherwise."""
        if self.layout == "slot":
            return self.n_slots * _LANE
        return self.emb_width

    @property
    def trunk_meta(self) -> FT.TrunkMeta:
        return FT.TrunkMeta(
            emb_width=self.emb_width, d_hidden=self.d_hidden,
            n_layers=self.n_layers, skip=self.skip, d_out=self.d_out,
            dtype=self.dtype,
        )

    @property
    def gpe_blocks(self) -> int:
        """8-wide blocks of the in-kernel grad(+PE) section:
        [g | sin_l x L | cos_l x L]."""
        return 1 + 2 * self.grad_L

    @property
    def gpe_width(self) -> int:
        """Kernel width of the grad(+PE) color-input section: one full
        128-lane slot (16 groups of 8; junk lanes -> -1 rows) in slot
        layout, 8*gpe_blocks packed blocks otherwise."""
        if self.layout == "slot":
            assert 1 + 2 * self.grad_L <= 16
            return _LANE
        return 8 * self.gpe_blocks

    @property
    def color_in_kernel(self) -> int:
        """Kernel-layout color input width: e + feat + grad(+PE)."""
        return self.e_kernel_width + (self.d_out - 1) + self.gpe_width

    @property
    def color_dims(self) -> Tuple[Tuple[int, int], ...]:
        """(in, out) per color layer in KERNEL layout (padded-friendly)."""
        dims = []
        d_in = self.color_in_kernel
        for l in range(self.c_layers):
            d_o = 3 if l == self.c_layers - 1 else self.c_hidden
            dims.append((d_in, d_o))
            d_in = d_o
        return tuple(dims)

    def stash_specs(self) -> Tuple[Tuple[str, int, str], ...]:
        """(name, width, dtype) of the residual-stash arrays, in kernel
        I/O order (stash=True).  Dtypes: 'cast' follows the trunk dtype
        (values that only feed matmul operands — bit-exact under the
        matmul's own cast), 'f32' for values consumed by f32 elementwise
        statements.  want_dw=False (frozen nets) drops the arrays only
        the dW matmuls need (trunk ins, color-input feat)."""
        assert self.with_color, "stash requires with_color"
        Hp = _round_up(self.d_hidden, _LANE)   # in-kernel padded widths
        cHp = _round_up(self.c_hidden, _LANE)
        n = self.n_layers
        Ekp = _round_up(self.e_kernel_width, _LANE)
        specs = []
        if self.want_dw:
            specs.append(("ins", (n - 1) * Hp, "cast"))  # raw a_1..a_{n-1}
        specs.append(("ss", (n - 1) * Hp, "f32"))         # sigmoid(beta z)
        specs.append(("cs", (n - 1) * Hp, "f32"))         # u-chain cs[1..]
        specs.append(("u", Ekp, "f32"))                   # d sdf / d e
        if self.want_dw:
            specs.append(("feat", self.d_out - 1, "cast"))  # out[:, 1:]
        specs.append(("cacts", (self.c_layers - 1) * cHp,
                      "cast"))                            # color relu acts
        specs.append(("sig", 8, "f32"))                   # color sigmoid
        return tuple(specs)


def color_row_map(meta: FineMeta) -> np.ndarray:
    """Maps kernel color-input rows -> reference color-input rows
    (after the channel-major e gather), with -1 for the zero rows the
    8-lane grad-PE padding introduces.

    Reference color input (utils/fields.py:222-240, flat-embedding
    order): [e (E) | feat (256) | g (3) | PE(g): per channel
    (sin f0..fL-1, cos f0..fL-1)].  Kernel layout replaces the 27-ch
    grad section with 8-wide blocks [g | sin_l | cos_l] whose channels
    3..7 are junk — mapped to zero weight rows.

    layout='slot': the e section rows follow slot_channel_map (slot-pad
    lanes -> -1); feat/grad sections unchanged."""
    E = meta.emb_width
    F = meta.d_out - 1
    L = meta.grad_L
    if meta.layout == "slot":
        rows = [int(c) for c in slot_channel_map(meta)]
        rows += list(range(E, E + F))
    else:
        rows = list(range(E + F))
    gbase = E + F
    n_grp = (16 if meta.layout == "slot" else meta.gpe_blocks)
    for blk in range(n_grp):
        for ch in range(8):
            if ch >= 3 or blk >= meta.gpe_blocks:
                rows.append(-1)
            elif blk == 0:
                rows.append(gbase + ch)
            else:
                t = 0 if blk - 1 < L else 1
                l = (blk - 1) % L
                rows.append(gbase + 3 + ch * 2 * L + t * L + l)
    return np.asarray(rows)


# ---------------------------------------------------------------------------
# Embedding block bodies (padded (B, 128) stage shapes; pure jnp — run
# identically inside the kernel and in CPU tests)
# ---------------------------------------------------------------------------

def _emb_fwd_block(p8, rotT, off, cut, meta: FineMeta):
    """Embedding stages for one block.

    Args:
        p8: (B, 8) points padded to 8 cols.
        rotT: (8, 128) — rows 0-2 hold [R_0^T .. R_20^T] (63 cols).
        off: (1, 128) — trans - t_pose flattened (63 cols).
        cut: (1, 128) — per-bone cutoffs (21 cols).
    Returns:
        dict of stage values; e is the (B, E) channel-major embedding.
    """
    vL, rL = meta.v_multires, meta.r_multires
    S, ST = _sel_matrices()
    q = jnp.dot(p8, rotT, preferred_element_type=jnp.float32) + off[0, :]
    v2p = jnp.dot(q * q, S, preferred_element_type=jnp.float32) + EPS_V2
    v = jnp.sqrt(v2p)                       # (B, 128; 21 real)
    sc = jax.nn.sigmoid(CUTOFF_TAU * (v - cut[0, :]))
    h = 1.0 - sc
    vrep = jnp.dot(v2p, ST, preferred_element_type=jnp.float32)
    w3 = jax.lax.rsqrt(vrep + EPS_V2)       # (B, 128; 63 real)
    rr = q * w3
    h3 = jnp.dot(h, ST, preferred_element_type=jnp.float32)
    # PE values via the double-angle recurrence (f32 — the bf16 cast
    # happens only on the e pieces, so stage values reused by the
    # derivative chains stay accurate)
    sv, cv = [], []
    s, c = jnp.sin(v), jnp.cos(v)
    for l in range(vL):
        if l:
            s, c = 2.0 * s * c, (c - s) * (c + s)
        sv.append(s)
        cv.append(c)
    sr, cr = [], []
    s, c = jnp.sin(rr), jnp.cos(rr)
    for l in range(rL):
        if l:
            s, c = 2.0 * s * c, (c - s) * (c + s)
        sr.append(s)
        cr.append(c)
    v21, h21 = v[:, :21], h[:, :21]
    r63, h63 = rr[:, :63], h3[:, :63]
    pieces = [v21 * h21]
    pieces += [sv[l][:, :21] * h21 for l in range(vL)]
    pieces += [cv[l][:, :21] * h21 for l in range(vL)]
    pieces += [r63 * h63]
    pieces += [sr[l][:, :63] * h63 for l in range(rL)]
    pieces += [cr[l][:, :63] * h63 for l in range(rL)]
    e = jnp.concatenate(pieces, axis=-1)    # (B, E) channel-major
    return dict(q=q, v2p=v2p, v=v, sc=sc, h=h, w3=w3, rr=rr, h3=h3,
                sv=sv, cv=cv, sr=sr, cr=cr, e=e)


def _split_u(u, meta: FineMeta):
    """Split a (B, E) embedding-cotangent into the per-piece views,
    zero-padded back to 128 lanes (kernel-friendly)."""
    vL, rL = meta.v_multires, meta.r_multires
    pos = 0
    out = []
    widths = [21] * (1 + 2 * vL) + [63] * (1 + 2 * rL)
    for wdt in widths:
        piece = u[:, pos:pos + wdt]
        out.append(jnp.pad(piece, ((0, 0), (0, _LANE - wdt))))
        pos += wdt
    u_vh = out[0]
    u_sv = out[1:1 + vL]
    u_cv = out[1 + vL:1 + 2 * vL]
    u_rh = out[1 + 2 * vL]
    u_sr = out[2 + 2 * vL:2 + 2 * vL + rL]
    u_cr = out[2 + 2 * vL + rL:]
    return u_vh, u_sv, u_cv, u_rh, u_sr, u_cr


def _rev_tail(st, rotT, phi_v, a_v, b_h, phi_r, c_rr, d_h3):
    """R5-R12 of the reverse chain — shared by the piece and slot
    layouts (inputs are the per-family adjoints the layouts assemble
    differently; the stage arrays in `st` carry real values in lanes
    0..20 / 0..62 and layout-specific junk elsewhere that the S/ST
    zero structure filters)."""
    S, ST = _sel_matrices()
    v = st["v"]
    # R5
    b_h = b_h + jnp.dot(d_h3, S, preferred_element_type=jnp.float32)
    # R6/R7
    f_q = c_rr * st["w3"]
    m_vrep = -0.5 * c_rr * st["q"] * st["w3"] ** 3
    # R8
    n_v2p = jnp.dot(m_vrep, S, preferred_element_type=jnp.float32)
    # R9
    a_v = a_v - CUTOFF_TAU * st["sc"] * (1.0 - st["sc"]) * b_h
    # R10
    n_v2p = n_v2p + 0.5 * a_v / v
    # R11
    f_q = f_q + 2.0 * st["q"] * jnp.dot(
        n_v2p, ST, preferred_element_type=jnp.float32)
    # R12: g = f_q @ rotT^T (rows 0-2 real)
    g8 = jnp.dot(f_q, rotT.T, preferred_element_type=jnp.float32)
    chain = dict(phi_v=phi_v, a_v=a_v, b_h=b_h, phi_r=phi_r, c_rr=c_rr,
                 d_h3=d_h3, f_q=f_q, m_vrep=m_vrep, n_v2p=n_v2p)
    return g8, chain


def _emb_rev_block(st, rotT, u, meta: FineMeta):
    """REVERSE chain: cotangent u on e -> g = (d e/d pts)^T u  (B, 8).

    Also returns the chain intermediates needed by the transpose."""
    vL, rL = meta.v_multires, meta.r_multires
    u_vh, u_sv, u_cv, u_rh, u_sr, u_cr = _split_u(u, meta)
    sv, cv, sr, cr = st["sv"], st["cv"], st["sr"], st["cr"]
    h, v, rr, h3 = st["h"], st["v"], st["rr"], st["h3"]
    # R1/R2: v-piece adjoints
    phi_v = u_vh + sum((2.0 ** l) * (cv[l] * u_sv[l] - sv[l] * u_cv[l])
                       for l in range(vL))
    a_v = h * phi_v                                        # dbar v  (21)
    b_h = v * u_vh + sum(sv[l] * u_sv[l] + cv[l] * u_cv[l]
                         for l in range(vL))               # dbar h
    # R3/R4: r-piece adjoints
    phi_r = u_rh + sum((2.0 ** l) * (cr[l] * u_sr[l] - sr[l] * u_cr[l])
                       for l in range(rL))
    c_rr = h3 * phi_r                                      # dbar rr (63)
    d_h3 = rr * u_rh + sum(sr[l] * u_sr[l] + cr[l] * u_cr[l]
                           for l in range(rL))             # dbar h3
    return _rev_tail(st, rotT, phi_v, a_v, b_h, phi_r, c_rr, d_h3)


def _transpose_head(st, ch, rotT, t8):
    """T12-T5 of the reverse-chain transpose — shared by the piece and
    slot layouts.  Returns the family-level cotangents (cb on b_h, cd on
    d_h3, cc on c_rr, ca on a_v) plus the direct stage adjoints
    (dq, dv, dsc, dw3) and the g = f @ rotT^T term's drotT."""
    S, ST = _sel_matrices()
    v, q, sc, w3 = st["v"], st["q"], st["sc"], st["w3"]
    # T12: g = f @ rotT^T
    cf = jnp.dot(t8, rotT, preferred_element_type=jnp.float32)  # chat(f)
    drotT = jnp.dot(t8.T, ch["f_q"],
                    preferred_element_type=jnp.float32)  # (8, 128)
    # T11: f += 2 q * (n @ ST)
    n_rep = jnp.dot(ch["n_v2p"], ST, preferred_element_type=jnp.float32)
    cn = jnp.dot(2.0 * q * cf, S, preferred_element_type=jnp.float32)
    dq = 2.0 * n_rep * cf
    # T10: n += 0.5 a / v
    ca = 0.5 * cn / v
    dv = -0.5 * ch["a_v"] / (v * v) * cn
    # T9: a += -tau sc (1 - sc) b
    cb = -CUTOFF_TAU * sc * (1.0 - sc) * ca
    dsc = -CUTOFF_TAU * (1.0 - 2.0 * sc) * ch["b_h"] * ca
    # T8: n = m @ S
    cm = jnp.dot(cn, ST, preferred_element_type=jnp.float32)
    # T7: m = -0.5 c q w3^3
    cc = -0.5 * q * w3 ** 3 * cm
    dq = dq - 0.5 * ch["c_rr"] * w3 ** 3 * cm
    dw3 = -1.5 * ch["c_rr"] * q * w3 ** 2 * cm
    # T6: f = c * w3  (the R6 contribution to f)
    cc = cc + w3 * cf
    dw3 = dw3 + ch["c_rr"] * cf
    # T5: b += d @ S
    cd = jnp.dot(cb, ST, preferred_element_type=jnp.float32)
    return dict(cf=cf, drotT=drotT, dq=dq, dv=dv, dsc=dsc, dw3=dw3,
                ca=ca, cb=cb, cc=cc, cd=cd)


def _emb_rev_transpose_block(st, ch, rotT, u, t8, meta: FineMeta):
    """Transpose of the reverse chain w.r.t. (u, stages, rotT) at
    cotangent t on g.

    Args:
        st: forward stages; ch: reverse-chain intermediates; u: the
        primal u; t8: (B, 8) cotangent of g (3 real cols).
    Returns:
        du (B, E), stage-adjoint dict (seeds for the fwd transpose),
        drotT_partial (8, 128) from the direct g = f @ rotT^T term.
    """
    vL, rL = meta.v_multires, meta.r_multires
    sv, cv, sr, cr = st["sv"], st["cv"], st["sr"], st["cr"]
    h, v, rr, h3 = st["h"], st["v"], st["rr"], st["h3"]
    u_vh, u_sv, u_cv, u_rh, u_sr, u_cr = _split_u(u, meta)

    hd = _transpose_head(st, ch, rotT, t8)
    drotT = hd["drotT"]
    dq, dv, dsc, dw3 = hd["dq"], hd["dv"], hd["dsc"], hd["dw3"]
    ca, cb, cc, cd = hd["ca"], hd["cb"], hd["cc"], hd["cd"]
    # T4: d = rr u_rh + sum(sr u_sr + cr u_cr)
    cu_rh = rr * cd
    drr = u_rh * cd
    dsr = [u_sr[l] * cd for l in range(rL)]
    dcr = [u_cr[l] * cd for l in range(rL)]
    cu_sr = [sr[l] * cd for l in range(rL)]
    cu_cr = [cr[l] * cd for l in range(rL)]
    # T3: c = h3 * phi_r
    dh3 = ch["phi_r"] * cc
    hc = h3 * cc
    cu_rh = cu_rh + hc
    for l in range(rL):
        f = 2.0 ** l
        cu_sr[l] = cu_sr[l] + f * cr[l] * hc
        cu_cr[l] = cu_cr[l] - f * sr[l] * hc
        dcr[l] = dcr[l] + f * u_sr[l] * hc
        dsr[l] = dsr[l] - f * u_cr[l] * hc
    # T2: b(part) = v u_vh + sum(sv u_sv + cv u_cv)
    cu_vh = v * cb
    dv = dv + u_vh * cb
    dsv = [u_sv[l] * cb for l in range(vL)]
    dcv = [u_cv[l] * cb for l in range(vL)]
    cu_sv = [sv[l] * cb for l in range(vL)]
    cu_cv = [cv[l] * cb for l in range(vL)]
    # T1: a(part) = h * phi_v
    dh = ch["phi_v"] * ca
    hca = h * ca
    cu_vh = cu_vh + hca
    for l in range(vL):
        f = 2.0 ** l
        cu_sv[l] = cu_sv[l] + f * cv[l] * hca
        cu_cv[l] = cu_cv[l] - f * sv[l] * hca
        dcv[l] = dcv[l] + f * u_sv[l] * hca
        dsv[l] = dsv[l] - f * u_cv[l] * hca

    du = jnp.concatenate(
        [cu_vh[:, :21]] + [x[:, :21] for x in cu_sv]
        + [x[:, :21] for x in cu_cv] + [cu_rh[:, :63]]
        + [x[:, :63] for x in cu_sr] + [x[:, :63] for x in cu_cr],
        axis=-1,
    )
    adj = dict(dq=dq, dv=dv, dsc=dsc, dw3=dw3, drr=drr, dh=dh, dh3=dh3,
               dsv=dsv, dcv=dcv, dsr=dsr, dcr=dcr)
    return du, adj, drotT


def _emb_fwd_transpose_block(st, de, adj, cut, meta: FineMeta):
    """Transpose of the embedding FORWARD at cotangents de (on e) merged
    with the R-transpose stage adjoints.  Returns dq_total (B, 128) — the
    complete adjoint of q — from which dp / drotT / doff follow."""
    vL, rL = meta.v_multires, meta.r_multires
    S, ST = _sel_matrices()
    sv, cv, sr, cr = st["sv"], st["cv"], st["sr"], st["cr"]
    h, v, rr, h3, q, sc, w3 = (st["h"], st["v"], st["rr"], st["h3"],
                               st["q"], st["sc"], st["w3"])
    e_vh, e_sv, e_cv, e_rh, e_sr, e_cr = _split_u(de, meta)

    # e pieces: p = X * gate  (X in {v, sv_l, cv_l}, gate = h; r-family
    # gate = h3).  Merge with the R-transpose adjoints on the same vars.
    dv = adj["dv"] + h * e_vh
    dh = adj["dh"] + v * e_vh
    dsv = [adj["dsv"][l] + h * e_sv[l] for l in range(vL)]
    dcv = [adj["dcv"][l] + h * e_cv[l] for l in range(vL)]
    dh = dh + sum(sv[l] * e_sv[l] + cv[l] * e_cv[l] for l in range(vL))
    drr = adj["drr"] + h3 * e_rh
    dh3 = adj["dh3"] + rr * e_rh
    dsr = [adj["dsr"][l] + h3 * e_sr[l] for l in range(rL)]
    dcr = [adj["dcr"][l] + h3 * e_cr[l] for l in range(rL)]
    dh3 = dh3 + sum(sr[l] * e_sr[l] + cr[l] * e_cr[l] for l in range(rL))

    # PE transposes: sin/cos(2^l x) chains — accumulate d/dx directly
    # (d sv_l/d v = 2^l cv_l; d cv_l/d v = -2^l sv_l; same for r)
    for l in range(vL):
        f = 2.0 ** l
        dv = dv + f * (cv[l] * dsv[l] - sv[l] * dcv[l])
    for l in range(rL):
        f = 2.0 ** l
        drr = drr + f * (cr[l] * dsr[l] - sr[l] * dcr[l])

    return _fwdT_tail(st, adj, dv, dh, dh3, drr)


def _fwdT_tail(st, adj, dv, dh, dh3, drr):
    """Stage-level tail of the embedding-forward transpose (the part
    below the piece/slot family structure) — shared by both layouts.
    adj carries the R-transpose's direct dq/dsc/dw3 seeds."""
    S, ST = _sel_matrices()
    v, q, sc, w3 = st["v"], st["q"], st["sc"], st["w3"]
    # h3 = h @ ST
    dh = dh + jnp.dot(dh3, S, preferred_element_type=jnp.float32)
    # rr = q * w3
    dq = adj["dq"] + w3 * drr
    dw3 = adj["dw3"] + q * drr
    # w3 = rsqrt(vrep + eps); vrep = v2p @ ST
    dvrep = -0.5 * w3 ** 3 * dw3
    dv2p = jnp.dot(dvrep, S, preferred_element_type=jnp.float32)
    # h = 1 - sc; sc = sigmoid(tau (v - cut))
    dsc = adj["dsc"] - dh
    dv = dv + CUTOFF_TAU * sc * (1.0 - sc) * dsc
    # v = sqrt(v2p)
    dv2p = dv2p + 0.5 * dv / v
    # v2p = (q*q) @ S + eps
    dq = dq + 2.0 * q * jnp.dot(dv2p, ST,
                                preferred_element_type=jnp.float32)
    return dq


# ---------------------------------------------------------------------------
# SLOT layout (round 4): lane-aligned embedding slots
#
# The piece layout's channel-major e forces ~130 unaligned 21/63-lane
# slices/pads (_split_u x3 per backward) and two 37-piece concats per
# block — all VPU cross-lane shuffles.  The slot layout instead:
#   * replicates the per-bone stages across lane GROUPS via constant
#     selection matmuls (S6/ST2 — the MXU moves lanes for free),
#   * evaluates each 128-lane e slot with ONE sin + ONE cos over
#     per-lane frequency constants (iota-built; Mosaic rejects captured
#     dense constants but not iota comparisons),
#   * permutes the trunk/color weight ROWS host-side to match
#     (slot_channel_map), so the op's public semantics are unchanged.
# u/de then split into 128-aligned slot VIEWS (free) and the per-piece
# chain sums become slot-wise products + one reduction matmul.
# v-family: 6 pieces of 21 lanes per slot; r-family: 2 pieces of 63.
# ---------------------------------------------------------------------------

def slot_channel_map_lr(vL: int, rL: int) -> np.ndarray:
    """new kernel channel -> channel-major e index (-1 for slot pads),
    as a function of the two PE orders (shared with the forward-only
    ladder kernel, ops/fused_hand.py).

    Channel-major piece order (hand_embedding_flat,
    models/embedding.py:162-172): [vh, sv_0..sv_{vL-1}, cv_0.., rrh3,
    sr_0.., cr_0..]."""
    v_pieces, r_pieces = 1 + 2 * vL, 1 + 2 * rL
    rows = []
    for k in range(-(-v_pieces // 6)):
        for lane in range(_LANE):
            p = 6 * k + lane // 21
            if lane < 126 and p < v_pieces:
                rows.append(p * 21 + lane % 21)
            else:
                rows.append(-1)
    rbase = 21 * v_pieces
    for k in range(-(-r_pieces // 2)):
        for lane in range(_LANE):
            p = 2 * k + lane // 63
            if lane < 126 and p < r_pieces:
                rows.append(rbase + p * 63 + lane % 63)
            else:
                rows.append(-1)
    return np.asarray(rows)


def slot_channel_map(meta: FineMeta) -> np.ndarray:
    return slot_channel_map_lr(meta.v_multires, meta.r_multires)


def _slot_sel_matrices(dtype=jnp.float32):
    """Iota-built selection/reduction matrices for the slot layout:
      S6   q-lane space -> v2p replicated over 6 groups of 21
      ST2  group-0 21 lanes -> 63 lanes (bone->r triple) x 2 groups
      RED6 sum the 6 v-groups -> 21 lanes;  RED2 likewise for r
      BRD6 broadcast 21 lanes -> 6 groups;  BRD2 63 -> 2 groups"""
    ii = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    S6 = ((ii < 63) & (jj < 126) & (ii // 3 == jj % 21)).astype(dtype)
    ST2 = ((ii < 21) & (jj < 126) & ((jj % 63) // 3 == ii)).astype(dtype)
    RED6 = ((ii < 126) & (jj < 21) & (ii % 21 == jj)).astype(dtype)
    RED2 = ((ii < 126) & (jj < 63) & (ii % 63 == jj)).astype(dtype)
    BRD6 = ((ii < 21) & (jj < 126) & (jj % 21 == ii)).astype(dtype)
    BRD2 = ((ii < 63) & (jj < 126) & (jj % 63 == ii)).astype(dtype)
    return S6, ST2, RED6, RED2, BRD6, BRD2


def _slot_lane_consts(meta: FineMeta):
    """Per-slot (1, 128) lane constants: identity/sin/cos masks and the
    PE frequency 2^l at each lane (0 where masked).  Iota-built."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    out = []
    for fam in ("v", "r"):
        n_slots = meta.v_slots if fam == "v" else meta.r_slots
        per, width = (6, 21) if fam == "v" else (2, 63)
        pieces = meta.v_pieces if fam == "v" else meta.r_pieces
        L = meta.v_multires if fam == "v" else meta.r_multires
        for k in range(n_slots):
            p = per * k + lane // width
            valid = (lane < per * width) & (p < pieces)
            idm = (valid & (p == 0)).astype(jnp.float32)
            sm = (valid & (p >= 1) & (p <= L)).astype(jnp.float32)
            cm = (valid & (p > L)).astype(jnp.float32)
            ell = jnp.where(p <= L, p - 1, p - 1 - L)
            F = jnp.exp2(jnp.clip(ell, 0, None).astype(jnp.float32))
            F = F * (sm + cm)
            out.append(dict(idm=idm, sm=sm, cm=cm, F=F, F2=F * F))
    return out


def _slot_D(lc, s, c):
    """d T_k / d x per lane (identity -> 1, sin -> F cos, cos -> -F sin)."""
    return lc["idm"] + lc["F"] * (lc["sm"] * c - lc["cm"] * s)


def _slot_D2(lc, s, c):
    """d2 T_k / d x2 per lane (trig -> -F^2 T; identity/pad -> 0)."""
    return -lc["F2"] * (lc["sm"] * s + lc["cm"] * c)


def _slot_views(u, meta: FineMeta):
    """128-aligned per-slot views of a (B, n_slots*128) array — free."""
    return [u[:, k * _LANE:(k + 1) * _LANE] for k in range(meta.n_slots)]


def _emb_fwd_block_slots(p8, rotT, off, cut, meta: FineMeta):
    """Slot-layout embedding stages.  Stage arrays are REPLICATED:
    v/sc/h over 6 lane groups of 21 (group 0 = the piece layout's
    values), w3/rr/h3 over 2 groups of 63.  The chain tails only read
    the real lanes (S/ST zero structure), so they are shared with the
    piece layout."""
    S6, ST2, RED6, RED2, BRD6, BRD2 = _slot_sel_matrices()
    lcs = _slot_lane_consts(meta)
    q = jnp.dot(p8, rotT, preferred_element_type=jnp.float32) + off[0, :]
    v2p = jnp.dot(q * q, S6, preferred_element_type=jnp.float32) + EPS_V2
    v = jnp.sqrt(v2p)                            # rep6 (126 real)
    cut6 = jnp.dot(cut, BRD6, preferred_element_type=jnp.float32)
    sc = jax.nn.sigmoid(CUTOFF_TAU * (v - cut6[0, :]))
    h = 1.0 - sc
    vrep = jnp.dot(v2p, ST2, preferred_element_type=jnp.float32)
    w3 = jax.lax.rsqrt(vrep + EPS_V2)            # rep2 (126 real)
    q2 = jnp.dot(q, BRD2, preferred_element_type=jnp.float32)
    rr = q2 * w3
    h3 = jnp.dot(h, ST2, preferred_element_type=jnp.float32)
    SINs, COSs, Ts, es = [], [], [], []
    for k, lc in enumerate(lcs):
        x, gate = (v, h) if k < meta.v_slots else (rr, h3)
        s = jnp.sin(x * lc["F"])
        c = jnp.cos(x * lc["F"])
        t = lc["idm"] * x + lc["sm"] * s + lc["cm"] * c
        SINs.append(s)
        COSs.append(c)
        Ts.append(t)
        es.append(t * gate)
    e = jnp.concatenate(es, axis=-1)             # (B, n_slots*128) aligned
    return dict(q=q, v2p=v2p, v=v, sc=sc, h=h, w3=w3, rr=rr, h3=h3,
                SIN=SINs, COS=COSs, T=Ts, lc=lcs, e=e)


def _emb_rev_block_slots(st, rotT, u, meta: FineMeta):
    """Slot-layout reverse chain: the per-piece R1-R4 sums become
    slot-wise products + one reduction matmul per family."""
    _S6, _ST2, RED6, RED2, _B6, _B2 = _slot_sel_matrices()
    us = _slot_views(u, meta)
    nv = meta.v_slots
    lcs, SIN, COS, T = st["lc"], st["SIN"], st["COS"], st["T"]
    phi_v_p = sum(us[k] * _slot_D(lcs[k], SIN[k], COS[k])
                  for k in range(nv))
    b_h_p = sum(us[k] * T[k] for k in range(nv))
    phi_r_p = sum(us[nv + k] * _slot_D(lcs[nv + k], SIN[nv + k],
                                       COS[nv + k])
                  for k in range(meta.r_slots))
    d_h3_p = sum(us[nv + k] * T[nv + k] for k in range(meta.r_slots))
    phi_v = jnp.dot(phi_v_p, RED6, preferred_element_type=jnp.float32)
    b_h = jnp.dot(b_h_p, RED6, preferred_element_type=jnp.float32)
    phi_r = jnp.dot(phi_r_p, RED2, preferred_element_type=jnp.float32)
    d_h3 = jnp.dot(d_h3_p, RED2, preferred_element_type=jnp.float32)
    a_v = st["h"] * phi_v
    c_rr = st["h3"] * phi_r
    return _rev_tail(st, rotT, phi_v, a_v, b_h, phi_r, c_rr, d_h3)


def _emb_rev_transpose_block_slots(st, ch, rotT, u, t8, meta: FineMeta):
    """Slot-layout transpose of the reverse chain.  Returns du in SLOT
    layout (aligned concat), the adjoint dict (with per-slot dT/dD
    instead of per-piece trig adjoints), and the direct drotT term."""
    _S6, _ST2, _R6, _R2, BRD6, BRD2 = _slot_sel_matrices()
    us = _slot_views(u, meta)
    lcs, SIN, COS, T = st["lc"], st["SIN"], st["COS"], st["T"]
    hd = _transpose_head(st, ch, rotT, t8)
    ca, cb, cc, cd = hd["ca"], hd["cb"], hd["cc"], hd["cd"]
    cb6 = jnp.dot(cb, BRD6, preferred_element_type=jnp.float32)
    hca6 = jnp.dot(st["h"] * ca, BRD6, preferred_element_type=jnp.float32)
    cd2 = jnp.dot(cd, BRD2, preferred_element_type=jnp.float32)
    hc2 = jnp.dot(st["h3"] * cc, BRD2, preferred_element_type=jnp.float32)
    cUs, dTs, dDs = [], [], []
    for k in range(meta.n_slots):
        cT, cD = (cb6, hca6) if k < meta.v_slots else (cd2, hc2)
        D = _slot_D(lcs[k], SIN[k], COS[k])
        cUs.append(T[k] * cT + D * cD)
        dTs.append(us[k] * cT)
        dDs.append(us[k] * cD)
    du = jnp.concatenate(cUs, axis=-1)
    adj = dict(dq=hd["dq"], dv=hd["dv"], dsc=hd["dsc"], dw3=hd["dw3"],
               dh=ch["phi_v"] * ca, dh3=ch["phi_r"] * cc, dT=dTs, dD=dDs)
    return du, adj, hd["drotT"]


def _emb_fwd_transpose_block_slots(st, de, adj, cut, meta: FineMeta):
    """Slot-layout transpose of the embedding forward, merged with the
    R-transpose slot adjoints (adj['dT']/adj['dD']).  de is the SLOT-
    layout e cotangent."""
    _S6, _ST2, RED6, RED2, _B6, _B2 = _slot_sel_matrices()
    des = _slot_views(de, meta)
    lcs, SIN, COS, T = st["lc"], st["SIN"], st["COS"], st["T"]
    dv_p = dh_p = drr_p = dh3_p = 0.0
    for k in range(meta.n_slots):
        isv = k < meta.v_slots
        gate = st["h"] if isv else st["h3"]
        dT = adj["dT"][k] + gate * des[k]
        contrib = (dT * _slot_D(lcs[k], SIN[k], COS[k])
                   + adj["dD"][k] * _slot_D2(lcs[k], SIN[k], COS[k]))
        gate_adj = T[k] * des[k]
        if isv:
            dv_p = dv_p + contrib
            dh_p = dh_p + gate_adj
        else:
            drr_p = drr_p + contrib
            dh3_p = dh3_p + gate_adj
    dv = adj["dv"] + jnp.dot(dv_p, RED6, preferred_element_type=jnp.float32)
    dh = adj["dh"] + jnp.dot(dh_p, RED6, preferred_element_type=jnp.float32)
    drr = jnp.dot(drr_p, RED2, preferred_element_type=jnp.float32)
    dh3 = adj["dh3"] + jnp.dot(dh3_p, RED2,
                               preferred_element_type=jnp.float32)
    return _fwdT_tail(st, adj, dv, dh, dh3, drr)


# ---------------------------------------------------------------------------
# Color-net block bodies (relu MLP + sigmoid; kernel input layout)
# ---------------------------------------------------------------------------

def _gpe_block(meta: FineMeta, g8):
    """Kernel-layout grad(+PE) section: (B, 8*(1+2L)) = [g | sin_l | cos_l]
    per 8-lane block (junk channels map to zero weight rows)."""
    pieces = [g8]
    sins, coss = [], []
    for l in range(meta.grad_L):
        f = 2.0 ** l
        sins.append(jnp.sin(g8 * f))
        coss.append(jnp.cos(g8 * f))
    return jnp.concatenate(pieces + sins + coss, axis=-1)


def _gpe_transpose(meta: FineMeta, g8, dgpe):
    """Transpose of _gpe_block: cotangent on the (B, 8*(1+2L)) section
    -> cotangent on g8."""
    L = meta.grad_L
    dg = dgpe[:, :8]
    for l in range(L):
        f = 2.0 ** l
        ds = dgpe[:, (1 + l) * 8:(2 + l) * 8]
        dc = dgpe[:, (1 + L + l) * 8:(2 + L + l) * 8]
        dg = dg + f * (jnp.cos(g8 * f) * ds - jnp.sin(g8 * f) * dc)
    return dg


def _gpe_lane_consts(meta: FineMeta):
    """(1, 128) lane constants for the slot-mode grad-PE section:
    16 groups of 8 lanes, [g | sin_l x L | cos_l x L | pad]; only
    channels 0-2 of each group are live."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    grp = lane // 8
    ch = lane % 8
    L = meta.grad_L
    valid = (ch < 3) & (grp < 1 + 2 * L)
    idm = (valid & (grp == 0)).astype(jnp.float32)
    sm = (valid & (grp >= 1) & (grp <= L)).astype(jnp.float32)
    cm = (valid & (grp > L)).astype(jnp.float32)
    ell = jnp.where(grp <= L, grp - 1, grp - 1 - L)
    F = jnp.exp2(jnp.clip(ell, 0, None).astype(jnp.float32)) * (sm + cm)
    return dict(idm=idm, sm=sm, cm=cm, F=F)


def _gpe_rep_matrices(dtype=jnp.float32):
    """REP16 (8, 128): replicate the 8 g lanes into 16 groups;
    RED16 (128, 8): sum the groups back (iota-built)."""
    i8 = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 0)
    j8 = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 1)
    REP16 = (j8 % 8 == i8).astype(dtype)
    ii = jax.lax.broadcasted_iota(jnp.int32, (_LANE, 8), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (_LANE, 8), 1)
    RED16 = (ii % 8 == jj).astype(dtype)
    return REP16, RED16


def _gpe_block_slot(meta: FineMeta, g8):
    """Slot-mode grad(+PE): ONE aligned (B, 128) register, two
    transcendentals (vs 1+2L sub-width blocks and their concat)."""
    REP16, _ = _gpe_rep_matrices()
    lc = _gpe_lane_consts(meta)
    g_rep = jnp.dot(g8, REP16, preferred_element_type=jnp.float32)
    return (lc["idm"] * g_rep + lc["sm"] * jnp.sin(g_rep * lc["F"])
            + lc["cm"] * jnp.cos(g_rep * lc["F"]))


def _gpe_transpose_slot(meta: FineMeta, g8, dgpe):
    """Transpose of _gpe_block_slot: (B, 128) cotangent -> (B, 8)."""
    REP16, RED16 = _gpe_rep_matrices()
    lc = _gpe_lane_consts(meta)
    g_rep = jnp.dot(g8, REP16, preferred_element_type=jnp.float32)
    D = lc["idm"] + lc["F"] * (lc["sm"] * jnp.cos(g_rep * lc["F"])
                               - lc["cm"] * jnp.sin(g_rep * lc["F"]))
    return jnp.dot(dgpe * D, RED16, preferred_element_type=jnp.float32)


def _color_fwd_block(meta: FineMeta, x, cws, cbs, with_residuals=False):
    """Color MLP forward on the kernel-layout input x (B, CXp).
    Returns color (B, out_pad; 3 real) [, (zs for the relu masks)]."""
    tm = meta.trunk_meta
    n = meta.c_layers
    a = x.astype(FT._cast(tm))
    zs = []
    acts = [a]
    for l in range(n):
        z = FT._mm(tm, a, cws[l]) + cbs[l][0, :]
        zs.append(z)
        if l < n - 1:
            a = jnp.maximum(z, 0.0).astype(FT._cast(tm))
            acts.append(a)
    color = jax.nn.sigmoid(zs[-1])
    return (color, zs, acts) if with_residuals else color


def _color_bwd_block(meta: FineMeta, x, cws, cbs, dcolor, res=None,
                     want_dw: bool = True, res_stash=None):
    """Transpose of the color MLP at cotangent dcolor.
    Returns (dx, dcws, dcbs); want_dw=False skips the weight grads
    (frozen nets) and returns (dx, None, None).

    res_stash=(sig8, acts) is the streamed-residual form (stash mode):
    sig8 (B, 8) holds the forward's sigmoid output (real lanes; the
    junk-lane values are irrelevant because dcolor is zero there) and
    the relu masks are derived from the stashed activations
    (acts[l] > 0 == z > 0; for bf16 activations this differs only on
    the measure-zero band of positive f32 z below the smallest positive
    bf16, ~1e-40)."""
    tm = meta.trunk_meta
    n = meta.c_layers
    if res_stash is not None:
        sig8, acts = res_stash
        zs = None
        sig = jnp.pad(sig8, ((0, 0), (0, dcolor.shape[1] - sig8.shape[1])))
    else:
        if res is None:
            _, zs, acts = _color_fwd_block(meta, x, cws, cbs,
                                           with_residuals=True)
        else:
            zs, acts = res
        sig = jax.nn.sigmoid(zs[-1])
    dz = sig * (1.0 - sig) * dcolor
    dcws = [None] * n
    dcbs = [None] * n
    for l in range(n - 1, -1, -1):
        if want_dw:
            dcws[l] = FT._mm_tn(tm, acts[l], dz)
            dcbs[l] = jnp.sum(dz, axis=0, keepdims=True)
        da = FT._mm_t(tm, dz, cws[l])
        if l > 0:
            mask = (acts[l] > 0.0) if zs is None else (zs[l - 1] > 0.0)
            dz = jnp.where(mask, da, 0.0)
        else:
            dx = da
    if not want_dw:
        return dx, None, None
    return dx, dcws, dcbs


# ---------------------------------------------------------------------------
# Integrated block bodies (shared by kernels and CPU tests)
# ---------------------------------------------------------------------------

def _fine_fwd_block(meta: FineMeta, p8, rotT, off, cut, ws, bs,
                    cws=(), cbs=(), with_residuals: bool = False):
    """One block of the fully-fused forward.

    Without color: returns (out (B, OUTp) f32, g8 (B, 8) f32, e (B, Ep)).
    With color (meta.with_color): returns (out, g8, color (B, out_pad)).
    with_residuals additionally returns the intermediates the backward
    reuses."""
    tm = meta.trunk_meta
    E = meta.emb_width
    if meta.layout == "slot":
        assert meta.with_color, "slot layout never exposes e"
        st = _emb_fwd_block_slots(p8, rotT, off, cut, meta)
        e_pad = st["e"].astype(FT._cast(tm))  # already lane-aligned
        out, u, ss, ins, ts, cs, acts = FT._kernel_fwd_body(
            tm, e_pad, list(ws), list(bs))
        u_pad = u
        g8, chain = _emb_rev_block_slots(st, rotT, u, meta)
    else:
        Ep = _round_up(E, _LANE)
        st = _emb_fwd_block(p8, rotT, off, cut, meta)
        e_pad = jnp.pad(st["e"], ((0, 0), (0, Ep - E))).astype(FT._cast(tm))
        out, u_pad, ss, ins, ts, cs, acts = FT._kernel_fwd_body(
            tm, e_pad, list(ws), list(bs))
        u = u_pad[:, :E]
        g8, chain = _emb_rev_block(st, rotT, u, meta)
    if not meta.with_color:
        if with_residuals:
            return out, g8, e_pad, (st, u, chain, (ss, ins, ts, cs))
        return out, g8, e_pad
    # color net on [e | feat | grad(+PE)] in kernel layout
    feat = out[:, 1:meta.d_out]
    gpe = (_gpe_block_slot(meta, g8) if meta.layout == "slot"
           else _gpe_block(meta, g8))
    x = jnp.concatenate(
        [st["e"], feat.astype(st["e"].dtype), gpe], axis=-1,
    )
    CXp = _round_up(meta.color_in_kernel, _LANE)
    x = jnp.pad(x, ((0, 0), (0, CXp - x.shape[1])))
    color_res = _color_fwd_block(meta, x, list(cws), list(cbs),
                                 with_residuals=True)
    color = color_res[0]
    if with_residuals:
        return out, g8, color, (st, u, chain, (ss, ins, ts, cs), x,
                                color_res[1:], (acts, u_pad, color))
    return out, g8, color


def _build_stash(meta: FineMeta, res):
    """Pack the forward residuals of one block into the stash arrays
    (meta.stash_specs order).  Values are EXACTLY the in-kernel
    intermediates: 'cast'-dtype arrays are already that dtype in the
    forward; f32 arrays are stored untouched."""
    tm = meta.trunk_meta
    cast = FT._cast(tm)
    out, _g8, _color, (st, _u, _chain, (ss, _ins, _ts, cs), _x,
                       _cres, (acts, u_pad, color)) = res
    Ekp = _round_up(meta.e_kernel_width, _LANE)
    if u_pad.shape[1] != Ekp:
        u_pad = jnp.pad(u_pad, ((0, 0), (0, Ekp - u_pad.shape[1])))
    _zs, cacts = _cres
    vals = {
        "ins": lambda: jnp.concatenate(
            [a.astype(cast) for a in acts], axis=-1),
        "ss": lambda: jnp.concatenate(ss, axis=-1),
        "cs": lambda: jnp.concatenate(cs[1:], axis=-1),
        "u": lambda: u_pad,
        "feat": lambda: out[:, 1:meta.d_out].astype(cast),
        "cacts": lambda: jnp.concatenate(
            [a.astype(cast) for a in cacts[1:]], axis=-1),
        "sig": lambda: color[:, :8].astype(jnp.float32),
    }
    return tuple(vals[name]() for name, _w, _d in meta.stash_specs())


def _unpack_stash(meta: FineMeta, stash):
    """Inverse of _build_stash for one block: returns a dict of the
    reconstructed per-layer lists the backward statements consume."""
    Hp = _round_up(meta.d_hidden, _LANE)
    cHp = _round_up(meta.c_hidden, _LANE)
    n = meta.n_layers
    named = {name: arr for (name, _w, _d), arr
             in zip(meta.stash_specs(), stash)}
    out = {}
    out["ss"] = [named["ss"][:, l * Hp:(l + 1) * Hp] for l in range(n - 1)]
    cs = [None] + [named["cs"][:, l * Hp:(l + 1) * Hp]
                   for l in range(n - 1)]
    out["cs"] = cs
    out["u_pad"] = named["u"]
    out["cacts"] = [named["cacts"][:, l * cHp:(l + 1) * cHp]
                    for l in range(meta.c_layers - 1)]
    out["sig"] = named["sig"]
    if meta.want_dw:
        out["acts"] = [named["ins"][:, l * Hp:(l + 1) * Hp]
                       for l in range(n - 1)]
        out["feat"] = named["feat"]
    return out


def _fine_bwd_block(meta: FineMeta, p8, rotT, off, cut, ws, bs,
                    dout, dg8, dthird, cws=(), cbs=(), stash=None):
    """One block of the fully-fused backward.

    Cotangents: dout on out (B, OUTp; with_color: only col 0 = sdf is
    externally visible), dg8 on g (B, 8; 3 real), dthird = de_ext
    (no-color: on the e output, (B, Ep)) or dcolor (with_color,
    (B, out_pad)).
    Returns (dp8, dws, dbs, drotT_blk, doff_blk[, dcws, dcbs]);
    with meta.want_dw=False the dws/dbs/dcws/dcbs slots are None.

    stash (meta.stash): the forward's streamed residual arrays for this
    block (meta.stash_specs order).  The trunk forward, u-chain and
    color forward are NOT recomputed — their intermediates come from
    the stash; only the embedding stages (VPU-only) and the reverse
    chain (needs only st + the stashed u) are rebuilt in-block.
    Numerics are bit-exact vs the recompute path (see FineMeta.stash)."""
    tm = meta.trunk_meta
    E = meta.emb_width
    Ek = meta.e_kernel_width
    slot = meta.layout == "slot"
    if stash is not None:
        assert meta.with_color, "stash requires with_color"
        sv = _unpack_stash(meta, stash)
        H = meta.d_hidden
        n = meta.n_layers
        # embedding stages + reverse chain: VPU-only recompute
        if slot:
            st = _emb_fwd_block_slots(p8, rotT, off, cut, meta)
            u = sv["u_pad"][:, :Ek]
            g8, chain = _emb_rev_block_slots(st, rotT, u, meta)
        else:
            st = _emb_fwd_block(p8, rotT, off, cut, meta)
            u = sv["u_pad"][:, :E]
            g8, chain = _emb_rev_block(st, rotT, u, meta)
        e_cast = st["e"].astype(FT._cast(tm))
        Ekp = _round_up(Ek, _LANE)
        e_pad_c = (e_cast if e_cast.shape[1] == Ekp else
                   jnp.pad(e_cast, ((0, 0), (0, Ekp - e_cast.shape[1]))))
        # trunk residuals from the stash (ts[l-1] = cs[l] * ss[l-1] is
        # exactly the forward's own statement; ts[n-1] is the onehot)
        ss = sv["ss"]
        cs = sv["cs"]
        ts = [cs[l] * ss[l - 1] for l in range(1, n)]
        OUTp = _round_up(meta.d_out, _LANE)
        t_last = (jax.lax.broadcasted_iota(
            jnp.int32, (p8.shape[0], OUTp), 1) == 0).astype(jnp.float32)
        ts = ts + [t_last]
        if meta.want_dw:
            acts = sv["acts"]
            ins = [None] * n
            ins[0] = e_pad_c
            for l in range(1, n):
                if l == meta.skip:
                    ins[l] = jnp.concatenate(
                        [acts[l - 1], e_pad_c], axis=-1) * INV_SQRT2
                else:
                    ins[l] = acts[l - 1]
            # color input x (dW operand): e | feat | grad(+PE)
            feat = sv["feat"]
            gpe = (_gpe_block_slot(meta, g8) if slot
                   else _gpe_block(meta, g8))
            x = jnp.concatenate(
                [st["e"], feat.astype(st["e"].dtype), gpe], axis=-1)
            CXp = _round_up(meta.color_in_kernel, _LANE)
            x = jnp.pad(x, ((0, 0), (0, CXp - x.shape[1])))
            c_acts = [x.astype(FT._cast(tm))] + sv["cacts"]
        else:
            ins = [None] * n
            x = None
            c_acts = [None] + sv["cacts"]
        trunk_fwd = (ss, ins, ts, cs)
        dx, dcws, dcbs = _color_bwd_block(
            meta, x, list(cws), list(cbs), dthird,
            want_dw=meta.want_dw, res_stash=(sv["sig"], c_acts))
        F = meta.d_out - 1
        de_ext = dx[:, :Ek]
        dfeat = dx[:, Ek:Ek + F]
        dgpe = dx[:, Ek + F:Ek + F + meta.gpe_width]
        dg8 = dg8 + (_gpe_transpose_slot(meta, g8, dgpe) if slot
                     else _gpe_transpose(meta, g8, dgpe))
        out_pad = dout.shape[1]
        dout = dout + jnp.pad(dfeat, ((0, 0), (1, out_pad - 1 - F)))
        # 1. transpose of the reverse chain at cotangent dg
        if slot:
            du, adj, drotT_direct = _emb_rev_transpose_block_slots(
                st, chain, rotT, u, dg8, meta)
            e_pad = e_cast
            du_pad = du
        else:
            du, adj, drotT_direct = _emb_rev_transpose_block(
                st, chain, rotT, u, dg8, meta)
            Ep = _round_up(E, _LANE)
            e_pad = (e_cast if e_cast.shape[1] == Ep else
                     jnp.pad(e_cast, ((0, 0), (0, Ep - e_cast.shape[1]))))
            du_pad = jnp.pad(du, ((0, 0), (0, Ep - du.shape[1])))
        # 2. trunk backward with cotangents (dout, du)
        de_trunk, dws, dbs = FT._trunk_bwd_block(
            tm, e_pad, dout, du_pad, list(ws), list(bs), fwd=trunk_fwd,
            want_dw=meta.want_dw)
        # 3. embedding-forward transpose
        if slot:
            de_total = de_trunk + de_ext.astype(jnp.float32)
            dq = _emb_fwd_transpose_block_slots(st, de_total, adj, cut,
                                                meta)
        else:
            de_total = de_trunk[:, :E] + de_ext.astype(jnp.float32)
            dq = _emb_fwd_transpose_block(st, de_total, adj, cut, meta)
        # 4. pose / point adjoints
        dp8 = jnp.dot(dq, rotT.T, preferred_element_type=jnp.float32)
        drotT_blk = drotT_direct + jnp.dot(
            p8.T, dq, preferred_element_type=jnp.float32)
        doff_blk = jnp.sum(dq, axis=0, keepdims=True)
        return dp8, dws, dbs, drotT_blk, doff_blk, dcws, dcbs
    res = _fine_fwd_block(meta, p8, rotT, off, cut, ws, bs, cws, cbs,
                          with_residuals=True)
    if meta.with_color:
        out, g8, _color, (st, u, chain, trunk_fwd, x, cres, _sx) = res
        # 0. color transpose -> de/dfeat/dg contributions
        dx, dcws, dcbs = _color_bwd_block(meta, x, list(cws), list(cbs),
                                          dthird, res=cres,
                                          want_dw=meta.want_dw)
        F = meta.d_out - 1
        de_ext = dx[:, :Ek]
        dfeat = dx[:, Ek:Ek + F]
        dgpe = dx[:, Ek + F:Ek + F + meta.gpe_width]
        dg8 = dg8 + (_gpe_transpose_slot(meta, g8, dgpe) if slot
                     else _gpe_transpose(meta, g8, dgpe))
        out_pad = dout.shape[1]
        dout = dout + jnp.pad(dfeat, ((0, 0), (1, out_pad - 1 - F)))
    else:
        out, g8, e_pad_out, (st, u, chain, trunk_fwd) = res
        de_ext = dthird[:, :E]
    # 1. transpose of the reverse chain at cotangent dg
    if slot:
        du, adj, drotT_direct = _emb_rev_transpose_block_slots(
            st, chain, rotT, u, dg8, meta)
        e_pad = st["e"].astype(FT._cast(tm))
        du_pad = du
    else:
        du, adj, drotT_direct = _emb_rev_transpose_block(
            st, chain, rotT, u, dg8, meta)
        Ep = _round_up(E, _LANE)
        e_pad = jnp.pad(st["e"], ((0, 0), (0, Ep - E))).astype(FT._cast(tm))
        du_pad = jnp.pad(du, ((0, 0), (0, Ep - E)))
    # 2. trunk backward with cotangents (dout, du)
    de_trunk, dws, dbs = FT._trunk_bwd_block(
        tm, e_pad, dout, du_pad, list(ws), list(bs), fwd=trunk_fwd,
        want_dw=meta.want_dw)
    # 3. embedding-forward transpose: trunk de + external de + R adjoints
    if slot:
        de_total = de_trunk + de_ext.astype(jnp.float32)
        dq = _emb_fwd_transpose_block_slots(st, de_total, adj, cut, meta)
    else:
        de_total = de_trunk[:, :E] + de_ext.astype(jnp.float32)
        dq = _emb_fwd_transpose_block(st, de_total, adj, cut, meta)
    # 4. pose / point adjoints
    dp8 = jnp.dot(dq, rotT.T, preferred_element_type=jnp.float32)
    drotT_blk = drotT_direct + jnp.dot(
        p8.T, dq, preferred_element_type=jnp.float32)
    doff_blk = jnp.sum(dq, axis=0, keepdims=True)
    if meta.with_color:
        return dp8, dws, dbs, drotT_blk, doff_blk, dcws, dcbs
    return dp8, dws, dbs, drotT_blk, doff_blk


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _make_fwd_kernel(meta: FineMeta, stash: bool = False):
    n = meta.n_layers
    cn = meta.c_layers if meta.with_color else 0
    assert not stash or meta.with_color

    def kernel(p_ref, rotT_ref, off_ref, cut_ref, *refs):
        ws = [r[:] for r in refs[:n]]
        bs = [r[:] for r in refs[n:2 * n]]
        cws = [r[:] for r in refs[2 * n:2 * n + cn]]
        cbs = [r[:] for r in refs[2 * n + cn:2 * n + 2 * cn]]
        if meta.with_color:
            # ONE packed (B, 8) output [sdf | g xyz | color rgb | 0]:
            # three lane-padded (N, 128) outputs cost ~2 ms/step of
            # XLA relayout slices downstream (profiled)
            packed_ref = refs[2 * n + 2 * cn]
            stash_refs = refs[2 * n + 2 * cn + 1:] if stash else ()
        else:
            out_ref = refs[2 * n + 2 * cn]
            g_ref = refs[2 * n + 2 * cn + 1]
            third_ref = refs[2 * n + 2 * cn + 2]
        B = p_ref.shape[0]
        sub = B // meta.n_split
        for i in range(meta.n_split):
            rows = slice(i * sub, (i + 1) * sub)
            if stash:
                res = _fine_fwd_block(
                    meta, p_ref[rows, :], rotT_ref[:], off_ref[:],
                    cut_ref[:], ws, bs, cws, cbs, with_residuals=True)
                out, g8, third = res[0], res[1], res[2]
                for ref, arr in zip(stash_refs, _build_stash(meta, res)):
                    ref[rows, :] = arr.astype(ref.dtype)
            else:
                out, g8, third = _fine_fwd_block(
                    meta, p_ref[rows, :], rotT_ref[:], off_ref[:],
                    cut_ref[:], ws, bs, cws, cbs)
            if meta.with_color:
                packed_ref[rows, :] = jnp.concatenate(
                    [out[:, :1], g8[:, :3], third[:, :3],
                     jnp.zeros((out.shape[0], 1), jnp.float32)], axis=-1)
            else:
                out_ref[rows, :] = out
                third_ref[rows, :] = third.astype(third_ref.dtype)  # e
                g_ref[rows, :] = jnp.pad(
                    g8, ((0, 0), (0, _LANE - g8.shape[1])))

    return kernel


def _stash_dtype(meta: FineMeta, d: str):
    return (jnp.float32 if d == "f32" else FT._cast(meta.trunk_meta))


#: Ablation hook (scripts/bench_fine_ablate2.py): "add" is production;
#: "assign" overwrites the dW/db output refs every grid step instead of
#: accumulating (numerics garbage, isolates the read half of the VMEM
#: read-modify-write).  Trace-time only — rebuild the kernel to change.
_DW_ACCUM = "add"

#: Where the cross-grid-step dW/db accumulators live: "out" accumulates
#: directly in the (constant-index-map) output refs; "scratch"
#: accumulates in VMEM scratch and copies to the output refs once, at
#: the last grid step (numerics-identical — same adds in the same
#: order).  The round-5 ablation measured the accumulator stores as the
#: entire 4.4 ms dW cost with reads and matmuls free; "scratch" tests
#: (and, if it wins, fixes) per-step output-ref writeback as the cause.
#: Trace-time only.
_DW_PLACE = "out"

#: Mosaic scoped-VMEM cap for the fwd/bwd pallas_calls (bytes).  The
#: round-4 default of 64M clears block=128 (which needs >23M); the
#: block-size ablation (scripts/bench_fine_ablate3.py) varies this to
#: test whether the block-256 dW anomaly is a VMEM ceiling.
_VMEM_LIMIT = 64 * 1024 * 1024

#: Staged low-precision dW accumulation period (bf16 trunks only;
#: 0 = off).  When S > 0, the per-grid-step dW partials accumulate in
#: bf16 VMEM scratch for S steps and flush into the f32 output refs
#: every S-th step — the f32 accumulator traffic (measured as the
#: entire 4.4 ms dW cost, see BENCH_NOTES round-5 dW decomposition)
#: drops to bf16 stores + 1/S of the f32 RMW.  Numerics: each flushed
#: stage partial carries ~S*2^-9 relative rounding on top of the
#: existing bf16-matmul noise in its inputs; across ~N/(block*S)
#: independent stages the total dW error stays ~0.5% at S=16 —
#: gate-checked end-to-end (pose-fit quality gates + train-loss
#: trajectory) before any default flip.  Trace-time only;
#: HONERF_DW_STAGE sets the process default (A/B gates + e2e bench).
_DW_STAGE = int(os.environ.get("HONERF_DW_STAGE", "0"))


def _dw_store(ref, val, first):
    """Write one dW/db accumulator ref for this grid step (_DW_ACCUM)."""
    if _DW_ACCUM == "assign":
        ref[:] = val
        return

    @pl.when(first)
    def _():
        ref[:] = val

    @pl.when(jnp.logical_not(first))
    def _():
        ref[:] += val


def _dw_store_staged(acc_ref, out_ref, val, i, S):
    """Staged accumulate (_DW_STAGE): bf16 scratch for S grid steps,
    f32 flush into the output ref at each stage end / the last step."""
    nprog = pl.num_programs(0)
    sfirst = (i % S) == 0
    flush = jnp.logical_or((i % S) == S - 1, i == nprog - 1)
    v16 = val.astype(acc_ref.dtype)

    @pl.when(sfirst)
    def _():
        acc_ref[:] = v16

    @pl.when(jnp.logical_not(sfirst))
    def _():
        acc_ref[:] += v16

    @pl.when(jnp.logical_and(flush, i < S))
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.float32)

    @pl.when(jnp.logical_and(flush, i >= S))
    def _():
        out_ref[:] += acc_ref[:].astype(jnp.float32)


def _make_bwd_kernel(meta: FineMeta):
    n = meta.n_layers
    cn = meta.c_layers if meta.with_color else 0
    want_dw = meta.want_dw
    staged = (want_dw and _DW_STAGE > 0 and meta.dtype == "bf16")
    scratch_acc = want_dw and not staged and _DW_PLACE == "scratch"
    n_stash = len(meta.stash_specs()) if meta.stash else 0

    def body(p_ref, dout_ref, dg_ref, dthird_ref, rotT_ref, off_ref,
             cut_ref, *refs):
        ws = [r[:] for r in refs[:n]]
        bs = [r[:] for r in refs[n:2 * n]]
        cws = [r[:] for r in refs[2 * n:2 * n + cn]]
        cbs = [r[:] for r in refs[2 * n + cn:2 * n + 2 * cn]]
        stash_refs = refs[2 * n + 2 * cn:2 * n + 2 * cn + n_stash]
        o = 2 * n + 2 * cn + n_stash
        dp_ref = refs[o]
        if want_dw:
            out_dw_refs = refs[o + 1:o + 1 + n]
            out_db_refs = refs[o + 1 + n:o + 1 + 2 * n]
            drotT_ref = refs[o + 1 + 2 * n]
            doff_ref = refs[o + 2 + 2 * n]
            out_dcw_refs = refs[o + 3 + 2 * n:o + 3 + 2 * n + cn]
            out_dcb_refs = refs[o + 3 + 2 * n + cn:o + 3 + 2 * n + 2 * cn]
            if scratch_acc or staged:
                s = o + 3 + 2 * n + 2 * cn  # scratch refs follow outputs
                dw_refs = refs[s:s + n]
                db_refs = refs[s + n:s + 2 * n]
                dcw_refs = refs[s + 2 * n:s + 2 * n + cn]
                dcb_refs = refs[s + 2 * n + cn:s + 2 * n + 2 * cn]
            else:
                dw_refs, db_refs = out_dw_refs, out_db_refs
                dcw_refs, dcb_refs = out_dcw_refs, out_dcb_refs
        else:
            drotT_ref = refs[o + 1]
            doff_ref = refs[o + 2]
        first = pl.program_id(0) == 0

        B = p_ref.shape[0]
        sub = B // meta.n_split
        dws = dbs = dcws = dcbs = None
        drotT_blk = doff_blk = None
        OUTp = _round_up(meta.d_out, _LANE)
        for i in range(meta.n_split):
            rows = slice(i * sub, (i + 1) * sub)
            if meta.with_color:
                # unpack the (B, 8) [dsdf | dg | dcolor | 0] cotangent
                dpack = dout_ref[rows, :]
                dout_v = jnp.pad(dpack[:, :1], ((0, 0), (0, OUTp - 1)))
                dg_v = jnp.pad(dpack[:, 1:4], ((0, 0), (0, 5)))
                dthird_v = jnp.pad(dpack[:, 4:7],
                                   ((0, 0), (0, _LANE - 3)))
            else:
                dout_v = dout_ref[rows, :]
                dg_v = dg_ref[rows, :8]
                dthird_v = dthird_ref[rows, :]
            stash_v = (tuple(r[rows, :] for r in stash_refs)
                       if n_stash else None)
            res = _fine_bwd_block(
                meta, p_ref[rows, :], rotT_ref[:], off_ref[:],
                cut_ref[:], ws, bs, dout_v, dg_v, dthird_v, cws, cbs,
                stash=stash_v)
            if meta.with_color:
                dp8, dws_i, dbs_i, drotT_i, doff_i, dcws_i, dcbs_i = res
            else:
                dp8, dws_i, dbs_i, drotT_i, doff_i = res
                dcws_i, dcbs_i = [], []
            dp_ref[rows, :] = dp8
            if i == 0:
                dws, dbs, dcws, dcbs = dws_i, dbs_i, dcws_i, dcbs_i
                drotT_blk, doff_blk = drotT_i, doff_i
            else:
                drotT_blk = drotT_blk + drotT_i
                doff_blk = doff_blk + doff_i
                if want_dw:
                    dws = [a + b for a, b in zip(dws, dws_i)]
                    dbs = [a + b for a, b in zip(dbs, dbs_i)]
                    dcws = [a + b for a, b in zip(dcws, dcws_i)]
                    dcbs = [a + b for a, b in zip(dcbs, dcbs_i)]

        @pl.when(first)
        def _():
            drotT_ref[:] = drotT_blk
            doff_ref[:] = doff_blk

        @pl.when(jnp.logical_not(first))
        def _():
            drotT_ref[:] += drotT_blk
            doff_ref[:] += doff_blk

        if not want_dw:
            return

        if staged:
            i = pl.program_id(0)
            for l in range(n):
                _dw_store_staged(dw_refs[l], out_dw_refs[l], dws[l],
                                 i, _DW_STAGE)
                _dw_store_staged(db_refs[l], out_db_refs[l], dbs[l],
                                 i, _DW_STAGE)
            for l in range(cn):
                _dw_store_staged(dcw_refs[l], out_dcw_refs[l], dcws[l],
                                 i, _DW_STAGE)
                _dw_store_staged(dcb_refs[l], out_dcb_refs[l], dcbs[l],
                                 i, _DW_STAGE)
            return

        for l in range(n):
            _dw_store(dw_refs[l], dws[l], first)
            _dw_store(db_refs[l], dbs[l], first)

        for l in range(cn):
            _dw_store(dcw_refs[l], dcws[l], first)
            _dw_store(dcb_refs[l], dcbs[l], first)

        if scratch_acc:
            last = pl.program_id(0) == pl.num_programs(0) - 1

            @pl.when(last)
            def _():
                for src, dst in (list(zip(dw_refs, out_dw_refs))
                                 + list(zip(db_refs, out_db_refs))
                                 + list(zip(dcw_refs, out_dcw_refs))
                                 + list(zip(dcb_refs, out_dcb_refs))):
                    dst[:] = src[:]

    if meta.with_color:
        def kernel(p_ref, dpack_ref, rotT_ref, off_ref, cut_ref, *refs):
            body(p_ref, dpack_ref, None, None, rotT_ref, off_ref,
                 cut_ref, *refs)
    else:
        def kernel(p_ref, dout_ref, dg_ref, dthird_ref, rotT_ref,
                   off_ref, cut_ref, *refs):
            body(p_ref, dout_ref, dg_ref, dthird_ref, rotT_ref, off_ref,
                 cut_ref, *refs)

    return kernel


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# ---------------------------------------------------------------------------

def _const(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _rows(block, width):
    return pl.BlockSpec((block, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _slot_gather_rows(w, cm_idx):
    """Gather w's rows by the slot channel map (-1 -> a zero row)."""
    w_ext = jnp.concatenate([w, jnp.zeros((1, w.shape[1]), w.dtype)],
                            axis=0)
    idx = jnp.asarray(np.where(cm_idx < 0, w.shape[0], cm_idx))
    return w_ext[idx]


def _slot_inverse_pos(meta: FineMeta) -> np.ndarray:
    """pos[channel-major c] = its slot-layout row (host-side; the dW
    un-permutation in _bwd_padded)."""
    cmap = slot_channel_map(meta)
    pos = np.zeros(meta.emb_width, np.int64)
    pos[cmap[cmap >= 0]] = np.nonzero(cmap >= 0)[0]
    return pos


def _pad_weights_slots(ws, bs, meta: FineMeta):
    """Slot-layout trunk weight padding: layer 0's rows (and the skip
    layer's e rows) are PERMUTED into the slot channel order with zero
    rows at slot pads; other layers pad exactly like FT._pad_weights."""
    tm = meta.trunk_meta
    H = meta.d_hidden
    Hp = _round_up(H, _LANE)
    cmap = slot_channel_map(meta)
    wps, bps = [], []
    for l, ((d_in, d_out), w, b) in enumerate(zip(FT._dims(tm), ws, bs)):
        op = _round_up(d_out, _LANE)
        if l == 0:
            wp = jnp.pad(_slot_gather_rows(w, cmap),
                         ((0, 0), (0, op - d_out)))
        elif l == meta.skip:
            wp = jnp.zeros((Hp + meta.e_kernel_width, op), w.dtype)
            wp = wp.at[:H, :d_out].set(w[:H])
            wp = wp.at[Hp:, :d_out].set(_slot_gather_rows(w[H:], cmap))
        else:
            ip = _round_up(d_in, _LANE)
            wp = jnp.pad(w, ((0, ip - d_in), (0, op - d_out)))
        wps.append(wp.astype(FT._cast(tm)))
        bps.append(jnp.pad(b, (0, op - d_out)).astype(jnp.float32)[None, :])
    return tuple(wps), tuple(bps)


def _pad_color_weights(cws, cbs, meta: FineMeta):
    """Zero-pad color weights to lane multiples (kernel row layout)."""
    tm = meta.trunk_meta
    wps, bps = [], []
    for (d_in, d_out), w, b in zip(meta.color_dims, cws, cbs):
        ip, op = _round_up(d_in, _LANE), _round_up(d_out, _LANE)
        wps.append(jnp.pad(w, ((0, ip - d_in), (0, op - d_out))
                           ).astype(FT._cast(tm)))
        bps.append(jnp.pad(b, (0, op - d_out)).astype(jnp.float32)[None, :])
    return tuple(wps), tuple(bps)


@functools.partial(jax.jit, static_argnames=("meta", "block", "interpret",
                                             "stash"))
def _fwd_call(p8, rotT, off, cut, wps, bps, cwps, cbps, meta: FineMeta,
              block, interpret, stash=False):
    N = p8.shape[0]
    Ep = _round_up(meta.emb_width, _LANE)
    op = _round_up(meta.d_out, _LANE)
    e_dtype = jnp.bfloat16 if meta.dtype == "bf16" else jnp.float32
    flops = 4 * N * sum(w.shape[0] * w.shape[1]
                        for w in list(wps) + list(cwps))
    stash_bytes = 0
    if meta.with_color:
        # ONE packed (N, 8) output [sdf | g | color | 0]
        out_shape = [jax.ShapeDtypeStruct((N, 8), jnp.float32)]
        out_specs = [_rows(block, 8)]
        if stash:
            for _name, w, d in meta.stash_specs():
                dt = _stash_dtype(meta, d)
                out_shape.append(jax.ShapeDtypeStruct((N, w), dt))
                out_specs.append(_rows(block, w))
                stash_bytes += N * w * np.dtype(dt).itemsize
        out_shape, out_specs = tuple(out_shape), tuple(out_specs)
    else:
        assert not stash
        out_shape = (
            jax.ShapeDtypeStruct((N, op), jnp.float32),
            jax.ShapeDtypeStruct((N, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((N, Ep), e_dtype),
        )
        out_specs = (_rows(block, op), _rows(block, _LANE),
                     _rows(block, Ep))
    return pl.pallas_call(
        _make_fwd_kernel(meta, stash=stash),
        out_shape=out_shape,
        grid=(N // block,),
        in_specs=([_rows(block, 8), _const(rotT.shape), _const(off.shape),
                   _const(cut.shape)]
                  + [_const(w.shape) for w in wps]
                  + [_const(b.shape) for b in bps]
                  + [_const(w.shape) for w in cwps]
                  + [_const(b.shape) for b in cbps]),
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=N * (Ep + op + _LANE) * 4 + stash_bytes,
            transcendentals=N * (meta.d_hidden * (meta.n_layers - 1)
                                 + 2 * 84 + 21),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(p8, rotT, off, cut, *wps, *bps, *cwps, *cbps)


@functools.partial(jax.jit, static_argnames=("meta", "block", "interpret"))
def _bwd_call(p8, dout, dg, dthird, rotT, off, cut, wps, bps, cwps, cbps,
              meta: FineMeta, block, interpret, stash=()):
    N = p8.shape[0]
    Ep = _round_up(meta.emb_width, _LANE)
    # stash mode removes the trunk/u-chain/color forward recompute:
    # 12x the fwd matmul flops drop to ~8x
    flops = ((8 if meta.stash else 12)
             * N * sum(w.shape[0] * w.shape[1]
                       for w in list(wps) + list(cwps)))
    n = meta.n_layers
    cn = meta.c_layers if meta.with_color else 0
    # dp is (N, 8): only 3 real columns — lane-padding it to 128 costs
    # relayout copies downstream (profiled ~0.3 ms/step each)
    if meta.want_dw:
        out_shapes = (
            [jax.ShapeDtypeStruct((N, 8), jnp.float32)]
            + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wps]
            + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bps]
            + [jax.ShapeDtypeStruct(rotT.shape, jnp.float32),
               jax.ShapeDtypeStruct(off.shape, jnp.float32)]
            + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in cwps]
            + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in cbps]
        )
        out_specs = (
            [_rows(block, 8)]
            + [_const(w.shape) for w in wps]
            + [_const(b.shape) for b in bps]
            + [_const(rotT.shape), _const(off.shape)]
            + [_const(w.shape) for w in cwps]
            + [_const(b.shape) for b in cbps]
        )
    else:
        out_shapes = [
            jax.ShapeDtypeStruct((N, 8), jnp.float32),
            jax.ShapeDtypeStruct(rotT.shape, jnp.float32),
            jax.ShapeDtypeStruct(off.shape, jnp.float32),
        ]
        out_specs = [_rows(block, 8), _const(rotT.shape),
                     _const(off.shape)]
    if meta.with_color:
        # packed (N, 8) cotangent [dsdf | dg | dcolor | 0] — the
        # external dout has only the sdf column, so staging a lane-
        # padded (N, 384) dout + (N, 128) dg/dcolor wastes ~150 MB of
        # HBM traffic per step (dout arrives via the `dout` operand)
        ct_specs = [_rows(block, 8)]
        ct_args = (dout,)
    else:
        ct_specs = [_rows(block, _round_up(meta.d_out, _LANE)),
                    _rows(block, _LANE), _rows(block, Ep)]
        ct_args = (dout, dg, dthird)
    scratch_shapes = ()
    if meta.want_dw and _DW_STAGE > 0 and meta.dtype == "bf16":
        scratch_shapes = tuple(
            pltpu.VMEM(a.shape, jnp.bfloat16)
            for a in (list(wps) + list(bps) + list(cwps) + list(cbps))
        )
    elif meta.want_dw and _DW_PLACE == "scratch":
        scratch_shapes = tuple(
            pltpu.VMEM(a.shape, jnp.float32)
            for a in (list(wps) + list(bps) + list(cwps) + list(cbps))
        )
    if meta.stash:
        assert len(stash) == len(meta.stash_specs())
        stash_specs = [_rows(block, a.shape[1]) for a in stash]
        stash_bytes = sum(a.size * a.dtype.itemsize for a in stash)
    else:
        assert not stash
        stash_specs = []
        stash_bytes = 0
    outs = pl.pallas_call(
        _make_bwd_kernel(meta),
        out_shape=tuple(out_shapes),
        grid=(N // block,),
        in_specs=([_rows(block, 8)] + ct_specs
                  + [_const(rotT.shape), _const(off.shape),
                     _const(cut.shape)]
                  + [_const(w.shape) for w in wps]
                  + [_const(b.shape) for b in bps]
                  + [_const(w.shape) for w in cwps]
                  + [_const(b.shape) for b in cbps]
                  + stash_specs),
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=N * (2 * Ep + _LANE) * 4 + stash_bytes,
            transcendentals=2 * N * (meta.d_hidden * (meta.n_layers - 1)
                                     + 2 * 84 + 21),
        ),
        # the block holds embedding stages + trunk/color activations +
        # chain values + f32 dW/pose accumulators: >23M at block=128 on
        # v5e — above the compiler's default 16M scoped-vmem limit, well
        # under physical VMEM; raise the cap instead of shrinking blocks
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(p8, *ct_args, rotT, off, cut, *wps, *bps, *cwps, *cbps, *stash)
    dp = outs[0]
    if not meta.want_dw:
        return dp, (), (), outs[1], outs[2], (), ()
    dws = outs[1:1 + n]
    dbs = outs[1 + n:1 + 2 * n]
    drotT, doff = outs[1 + 2 * n], outs[2 + 2 * n]
    dcws = outs[3 + 2 * n:3 + 2 * n + cn]
    dcbs = outs[3 + 2 * n + cn:3 + 2 * n + 2 * cn]
    return dp, tuple(dws), tuple(dbs), drotT, doff, tuple(dcws), tuple(dcbs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def hand_fine_full(pts, rotT, off, ws, bs, meta: FineMeta,
                   block: int = 128, interpret: bool = False):
    """Fully-fused differentiable fine pass.

    Args:
        pts: (N, 3) world-space query points.
        rotT, off: pose operands from ops.fused_hand.pack_hand_pose
            (differentiable — pack stays in XLA so bt_inv/se3 gradients
            flow through its autodiff).
        ws, bs: materialized (in, out) f32 trunk weights / biases
            (weight-norm materialization stays in XLA).
    Returns:
        (out (N, d_out), g (N, 3) spatial sdf gradient, e (N, E)
        channel-major embedding for the color net).
    """
    out, g, e, _cut = _fwd_padded(pts, rotT, off, ws, bs, meta, block,
                                  interpret)
    return out, g, e


def _fwd_block(block: int, interpret: bool) -> int:
    """Grid block for the FORWARD kernel only.

    The fwd kernel has no dW accumulators, so it speeds up with block
    size where the bwd regresses (ablate3 @ N=56832: piece fwd 6.24 ->
    5.93 ms at 256, slot 7.00 -> 6.30; bwd-full 13.06 -> 14.34).  The
    default 128 therefore maps to 256 on the fwd side; explicit
    non-default blocks (tests, sweeps) and interpret mode are honored
    as-is.  b512 fails to compile (Mosaic OOM) — do not raise further.
    HONERF_FINE_FWD_BLOCK overrides (<= 0 means "honor the caller's
    block", i.e. disable the 256 remap)."""
    env = os.environ.get("HONERF_FINE_FWD_BLOCK")
    if env:
        try:
            v = int(env)
        except ValueError as e:
            raise ValueError(
                f"HONERF_FINE_FWD_BLOCK={env!r} is not an integer") from e
        return v if v > 0 else block
    return 256 if (block == 128 and not interpret) else block


def _fwd_padded(pts, rotT, off, ws, bs, meta, block, interpret,
                cws=(), cbs=(), stash=False):
    N = pts.shape[0]
    block = _fwd_block(block, interpret)
    Np = _round_up(max(N, block), block)
    p8 = jnp.pad(pts.astype(jnp.float32), ((0, Np - N), (0, 5)))
    cut = jnp.pad(BONE_CUTOFFS, (0, _LANE - 21))[None, :].astype(jnp.float32)
    if meta.layout == "slot":
        assert meta.with_color, "slot layout requires with_color"
        wps, bps = _pad_weights_slots(ws, bs, meta)
    else:
        wps, bps = FT._pad_weights(ws, bs, meta.trunk_meta)
    cwps, cbps = (_pad_color_weights(cws, cbs, meta) if meta.with_color
                  else ((), ()))
    outs = _fwd_call(p8, rotT.astype(jnp.float32),
                     off.astype(jnp.float32), cut, wps, bps,
                     cwps, cbps, meta, block, interpret, stash=stash)
    if meta.with_color:
        packed = outs[0]
        if stash:
            # the stash stays FULL-Np (the bwd grid consumes it
            # unsliced — a row slice here would copy ~1.6 GB in XLA)
            return (packed[:N, 0], packed[:N, 1:4], packed[:N, 4:7],
                    cut, tuple(outs[1:]))
        return packed[:N, 0], packed[:N, 1:4], packed[:N, 4:7], cut
    out, g, third = outs
    E = meta.emb_width
    return (out[:N, :meta.d_out], g[:N, :3],
            third[:N, :E].astype(jnp.float32), cut)


def _vjp_fwd(pts, rotT, off, ws, bs, meta, block, interpret):
    out, g, e, _cut = _fwd_padded(pts, rotT, off, ws, bs, meta, block,
                                  interpret)
    return (out, g, e), (pts, rotT, off, ws, bs)


def _bwd_padded(meta, block, interpret, pts, rotT, off, ws, bs,
                dout_full, dg, dthird, cws=(), cbs=(), stash=()):
    """Shared padded backward: dout_full is the (N, d_out) cotangent on
    the full trunk output (with_color: only col 0 nonzero externally).

    stash: the forward's residual arrays (meta.stash) — FULL-Np rows
    from the forward's (possibly larger) block padding; the bwd grid
    covers those rows (padded rows carry finite garbage with ZERO
    cotangents, so their dW/pose contributions vanish exactly, same as
    the recompute path's zero-padded rows)."""
    N = pts.shape[0]
    E = meta.emb_width
    Ep = _round_up(E, _LANE)
    op = _round_up(meta.d_out, _LANE)
    Np = _round_up(max(N, block), block)
    if stash:
        assert meta.stash
        Np_s = stash[0].shape[0]
        assert Np_s % block == 0 and Np_s >= Np, (
            f"stash rows {Np_s} not a multiple of bwd block {block}")
        Np = Np_s
    p8 = jnp.pad(pts.astype(jnp.float32), ((0, Np - N), (0, 5)))
    cut = jnp.pad(BONE_CUTOFFS, (0, _LANE - 21))[None, :].astype(jnp.float32)
    if meta.with_color:
        # pack [dsdf | dg | dcolor | 0] into ONE (Np, 8) operand
        # (dout_full arrives as the (N, 1) sdf cotangent here)
        dpack = jnp.concatenate(
            [dout_full.reshape(N, 1).astype(jnp.float32),
             dg.astype(jnp.float32), dthird.astype(jnp.float32),
             jnp.zeros((N, 1), jnp.float32)], axis=-1)
        dout_p = jnp.pad(dpack, ((0, Np - N), (0, 0)))
        dg_p = dthird_p = None
    else:
        dout_p = jnp.pad(dout_full.astype(jnp.float32),
                         ((0, Np - N), (0, op - meta.d_out)))
        dg_p = jnp.pad(dg.astype(jnp.float32),
                       ((0, Np - N), (0, _LANE - 3)))
        dthird_p = jnp.pad(dthird.astype(jnp.float32),
                           ((0, Np - N), (0, Ep - dthird.shape[1])))
    if meta.layout == "slot":
        wps, bps = _pad_weights_slots(ws, bs, meta)
    else:
        wps, bps = FT._pad_weights(ws, bs, meta.trunk_meta)
    cwps, cbps = (_pad_color_weights(cws, cbs, meta) if meta.with_color
                  else ((), ()))
    dp, dws, dbs, drotT, doff, dcws, dcbs = _bwd_call(
        p8, dout_p, dg_p, dthird_p, rotT.astype(jnp.float32),
        off.astype(jnp.float32), cut, wps, bps, cwps, cbps, meta, block,
        interpret, stash=stash)
    if not meta.want_dw:
        # frozen nets: weight cotangents are ZERO by contract.  With
        # HONERF_DEBUG_FROZEN_NAN=1 they are NaN-poisoned instead so a
        # caller that accidentally differentiates w.r.t. the weights in
        # frozen mode fails loudly rather than training on silent zeros
        # (ADVICE r3; tests/test_fused_fine_full.py pins both modes).
        import os

        fill = (
            float("nan") if os.environ.get("HONERF_DEBUG_FROZEN_NAN")
            else 0.0
        )
        zw = tuple(jnp.full_like(w, fill) for w in ws)
        zb = tuple(jnp.full_like(b, fill) for b in bs)
        zcw = tuple(jnp.full_like(w, fill) for w in cws)
        zcb = tuple(jnp.full_like(b, fill) for b in cbs)
        return dp[:N, :3], drotT, doff, zw, zb, zcw, zcb
    dims = FT._dims(meta.trunk_meta)
    H = meta.d_hidden
    Hp = _round_up(H, _LANE)
    pos = (jnp.asarray(_slot_inverse_pos(meta))
           if meta.layout == "slot" else None)
    out_dws = []
    for l, (dw, (d_in, d_out)) in enumerate(zip(dws, dims)):
        if meta.layout == "slot":
            # un-permute the slot rows back to channel-major
            if l == 0:
                dw = dw[pos]
            elif l == meta.skip:
                dw = jnp.concatenate([dw[:H], dw[Hp:][pos]], axis=0)
        elif l == meta.skip:
            dw = jnp.concatenate([dw[:H], dw[Hp:Hp + E]], axis=0)
        out_dws.append(dw[:d_in, :d_out])
    out_dbs = tuple(db[0, :d_out] for db, (_d, d_out) in zip(dbs, dims))
    out_dcws = tuple(dw[:d_in, :d_out] for dw, (d_in, d_out)
                     in zip(dcws, meta.color_dims))
    out_dcbs = tuple(db[0, :d_out] for db, (_d, d_out)
                     in zip(dcbs, meta.color_dims))
    return (dp[:N, :3], drotT, doff, tuple(out_dws), out_dbs,
            out_dcws, out_dcbs)


def _vjp_bwd(meta, block, interpret, res, cts):
    pts, rotT, off, ws, bs = res
    dout, dg, de = cts
    dp, drotT, doff, dws, dbs, _dcw, _dcb = _bwd_padded(
        meta, block, interpret, pts, rotT, off, ws, bs, dout, dg, de)
    return (dp, drotT, doff, dws, dbs)


hand_fine_full.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def hand_fine_color(pts, rotT, off, ws, bs, cws, cbs, meta: FineMeta,
                    block: int = 128, interpret: bool = False):
    """Fully-fused fine pass INCLUDING the hand color net:
    (pts, pose, trunk W, color W) -> (sdf (N,), g (N, 3), color (N, 3)).
    The embedding and the 256-d features never leave VMEM."""
    assert meta.with_color
    sdf, g, color, _cut = _fwd_padded(pts, rotT, off, ws, bs, meta,
                                      block, interpret, cws, cbs)
    return sdf, g, color


def _vjp_color_fwd(pts, rotT, off, ws, bs, cws, cbs, meta, block,
                   interpret):
    if meta.stash:
        sdf, g, color, _cut, stash = _fwd_padded(
            pts, rotT, off, ws, bs, meta, block, interpret, cws, cbs,
            stash=True)
    else:
        sdf, g, color, _cut = _fwd_padded(pts, rotT, off, ws, bs, meta,
                                          block, interpret, cws, cbs)
        stash = ()
    return (sdf, g, color), (pts, rotT, off, ws, bs, cws, cbs, stash)


def _vjp_color_bwd(meta, block, interpret, res, cts):
    pts, rotT, off, ws, bs, cws, cbs, stash = res
    dsdf, dg, dcolor = cts
    N = pts.shape[0]
    # with_color packs [dsdf | dg | dcolor] — no (N, d_out) staging
    dp, drotT, doff, dws, dbs, dcws, dcbs = _bwd_padded(
        meta, block, interpret, pts, rotT, off, ws, bs,
        dsdf.reshape(N, 1), dg, dcolor, cws, cbs, stash=stash)
    return (dp, drotT, doff, dws, dbs, dcws, dcbs)


hand_fine_color.defvjp(_vjp_color_fwd, _vjp_color_bwd)
