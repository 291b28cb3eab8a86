"""Neural field networks: hand/object SDF MLPs, color MLPs, deviation.

Functional re-design of the reference networks (utils/fields.py) as pure
`apply(params, ...)` functions over plain pytree parameters, with static
architecture captured in hashable config NamedTuples (jit-friendly).

Architecture parity (SURVEY.md §2.4):
  * SDF MLPs: 8x256, skip at 4, d_out = 257 (sdf + 256-feature), Softplus
    beta=100, geometric init, weight norm.
  * Hand SDF input: flattened per-bone (v-PE || r-PE) * cutoff over 21 bones
    (utils/fields.py:132-148).  Skip style: widened skip-layer input
    (utils/fields.py:96-99).
  * Object SDF input: xyz PE L=10 (63 ch); skip style: shrunk pre-skip
    output (utils/fields.py:281-284).
  * Color MLPs: 4x256 ReLU + sigmoid; hand eats (xyz_feature, 256-feat,
    grad-PE); obj eats (point-PE, dir-PE, feat, grad-PE).
  * Deviation: inv_s = exp(10 * variance), init 0.3 (utils/fields.py:243-249).
  * se3_refine tables: hand (N, 36), obj (N, 9), initialized with identity
    rot6d (utils/fields.py:127-130, :311-314).

SDF spatial gradients use one vjp (forward + reverse) instead of the
reference's autograd double-backprop (utils/fields.py:165-177) — the
eikonal term's higher-order grads flow through it under jax.grad.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from honerf_tpu.models.embedding import (
    channel_major_dest,
    hand_embedding,
    hand_embedding_flat,
    hand_embedding_width,
    positional_encoding,
)
from honerf_tpu.models.mlp import (
    apply_linear,
    geometric_init_weights,
    init_linear,
    linear_weight,
    softplus_beta,
)

Params = Dict[str, Any]

SQRT2 = math.sqrt(2.0)


class SDFConfig(NamedTuple):
    """Static architecture of an SDF MLP (hand or object)."""

    kind: str  # 'hand' | 'obj'
    d_in: int = 3
    d_out: int = 257
    d_hidden: int = 256
    n_layers: int = 8
    skip_in: Tuple[int, ...] = (4,)
    v_multires: int = 10
    r_multires: int = 4  # hand: bone-direction PE L (7 in hand confs)
    bias: float = 0.5
    scale: float = 1.0
    geometric_init: bool = True
    weight_norm: bool = True
    inside_outside: bool = False
    # TPU fast path: build the hand embedding channel-major and gather
    # weight columns at apply time (stored params stay bone-major; see
    # embedding.hand_embedding_flat).  Numerics differ only by matmul
    # summation order.
    flat_embedding: bool = True
    # 'bf16' = fast mode: bfloat16 trunk activations (see _mlp_trunk)
    trunk_dtype: str = "f32"

    @property
    def input_width(self) -> int:
        if self.kind == "hand":
            return hand_embedding_width(self.v_multires, self.r_multires)
        return self.d_in + 2 * self.v_multires * self.d_in

    @property
    def dims(self) -> Tuple[int, ...]:
        return (self.input_width,) + (self.d_hidden,) * self.n_layers + (self.d_out,)

    @property
    def skip_style(self) -> str:
        return "widen_input" if self.kind == "hand" else "shrink_output"


class ColorConfig(NamedTuple):
    """Static architecture of a color MLP."""

    kind: str  # 'hand' | 'obj'
    d_feature: int = 256
    d_in: int = 3
    d_out: int = 3
    d_hidden: int = 256
    n_layers: int = 4
    weight_norm: bool = True
    v_multires: int = 10
    r_multires: int = 4
    grad_multires: int = 4
    squeeze_out: bool = True
    use_gradients: bool = True
    flat_embedding: bool = True  # must match the SDF net's flag
    trunk_dtype: str = "f32"

    @property
    def input_width(self) -> int:
        grad_ch = self.d_in + 2 * self.grad_multires * self.d_in
        if self.kind == "hand":
            # (v-emb + r-emb) x 21 bones + feature (+ gradient PE)
            base = (
                hand_embedding_width(self.v_multires, self.r_multires)
                + self.d_feature
            )
            return base + (grad_ch if self.use_gradients else 0)
        point_ch = self.d_in + 2 * self.v_multires * self.d_in
        dir_ch = self.d_in + 2 * self.r_multires * self.d_in
        return point_ch + dir_ch + self.d_feature + grad_ch

    @property
    def dims(self) -> Tuple[int, ...]:
        return (self.input_width,) + (self.d_hidden,) * self.n_layers + (self.d_out,)


def sdf_config_from_conf(kind: str, conf: Dict[str, Any]) -> SDFConfig:
    """Build from a `model.sdf_network` conf section (kwarg-splat parity with
    exp_runner.py:91-105)."""
    return SDFConfig(
        kind=kind,
        d_in=int(conf.get("d_in", 3)),
        d_out=int(conf.get("d_out", 257)),
        d_hidden=int(conf.get("d_hidden", 256)),
        n_layers=int(conf.get("n_layers", 8)),
        skip_in=tuple(conf.get("skip_in", [4])),
        v_multires=int(conf.get("v_multires", 10)),
        r_multires=int(conf.get("r_multires", 4)),
        bias=float(conf.get("bias", 0.5)),
        scale=float(conf.get("scale", 1.0)),
        geometric_init=bool(conf.get("geometric_init", True)),
        weight_norm=bool(conf.get("weight_norm", True)),
        inside_outside=bool(conf.get("inside_outside", False)),
        trunk_dtype=str(conf.get("trunk_dtype", "f32")),
    )


def color_config_from_conf(kind: str, conf: Dict[str, Any]) -> ColorConfig:
    return ColorConfig(
        kind=kind,
        d_feature=int(conf.get("d_feature", 256)),
        d_in=int(conf.get("d_in", 3)),
        d_out=int(conf.get("d_out", 3)),
        d_hidden=int(conf.get("d_hidden", 256)),
        n_layers=int(conf.get("n_layers", 4)),
        weight_norm=bool(conf.get("weight_norm", True)),
        v_multires=int(conf.get("v_multires", 10)),
        r_multires=int(conf.get("r_multires", 4)),
        grad_multires=int(conf.get("grad_multires", 4)),
        squeeze_out=bool(conf.get("squeeze_out", True)),
        use_gradients=bool(conf.get("use_gradients", True)),
        trunk_dtype=str(conf.get("trunk_dtype", "f32")),
    )


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_sdf_params(key, cfg: SDFConfig) -> Params:
    dims = cfg.dims
    layers = []
    if cfg.geometric_init:
        wb = geometric_init_weights(
            key, dims, cfg.skip_in, cfg.bias, cfg.inside_outside, cfg.skip_style
        )
        for w, b in wb:
            layers.append(init_linear(None, 0, 0, cfg.weight_norm, w_init=w, b_init=b))
    else:
        keys = jax.random.split(key, len(dims) - 1)
        for l in range(len(dims) - 1):
            if cfg.skip_style == "widen_input":
                d_in = dims[l] + dims[0] if l in cfg.skip_in else dims[l]
                d_out = dims[l + 1]
            else:
                d_in = dims[l]
                d_out = dims[l + 1] - dims[0] if (l + 1) in cfg.skip_in else dims[l + 1]
            layers.append(init_linear(keys[l], d_in, d_out, cfg.weight_norm))
    return {"layers": layers}


def init_color_params(key, cfg: ColorConfig) -> Params:
    dims = cfg.dims
    keys = jax.random.split(key, len(dims) - 1)
    layers = [
        init_linear(keys[l], dims[l], dims[l + 1], cfg.weight_norm)
        for l in range(len(dims) - 1)
    ]
    return {"layers": layers}


def init_variance_params(init_val: float = 0.3) -> Params:
    return {"variance": jnp.asarray(float(init_val))}


def init_se3_refine(n_frames: int, kind: str) -> jnp.ndarray:
    """Per-training-image pose-refinement table: identity rot6d in the first
    6 slots (utils/fields.py:127-130, :311-314)."""
    width = 36 if kind == "hand" else 9
    table = jnp.zeros((n_frames, width))
    return table.at[:, 0].set(1.0).at[:, 3].set(1.0)


# ---------------------------------------------------------------------------
# Application
# ---------------------------------------------------------------------------

def _mlp_trunk(
    layers, x: jnp.ndarray, skip_in: Tuple[int, ...], n_layers_total: int,
    activation, dtype: str = "f32",
) -> jnp.ndarray:
    """dtype='bf16' runs the trunk with bfloat16 activations and weights
    (f32 matmul accumulation, f32 output) — the optional fast mode: the
    TPU already executes f32 matmuls as bf16 passes, so this only halves
    the HBM traffic of activations and backward residuals, not matmul
    precision.  Default f32 preserves golden parity."""
    cast = jnp.bfloat16 if dtype == "bf16" else None
    inputs = x if cast is None else x.astype(cast)
    x = inputs
    for l in range(n_layers_total - 1):
        if l in skip_in:
            x = jnp.concatenate([x, inputs], axis=-1) / SQRT2
        if cast is None:
            x = apply_linear(layers[l], x)
        else:
            w = linear_weight(layers[l]).astype(cast)
            x = jax.lax.dot_general(
                x, w.T, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + layers[l]["b"]
            x = x if l == n_layers_total - 2 else x.astype(cast)
        if l < n_layers_total - 2:
            x = activation(x)
    return x.astype(jnp.float32)


def sdf_obj_apply(params: Params, cfg: SDFConfig, pts: jnp.ndarray) -> jnp.ndarray:
    """Object SDF forward: (..., 3) -> (..., 257) [sdf/scale, features]."""
    emb = jnp.concatenate([pts, positional_encoding(pts, cfg.v_multires)], axis=-1)
    out = _mlp_trunk(
        params["layers"], emb, cfg.skip_in, len(cfg.dims), softplus_beta,
        cfg.trunk_dtype,
    )
    return jnp.concatenate([out[..., :1] / cfg.scale, out[..., 1:]], axis=-1)


@functools.lru_cache(maxsize=8)
def _cm_index(v_multires: int, r_multires: int, prefix: int, tail: int):
    """Input-column gather index mapping bone-major stored weights onto the
    channel-major flat embedding: cols [prefix, prefix+W) are permuted by
    channel_major_dest; `prefix` leading and `tail` trailing cols pass
    through."""
    dest = channel_major_dest(v_multires, r_multires)
    w = len(dest)
    return np.concatenate([
        np.arange(prefix), prefix + dest, np.arange(prefix + w, prefix + w + tail)
    ])


def _gather_cols(layer: Params, idx: np.ndarray) -> Params:
    """w'[:, i] = w[:, idx[i]].  Column permutation commutes with weight
    norm's per-output-row normalization, so 'v' is gathered directly."""
    out = dict(layer)
    key = "v" if "v" in layer else "w"
    out[key] = layer[key][:, idx]
    return out


def sdf_hand_apply(
    params: Params,
    cfg: SDFConfig,
    pts: jnp.ndarray,
    bt_inv: jnp.ndarray,
    t_pose_21: jnp.ndarray,
):
    """Hand SDF forward.

    Returns (out257, xyz_feature, r, h) like the reference forward
    (utils/fields.py:132-156).  With cfg.flat_embedding the returned
    xyz_feature is in channel-major order (embedding.channel_major_dest);
    stored weights stay bone-major and are gathered here."""
    if cfg.flat_embedding:
        xyz_feature, r, h = hand_embedding_flat(
            pts, bt_inv, t_pose_21, cfg.v_multires, cfg.r_multires
        )
        w = cfg.input_width
        layers = list(params["layers"])
        layers[0] = _gather_cols(
            layers[0], _cm_index(cfg.v_multires, cfg.r_multires, 0, 0)
        )
        for s in cfg.skip_in:
            # widen_input skip: input = concat([x(d_hidden), embedding(W)])
            layers[s] = _gather_cols(
                layers[s],
                _cm_index(cfg.v_multires, cfg.r_multires, cfg.d_hidden, 0),
            )
    else:
        xyz_feature, r, h = hand_embedding(
            pts, bt_inv, t_pose_21, cfg.v_multires, cfg.r_multires
        )
        layers = params["layers"]
    out = _mlp_trunk(
        layers, xyz_feature, cfg.skip_in, len(cfg.dims), softplus_beta,
        cfg.trunk_dtype,
    )
    return out, xyz_feature, r, h


def color_hand_apply(
    params: Params,
    cfg: ColorConfig,
    xyz_feature: jnp.ndarray,
    feature_vector: jnp.ndarray,
    gradients: jnp.ndarray,
) -> jnp.ndarray:
    """Hand color net (utils/fields.py:222-240).  The raw view dirs and the
    cutoff gate h are accepted by the reference forward but unused; the
    actual input is (xyz_feature || feature || gradient-PE)."""
    x = jnp.concatenate([xyz_feature, feature_vector], axis=-1)
    if cfg.use_gradients:
        grad_emb = jnp.concatenate(
            [gradients, positional_encoding(gradients, cfg.grad_multires)], axis=-1
        )
        x = jnp.concatenate([x, grad_emb], axis=-1)
    layers = params["layers"]
    if cfg.flat_embedding:
        # xyz_feature arrives channel-major from sdf_hand_apply; gather the
        # first-layer columns of its slice to match (rest pass through)
        w = hand_embedding_width(cfg.v_multires, cfg.r_multires)
        layers = list(layers)
        layers[0] = _gather_cols(
            layers[0],
            _cm_index(cfg.v_multires, cfg.r_multires, 0, cfg.input_width - w),
        )
    out = _mlp_trunk(layers, x, (), len(cfg.dims), jax.nn.relu,
                     cfg.trunk_dtype)
    return jax.nn.sigmoid(out) if cfg.squeeze_out else out


def color_obj_apply(
    params: Params,
    cfg: ColorConfig,
    pts: jnp.ndarray,
    dirs: jnp.ndarray,
    feature_vector: jnp.ndarray,
    gradients: jnp.ndarray,
) -> jnp.ndarray:
    """Object color net (utils/fields.py:387-405)."""
    point_emb = jnp.concatenate([pts, positional_encoding(pts, cfg.v_multires)], -1)
    dir_emb = jnp.concatenate([dirs, positional_encoding(dirs, cfg.r_multires)], -1)
    grad_emb = jnp.concatenate(
        [gradients, positional_encoding(gradients, cfg.grad_multires)], -1
    )
    x = jnp.concatenate([point_emb, dir_emb, feature_vector, grad_emb], axis=-1)
    out = _mlp_trunk(params["layers"], x, (), len(cfg.dims), jax.nn.relu,
                     cfg.trunk_dtype)
    return jax.nn.sigmoid(out) if cfg.squeeze_out else out


def variance_apply(params: Params) -> jnp.ndarray:
    """inv_s = exp(10 * variance), clipped like the renderer does
    (utils/renderer.py:144)."""
    return jnp.clip(jnp.exp(params["variance"] * 10.0), 1e-6, 1e6)


# ---------------------------------------------------------------------------
# Value + spatial gradient (single vjp; replaces autograd double-backprop)
# ---------------------------------------------------------------------------

def sdf_obj_value_feat_grad(params: Params, cfg: SDFConfig, pts: jnp.ndarray):
    """Returns (sdf (...,1), features (...,256), grad (...,3)) in one
    forward + one reverse pass."""
    out, vjp = jax.vjp(lambda p: sdf_obj_apply(params, cfg, p), pts)
    cot = jnp.zeros_like(out).at[..., 0].set(1.0)
    (grad,) = vjp(cot)
    return out[..., :1], out[..., 1:], grad


def sdf_hand_value_feat_grad(
    params: Params,
    cfg: SDFConfig,
    pts: jnp.ndarray,
    bt_inv: jnp.ndarray,
    t_pose_21: jnp.ndarray,
):
    """Returns (sdf, features, xyz_feature, r, h, grad) in one forward + one
    reverse pass (gradient w.r.t. world-space pts)."""
    def fwd(p):
        out, xyz_feature, r, h = sdf_hand_apply(params, cfg, p, bt_inv, t_pose_21)
        return out, (xyz_feature, r, h)

    out, vjp, (xyz_feature, r, h) = jax.vjp(fwd, pts, has_aux=True)
    cot = jnp.zeros_like(out).at[..., 0].set(1.0)
    (grad,) = vjp(cot)
    return out[..., :1], out[..., 1:], xyz_feature, r, h, grad


def sdf_hand_value_feat_grad_fused(
    params: Params,
    cfg: SDFConfig,
    pts: jnp.ndarray,
    bt_inv: jnp.ndarray,
    t_pose_21: jnp.ndarray,
    block: int = 128,
    interpret: bool = False,
    impl: str = "pallas",
):
    """Differentiable DECOMPOSED fine pass (ops/fused_fine.py): embedding
    and its pose coupling in XLA; the 9-layer trunk + d sdf/d embedding
    chain as an explicit program with the spatial gradient reassembled
    as grad = embedding_vjp(u), u = d sdf/d e — so se3_refine/bt_inv
    gradients (incl. second order through the embedding Jacobian) remain
    exact XLA autodiff.

    impl='pallas': the trunk+chain run as one custom-VJP Pallas op whose
    hand-written backward (incl. the eikonal grad-of-grad second-order
    softplus terms) keeps activations in VMEM (validated <=1e-3 vs the
    XLA path, tests/test_fused_fine.py).
    impl='xla': the same explicit decomposition lowered by XLA autodiff
    — the restructure alone avoids the nested-vjp program whose dW
    staging dominated the round-2 hand step."""
    from honerf_tpu.ops.fused_fine import (
        TrunkMeta,
        hand_trunk_sdf_u,
        trunk_sdf_u_ref,
    )
    from honerf_tpu.ops.fused_hand import _assert_not_batched

    _assert_not_batched(pts)
    assert len(cfg.skip_in) == 1, "fused fine pass supports one skip"

    def emb(p):
        xyz_feature, r, h = hand_embedding_flat(
            p, bt_inv, t_pose_21, cfg.v_multires, cfg.r_multires
        )
        return xyz_feature, (r, h)

    e, emb_vjp, (r, h) = jax.vjp(emb, pts, has_aux=True)
    layers = list(params["layers"])
    layers[0] = _gather_cols(
        layers[0], _cm_index(cfg.v_multires, cfg.r_multires, 0, 0)
    )
    s = cfg.skip_in[0]
    layers[s] = _gather_cols(
        layers[s], _cm_index(cfg.v_multires, cfg.r_multires, cfg.d_hidden, 0)
    )
    ws = tuple(linear_weight(l).T for l in layers)  # (in, out)
    bs = tuple(l["b"] for l in layers)
    meta = TrunkMeta(
        emb_width=cfg.input_width, d_hidden=cfg.d_hidden,
        n_layers=len(cfg.dims) - 1, skip=s, d_out=cfg.d_out,
        dtype="bf16" if cfg.trunk_dtype == "bf16" else "f32",
    )
    if impl == "xla":
        cast = jnp.bfloat16 if meta.dtype == "bf16" else jnp.float32
        out, u = trunk_sdf_u_ref(
            e, [w.astype(cast) for w in ws], list(bs), meta
        )
    else:
        out, u = hand_trunk_sdf_u(e, ws, bs, meta, block, interpret)
    (grad,) = emb_vjp(u)
    return out[..., :1], out[..., 1:], e, r, h, grad


def sdf_hand_value_feat_grad_full(
    params: Params,
    cfg: SDFConfig,
    pts: jnp.ndarray,
    bt_inv: jnp.ndarray,
    t_pose_21: jnp.ndarray,
    block: int = 128,
    interpret: bool = False,
    frozen: bool = False,
):
    """FULLY-fused fine pass (ops/fused_fine_full.py): embedding + trunk
    + spatial gradient in one custom-VJP Pallas op, pose gradients via
    the differentiable (rotT, off) operands (pack_hand_pose stays XLA).

    frozen=True (pose fitting): the backward kernel skips all weight
    gradients and returns ZERO cotangents for the net params — callers
    must only differentiate w.r.t. pose/points.

    Returns (sdf, feat, xyz_feature, r, h, grad) like
    sdf_hand_value_feat_grad — r and h are None (the reference color
    forward accepts but never uses them, utils/fields.py:222)."""
    from honerf_tpu.ops.fused_fine_full import FineMeta, hand_fine_full
    from honerf_tpu.ops.fused_hand import _assert_not_batched, pack_hand_pose

    _assert_not_batched(pts)
    assert len(cfg.skip_in) == 1, "fused fine pass supports one skip"
    rotT, off, _cut = pack_hand_pose(bt_inv, t_pose_21)
    ws, bs = _fine_trunk_weights(params, cfg)
    meta = FineMeta(
        v_multires=cfg.v_multires, r_multires=cfg.r_multires,
        d_hidden=cfg.d_hidden, n_layers=len(cfg.dims) - 1,
        skip=cfg.skip_in[0], d_out=cfg.d_out,
        dtype="bf16" if cfg.trunk_dtype == "bf16" else "f32",
        want_dw=not frozen,
    )
    out, grad, e = hand_fine_full(pts, rotT, off, ws, bs, meta, block,
                                  interpret)
    return out[..., :1], out[..., 1:], e, None, None, grad


def _fine_trunk_weights(params: Params, cfg: SDFConfig):
    layers = list(params["layers"])
    layers[0] = _gather_cols(
        layers[0], _cm_index(cfg.v_multires, cfg.r_multires, 0, 0)
    )
    s = cfg.skip_in[0]
    layers[s] = _gather_cols(
        layers[s], _cm_index(cfg.v_multires, cfg.r_multires, cfg.d_hidden, 0)
    )
    ws = tuple(linear_weight(l).T for l in layers)
    bs = tuple(l["b"] for l in layers)
    return ws, bs


def hand_fine_color_apply(
    params: Params,
    sdf_cfg: SDFConfig,
    color_cfg: ColorConfig,
    pts: jnp.ndarray,
    bt_inv: jnp.ndarray,
    t_pose_21: jnp.ndarray,
    block: int = 128,
    interpret: bool = False,
    frozen: bool = False,
    layout: str = None,
    stash: bool = None,
):
    """(sdf, grad, color) via the COLOR-fused fine pass
    (ops/fused_fine_full.hand_fine_color): embedding, trunk, spatial
    gradient AND the 4x256 color net in one kernel — the embedding and
    features never touch HBM.  params = {'sdf': .., 'color': ..}.

    frozen=True (the pose-fitting stage): the backward kernel skips the
    23 dW = X^T dY matmuls and their f32 VMEM accumulators and returns
    ZERO cotangents for the net params — only pose/point gradients are
    valid in this mode.

    stash (round 5, default via HONERF_FINE_STASH): the VJP forward
    emits the trunk/u-chain/color residuals and the backward streams
    them instead of rematerializing the forward per block — bit-exact,
    ~1/3 less backward MXU work for ~29 KB/row of pipelined HBM
    traffic (ops/fused_fine_full.FineMeta.stash)."""
    from honerf_tpu.ops.fused_fine_full import (
        FineMeta,
        color_row_map,
        hand_fine_color,
    )
    from honerf_tpu.ops.fused_hand import _assert_not_batched, pack_hand_pose

    _assert_not_batched(pts)
    assert len(sdf_cfg.skip_in) == 1
    assert color_cfg.use_gradients and color_cfg.squeeze_out
    if layout is None:
        # embedding lane layout inside the kernel ('piece' channel-major
        # vs the round-4 lane-aligned 'slot'); both are <=1e-3-equivalent
        # to the XLA path by the test suite — the default tracks the
        # faster one on the measured hardware (BENCH_NOTES round 4).
        layout = os.environ.get("HONERF_FINE_LAYOUT", "piece")
    if stash is None:
        # residual-stash backward (bit-exact; BENCH_NOTES round 5)
        stash = os.environ.get("HONERF_FINE_STASH", "0") == "1"
    rotT, off, _cut = pack_hand_pose(bt_inv, t_pose_21)
    ws, bs = _fine_trunk_weights(params["sdf"], sdf_cfg)
    meta = FineMeta(
        v_multires=sdf_cfg.v_multires, r_multires=sdf_cfg.r_multires,
        d_hidden=sdf_cfg.d_hidden, n_layers=len(sdf_cfg.dims) - 1,
        skip=sdf_cfg.skip_in[0], d_out=sdf_cfg.d_out,
        dtype="bf16" if sdf_cfg.trunk_dtype == "bf16" else "f32",
        with_color=True, c_hidden=color_cfg.d_hidden,
        c_layers=len(color_cfg.dims) - 1,
        grad_L=color_cfg.grad_multires,
        want_dw=not frozen,
        layout=layout,
        stash=stash,
    )
    assert color_cfg.input_width == (
        meta.emb_width + (meta.d_out - 1) + 3 + 6 * meta.grad_L
    ), "color net layout mismatch"
    # color weights: channel-major e gather, then the kernel row map
    # (8-lane grad-PE blocks; junk channels -> appended zero row)
    clayers = list(params["color"]["layers"])
    clayers[0] = _gather_cols(
        clayers[0],
        _cm_index(sdf_cfg.v_multires, sdf_cfg.r_multires, 0,
                  color_cfg.input_width
                  - hand_embedding_width(sdf_cfg.v_multires,
                                         sdf_cfg.r_multires)),
    )
    W0 = linear_weight(clayers[0]).T  # (in_ref, out)
    rows = color_row_map(meta)
    W0_ext = jnp.concatenate(
        [W0, jnp.zeros((1, W0.shape[1]), W0.dtype)], axis=0
    )
    idx = jnp.asarray(np.where(rows < 0, W0.shape[0], rows))
    cws = (W0_ext[idx],) + tuple(
        linear_weight(l).T for l in clayers[1:]
    )
    cbs = tuple(l["b"] for l in clayers)
    sdf, grad, color = hand_fine_color(
        pts, rotT, off, ws, bs, cws, cbs, meta, block, interpret
    )
    return sdf, grad, color
