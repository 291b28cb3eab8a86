"""Positional encodings and the per-bone hand embedding.

TPU notes: everything here is elementwise / small matmul work that XLA fuses
into the surrounding MLP; shapes are static.

Reference parity:
  * `positional_encoding` == `Embedding.forward` (utils/fields.py:8-20):
    frequencies 2^k, per input channel the layout is
    [sin(f0 x) .. sin(fL-1 x), cos(f0 x) .. cos(fL-1 x)].
  * `anerf_bone_embedding` == `anerf_emb_point` (utils/fields.py:22-36):
    per-bone inverse transform, distance v, direction r, cutoff gate
    h = 1 - sigmoid(200 (v - cutoff)).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import sigmoid

# Per-bone cutoff distances (meters), MANO joint order
# (utils/fields.py:24).
BONE_CUTOFFS = jnp.asarray(
    [0.08, 0.03, 0.03, 0.02, 0.02, 0.03, 0.02, 0.02, 0.02, 0.03, 0.02,
     0.02, 0.02, 0.03, 0.02, 0.02, 0.02, 0.03, 0.02, 0.02, 0.02]
)

CUTOFF_TAU = 200.0


def positional_encoding(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """NeRF sin/cos encoding.

    Args:
        x: (..., N) inputs.
        n_freqs: L; frequencies are 2^0 .. 2^(L-1).

    Returns:
        (..., N * 2 * L) with per-channel [sinL.., cosL..] layout.
    """
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)
    spectrum = x[..., None] * freqs  # (..., N, L)
    enc = jnp.stack([jnp.sin(spectrum), jnp.cos(spectrum)], axis=-2)  # (..., N, 2, L)
    return enc.reshape(*x.shape[:-1], x.shape[-1] * 2 * n_freqs)


def anerf_bone_embedding(
    pts: jnp.ndarray, bt_inv: jnp.ndarray, t_pose_21: jnp.ndarray
):
    """Per-bone distance/direction/cutoff embedding of query points.

    Args:
        pts: (..., 3) world-space query points.
        bt_inv: (21, 4, 4) inverse bone transforms (world -> T-pose space).
        t_pose_21: (21, 3) T-pose joint locations.

    Returns:
        v: (..., 21, 1) distance to each T-pose joint after transform.
        r: (..., 21, 3) unit direction.
        h: (..., 21, 1) cutoff window gate.
    """
    rot = bt_inv[:, :3, :3]  # (21, 3, 3)
    trans = bt_inv[:, :3, 3]  # (21, 3)
    # q[..., j, :] = rot[j] @ pts + trans[j] - t_pose[j]
    q = jnp.einsum("jab,...b->...ja", rot, pts) + trans - t_pose_21
    # safe length: finite gradient for a query exactly at a joint
    v = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
    r = q / v
    h = 1.0 - sigmoid(CUTOFF_TAU * (v - BONE_CUTOFFS[:, None]))
    return v, r, h


def hand_embedding_width(v_multires: int, r_multires: int) -> int:
    """MLP input width of the flattened hand embedding
    (utils/fields.py:84-87): per bone (1 + 2*v_L) + (3 + 6*r_L), x21 bones."""
    return 21 * ((1 + 2 * v_multires) + (3 + 2 * 3 * r_multires))


def hand_embedding(
    pts: jnp.ndarray,
    bt_inv: jnp.ndarray,
    t_pose_21: jnp.ndarray,
    v_multires: int,
    r_multires: int,
):
    """Full hand-SDF input feature (utils/fields.py:140-148), reference
    bone-major channel order.

    Returns:
        xyz_feature: (..., 21*(1+2vL+3+6rL)) gated, flattened embedding.
        r: (..., 21, 3); h: (..., 21, 1) — passed to the color net.
    """
    v, r, h = anerf_bone_embedding(pts, bt_inv, t_pose_21)
    v_emb = jnp.concatenate([v, positional_encoding(v, v_multires)], axis=-1)
    r_emb = jnp.concatenate([r, positional_encoding(r, r_multires)], axis=-1)
    feat = jnp.concatenate([v_emb, r_emb], axis=-1) * h
    xyz_feature = feat.reshape(*feat.shape[:-2], -1)
    return xyz_feature, r, h


def channel_major_dest(v_multires: int, r_multires: int):
    """dest[i] = bone-major column index of channel-major column i.

    The flat build (`hand_embedding_flat`) emits channels grouped by TYPE
    (all bones' v, then all bones' sin(v f_l) per frequency, ...), not by
    BONE like the reference.  Weight columns of any layer consuming the
    embedding are gathered with this map so stored checkpoints stay in the
    reference bone-major layout."""
    import numpy as np

    vL, rL = v_multires, r_multires
    per_bone = 1 + 2 * vL + 3 + 6 * rL
    dest = []
    for b in range(21):
        dest.append(b * per_bone)  # v
    for trig in range(2):  # sin then cos
        for l in range(vL):
            for b in range(21):
                dest.append(b * per_bone + 1 + trig * vL + l)
    for b in range(21):
        for c in range(3):
            dest.append(b * per_bone + 1 + 2 * vL + c)  # r
    for trig in range(2):
        for l in range(rL):
            for b in range(21):
                for c in range(3):
                    dest.append(
                        b * per_bone + 1 + 2 * vL + 3 + c * 2 * rL
                        + trig * rL + l
                    )
    return np.asarray(dest)


def hand_embedding_flat(
    pts: jnp.ndarray,
    bt_inv: jnp.ndarray,
    t_pose_21: jnp.ndarray,
    v_multires: int,
    r_multires: int,
):
    """Channel-major flat build of the hand embedding — the TPU fast path.

    Numerically identical to `hand_embedding` up to channel ORDER (see
    `channel_major_dest`).  The bone-major build materializes
    (..., 21, 66)-shaped intermediates whose 66-wide minor dim is padded
    to 128 by the TPU tiled layout (~2x HBM traffic per pass) and whose
    final flatten is a relayout copy; building flat 2-D pieces and
    concatenating once keeps everything in one fused kernel (measured
    2.2x faster on the fwd+bwd training path on v5e).

    Returns (feat_cm (..., 21*(1+2vL+3+6rL)), r (..., 21, 3), h (..., 21, 1)).
    """
    vL, rL = v_multires, r_multires
    rot = bt_inv[:, :3, :3]
    trans = bt_inv[:, :3, 3]
    q = jnp.einsum("jab,...b->...ja", rot, pts) + trans - t_pose_21
    v2 = jnp.sum(q * q, axis=-1) + 1e-24  # (..., 21)
    v = jnp.sqrt(v2)
    r = q / v[..., None]
    h = 1.0 - sigmoid(CUTOFF_TAU * (v - BONE_CUTOFFS))  # (..., 21)
    r63 = r.reshape(*v.shape[:-1], 63)
    h3 = jnp.repeat(h, 3, axis=-1)  # gate per r channel (..., 63)
    pieces = [v * h]
    for l in range(vL):
        pieces.append(jnp.sin(v * (2.0 ** l)) * h)
    for l in range(vL):
        pieces.append(jnp.cos(v * (2.0 ** l)) * h)
    pieces.append(r63 * h3)
    for l in range(rL):
        pieces.append(jnp.sin(r63 * (2.0 ** l)) * h3)
    for l in range(rL):
        pieces.append(jnp.cos(r63 * (2.0 ** l)) * h3)
    feat = jnp.concatenate(pieces, axis=-1)
    return feat, r, h[..., None]
