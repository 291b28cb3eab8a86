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
    """Full hand-SDF input feature (utils/fields.py:140-148).

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
