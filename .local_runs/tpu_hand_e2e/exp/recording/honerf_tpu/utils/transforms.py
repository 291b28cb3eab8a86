"""Rotation / SE(3) helpers in pure JAX.

Replaces the reference's torch helpers (reference: utils/utils.py:11-29 for
rot6d, halo_util/utils.py for homogeneous helpers) with jit/vmap-friendly
equivalents.
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_len(v: jnp.ndarray, axis: int = -1, keepdims: bool = False) -> jnp.ndarray:
    """Euclidean length with a finite gradient at v == 0 (jnp.linalg.norm
    backprops NaN there; torch's subgradient convention returns 0, which is
    what the reference silently relies on in its degenerate configs)."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims) + 1e-24)


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalize along `axis` (torch.nn.functional.normalize semantics:
    divides by max(norm, eps))."""
    n = _safe_len(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def rot6d_to_matrix(rot_6d: jnp.ndarray) -> jnp.ndarray:
    """Convert 6D rotation representation to 3x3 rotation matrices.

    Zhou et al., "On the Continuity of Rotation Representations in Neural
    Networks", CVPR 2019.  Matches the reference semantics
    (utils/utils.py:11-29): input is reshaped to (..., 3, 2); the two columns
    are Gram-Schmidt orthonormalized and stacked as matrix columns.

    Args:
        rot_6d: (..., 6) or (..., 3, 2).

    Returns:
        (..., 3, 3) rotation matrices.
    """
    r = rot_6d.reshape(rot_6d.shape[:-1] + (3, 2)) if rot_6d.shape[-1] == 6 else rot_6d
    a1 = r[..., :, 0]
    a2 = r[..., :, 1]
    b1 = normalize(a1)
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = normalize(a2 - dot * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-1)


def xyz_to_xyz1(xyz: jnp.ndarray) -> jnp.ndarray:
    """Append homogeneous 1 (reference: halo_util/utils.py:7-11)."""
    ones = jnp.ones(xyz.shape[:-1] + (1,), dtype=xyz.dtype)
    return jnp.concatenate([xyz, ones], axis=-1)


def pad34_to_44(mat: jnp.ndarray) -> jnp.ndarray:
    """Pad (..., 3, 4) transforms to (..., 4, 4)
    (reference: halo_util/utils.py:13-15)."""
    last_row = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=mat.dtype), mat.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([mat, last_row], axis=-2)


def rodrigues(angles: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle to rotation matrix via the Rodrigues formula.

    Matches the reference `rotation_matrix`
    (halo_util/converter_fit_batch.py:280-309): the axis is normalized first.

    Args:
        angles: (...,) or (..., 1) rotation angles in radians.
        axis:   (..., 3) rotation axes (need not be unit length).

    Returns:
        (..., 3, 3) rotation matrices.
    """
    if angles.ndim == axis.ndim:  # (..., 1) -> (...,)
        angles = angles[..., 0]
    a = normalize(axis)
    sina = jnp.sin(angles)[..., None, None]
    cosa_1m = (1.0 - jnp.cos(angles))[..., None, None]
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    zeros = jnp.zeros_like(a0)
    # Cross-product (skew-symmetric) matrix of the axis.
    cprod = jnp.stack(
        [
            jnp.stack([zeros, -a2, a1], axis=-1),
            jnp.stack([a2, zeros, -a0], axis=-1),
            jnp.stack([-a1, a0, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=a.dtype)
    return eye + cprod * sina + (cprod @ cprod) * cosa_1m


def rotate_axis_angle(v: jnp.ndarray, k: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors `v` around unit axes `k` by `theta` (Rodrigues form on
    vectors; reference: halo_util/converter_fit_batch.py:34-40 and :323-338).

    `theta` broadcasts against the leading dims of v/k with a trailing 1 dim.
    """
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    dot = jnp.sum(k * v, axis=-1, keepdims=True)
    return v * cos_t + jnp.cross(k, v) * sin_t + k * dot * (1.0 - cos_t)


def angle_between(v1: jnp.ndarray, v2: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Numerically stable unsigned angle between vectors
    (reference `angle2`, halo_util/converter_fit_batch.py:62-74)."""
    n1 = v1 / jnp.maximum(_safe_len(v1, keepdims=True), eps)
    n2 = v2 / jnp.maximum(_safe_len(v2, keepdims=True), eps)
    return 2.0 * jnp.arctan2(_safe_len(n1 - n2), _safe_len(n1 + n2))


def signed_angle(v1: jnp.ndarray, v2: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Signed angle of v1 w.r.t. v2; positive when v1 x v2 points along `ref`
    (reference: halo_util/converter_fit_batch.py:76-92)."""
    ang = angle_between(v1, v2)
    cross_12 = jnp.cross(v1, v2)
    cond = (jnp.sum(ref * cross_12, axis=-1) < 0).astype(ang.dtype)
    return cond * (-ang) + (1.0 - cond) * ang


def alignment_matrix(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Rotation R with R@v1 parallel to v2
    (reference `get_alignment_mat`, halo_util/converter_fit_batch.py:94-101)."""
    axis = normalize(jnp.cross(v1, v2), eps=1e-8)
    ang = angle_between(v1, v2)
    return rodrigues(ang, axis)
