"""Loss functions for offline training and online pose fitting.

All losses are fixed-shape masked reductions — the reference's boolean
indexing (fitting_single.py:270-281) and KD-tree queries
(renderer_batch.py:318-371) are re-expressed as `where`-masked sums /
brute-force distance argmins, which keep XLA shapes static and run on the
VPU/MXU instead of the host (SURVEY.md §7 step 8).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def masked_l1_color(
    color: jnp.ndarray, true_rgb: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """sum(|(c - rgb) * mask|) / (sum(mask) + 1e-5)
    (reference: exp_runner.py:220-221)."""
    mask_sum = jnp.sum(mask) + 1e-5
    err = (color - true_rgb) * mask
    return jnp.sum(jnp.abs(err)) / mask_sum


def mask_bce(weight_sum: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Binary cross entropy of clipped ray opacity vs the mask
    (reference: exp_runner.py:224)."""
    p = jnp.clip(weight_sum, 1e-3, 1.0 - 1e-3)
    return -jnp.mean(mask * jnp.log(p) + (1.0 - mask) * jnp.log(1.0 - p))


def masked_psnr(
    color: jnp.ndarray, true_rgb: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """PSNR over masked pixels (reference: exp_runner.py:222)."""
    mask_sum = jnp.sum(mask) + 1e-5
    mse = jnp.sum((color - true_rgb) ** 2 * mask) / (mask_sum * 3.0)
    # floor keeps the metric finite when the masked error underflows
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def pose_l2(target: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Mean per-point L2 norm (reference `pose_loss`,
    fitting_single.py:119-122).  Safe sqrt: at iteration 0 the prediction
    can equal the target exactly (identity refinements) and the norm
    gradient at 0 must be 0, not NaN (torch's subgradient convention)."""
    d = target - pred
    return jnp.mean(jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-24))


def contact_loss(sdf_hand: jnp.ndarray, sdf_obj: jnp.ndarray) -> jnp.ndarray:
    """Mean |sdf_h|+|sdf_o| over samples where the sum < 1e-2, as a masked
    reduction (reference boolean-index version: fitting_single.py:270-274)."""
    s = jnp.abs(sdf_hand) + jnp.abs(sdf_obj)
    m = (s < 1e-2).astype(s.dtype)
    return jnp.sum(s * m) / (jnp.sum(m) + 1e-9)


def penetration_loss(sdf_hand: jnp.ndarray, sdf_obj: jnp.ndarray) -> jnp.ndarray:
    """Mean |sdf_h|+|sdf_o| over samples inside BOTH surfaces
    (reference: fitting_single.py:275-281)."""
    m = ((sdf_obj < 0) & (sdf_hand < 0)).astype(sdf_hand.dtype)
    s = (jnp.abs(sdf_hand) + jnp.abs(sdf_obj)) * m
    return jnp.sum(s) / (jnp.sum(m) + 1e-9)


def smooth_loss(
    joints: jnp.ndarray, obj_verts_world: jnp.ndarray
) -> jnp.ndarray:
    """Adjacent-frame joint + object-vertex differences over a frame window
    (reference: fitting_video.py:310-312).

    Args:
        joints: (F, 21, 3); obj_verts_world: (F, V, 3).
    """
    j = pose_l2(joints[1:], joints[:-1])
    v = pose_l2(obj_verts_world[1:], obj_verts_world[:-1])
    return j + v


def nearest_neighbor_dists(
    query: jnp.ndarray, points: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Brute-force nearest neighbors on device: (Q, 3) vs (P, 3) ->
    (dists (Q,), idx (Q,)).  Point counts in the stable loss are tiny
    (object verts ::10, renderer_batch.py:319) so the (Q x P) distance
    matrix is cheap and beats a host KD-tree round trip."""
    d2 = jnp.sum((query[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    idx = jnp.argmin(d2, axis=-1)
    return jnp.sqrt(jnp.take_along_axis(d2, idx[:, None], axis=1))[:, 0], idx


def stable_loss_cross(
    hand_sdf_at_verts: jnp.ndarray,
    verts_local: jnp.ndarray,
    out_weight: float = 0.05,
) -> jnp.ndarray:
    """Cross-frame contact-stability loss, fixed-shape re-expression of the
    reference `get_stable_loss_cross` (utils/renderer_batch.py:318-371).

    For every frame c whose penetration set (hand_sdf < 0) is non-empty:
      * in_err: other frames' sdf at c's in-points, clipped to >= 0
        (those points should stay inside / in contact across frames);
      * out_err: other frames' negative sdf at the nearest out-points of
        c's in-points (those should stay outside), weighted by out_weight.

    The reference normalizes both terms by (in_time - 1) * |in_points_c| and
    averages over contributing frames; `in_time` is the number of frames
    with non-empty penetration sets and the loss is 0 when in_time <= 1.
    Here the data-dependent index sets become soft masks:

    Args:
        hand_sdf_at_verts: (F, V) hand SDF at (downsampled) object verts,
            per frame.
        verts_local: (V, 3) the object-local vert positions (frame-invariant).

    Returns: scalar loss.
    """
    F, V = hand_sdf_at_verts.shape
    in_mask = (hand_sdf_at_verts < 0).astype(hand_sdf_at_verts.dtype)  # (F, V)
    frame_has_in = (jnp.sum(in_mask, axis=1) > 0).astype(in_mask.dtype)  # (F,)
    in_time = jnp.sum(frame_has_in)

    # Pairwise vert distances once; for each frame c and each in-point i of
    # c, the nearest out-point is argmin over j of dist(i, j) masked to
    # out-points of c.
    d2 = jnp.sum(
        (verts_local[:, None, :] - verts_local[None, :, :]) ** 2, axis=-1
    )  # (V, V)

    def per_frame(c_in_mask):
        # c_in_mask: (V,) 1 for in-points of frame c
        n_in = jnp.sum(c_in_mask)
        # in_err: sum over other frames & c's in-points of sdf+ (clip >= 0)
        in_err_all = jnp.sum(
            jnp.clip(hand_sdf_at_verts, 0.0, 1e7) * c_in_mask[None, :]
        )
        # nearest out-point of each in-point: mask distances to out-points
        big = jnp.float32(1e10)
        masked_d2 = jnp.where(c_in_mask[None, :] > 0, big, d2)  # (V, V)
        nearest_out = jnp.argmin(masked_d2, axis=1)  # (V,) per potential in-pt
        # unique-ify like the reference (np.unique) via a scatter-max mask
        is_near_out = jnp.zeros((V,)).at[nearest_out].max(c_in_mask)
        out_err_all = jnp.sum(
            jnp.abs(jnp.clip(hand_sdf_at_verts, -1e7, 0.0)) * is_near_out[None, :]
        )
        denom = jnp.maximum(in_time - 1.0, 1.0) * jnp.maximum(n_in, 1.0)
        return (in_err_all + out_weight * out_err_all) / denom

    per = jax.vmap(per_frame)(in_mask)  # (F,)
    total = jnp.sum(per * frame_has_in) / jnp.maximum(in_time, 1.0)
    return jnp.where(in_time > 1, total, 0.0)
