"""Loss functions for offline training and online pose fitting.

All losses are fixed-shape masked reductions — the reference's boolean
indexing (fitting_single.py:270-281) and KD-tree queries
(renderer_batch.py:318-371) are re-expressed as `where`-masked sums /
brute-force distance argmins, which keep XLA shapes static and run on the
VPU/MXU instead of the host (SURVEY.md §7 step 8).
"""

from __future__ import annotations

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


def stable_loss_cross(
    hand_sdf_at_verts: jnp.ndarray,
    verts_local: jnp.ndarray,
    out_weight: float = 0.05,
) -> jnp.ndarray:
    """Cross-frame contact-stability loss, fixed-shape re-expression of the
    reference `get_stable_loss_cross` (utils/renderer_batch.py:318-371).

    For every frame c whose penetration set (hand_sdf < 0) is non-empty:
      * in_err: contributing frames' sdf at c's in-points, clipped to >= 0
        (those points should stay inside / in contact across frames);
      * out_err: contributing frames' negative sdf at the nearest "out"
        candidates of c's in-points, weighted by out_weight.

    Parity notes (oracle-verified against the torch implementation):
      * Only frames with a non-empty penetration set contribute ROWS to
        both error sums — `hand_sdf_list` is stacked from those frames
        alone (renderer_batch.py:329-341); non-contact frames are fully
        excluded, not just excluded from the outer average.
      * The reference computes
        `cur_out_id = np.setdiff1d(range(V), bool_mask)`
        (renderer_batch.py:347): setdiff1d treats the boolean mask as
        VALUES {0, 1}, so the "out" candidate set is every vert id except
        0 and 1 (id 0 stays when the frame is fully penetrating, because
        the mask then holds only value 1).  The nearest "out" candidate of
        an in-point with id >= 2 is therefore itself, and out_err mostly
        penalizes |negative sdf| at the in-points across contributing
        frames (pulling contact points toward sdf ~ 0).  We reproduce this
        exactly rather than the presumably-intended complement set.
      * Both terms are normalized by (in_time - 1) * |in_points_c|, the
        per-frame contributions are summed and divided by in_time, and the
        loss is 0 when in_time <= 1 (renderer_batch.py:342-369).

    Args:
        hand_sdf_at_verts: (F, V) hand SDF at (downsampled) object verts,
            per frame.
        verts_local: (V, 3) the object-local vert positions (frame-invariant).

    Returns: scalar loss.
    """
    F, V = hand_sdf_at_verts.shape
    dt = hand_sdf_at_verts.dtype
    in_mask = (hand_sdf_at_verts < 0).astype(dt)  # (F, V)
    frame_has_in = (jnp.sum(in_mask, axis=1) > 0).astype(dt)  # (F,)
    in_time = jnp.sum(frame_has_in)

    # Row-masked positive/negative parts: only contributing frames' rows
    # enter the in/out error sums (parity note 1).
    sdf_pos = jnp.clip(hand_sdf_at_verts, 0.0, 1e7) * frame_has_in[:, None]
    sdf_neg = (
        jnp.abs(jnp.clip(hand_sdf_at_verts, -1e7, 0.0)) * frame_has_in[:, None]
    )

    # Pairwise vert distances once; nearest "out" candidate per vert is an
    # argmin over the quirk-restricted candidate set (parity note 2).
    d2 = jnp.sum(
        (verts_local[:, None, :] - verts_local[None, :, :]) ** 2, axis=-1
    )  # (V, V)
    vid = jnp.arange(V)

    def per_frame(c_in_mask):
        # c_in_mask: (V,) 1 for in-points of frame c
        n_in = jnp.sum(c_in_mask)
        in_err = jnp.sum(sdf_pos * c_in_mask[None, :])
        # setdiff1d-on-bool quirk: candidates are all ids except {0, 1};
        # id 0 remains a candidate iff the frame is fully penetrating.
        fully_in = n_in >= V
        out_ok = (vid != 1) & ((vid != 0) | fully_in)  # (V,)
        big = jnp.asarray(1e10, d2.dtype)
        masked_d2 = jnp.where(out_ok[None, :], d2, big)  # (V, V)
        nearest_out = jnp.argmin(masked_d2, axis=1)  # (V,) global vert ids
        # unique-ify like the reference (np.unique) via a scatter-max mask,
        # scattering only from actual in-points.
        is_near_out = jnp.zeros((V,), dt).at[nearest_out].max(c_in_mask)
        out_err = jnp.sum(sdf_neg * is_near_out[None, :])
        denom = jnp.maximum(in_time - 1.0, 1.0) * jnp.maximum(n_in, 1.0)
        return (in_err + out_weight * out_err) / denom

    per = jax.vmap(per_frame)(in_mask)  # (F,)
    total = jnp.sum(per * frame_has_in) / jnp.maximum(in_time, 1.0)
    return jnp.where(in_time > 1, total, 0.0)
