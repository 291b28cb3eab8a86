"""Dual-volume (hand + object) renderer for the online fitting stage.

Replaces `NeuSRenderer_fitting` (utils/renderer.py:286-572 and its
[frames, pixels]-batched variant utils/renderer_batch.py:41-313) with one
jittable function: per-model hierarchical importance sampling on separate
z-ladders, a merged sorted 192-sample union, per-model sdf->alpha, and
occlusion-aware compositing final_alpha = (1-ah+1e-7)(1-ao+1e-7) with
transmittance seeded at ones (the fitting renderers' convention,
utils/renderer.py:512-520).

The frame/view-batched use is this same function under `jax.vmap` — the
hand-written batched renderer file of the reference collapses into a
transform (SURVEY.md §7 step 7).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from honerf_tpu.render.neus import (
    Field,
    RenderConfig,
    coarse_z_vals,
    safe_norm,
    sdf_to_alpha,
)
from honerf_tpu.render.sampling import (
    merge_sorted,
    merge_z_vals,
    neus_upsample_weights,
    sample_pdf_det,
)


def dual_hierarchical_z_vals(
    hand_field: Field,
    obj_field: Field,
    rays_o_hand: jnp.ndarray,
    rays_d_hand: jnp.ndarray,
    rays_o_obj: jnp.ndarray,
    rays_d_obj: jnp.ndarray,
    z_init: jnp.ndarray,
    rcfg: RenderConfig,
) -> jnp.ndarray:
    """Interleaved per-model importance sampling (utils/renderer.py:460-498):
    each model refines its own z ladder; every new batch of samples also
    joins the shared union.  Returns the union sorted:
    (R, n_samples + 2 * n_importance)."""
    n_per_step = rcfg.n_importance // rcfg.up_sample_steps

    def eval_sdf(field, o, d, z):
        pts = o[:, None, :] + d[:, None, :] * z[..., None]
        return field.sdf_fn(pts.reshape(-1, 3)).reshape(z.shape)

    z_hand = z_obj = z_union = z_init
    sdf_hand = eval_sdf(hand_field, rays_o_hand, rays_d_hand, z_init)
    sdf_obj = eval_sdf(obj_field, rays_o_obj, rays_d_obj, z_init)
    for i in range(rcfg.up_sample_steps):
        inv_s = 64.0 * 2**i
        last = i + 1 == rcfg.up_sample_steps
        w_h = neus_upsample_weights(z_hand, sdf_hand, inv_s)
        new_h = sample_pdf_det(z_hand, w_h, n_per_step)
        new_sdf_h = (
            None if last else eval_sdf(hand_field, rays_o_hand, rays_d_hand, new_h)
        )
        z_hand, sdf_hand = merge_z_vals(z_hand, new_h, sdf_hand, new_sdf_h)

        w_o = neus_upsample_weights(z_obj, sdf_obj, inv_s)
        new_o = sample_pdf_det(z_obj, w_o, n_per_step)
        new_sdf_o = (
            None if last else eval_sdf(obj_field, rays_o_obj, rays_d_obj, new_o)
        )
        z_obj, sdf_obj = merge_z_vals(z_obj, new_o, sdf_obj, new_sdf_o)

        # union stays sorted by merging (bitonic merge network, not a
        # generic sort): new_h/new_o are each monotone inverse-CDF draws
        new_ho, _ = merge_sorted(new_h, new_o)
        z_union, _ = merge_sorted(z_union, new_ho)
    return jax.lax.stop_gradient(z_union)


def render_dual(
    hand_field: Field,
    obj_field: Field,
    rcfg: RenderConfig,
    key,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    rays_o_obj: jnp.ndarray,
    rays_d_obj: jnp.ndarray,
    near: float,
    far: float,
) -> Dict[str, jnp.ndarray]:
    """Render hand + object volumes along shared rays.

    Args:
        rays_o/rays_d: (R, 3) world-frame rays (the hand lives in world).
        rays_o_obj/rays_d_obj: (R, 3) the same rays in the object frame
            (`rays_to_object_frame` with the CURRENT pose estimate — pose
            gradients flow through this transformation).

    Returns dict with color_fine (R,3), weight_sum (R,1), per-sample
    sdf_hand/sdf_obj ((R*S,1)), gradient errors and per-sample gradients —
    the quantities the interaction losses consume
    (fitting_single.py:267-282).
    """
    n_rays = rays_o.shape[0]
    sample_dist = (far - near) / rcfg.n_samples
    z0 = coarse_z_vals(key, n_rays, rcfg, near, far)
    if rcfg.n_importance > 0:
        z_vals = dual_hierarchical_z_vals(
            hand_field,
            obj_field,
            jax.lax.stop_gradient(rays_o),
            jax.lax.stop_gradient(rays_d),
            jax.lax.stop_gradient(rays_o_obj),
            jax.lax.stop_gradient(rays_d_obj),
            z0,
            rcfg,
        )
    else:
        z_vals = z0
    n_samples = z_vals.shape[-1]

    dists = jnp.diff(z_vals, axis=-1)
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], sample_dist)], axis=-1
    )
    mid_z = z_vals + dists * 0.5
    dists_flat = dists.reshape(-1)

    def model_pass(field: Field, o, d):
        pts = (o[:, None, :] + d[:, None, :] * mid_z[..., None]).reshape(-1, 3)
        dirs = jnp.broadcast_to(d[:, None, :], (n_rays, n_samples, 3)).reshape(-1, 3)
        sdf, grad, color = field.full_fn(pts, dirs)
        alpha, _ = sdf_to_alpha(sdf, grad, dirs, dists_flat, field.inv_s)
        g_err = jnp.mean(
            (safe_norm(grad.reshape(n_rays, n_samples, 3)) - 1.0) ** 2
        )
        return (
            alpha.reshape(n_rays, n_samples),
            color.reshape(n_rays, n_samples, 3),
            sdf,
            g_err,
            grad,
        )

    alpha_h, color_h, sdf_h, gerr_h, grad_h = model_pass(hand_field, rays_o, rays_d)
    alpha_o, color_o, sdf_o, gerr_o, grad_o = model_pass(
        obj_field, rays_o_obj, rays_d_obj
    )

    final_alpha = (1.0 - alpha_h + 1e-7) * (1.0 - alpha_o + 1e-7)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((n_rays, 1)), final_alpha], axis=-1), axis=-1
    )[:, :-1]
    weights_h = alpha_h * trans
    weights_o = alpha_o * trans
    color = jnp.sum(color_h * weights_h[..., None], axis=1) + jnp.sum(
        color_o * weights_o[..., None], axis=1
    )
    weight_sum = jnp.sum(weights_h, -1, keepdims=True) + jnp.sum(
        weights_o, -1, keepdims=True
    )

    return {
        "color_fine": color,
        "weight_sum": weight_sum,
        "sdf_hand": sdf_h[:, None],
        "sdf_obj": sdf_o[:, None],
        "gradient_error_hand": gerr_h,
        "gradient_error_obj": gerr_o,
        "gradient_hand": grad_h,
        "gradient_obj": grad_o,
    }
