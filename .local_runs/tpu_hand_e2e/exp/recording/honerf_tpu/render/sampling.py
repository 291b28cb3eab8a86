"""Hierarchical SDF-guided ray sampling.

TPU-native re-design of the reference's importance sampling
(utils/renderer.py:10-105): all shapes are static (the reference already
uses fixed 64/16 sample counts, ideal for XLA), `searchsorted` is replaced
by a vectorized rank computation (a (n_new x n_bins) comparison per ray —
tiny, fully parallel, no gather-heavy CDF inversion), and sorting uses
`jnp.sort`/`take_along_axis`.

The whole up-sampling phase runs under `stop_gradient`, matching the
reference's `torch.no_grad()` region (utils/renderer.py:214-236).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pdf_det(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Deterministic inverse-CDF sampling (reference `sample_pdf` with
    det=True, utils/renderer.py:10-37).

    Args:
        bins: (R, S) sorted sample positions (z values).
        weights: (R, S-1) per-interval weights.
        n_samples: number of new samples per ray.

    Returns:
        (R, n_samples) new z values.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (R, S)
    u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
    u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))

    # searchsorted(right=True): count of cdf entries <= u.  (R, n, S) bool
    # contraction — small static shapes, VPU-friendly, no dynamic gather.
    inds = jnp.sum(cdf[..., None, :] <= u[..., :, None], axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)
    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=-1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=-1)
    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def neus_upsample_weights(
    z_vals: jnp.ndarray, sdf: jnp.ndarray, inv_s: float
) -> jnp.ndarray:
    """Interval weights for SDF-guided up-sampling at a fixed inv_s
    (reference `up_sample`, utils/renderer.py:60-86).

    Args:
        z_vals: (R, S); sdf: (R, S); inv_s: scalar (64 * 2^step).

    Returns:
        (R, S-1) weights.
    """
    prev_sdf, next_sdf = sdf[..., :-1], sdf[..., 1:]
    prev_z, next_z = z_vals[..., :-1], z_vals[..., 1:]
    mid_sdf = 0.5 * (prev_sdf + next_sdf)
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
    prev_cos = jnp.concatenate(
        [jnp.zeros_like(cos_val[..., :1]), cos_val[..., :-1]], axis=-1
    )
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0)
    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1,
    )[..., :-1]
    return alpha * trans


def merge_z_vals(
    z_vals: jnp.ndarray,
    new_z_vals: jnp.ndarray,
    sdf: jnp.ndarray,
    new_sdf: jnp.ndarray | None,
):
    """Sorted merge of existing and new z values, carrying sdf along
    (reference `cat_z_vals`, utils/renderer.py:88-105).

    If new_sdf is None (the `last` step) only z is merged and sdf is
    returned as None.
    """
    z_cat = jnp.concatenate([z_vals, new_z_vals], axis=-1)
    order = jnp.argsort(z_cat, axis=-1)
    z_sorted = jnp.take_along_axis(z_cat, order, axis=-1)
    if new_sdf is None:
        return z_sorted, None
    sdf_cat = jnp.concatenate([sdf, new_sdf], axis=-1)
    sdf_sorted = jnp.take_along_axis(sdf_cat, order, axis=-1)
    return z_sorted, sdf_sorted


def hierarchical_z_vals(
    sdf_fn,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    n_importance: int,
    up_sample_steps: int,
    base_inv_s: float = 64.0,
) -> jnp.ndarray:
    """Run `up_sample_steps` rounds of SDF-guided importance sampling,
    growing z_vals from S to S + n_importance (reference:
    utils/renderer.py:214-236).  Non-differentiable (stop_gradient), shapes
    static per step so XLA compiles one fused program.

    Args:
        sdf_fn: (N, 3) -> (N,) sdf values (already closed over params/pose).
        z_vals: (R, S) initial stratified samples.

    Returns:
        (R, S + n_importance) sorted z values.
    """
    n_per_step = n_importance // up_sample_steps
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    sdf = sdf_fn(pts.reshape(-1, 3)).reshape(z_vals.shape)
    for i in range(up_sample_steps):
        weights = neus_upsample_weights(z_vals, sdf, base_inv_s * 2**i)
        new_z = sample_pdf_det(z_vals, weights, n_per_step)
        last = i + 1 == up_sample_steps
        if not last:
            new_pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z[..., None]
            new_sdf = sdf_fn(new_pts.reshape(-1, 3)).reshape(new_z.shape)
        else:
            new_sdf = None
        z_vals, sdf = merge_z_vals(z_vals, new_z, sdf, new_sdf)
    return jax.lax.stop_gradient(z_vals)
