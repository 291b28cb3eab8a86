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


def _bitonic_merge(z: jnp.ndarray, carry: jnp.ndarray | None):
    """Sort a BITONIC last axis (length L = power of two) with the
    classic log2(L)-stage compare-exchange butterfly, optionally moving a
    carry array (sdf) along with its z.  Pure elementwise min/max/select
    — XLA fuses the whole network into one kernel, unlike the generic
    multi-operand sort that `argsort` + `take_along_axis` lowers to
    (measured 2.7 ms/step of the 24 ms offline hand step)."""
    L = z.shape[-1]
    assert L & (L - 1) == 0, "bitonic length must be a power of two"
    lane = jnp.arange(L)
    d = L // 2
    while d >= 1:
        shp = z.shape[:-1] + (L // (2 * d), 2, d)
        pz = z.reshape(shp)[..., ::-1, :].reshape(z.shape)  # z[i ^ d]
        upper = (lane & d).astype(bool)
        if carry is not None:
            pc = carry.reshape(shp)[..., ::-1, :].reshape(carry.shape)
            # each lane keeps its own (z, carry) PAIR or takes the
            # partner's; ties keep own on both sides (no swap)
            keep = jnp.where(upper, z >= pz, z <= pz)
            carry = jnp.where(keep, carry, pc)
        z = jnp.where(upper, jnp.maximum(z, pz), jnp.minimum(z, pz))
        d //= 2
    return z, carry


def _debug_check_sorted(name: str, z) -> None:
    """HONERF_DEBUG_SORTED=1: assert a CONCRETE input is per-ray
    non-decreasing (ADVICE r3 — the bitonic merge silently mis-orders
    unsorted inputs, unlike the argsort it replaced).  Tracers are
    skipped; tests exercise the eager path."""
    import os

    if not os.environ.get("HONERF_DEBUG_SORTED"):
        return
    if isinstance(z, jax.core.Tracer):
        return
    import numpy as np

    zn = np.asarray(z)
    if not (np.diff(zn, axis=-1) >= 0).all():
        raise ValueError(
            f"merge_sorted precondition violated: `{name}` is not "
            "per-ray non-decreasing on the last axis"
        )


def merge_sorted(
    z_a: jnp.ndarray,
    z_b: jnp.ndarray,
    sdf_a: jnp.ndarray | None = None,
    sdf_b: jnp.ndarray | None = None,
):
    """Merge two per-ray SORTED z arrays (last axis ascending), carrying
    sdf along.  concat(A ascending, +inf pad, B descending) is bitonic,
    so a log2-stage butterfly sorts it — the pads land at the tail and
    are sliced off.

    PRECONDITION: both z_a and z_b must already be non-decreasing along
    the last axis (unlike the argsort-based merge this replaced, which
    tolerated arbitrary order).  Callers satisfy it by construction:
    z_vals stays sorted by ladder invariant and new z comes from the
    monotone inverse CDF of sample_pdf_det.  Violations produce
    mis-ordered output with NO error — set HONERF_DEBUG_SORTED=1 to
    check concrete inputs (ADVICE r3)."""
    _debug_check_sorted("z_a", z_a)
    _debug_check_sorted("z_b", z_b)
    S, n = z_a.shape[-1], z_b.shape[-1]
    total = S + n
    L = 1 << (total - 1).bit_length()
    pad_shape = z_a.shape[:-1] + (L - total,)
    z = jnp.concatenate(
        [z_a, jnp.full(pad_shape, jnp.inf, z_a.dtype), z_b[..., ::-1]],
        axis=-1,
    )
    carry = None
    if sdf_a is not None:
        carry = jnp.concatenate(
            [sdf_a, jnp.zeros(pad_shape, sdf_a.dtype), sdf_b[..., ::-1]],
            axis=-1,
        )
    z, carry = _bitonic_merge(z, carry)
    z = z[..., :total]
    return z, (None if carry is None else carry[..., :total])


def merge_z_vals(
    z_vals: jnp.ndarray,
    new_z_vals: jnp.ndarray,
    sdf: jnp.ndarray,
    new_sdf: jnp.ndarray | None,
):
    """Sorted merge of existing and new z values, carrying sdf along
    (reference `cat_z_vals`, utils/renderer.py:88-105).

    Both inputs are per-ray sorted (z_vals by invariant, new_z from the
    monotone inverse-CDF of sample_pdf_det), so this is a bitonic MERGE,
    not a sort.  If new_sdf is None (the `last` step) only z is merged
    and sdf is returned as None.
    """
    if new_sdf is None:
        z_sorted, _ = merge_sorted(z_vals, new_z_vals)
        return z_sorted, None
    return merge_sorted(z_vals, new_z_vals, sdf, new_sdf)


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
