"""Sampling tests: inverse-CDF determinism vs the torch reference algorithm,
up-sample weight placement, sorted merges (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honerf_tpu.render import (
    hierarchical_z_vals,
    merge_z_vals,
    neus_upsample_weights,
    sample_pdf_det,
)


def torch_sample_pdf_det(bins, weights, n_samples):
    """Independent torch oracle implementing the NeRF inverse-CDF sampler
    (same algorithm as utils/renderer.py:10-37, det=True)."""
    import torch

    bins = torch.from_numpy(bins)
    weights = torch.from_numpy(weights) + 1e-5
    pdf = weights / torch.sum(weights, -1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, steps=n_samples)
    u = u.expand(list(cdf.shape[:-1]) + [n_samples]).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    cdf_g0 = torch.gather(cdf, 1, below)
    cdf_g1 = torch.gather(cdf, 1, above)
    bins_g0 = torch.gather(bins, 1, below)
    bins_g1 = torch.gather(bins, 1, above)
    denom = cdf_g1 - cdf_g0
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    return (bins_g0 + t * (bins_g1 - bins_g0)).numpy()


def test_sample_pdf_matches_torch_oracle(rng):
    R, S, n = 8, 64, 16
    bins = np.sort(rng.uniform(0.4, 1.5, size=(R, S)).astype(np.float32), axis=-1)
    weights = rng.uniform(0, 1, size=(R, S - 1)).astype(np.float32)
    want = torch_sample_pdf_det(bins, weights, n)
    got = np.asarray(sample_pdf_det(jnp.asarray(bins), jnp.asarray(weights), n))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample_pdf_concentrates_on_heavy_interval():
    z = jnp.linspace(0.0, 1.0, 11)[None, :]
    w = jnp.zeros((1, 10)).at[0, 5].set(1.0)  # all mass in [0.5, 0.6]
    s = np.asarray(sample_pdf_det(z, w, 8))[0]
    assert (s > 0.45).all() and (s < 0.65).all()


def test_upsample_weights_peak_near_surface():
    # sdf crosses zero at z=1.0 on a linear ramp
    z = jnp.linspace(0.4, 1.5, 64)[None, :]
    sdf = 1.0 - z
    w = np.asarray(neus_upsample_weights(z, sdf, 64.0))[0]
    zmid = np.asarray(0.5 * (z[0, :-1] + z[0, 1:]))
    peak_z = zmid[np.argmax(w)]
    assert abs(peak_z - 1.0) < 0.1


def test_merge_z_vals_sorted_and_carries_sdf(rng):
    # both inputs per-ray sorted — the real call contract (z_vals by
    # invariant, new_z from the monotone inverse-CDF of sample_pdf_det)
    z = jnp.sort(jnp.asarray(rng.uniform(0, 1, size=(3, 8)).astype(np.float32)), -1)
    new_z = jnp.sort(
        jnp.asarray(rng.uniform(0, 1, size=(3, 4)).astype(np.float32)), -1)
    sdf = z * 2.0  # recognizable mapping z -> sdf
    new_sdf = new_z * 2.0
    z_m, sdf_m = merge_z_vals(z, new_z, sdf, new_sdf)
    assert z_m.shape == (3, 12)
    np.testing.assert_allclose(np.asarray(z_m), np.sort(np.asarray(z_m), -1))
    np.testing.assert_allclose(np.asarray(sdf_m), np.asarray(z_m) * 2.0, atol=1e-6)


def test_merge_sorted_matches_np_all_ladder_widths(rng):
    """The bitonic merge == np.sort(concat) exactly at every width the
    ladder uses (64+16, 80+16, 96+16, 112+16), plus non-pow2 odd sizes,
    with the sdf carry staying paired to its z."""
    from honerf_tpu.render.sampling import merge_sorted

    for S, n in [(64, 16), (80, 16), (96, 16), (112, 16), (5, 3),
                 (16, 16), (1, 7)]:
        z_a = np.sort(rng.uniform(0, 1, size=(4, S)).astype(np.float32), -1)
        z_b = np.sort(rng.uniform(0, 1, size=(4, n)).astype(np.float32), -1)
        sdf_a = z_a * 3.0 + 1.0
        sdf_b = z_b * 3.0 + 1.0
        z_m, sdf_m = merge_sorted(jnp.asarray(z_a), jnp.asarray(z_b),
                                  jnp.asarray(sdf_a), jnp.asarray(sdf_b))
        want = np.sort(np.concatenate([z_a, z_b], -1), -1)
        np.testing.assert_array_equal(np.asarray(z_m), want, err_msg=f"{S}+{n}")
        np.testing.assert_allclose(np.asarray(sdf_m),
                                   np.asarray(z_m) * 3.0 + 1.0, atol=1e-6)


def test_merge_sorted_with_duplicates(rng):
    """Ties across the two inputs keep (z, sdf) pairs intact."""
    from honerf_tpu.render.sampling import merge_sorted

    vals = rng.integers(0, 5, size=(2, 12)).astype(np.float32)
    z_a = np.sort(vals[:, :8], -1)
    z_b = np.sort(vals[:, 8:], -1)
    z_m, sdf_m = merge_sorted(
        jnp.asarray(z_a), jnp.asarray(z_b),
        jnp.asarray(z_a * 2.0), jnp.asarray(z_b * 2.0))
    np.testing.assert_array_equal(
        np.asarray(z_m), np.sort(np.concatenate([z_a, z_b], -1), -1))
    np.testing.assert_allclose(np.asarray(sdf_m), np.asarray(z_m) * 2.0)


def test_sample_pdf_det_is_monotone(rng):
    """sample_pdf_det output is per-ray nondecreasing — the precondition
    the bitonic merge relies on — including degenerate all-tiny weights."""
    bins = jnp.sort(
        jnp.asarray(rng.uniform(0.4, 1.5, size=(8, 65)).astype(np.float32)), -1)
    for w in [
        rng.uniform(0, 1, size=(8, 64)).astype(np.float32),
        np.zeros((8, 64), np.float32),
        np.where(rng.uniform(size=(8, 64)) > 0.9,
                 rng.uniform(0, 1, size=(8, 64)), 0.0).astype(np.float32),
    ]:
        z = np.asarray(sample_pdf_det(bins, jnp.asarray(w), 16))
        assert (np.diff(z, axis=-1) >= 0).all()


def test_hierarchical_z_vals_shapes_and_surface_density():
    def sphere_sdf(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.5

    R = 16
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.5]]), (R, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
    z0 = 0.4 + (1.5 - 0.4) * jnp.linspace(0, 1, 64)[None, :].repeat(R, 0)
    z = hierarchical_z_vals(sphere_sdf, rays_o, rays_d, z0, 64, 4)
    assert z.shape == (R, 128)
    # ray from z=-1.5 along +z hits sphere (r=0.5) at t=1.0; importance
    # samples should cluster there: count samples within 0.1 of the surface
    near_surface = np.abs(np.asarray(z) - 1.0) < 0.1
    frac = near_surface.mean()
    # uniform density would put ~18% of samples there; expect much more
    assert frac > 0.35


def test_hierarchical_z_vals_jits():
    def sphere_sdf(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.5

    @jax.jit
    def run(rays_o, rays_d, z0):
        return hierarchical_z_vals(sphere_sdf, rays_o, rays_d, z0, 64, 4)

    R = 4
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.5]]), (R, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
    z0 = 0.4 + 1.1 * jnp.linspace(0, 1, 64)[None, :].repeat(R, 0)
    out = run(rays_o, rays_d, z0)
    assert out.shape == (R, 128)


def test_merge_sorted_debug_checks_precondition(monkeypatch):
    """HONERF_DEBUG_SORTED=1 rejects unsorted concrete inputs (ADVICE r3
    — the bitonic merge requires both inputs non-decreasing and silently
    mis-orders otherwise); sorted inputs still pass."""
    from honerf_tpu.render.sampling import merge_sorted

    monkeypatch.setenv("HONERF_DEBUG_SORTED", "1")
    ok_a = jnp.asarray([[0.1, 0.4, 0.9]])
    ok_b = jnp.asarray([[0.2, 0.5]])
    z, _ = merge_sorted(ok_a, ok_b)
    np.testing.assert_allclose(
        np.asarray(z), np.sort(np.concatenate([ok_a, ok_b], -1), -1)
    )
    bad = jnp.asarray([[0.9, 0.1, 0.4]])
    with pytest.raises(ValueError, match="non-decreasing"):
        merge_sorted(bad, ok_b)
    with pytest.raises(ValueError, match="non-decreasing"):
        merge_sorted(ok_a, bad[..., :2])
    # off by default: unsorted input silently mis-orders (documented)
    monkeypatch.delenv("HONERF_DEBUG_SORTED")
    merge_sorted(bad, ok_b)
