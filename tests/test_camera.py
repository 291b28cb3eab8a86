"""Camera math tests: closed-form project/unproject round trips and ray
bundle conventions vs the reference's pytorch3d-based construction
(SURVEY.md §7 step 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honerf_tpu.camera import (
    Camera,
    full_image_ndc_grid,
    pixels_to_ndc,
    project_points,
    unproject_points,
    xy_to_ray_bundle,
)
from honerf_tpu.utils.transforms import rot6d_to_matrix


def random_camera(rng) -> Camera:
    # Random rotation via 6D -> matrix (well-conditioned with hi prob).
    R = np.asarray(rot6d_to_matrix(jnp.asarray(rng.normal(size=(6,)))))
    return Camera(
        R=jnp.asarray(R, dtype=jnp.float32),
        T=jnp.asarray(rng.normal(size=(3,)), dtype=jnp.float32),
        focal=jnp.asarray(rng.uniform(1.5, 3.0, size=(2,)), dtype=jnp.float32),
        principal=jnp.asarray(rng.uniform(-0.2, 0.2, size=(2,)), dtype=jnp.float32),
    )


def test_project_unproject_roundtrip(rng):
    cam = random_camera(rng)
    pts = jnp.asarray(rng.normal(size=(50, 3)), dtype=jnp.float32)
    # keep points in front of the camera (positive view z)
    ndc = project_points(cam, pts)
    valid = np.asarray(ndc[:, 2]) > 0.1
    back = unproject_points(cam, ndc)
    np.testing.assert_allclose(
        np.asarray(back)[valid], np.asarray(pts)[valid], rtol=1e-4, atol=1e-4
    )


def test_unproject_depth_is_view_z(rng):
    cam = random_camera(rng)
    xy = jnp.asarray(rng.uniform(-1, 1, size=(20, 2)), dtype=jnp.float32)
    depth = jnp.full((20, 1), 1.7)
    world = unproject_points(cam, jnp.concatenate([xy, depth], -1))
    view = world @ cam.R + cam.T
    np.testing.assert_allclose(np.asarray(view[:, 2]), 1.7, rtol=1e-5)


def test_ray_bundle_two_plane_convention(rng):
    """origins = p1 - dir and dirs unit (reference utils/utils.py:102-108)."""
    cam = random_camera(rng)
    xy = jnp.asarray(rng.uniform(-1, 1, size=(32, 2)), dtype=jnp.float32)
    rb = xy_to_ray_bundle(cam, xy)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rb.directions), axis=-1), 1.0, rtol=1e-5
    )
    p1 = unproject_points(cam, jnp.concatenate([xy, jnp.ones((32, 1))], -1))
    np.testing.assert_allclose(
        np.asarray(rb.origins + rb.directions), np.asarray(p1), atol=1e-5
    )
    # Rays pass through the depth-2 unprojection too.
    p2 = unproject_points(cam, jnp.concatenate([xy, 2 * jnp.ones((32, 1))], -1))
    t = np.linalg.norm(np.asarray(p2 - p1), axis=-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(rb.origins) + (1 + t) * np.asarray(rb.directions),
        np.asarray(p2),
        atol=1e-4,
    )


def test_rays_through_projected_pixels(rng):
    """A world point projected to NDC must lie on the ray cast through that
    NDC coordinate."""
    cam = random_camera(rng)
    pts = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
    ndc = project_points(cam, pts)
    valid = np.asarray(ndc[:, 2]) > 0.3
    rb = xy_to_ray_bundle(cam, ndc[:, :2])
    o = np.asarray(rb.origins)[valid]
    d = np.asarray(rb.directions)[valid]
    p = np.asarray(pts)[valid]
    # distance from point to each ray
    v = p - o
    t = (v * d).sum(-1, keepdims=True)
    dist = np.linalg.norm(v - t * d, axis=-1)
    assert dist.max() < 1e-4


def test_pixels_to_ndc_matches_reference_formula():
    H, W = 230, 266
    xy_pix = jnp.asarray([[0.0, 0.0], [W / 2, H / 2], [W - 1.0, H - 1.0]])
    ndc = np.asarray(pixels_to_ndc(xy_pix, H, W))
    # reference: x=(x - W/2)/(H/2); y=(y - H/2)/(H/2); then *= -1
    expect = np.array(
        [
            [-(0 - W / 2) / (H / 2), -(0 - H / 2) / (H / 2)],
            [0.0, 0.0],
            [-(W - 1 - W / 2) / (H / 2), -(H - 1 - H / 2) / (H / 2)],
        ]
    )
    np.testing.assert_allclose(ndc, expect, atol=1e-6)


def test_full_image_grid_shape_and_ranges():
    H, W = 230, 266
    grid = np.asarray(full_image_ndc_grid(H, W))
    assert grid.shape == (H * W, 3 - 1)
    rx = W / H
    assert grid[0, 0] == pytest.approx(rx)
    assert grid[W - 1, 0] == pytest.approx(-rx)
    assert grid[0, 1] == pytest.approx(1.0)
    assert grid[-1, 1] == pytest.approx(-1.0)


def test_rot6d_identity_and_orthonormal(rng):
    # Flat 6-vector is reshaped (3, 2): a1 = elements (0, 2, 4), a2 = (1, 3, 5)
    # — matches the reference se3_refine init [1,0,0,1,0,0] == identity
    # (utils/fields.py:127-129).
    eye6 = jnp.asarray([1.0, 0, 0, 1, 0, 0])
    np.testing.assert_allclose(np.asarray(rot6d_to_matrix(eye6)), np.eye(3), atol=1e-6)
    r = rot6d_to_matrix(jnp.asarray(rng.normal(size=(8, 6)), dtype=jnp.float32))
    r = np.asarray(r)
    for m in r:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-5)


def test_camera_vmap(rng):
    cams = Camera(
        R=jnp.stack([random_camera(rng).R for _ in range(4)]),
        T=jnp.stack([random_camera(rng).T for _ in range(4)]),
        focal=jnp.stack([random_camera(rng).focal for _ in range(4)]),
        principal=jnp.stack([random_camera(rng).principal for _ in range(4)]),
    )
    xy = jnp.asarray(rng.uniform(-1, 1, size=(4, 10, 2)), dtype=jnp.float32)
    rb = jax.vmap(xy_to_ray_bundle)(cams, xy)
    assert rb.origins.shape == (4, 10, 3)
