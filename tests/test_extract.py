"""Mesh extraction tests: C++ marching cubes on analytic SDFs, device grid
eval, penetration query."""

import jax
import jax.numpy as jnp
import numpy as np

from honerf_tpu.extract import (
    bounds_from_points,
    extract_geometry,
    inner_point_ids,
    marching_cubes,
)


def test_marching_cubes_sphere_surface():
    n = 48
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    u = np.sqrt(gx**2 + gy**2 + gz**2) - 0.6
    verts, tris = marching_cubes(u, 0.0)
    assert len(verts) > 200 and len(tris) > 200
    # all vertices near the iso-surface radius (grid-index coords -> world)
    world = verts / (n - 1) * 2.0 - 1.0
    r = np.linalg.norm(world, axis=-1)
    np.testing.assert_allclose(r, 0.6, atol=0.05)
    # triangle indices valid and mesh is shared-vertex (deduped)
    assert tris.max() < len(verts)
    assert len(verts) < 3 * len(tris)  # dedup actually happened


def test_marching_cubes_empty_grid():
    u = np.ones((8, 8, 8), np.float32)
    verts, tris = marching_cubes(u, 0.0)
    assert len(verts) == 0 and len(tris) == 0


def test_extract_geometry_world_space():
    def sphere(pts):
        return jnp.linalg.norm(pts - jnp.asarray([0.1, 0.0, -0.2]), axis=-1) - 0.25

    sdf_fn = jax.jit(sphere)
    verts, tris = extract_geometry(sdf_fn, [-0.5, -0.5, -0.7], [0.7, 0.5, 0.3], 40)
    r = np.linalg.norm(verts - np.asarray([0.1, 0.0, -0.2]), axis=-1)
    np.testing.assert_allclose(r, 0.25, atol=0.03)


def test_inner_point_ids():
    def sphere(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.5

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    ids = inner_point_ids(jax.jit(sphere), pts)
    inside = np.linalg.norm(pts, axis=-1) <= 0.5
    np.testing.assert_array_equal(ids, np.where(inside)[0])


def test_bounds_from_points():
    pts = np.asarray([[0.0, 1.0, -1.0], [2.0, -1.0, 3.0]])
    lo, hi = bounds_from_points(pts, 0.1)
    np.testing.assert_allclose(lo, [-0.1, -1.1, -1.1])
    np.testing.assert_allclose(hi, [2.1, 1.1, 3.1])
