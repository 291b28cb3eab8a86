"""Device-side SDF grid evaluation + mesh extraction.

Equivalent of `extract_geometry` (utils/renderer.py:260-284, :537-564) and
`get_inner_point_id` (:566-572): the SDF is evaluated on the TPU in fixed
2^k-point chunks under one jitted function (no per-subcube python loop —
the reference's triple-nested 64-chunk loops collapse into a single batched
sweep), then the grid is handed to the C++ marching-cubes host extension.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

import jax.numpy as jnp

from honerf_tpu.extract.marching_cubes import marching_cubes


def evaluate_sdf_grid(
    sdf_fn: Callable,
    bound_min: np.ndarray,
    bound_max: np.ndarray,
    resolution: int,
    chunk: int = 1 << 16,
) -> np.ndarray:
    """Evaluate `sdf_fn((N, 3)) -> (N,)` on a resolution^3 grid.

    Chunked so arbitrary resolutions fit in HBM; `sdf_fn` should already be
    jitted (it is called with fixed-size chunks so it compiles once).
    """
    bound_min = np.asarray(bound_min, np.float32)
    bound_max = np.asarray(bound_max, np.float32)
    xs = np.linspace(bound_min[0], bound_max[0], resolution, dtype=np.float32)
    ys = np.linspace(bound_min[1], bound_max[1], resolution, dtype=np.float32)
    zs = np.linspace(bound_min[2], bound_max[2], resolution, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    n = pts.shape[0]
    out = np.empty((n,), np.float32)
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        block = pts[start:end]
        if block.shape[0] < chunk:
            block = np.pad(block, ((0, chunk - block.shape[0]), (0, 0)))
        vals = np.asarray(sdf_fn(jnp.asarray(block)))
        out[start:end] = vals[: end - start]
    return out.reshape(resolution, resolution, resolution)


def extract_geometry(
    sdf_fn: Callable,
    bound_min,
    bound_max,
    resolution: int,
    threshold: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Grid-eval + marching cubes -> (world-space vertices, triangles).

    Matches the reference rescale and winding flip
    (utils/renderer.py:279-283): vertices map from grid-index space to
    [bound_min, bound_max]; triangle orientation is reversed.
    """
    bound_min = np.asarray(bound_min, np.float32)
    bound_max = np.asarray(bound_max, np.float32)
    u = evaluate_sdf_grid(sdf_fn, bound_min, bound_max, resolution)
    verts, tris = marching_cubes(u, threshold)
    tris = tris[:, ::-1]
    verts = verts / (resolution - 1.0) * (bound_max - bound_min)[None, :] + bound_min
    return verts, tris


def inner_point_ids(
    hand_sdf_fn: Callable, pts_world: np.ndarray, chunk: int = 1 << 14
) -> np.ndarray:
    """Indices of points inside the hand surface (sdf <= 0) — the
    penetration query (utils/renderer.py:566-572)."""
    n = pts_world.shape[0]
    vals = np.empty((n,), np.float32)
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        block = np.asarray(pts_world[start:end], np.float32)
        if block.shape[0] < chunk:
            block = np.pad(block, ((0, chunk - block.shape[0]), (0, 0)))
        out = np.asarray(hand_sdf_fn(jnp.asarray(block)))
        vals[start:end] = out[: end - start]
    return np.where(vals <= 0)[0]


def bounds_from_points(pts: np.ndarray, padding: float) -> Tuple[np.ndarray, np.ndarray]:
    """Axis-aligned bbox +- padding (exp_runner.py:493-523 uses 0.15;
    get_res.py:87-100 uses 0.08; fitting_video.py:73-85 uses 0.04)."""
    pts = np.asarray(pts)
    return pts.min(0) - padding, pts.max(0) + padding
