"""Host-side mesh geometry: containment, voxelization, closest-point
distances — pure numpy replacements for the reference's trimesh/rtree
dependency (analys_results/analys_interaction.py)."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def winding_numbers(points: np.ndarray, verts: np.ndarray, faces: np.ndarray,
                    chunk: int = 2048) -> np.ndarray:
    """Generalized winding number of each point w.r.t. a triangle mesh
    (~0 outside, ~1 inside for watertight meshes).  Robust to small holes,
    no spatial index needed at eval scales."""
    points = np.asarray(points, np.float64)
    tri = np.asarray(verts, np.float64)[faces]  # (T, 3, 3)
    out = np.empty(len(points))
    for s in range(0, len(points), chunk):
        p = points[s:s + chunk]  # (P, 3)
        a = tri[None, :, 0] - p[:, None]  # (P, T, 3)
        b = tri[None, :, 1] - p[:, None]
        c = tri[None, :, 2] - p[:, None]
        la = np.linalg.norm(a, axis=-1)
        lb = np.linalg.norm(b, axis=-1)
        lc = np.linalg.norm(c, axis=-1)
        num = np.einsum("ptk,ptk->pt", a, np.cross(b, c))
        den = (
            la * lb * lc
            + np.einsum("ptk,ptk->pt", a, b) * lc
            + np.einsum("ptk,ptk->pt", b, c) * la
            + np.einsum("ptk,ptk->pt", c, a) * lb
        )
        omega = 2.0 * np.arctan2(num, den)
        out[s:s + chunk] = omega.sum(axis=1) / (4.0 * np.pi)
    return out


def contains(points: np.ndarray, verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Boolean containment test (trimesh .contains equivalent)."""
    return winding_numbers(points, verts, faces) > 0.5


def voxel_points(verts: np.ndarray, faces: np.ndarray, pitch: float) -> np.ndarray:
    """Centers of occupied voxels of the mesh interior+surface at `pitch`
    (trimesh .voxelized(pitch).points equivalent, used by intersect_vox,
    analys_interaction.py:14-19)."""
    lo = verts.min(0) - pitch
    hi = verts.max(0) + pitch
    xs = np.arange(lo[0], hi[0] + pitch, pitch)
    ys = np.arange(lo[1], hi[1] + pitch, pitch)
    zs = np.arange(lo[2], hi[2] + pitch, pitch)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    inside = contains(pts, verts, faces)
    return pts[inside]


def closest_point_distances(
    points: np.ndarray, verts: np.ndarray, faces: np.ndarray, chunk: int = 512
) -> np.ndarray:
    """Distance from each point to the mesh surface (trimesh
    proximity.closest_point equivalent, used for penetration depth,
    analys_interaction.py:44-55)."""
    points = np.asarray(points, np.float64)
    tri = np.asarray(verts, np.float64)[faces]  # (T, 3, 3)
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    ab = b - a
    ac = c - a
    out = np.empty(len(points))
    for s in range(0, len(points), chunk):
        p = points[s:s + chunk][:, None, :]  # (P, 1, 3)
        ap = p - a[None]
        d1 = np.einsum("ptk,tk->pt", ap, ab)
        d2 = np.einsum("ptk,tk->pt", ap, ac)
        bp = p - b[None]
        d3 = np.einsum("ptk,tk->pt", bp, ab)
        d4 = np.einsum("ptk,tk->pt", bp, ac)
        cp = p - c[None]
        d5 = np.einsum("ptk,tk->pt", cp, ab)
        d6 = np.einsum("ptk,tk->pt", cp, ac)
        # barycentric-region closest point (Ericson, Real-Time Collision
        # Detection §5.1.5)
        va = d3 * d6 - d5 * d4
        vb = d5 * d2 - d1 * d6
        vc = d1 * d4 - d3 * d2
        denom = va + vb + vc
        v = np.where(np.abs(denom) > 1e-30, vb / np.where(denom == 0, 1, denom), 0.0)
        w = np.where(np.abs(denom) > 1e-30, vc / np.where(denom == 0, 1, denom), 0.0)
        # start from interior solution, then clamp edge/vertex regions
        v_edge_ab = np.clip(np.where(d1 - d3 != 0, d1 / np.where(d1 - d3 == 0, 1, d1 - d3), 0), 0, 1)
        w_edge_ac = np.clip(np.where(d2 - d6 != 0, d2 / np.where(d2 - d6 == 0, 1, d2 - d6), 0), 0, 1)
        t_edge_bc = np.clip(
            np.where(
                (d4 - d3) + (d5 - d6) != 0,
                (d4 - d3) / np.where((d4 - d3) + (d5 - d6) == 0, 1, (d4 - d3) + (d5 - d6)),
                0,
            ),
            0, 1,
        )
        cand_interior = a[None] + v[..., None] * ab[None] + w[..., None] * ac[None]
        region_a = (d1 <= 0) & (d2 <= 0)
        region_b = (d3 >= 0) & (d4 <= d3)
        region_c = (d6 >= 0) & (d5 <= d6)
        region_ab = (~region_a) & (~region_b) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
        region_ac = (~region_a) & (~region_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
        region_bc = (~region_b) & (~region_c) & (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
        closest = cand_interior
        closest = np.where(region_bc[..., None], b[None] + t_edge_bc[..., None] * (c - b)[None], closest)
        closest = np.where(region_ac[..., None], a[None] + w_edge_ac[..., None] * ac[None], closest)
        closest = np.where(region_ab[..., None], a[None] + v_edge_ab[..., None] * ab[None], closest)
        closest = np.where(region_c[..., None], c[None] * np.ones_like(closest), closest)
        closest = np.where(region_b[..., None], b[None] * np.ones_like(closest), closest)
        closest = np.where(region_a[..., None], a[None] * np.ones_like(closest), closest)
        d = np.linalg.norm(p - closest, axis=-1)  # (P, T)
        out[s:s + chunk] = d.min(axis=1)
    return out
