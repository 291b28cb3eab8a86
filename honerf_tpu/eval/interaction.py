"""Interaction metrics: intersection volume (cm^3) and max penetration
depth (mm) between the fitted hand and object meshes
(reference: analys_results/analys_interaction.py)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from honerf_tpu.eval.mesh_ops import (
    closest_point_distances,
    contains,
    voxel_points,
)


def intersect_volume(
    obj_verts: np.ndarray,
    obj_faces: np.ndarray,
    hand_verts: np.ndarray,
    hand_faces: np.ndarray,
    pitch: float = 0.005,
) -> float:
    """Volume of the object voxels inside the hand mesh, in the reference's
    reported unit (x 1e6 -> cm^3; analys_interaction.py:14-19, :33-35)."""
    if len(obj_verts) == 0 or len(hand_verts) == 0:
        return 0.0  # empty extraction (no zero crossing in the bbox)
    pts = voxel_points(obj_verts, obj_faces, pitch)
    if len(pts) == 0:
        return 0.0
    inside = contains(pts, hand_verts, hand_faces)
    return float(inside.sum() * pitch**3 * 1e6)


def penetration_depth(
    hand_verts: np.ndarray,
    obj_verts: np.ndarray,
    obj_faces: np.ndarray,
) -> float:
    """Max distance of penetrating hand vertices to the object surface, in
    mm (analys_interaction.py:44-55)."""
    if len(hand_verts) == 0 or len(obj_verts) == 0:
        return 0.0
    inside = contains(hand_verts, obj_verts, obj_faces)
    if inside.sum() == 0:
        return 0.0
    d = closest_point_distances(hand_verts[inside], obj_verts, obj_faces)
    return float(d.max() * 1000.0)


def interaction_metrics(
    hand_verts, hand_faces, obj_verts, obj_faces, pitch: float = 0.005
) -> Tuple[float, float]:
    """(intersection volume cm^3, penetration depth mm)."""
    vol = intersect_volume(obj_verts, obj_faces, hand_verts, hand_faces, pitch)
    dep = penetration_depth(hand_verts, obj_verts, obj_faces)
    return vol, dep
