"""Temporal metrics: acceleration error and penetration-consistency index
(reference: analys_results/analys_acc_err.py, analys_pci.py)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def acceleration_error(
    joints_gt: np.ndarray, joints_pred: np.ndarray, vis: Optional[np.ndarray] = None
) -> np.ndarray:
    """Per-frame acceleration error || (x_{i-1} - 2 x_i + x_{i+1})_pred -
    (...)_gt || averaged over joints (analys_acc_err.py:22-49).

    Args:
        joints_gt/joints_pred: (N, J, 3).
    Returns:
        (N-2,) errors (multiply by 1000 for the reported mm/frame^2).
    """
    accel_gt = joints_gt[:-2] - 2 * joints_gt[1:-1] + joints_gt[2:]
    accel_pred = joints_pred[:-2] - 2 * joints_pred[1:-1] + joints_pred[2:]
    normed = np.linalg.norm(accel_pred - accel_gt, axis=2)
    if vis is None:
        new_vis = np.ones(len(normed), dtype=bool)
    else:
        invis = np.logical_not(vis)
        invis1 = np.roll(invis, -1)
        invis2 = np.roll(invis, -2)
        new_vis = np.logical_not(
            np.logical_or(invis, np.logical_or(invis1, invis2))
        )[:-2]
    return np.mean(normed[new_vis], axis=1)


def penetration_iou(prev_ids: np.ndarray, next_ids: np.ndarray) -> float:
    """IoU of two penetration-point index sets (analys_pci.py:29-41)."""
    union = np.union1d(prev_ids, next_ids)
    inter = np.intersect1d(prev_ids, next_ids)
    return float(len(inter) / (len(union) + 1e-7))


def pci(inner_id_sequences: Sequence[np.ndarray]) -> float:
    """Penetration Consistency Index: mean consecutive-frame IoU x 100
    (analys_pci.py:43-91)."""
    if len(inner_id_sequences) < 2:
        return 0.0
    ious = [
        penetration_iou(inner_id_sequences[i - 1], inner_id_sequences[i])
        for i in range(1, len(inner_id_sequences))
    ]
    return float(np.mean(ious) * 100.0)
