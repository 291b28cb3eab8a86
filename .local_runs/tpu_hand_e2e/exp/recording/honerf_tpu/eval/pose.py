"""Pose-error metrics: MPJPE, object vertex error, ADD / ADD-S success
rates (reference: analys_results/analys_hand_obj_pose.py)."""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import numpy as np

ADD_THRESHOLD_M = 0.015  # 15 mm success threshold (analys_hand_obj_pose.py:51)


def mpjpe(pred_joints: np.ndarray, gt_joints: np.ndarray) -> float:
    """Mean per-joint position error (meters)
    (analys_hand_obj_pose.py:96)."""
    return float(np.sqrt(((pred_joints - gt_joints) ** 2).sum(-1)).mean())


def add(pred_pts: np.ndarray, gt_pts: np.ndarray) -> float:
    """Average distance between corresponding model points
    (analys_hand_obj_pose.py:17-19)."""
    return float(np.linalg.norm(pred_pts - gt_pts, axis=1).mean())


def adi(pred_pts: np.ndarray, gt_pts: np.ndarray) -> float:
    """Average closest-point distance (symmetric objects)
    (analys_hand_obj_pose.py:21-25)."""
    try:
        from scipy import spatial

        nn = spatial.cKDTree(pred_pts)
        dists, _ = nn.query(gt_pts, k=1)
        return float(dists.mean())
    except ImportError:  # brute force fallback
        d2 = ((gt_pts[:, None, :] - pred_pts[None, :, :]) ** 2).sum(-1)
        return float(np.sqrt(d2.min(1)).mean())


def transform_verts(verts: np.ndarray, R: np.ndarray, T: np.ndarray) -> np.ndarray:
    return verts @ R.T + T


def evaluate_pose_set(
    records: Iterable[Dict[str, np.ndarray]],
    model_verts: np.ndarray,
    threshold: float = ADD_THRESHOLD_M,
) -> Dict[str, float]:
    """Aggregate the per-frame table the reference prints
    (analys_hand_obj_pose.py:96-150).

    Each record: pred_joint3d, gt_joint3d, pred_Ro, pred_To, gt_Ro, gt_To
    (optionally init_joint3d / init_Ro / init_To for the baseline columns).

    Returns a dict with joint errors (mm), obj vertex errors (mm), and
    ADD/ADD-S success rates (%).
    """
    sums = {
        "joint_err_mm": 0.0, "obj_err_mm": 0.0,
        "add_success": 0.0, "adds_success": 0.0,
        "init_joint_err_mm": 0.0, "init_obj_err_mm": 0.0,
        "init_add_success": 0.0, "init_adds_success": 0.0,
    }
    n = 0
    has_init = False
    for rec in records:
        gt_v = transform_verts(model_verts, rec["gt_Ro"], rec["gt_To"])
        pred_v = transform_verts(model_verts, rec["pred_Ro"], rec["pred_To"])
        sums["joint_err_mm"] += mpjpe(rec["pred_joint3d"], rec["gt_joint3d"]) * 1000
        sums["obj_err_mm"] += add(pred_v, gt_v) * 1000
        sums["add_success"] += float(add(pred_v, gt_v) < threshold)
        sums["adds_success"] += float(adi(pred_v, gt_v) < threshold)
        if "init_joint3d" in rec:
            has_init = True
            init_v = transform_verts(model_verts, rec["init_Ro"], rec["init_To"])
            sums["init_joint_err_mm"] += (
                mpjpe(rec["init_joint3d"], rec["gt_joint3d"]) * 1000
            )
            sums["init_obj_err_mm"] += add(init_v, gt_v) * 1000
            sums["init_add_success"] += float(add(init_v, gt_v) < threshold)
            sums["init_adds_success"] += float(adi(init_v, gt_v) < threshold)
        n += 1
    if n == 0:
        return {}
    out = {
        "n_frames": n,
        "joint_err_mm": sums["joint_err_mm"] / n,
        "obj_err_mm": sums["obj_err_mm"] / n,
        "add_success_pct": sums["add_success"] / n * 100,
        "adds_success_pct": sums["adds_success"] / n * 100,
    }
    if has_init:
        out.update(
            init_joint_err_mm=sums["init_joint_err_mm"] / n,
            init_obj_err_mm=sums["init_obj_err_mm"] / n,
            init_add_success_pct=sums["init_add_success"] / n * 100,
            init_adds_success_pct=sums["init_adds_success"] / n * 100,
        )
    return out
