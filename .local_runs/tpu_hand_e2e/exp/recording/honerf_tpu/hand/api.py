"""High-level hand articulation API: the full driver-side chains.

These wrap the kinematics into the exact sequences the reference drivers
run per step (exp_runner.py:162-199, fitting_single.py:206-226): joint
refinement through the inverse HALO path, global palm rot/trans, and the
final world -> per-bone inverse transform stack that conditions the hand
SDF.  Everything is jittable and differentiable w.r.t. the refinement
parameters (pose fitting backprops through this entire chain).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from honerf_tpu.hand.kinematics import (
    pose_to_bone_transforms,
    refine_joints,
    transform_to_canonical,
)
from honerf_tpu.hand.skeleton import convert_joints
from honerf_tpu.utils.transforms import rot6d_to_matrix


def _invert_rigid_4x4(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (B, 4, 4) rigid transforms via R^T / -R^T t."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    return out.at[..., 3, 3].set(1.0)


def bone_transforms_from_mano_joints(joints_mano: jnp.ndarray) -> jnp.ndarray:
    """(B, 21, 3) repo-mano joints -> (B, 21, 4, 4) inverse bone transforms
    (world -> per-bone canonical space), mano joint order.

    The chain of exp_runner.py:191-199: mano->biomech, canonicalize,
    PoseConverter forward, biomech->mano, compose with the canonical
    transform."""
    B = joints_mano.shape[0]
    ones = jnp.ones((B,))
    kps = convert_joints(joints_mano, "mano", "biomech")
    kp_canon, glo_rot = transform_to_canonical(kps, ones)
    trans = pose_to_bone_transforms(kp_canon, ones)
    trans = convert_joints(trans, "biomech", "mano")
    return trans @ glo_rot[:, None]


def refined_hand_joints(
    joints_pred_mano: jnp.ndarray,
    bone_length: jnp.ndarray,
    joint_refine_angle: Optional[jnp.ndarray] = None,
    palm_refine_angle: Optional[jnp.ndarray] = None,
    palm_rot6d: Optional[jnp.ndarray] = None,
    palm_trans: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Refine predicted joints through the inverse HALO path + global palm
    transform (fitting_single.py:206-217; exp_runner.py:163-180 applies the
    same with 0.1-scaled palm angle/translation — scale at the call site).

    Args:
        joints_pred_mano: (B, 21, 3).
        bone_length: (B, 20) target bone lengths.
        palm_rot6d: (B, 6) global palm rotation (identity if None).
        palm_trans: (B, 3) global palm translation.

    Returns: (B, 21, 3) refined joints (repo-mano order).
    """
    B = joints_pred_mano.shape[0]
    ones = jnp.ones((B,))
    kps = convert_joints(joints_pred_mano, "mano", "biomech")
    kp_canon, glo_rot = transform_to_canonical(kps, ones)
    j3d = refine_joints(
        kp_canon, ones, bone_length, joint_refine_angle, palm_refine_angle
    )
    glo_inv = _invert_rigid_4x4(glo_rot)
    j3d = (
        jnp.einsum("bij,bkj->bki", glo_inv[:, :3, :3], j3d)
        + glo_inv[:, None, :3, 3]
    )
    if palm_rot6d is not None:
        R = rot6d_to_matrix(palm_rot6d)
        root = j3d[:, :1, :]
        j3d = jnp.einsum("bij,bkj->bki", R, j3d - root) + root
    if palm_trans is not None:
        j3d = j3d + palm_trans[:, None, :]
    return j3d


def t_pose_joints_from_transforms(
    bt_inv: jnp.ndarray, joints_mano: jnp.ndarray
) -> jnp.ndarray:
    """Map posed joints through their own inverse transforms to recover the
    canonical T-pose joints (exp_runner.py:328-331 test-mode path)."""
    j_h = jnp.concatenate(
        [joints_mano, jnp.ones(joints_mano.shape[:-1] + (1,))], axis=-1
    )
    return jnp.einsum("bnij,bnj->bni", bt_inv, j_h)[..., :3]
