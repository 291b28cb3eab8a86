from honerf_tpu.hand.api import (
    bone_transforms_from_mano_joints,
    refined_hand_joints,
    t_pose_joints_from_transforms,
)
from honerf_tpu.hand.kinematics import (
    compute_canonical_transform,
    forward_joints_from_bones,
    kp3d_to_bones,
    pose_to_bone_transforms,
    refine_joints,
    transform_to_canonical,
)
from honerf_tpu.hand.skeleton import convert_joints

__all__ = [
    "bone_transforms_from_mano_joints",
    "compute_canonical_transform",
    "convert_joints",
    "forward_joints_from_bones",
    "kp3d_to_bones",
    "pose_to_bone_transforms",
    "refine_joints",
    "refined_hand_joints",
    "t_pose_joints_from_transforms",
]
