from honerf_tpu.utils.transforms import (
    alignment_matrix,
    angle_between,
    normalize,
    pad34_to_44,
    rodrigues,
    rot6d_to_matrix,
    rotate_axis_angle,
    signed_angle,
    xyz_to_xyz1,
)

__all__ = [
    "alignment_matrix",
    "angle_between",
    "normalize",
    "pad34_to_44",
    "rodrigues",
    "rot6d_to_matrix",
    "rotate_axis_angle",
    "signed_angle",
    "xyz_to_xyz1",
]
