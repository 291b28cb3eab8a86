"""HALO keypoint-to-bone-transform hand kinematics in pure JAX.

Functional re-derivation of the reference `PoseConverter`
(halo_util/converter_fit_batch.py:341-1230) — the pose-conditioning core of
the hand SDF model.  21 canonicalized keypoints (biomech order) become 21
inverse bone transforms (posed-space -> per-bone canonical space), and the
inverse path re-synthesizes a 21-joint skeleton from learnable joint/palm
angles plus target bone lengths.

Design notes (SURVEY.md §7 step 5):
  * all in-place tensor surgery becomes functional `.at[]` updates; the
    static per-level python loops unroll into one XLA graph;
  * the reference's exact detach boundaries are preserved with
    `stop_gradient` (`coord_systems.detach()` at converter_fit_batch.py:722,
    `kp3d.clone().detach()` in canonicalization at :130) — pose-fitting
    gradients change if these move;
  * `acos`/`atan2` singularity guards (clips at +-(1 - 1e-6), zero-dot
    thresholds) are kept bit-identical.

Everything takes a batch axis B; shapes are static.  Bone index layout is
the biomech *bone* ordering: bone i at level l = 5*l + finger, fingers
thumb..pinky; joints (biomech): 0 root, 1-5 level-1 MCPs, 6-10, 11-15,
16-20 tips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from honerf_tpu.utils.transforms import (
    angle_between,
    rodrigues,
    rotate_axis_angle,
    signed_angle,
)

_EPS = 1e-6
_EPS_MAT = 1e-9

# Canonical pose constants of the default (straight-hand) converter
# (halo_util/converter_fit_batch.py:410-411 and the hardcoded array at
# :1043): angles between root-bone planes and between adjacent root bones.
ROOT_PLANE_ANGLES = np.asarray([0.8, 0.2, 0.2])
ROOT_BONE_ANGLES = np.asarray([0.4, 0.2, 0.2, 0.2])

# Canonical T-pose bone directions (biomech bone order), the fixed targets
# of the inverse path (halo_util/converter_fit_batch.py:460-479).
INITIAL_BONE_VEC = np.asarray(
    [
        [4.4889e-01, -8.4880e-01, -2.7935e-01],
        [1.9867e-01, -9.8007e-01, 0.0000e00],
        [2.0004e-07, -1.0000e00, 0.0000e00],
        [-1.9471e-01, -9.8007e-01, -3.9469e-02],
        [-3.7001e-01, -9.2185e-01, -1.1528e-01],
        [4.4889e-01, -8.4880e-01, -2.7935e-01],
        [1.9867e-01, -9.8007e-01, 1.1921e-07],
        [2.8685e-07, -1.0000e00, 0.0000e00],
        [-1.9471e-01, -9.8007e-01, -3.9470e-02],
        [-3.7001e-01, -9.2185e-01, -1.1528e-01],
        [4.4889e-01, -8.4880e-01, -2.7935e-01],
        [1.9867e-01, -9.8007e-01, 1.4901e-07],
        [1.9870e-06, -1.0000e00, 2.3842e-07],
        [-1.9471e-01, -9.8007e-01, -3.9470e-02],
        [-3.7001e-01, -9.2185e-01, -1.1528e-01],
        [4.4889e-01, -8.4880e-01, -2.7935e-01],
        [1.9867e-01, -9.8007e-01, 8.9407e-08],
        [-3.4117e-06, -1.0000e00, -2.1979e-07],
        [-1.9471e-01, -9.8007e-01, -3.9469e-02],
        [-3.7001e-01, -9.2185e-01, -1.1528e-01],
    ],
    dtype=np.float32,
)

# Bone parent joints (biomech): bones 0-4 root->MCP, then chains.
_IDX_CHILD = np.arange(1, 21)
_IDX_PARENT = np.concatenate([np.zeros(5, np.int64), np.arange(1, 16)])

_LEV = [list(range(0, 5)), list(range(5, 10)), list(range(10, 15)), list(range(15, 20))]


def _norm_clip(v: jnp.ndarray, eps: float = _EPS_MAT) -> jnp.ndarray:
    # sqrt(sum + tiny): finite gradient at exact zeros (see utils.transforms)
    return jnp.maximum(jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-24), eps)


def _normalize(v: jnp.ndarray, eps: float = _EPS_MAT) -> jnp.ndarray:
    return v / _norm_clip(v, eps)[..., None]


# ---------------------------------------------------------------------------
# Canonicalization (transform_to_canonical, converter_fit_batch.py:103-161)
# ---------------------------------------------------------------------------

def compute_canonical_transform(kp3d: jnp.ndarray, is_right: jnp.ndarray) -> jnp.ndarray:
    """(B, 21, 3) biomech keypoints -> (B, 3, 4) transform that root-centers,
    aligns the middle root bone with -y and the index/middle plane normal
    with +z.  Computed from DETACHED keypoints (reference :130)."""
    kp3d = jax.lax.stop_gradient(kp3d)
    B = kp3d.shape[0]
    right = is_right.reshape(B, 1).astype(kp3d.dtype)
    # flip left hands (y axis) before computing the transform
    flip = jnp.where(right > 0.5, 1.0, -1.0)
    kp3d = kp3d * jnp.concatenate(
        [jnp.ones((B, 1)), flip, jnp.ones((B, 1))], axis=-1
    )[:, None, :]
    t = -kp3d[:, 0]  # translation to the root
    T_t = jnp.tile(jnp.eye(3, 4, dtype=kp3d.dtype)[None], (B, 1, 1))
    T_t = T_t.at[:, :, 3].set(t)
    y_axis = jnp.asarray([0.0, -1.0, 0.0])[None].repeat(B, 0)
    v_mrb = _normalize(kp3d[:, 3] - kp3d[:, 0], 1e-8)
    R1 = _alignment(v_mrb, y_axis)
    v_irb = _normalize(kp3d[:, 2] - kp3d[:, 0], 1e-8)
    normal = jnp.cross(v_mrb, v_irb)
    normal_rot = jnp.einsum("bi,bji->bj", normal, R1)
    z_axis = jnp.asarray([0.0, 0.0, 1.0])[None].repeat(B, 0)
    R2 = _alignment(normal_rot, z_axis)
    # fold the left-hand flip into the transform (reference :158)
    T_t = T_t.at[:, 1, 1].set(jnp.where(right[:, 0] > 0.5, 1.0, -1.0))
    return R2 @ (R1 @ T_t)


def _alignment(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    axis = _normalize(jnp.cross(v1, v2), 1e-8)
    ang = angle_between(v1, v2)
    return rodrigues(ang, axis)


def transform_to_canonical(
    kp3d: jnp.ndarray, is_right: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (canonical keypoints (B, 21, 3), 4x4 transform (B, 4, 4)).
    Gradients flow through the points, NOT through the transform."""
    T34 = compute_canonical_transform(kp3d, is_right)
    kp_h = jnp.concatenate([kp3d, jnp.ones(kp3d.shape[:-1] + (1,))], axis=-1)
    kp_canon = jnp.einsum("bij,bkj->bki", T34, kp_h)
    last = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0, 1.0]])[None], (kp3d.shape[0], 1, 1))
    return kp_canon, jnp.concatenate([T34, last], axis=1)


# ---------------------------------------------------------------------------
# Bones
# ---------------------------------------------------------------------------

def preprocess_joints(joints: jnp.ndarray, is_right: jnp.ndarray) -> jnp.ndarray:
    """Flip left hands to right (reference :769-806; shift_factor == 0)."""
    right = is_right.reshape(-1, 1, 1).astype(joints.dtype)
    flipped = joints * jnp.asarray([-1.0, 1.0, 1.0])
    return joints * right + (1.0 - right) * flipped


def kp3d_to_bones(kp3d: jnp.ndarray):
    """Joints -> (unit bones (B,20,3), lengths (B,20,1), kp->bone 4x4
    (B,20,4,4)) (reference :537-562)."""
    B = kp3d.shape[0]
    bones = kp3d[:, _IDX_CHILD] - kp3d[:, _IDX_PARENT]
    lengths = jnp.maximum(
        jnp.sqrt(jnp.sum(bones * bones, axis=2, keepdims=True) + 1e-24), _EPS_MAT
    )
    bones = bones / lengths
    translate = jnp.tile(jnp.eye(4)[None, None], (B, 20, 1, 1))
    translate = translate.at[:, :, :3, 3].set(-kp3d[:, _IDX_PARENT])
    scale = jnp.tile(jnp.eye(4)[None, None], (B, 20, 1, 1)) / lengths[..., None]
    scale = scale.at[:, :, 3, 3].set(1.0)
    return bones, lengths, scale @ translate


# ---------------------------------------------------------------------------
# Palm normalization (root planes + root bone angles)
# ---------------------------------------------------------------------------

def normalize_root_planes(
    bones: jnp.ndarray, palm_refine: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate root bones so inter-finger plane angles match the canonical
    pose, with 3 learnable palm corrections (reference :964-1031).

    Returns (new_bones (B,20,3), per-bone norm rotations (B,20,3,3))."""
    B = bones.shape[0]
    canon = ROOT_PLANE_ANGLES
    b0, b1, b2, b3, b4 = (bones[:, i] for i in range(5))
    mat = jnp.tile(jnp.eye(3)[None, None], (B, 20, 1, 1))

    n1 = jnp.cross(b2, b1)
    n0 = jnp.cross(b1, b0)
    a01 = signed_angle(n0, n1, b1)
    thumb_t = rodrigues(a01 - canon[0] + palm_refine[:, 0], b1)
    mat = mat.at[:, 0].set(thumb_t)

    n2 = jnp.cross(b3, b2)
    a21 = signed_angle(n2, n1, b2)
    ring_t = rodrigues(a21 + canon[1] + palm_refine[:, 1], b2)
    b3r = jnp.einsum("bij,bj->bi", ring_t, b3)
    b4r = jnp.einsum("bij,bj->bi", ring_t, b4)
    mat = mat.at[:, 3].set(ring_t)

    n3 = jnp.cross(b4r, b3r)
    n2r = jnp.cross(b3r, b2)
    a32 = signed_angle(n3, n2r, b3r)
    pinky_t = rodrigues(a32 + canon[2] + palm_refine[:, 2], b3r)
    mat = mat.at[:, 4].set(pinky_t @ ring_t)

    # propagate down the kinematic chains (reference :1022-1024)
    mat = mat.at[:, 5:10].set(mat[:, 0:5])
    mat = mat.at[:, 10:15].set(mat[:, 0:5])
    mat = mat.at[:, 15:20].set(mat[:, 0:5])
    new_bones = jnp.einsum("bnij,bnj->bni", mat, bones)
    return new_bones, mat


def normalize_root_bone_angles(
    bones: jnp.ndarray, palm_refine: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate root bones so adjacent-bone angles match the canonical pose,
    with 4 learnable palm corrections (reference :1033-1107).  The reference
    intentionally uses hardcoded canonical angles here (:1043)."""
    B = bones.shape[0]
    canon = ROOT_BONE_ANGLES
    b0, b1, b2, b3, b4 = (bones[:, i] for i in range(5))
    mat = jnp.tile(jnp.eye(3)[None, None], (B, 20, 1, 1))

    n1 = _normalize(jnp.cross(b2, b1), 1e-8)
    a21 = signed_angle(b2, b1, n1)
    index_t = rodrigues(canon[1] - a21 + palm_refine[:, 3], n1)
    mat = mat.at[:, 1].set(index_t)
    mat = mat.at[:, 0].set(index_t)
    b1 = jnp.einsum("bij,bj->bi", index_t, b1)
    b0 = jnp.einsum("bij,bj->bi", index_t, b0)

    n0 = _normalize(jnp.cross(b1, b0), 1e-8)
    a10 = signed_angle(b1, b0, n0)
    thumb_t = rodrigues(canon[0] - a10 + palm_refine[:, 4], n0)
    mat = mat.at[:, 0].set(thumb_t @ index_t)
    b0 = jnp.einsum("bij,bj->bi", thumb_t, b0)

    n2 = _normalize(jnp.cross(b3, b2), 1e-8)
    a32 = signed_angle(b3, b2, n2)
    ring_t = rodrigues(a32 - canon[2] + palm_refine[:, 5], n2)
    mat = mat.at[:, 3].set(ring_t)
    mat = mat.at[:, 4].set(ring_t)
    b3 = jnp.einsum("bij,bj->bi", ring_t, b3)
    b4 = jnp.einsum("bij,bj->bi", ring_t, b4)

    n3 = _normalize(jnp.cross(b4, b3), 1e-8)
    a43 = signed_angle(b4, b3, n3)
    pinky_t = rodrigues(a43 - canon[3] + palm_refine[:, 6], n3)
    mat = mat.at[:, 4].set(pinky_t @ ring_t)

    mat = mat.at[:, 5:10].set(mat[:, 0:5])
    mat = mat.at[:, 10:15].set(mat[:, 0:5])
    mat = mat.at[:, 15:20].set(mat[:, 0:5])
    new_bones = jnp.einsum("bnij,bnj->bni", mat, bones)
    return new_bones, mat


# ---------------------------------------------------------------------------
# Local coordinate systems and angles
# ---------------------------------------------------------------------------

def compute_local_coordinate_system(bones: jnp.ndarray) -> jnp.ndarray:
    """Per-bone local frames (B, 20, 3, 3), rows = x/y/z basis vectors;
    root bones get the identity (reference :596-722).  DETACHED."""
    B = bones.shape[0]
    root_bones = bones[:, 0:5]
    plane_normals = _normalize(
        jnp.cross(root_bones[:, :-1], root_bones[:, 1:]), _EPS_MAT
    )  # (B, 4, 3)
    finger_norms = jnp.stack(
        [
            plane_normals[:, 0],
            plane_normals[:, 1],
            0.5 * (plane_normals[:, 1] + plane_normals[:, 2]),
            0.5 * (plane_normals[:, 2] + plane_normals[:, 3]),
            plane_normals[:, 3],
        ],
        axis=1,
    )  # (B, 5, 3)
    cs = jnp.tile(jnp.eye(3)[None, None], (B, 20, 1, 1))
    z = root_bones
    y = jnp.cross(z, finger_norms)
    x = jnp.cross(y, z)
    x = _normalize(x)
    y = _normalize(y)
    cs = cs.at[:, 5:10, 0].set(x).at[:, 5:10, 1].set(y).at[:, 5:10, 2].set(z)

    y_axis = jnp.asarray([0.0, 1.0, 0.0])[None, None].repeat(B, 0).repeat(5, 1)
    x_axis = jnp.asarray([1.0, 0.0, 0.0])[None, None].repeat(B, 0).repeat(5, 1)
    one = 1.0

    for lev in (2, 3):
        idx = _LEV[lev]
        parent_idx = _LEV[lev - 1]
        bone_parent = bones[:, parent_idx]  # (B, 5, 3)
        p_coord = cs[:, parent_idx]  # (B, 5, 3, 3)
        lbv2 = jnp.einsum("bfij,bfj->bfi", p_coord, bone_parent)
        lbv2_xz = lbv2 * jnp.asarray([1.0, 0.0, 1.0])
        dot_xz = lbv2_xz[..., 2]
        dot_xz = jnp.where(jnp.abs(dot_xz) < 1e-6, 0.0, dot_xz)
        norm_xz = _norm_clip(lbv2_xz, _EPS_MAT)
        dot_xz = jnp.clip(dot_xz / norm_xz, -one + _EPS, one - _EPS)
        angle_xz = jnp.arccos(dot_xz)
        angle_xz = jnp.where(lbv2_xz[..., 0] + 1e-6 < 0, -angle_xz, angle_xz)

        dot_yz = jnp.sum(lbv2_xz * lbv2, axis=-1) / norm_xz
        dot_yz = jnp.clip(dot_yz, -one + _EPS, one - _EPS)
        angle_yz = jnp.arccos(dot_yz)
        angle_yz = jnp.where(lbv2[..., 1] + 1e-6 < 0, -angle_yz, angle_yz)

        angle_xz = angle_xz[..., None]
        angle_yz = angle_yz[..., None]
        p_t = jnp.swapaxes(p_coord, -1, -2)
        rot_axis_xz = jnp.einsum("bfij,bfj->bfi", p_t, y_axis)
        rot_axis_y_local = rotate_axis_angle(x_axis, y_axis, angle_xz)
        rot_axis_y = jnp.einsum("bfij,bfj->bfi", p_t, rot_axis_y_local)

        small_xz = (jnp.abs(angle_xz) < _EPS).astype(bones.dtype)
        x = small_xz * x + (1 - small_xz) * rotate_axis_angle(x, rot_axis_xz, angle_xz)
        y = small_xz * y + (1 - small_xz) * rotate_axis_angle(y, rot_axis_xz, angle_xz)
        z = small_xz * z + (1 - small_xz) * rotate_axis_angle(z, rot_axis_xz, angle_xz)
        small_yz = (jnp.abs(angle_yz) < _EPS).astype(bones.dtype)
        x = small_yz * x + (1 - small_yz) * rotate_axis_angle(x, rot_axis_y, -angle_yz)
        y = small_yz * y + (1 - small_yz) * rotate_axis_angle(y, rot_axis_y, -angle_yz)
        z = small_yz * z + (1 - small_yz) * rotate_axis_angle(z, rot_axis_y, -angle_yz)

        cs = cs.at[:, idx, 0].set(x).at[:, idx, 1].set(y).at[:, idx, 2].set(z)

    return jax.lax.stop_gradient(cs)


def compute_local_coordinates(bones: jnp.ndarray, cs: jnp.ndarray) -> jnp.ndarray:
    """(B,20,3,3) frames applied to (B,20,3) bones (reference :725-728)."""
    return jnp.einsum("bnij,bnj->bni", cs, bones)


def compute_rot_angles(local_coords: jnp.ndarray) -> jnp.ndarray:
    """Flexion (xz) and abduction (yz) angles per bone -> (B, 20, 2)
    (reference :731-766)."""
    proj_xz = local_coords * jnp.asarray([1.0, 0.0, 1.0])
    norm_xz = _norm_clip(proj_xz, _EPS_MAT)
    dot_xz = proj_xz[..., 2]
    dot_xz = jnp.where(jnp.abs(dot_xz) < 1e-6, 0.0, dot_xz)
    dot_xz = jnp.clip(dot_xz / norm_xz, -1 + _EPS, 1 - _EPS)
    angle_xz = jnp.arccos(dot_xz)
    angle_xz = jnp.where(proj_xz[..., 0] + 1e-6 < 0, -angle_xz, angle_xz)

    dot_yz = jnp.sum(proj_xz * local_coords, axis=-1) / norm_xz
    dot_yz = jnp.clip(dot_yz, -1 + _EPS, 1 - _EPS)
    angle_yz = jnp.arccos(dot_yz)
    angle_yz = jnp.where(local_coords[..., 1] + 1e-6 > 0, -angle_yz, angle_yz)
    return jnp.stack([angle_xz, angle_yz], axis=-1)


def compute_rotation_matrix(
    rot_angles: jnp.ndarray,
    joint_refine: jnp.ndarray,
) -> jnp.ndarray:
    """Per-bone unpose rotations from flexion/abduction angles with the
    straight-hand canonical pose (zeros) and 20 learnable joint-angle
    refinements (reference :811-875): abduction refinements hit level-2
    bones (5 values), flexion refinements hit levels 2-4 (15 values)."""
    B, n_bones, _ = rot_angles.shape
    flex = rot_angles[..., 0]
    abd = rot_angles[..., 1]
    x = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (B, n_bones, 3))
    y = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, n_bones, 3))
    rotated_x = rotate_axis_angle(x, y, flex[..., None])
    abduction = -abd
    abduction = abduction.at[:, 5:10].add(joint_refine[:, :5])
    r1 = rodrigues(abduction, rotated_x)
    flexion = -flex
    flexion = flexion.at[:, 5:].add(joint_refine[:, 5:])
    r2 = rodrigues(flexion, y)
    r = r2 @ r1
    r = r.at[:, :5].set(jnp.eye(3))
    return r


def compute_adjusted_transpose(cs: jnp.ndarray, rot_mat: jnp.ndarray) -> jnp.ndarray:
    """Chain-adjusted transposed local frames (reference :939-962)."""
    lev2_rot = rot_mat[:, _LEV[1]]
    lev3_rot = rot_mat[:, _LEV[2]] @ lev2_rot
    cs_t = jnp.swapaxes(cs, -1, -2)
    cs_t = cs_t.at[:, _LEV[2]].set(cs_t[:, _LEV[2]] @ lev2_rot)
    cs_t = cs_t.at[:, _LEV[3]].set(cs_t[:, _LEV[3]] @ lev3_rot)
    return cs_t


def _to_4x4(mat3: jnp.ndarray) -> jnp.ndarray:
    B, n = mat3.shape[:2]
    out = jnp.zeros(mat3.shape[:2] + (4, 4), dtype=mat3.dtype)
    out = out.at[..., :3, :3].set(mat3)
    return out.at[..., 3, 3].set(1.0)


def compute_bone_to_kp_mat(
    bone_lengths: jnp.ndarray, local_coords_canonical: jnp.ndarray
) -> jnp.ndarray:
    """Scale + kinematic-chain translation back to keypoint space
    (reference :564-594)."""
    B = bone_lengths.shape[0]
    mat = jnp.tile(jnp.eye(4)[None, None], (B, 20, 1, 1)) * bone_lengths[..., None]
    mat = mat.at[:, :, 3, 3].set(1.0)
    bones_scaled = local_coords_canonical * bone_lengths
    lev1 = jnp.zeros((B, 5, 3))
    lev2 = bones_scaled[:, _LEV[0]]
    lev3 = bones_scaled[:, _LEV[1]] + lev2
    lev4 = bones_scaled[:, _LEV[2]] + lev3
    translation = jnp.concatenate([lev1, lev2, lev3, lev4], axis=1)
    return mat.at[:, :, :3, 3].set(translation)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def pose_to_bone_transforms(
    joints: jnp.ndarray,
    is_right: jnp.ndarray,
    joint_refine_angle: Optional[jnp.ndarray] = None,
    palm_refine_angle: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Canonicalized biomech keypoints -> 21 inverse bone transforms
    (B, 21, 4, 4) (reference `PoseConverter.forward`, :1109-1179)."""
    B = joints.shape[0]
    if joint_refine_angle is None:
        joint_refine_angle = jnp.zeros((B, 20))
    if palm_refine_angle is None:
        palm_refine_angle = jnp.zeros((B, 7))

    joints = preprocess_joints(joints, is_right)
    bones, bone_lengths, kp_to_bone = kp3d_to_bones(joints)

    plane_bones, plane_mat = normalize_root_planes(bones, palm_refine_angle)
    norm_bones, angle_mat = normalize_root_bone_angles(plane_bones, palm_refine_angle)
    root_norm_mat = angle_mat @ plane_mat

    cs = compute_local_coordinate_system(norm_bones)
    local_coords = compute_local_coordinates(norm_bones, cs)
    rot_angles = compute_rot_angles(local_coords)
    rot_mat = compute_rotation_matrix(rot_angles, joint_refine_angle)
    cs_t = compute_adjusted_transpose(cs, rot_mat)
    unpose3 = cs_t @ (rot_mat @ cs)
    local_coords_unposed = compute_local_coordinates(norm_bones, unpose3)
    inv_scale_trans = compute_bone_to_kp_mat(bone_lengths, local_coords_unposed)

    trans = _to_4x4(root_norm_mat) @ kp_to_bone
    trans = _to_4x4(unpose3) @ trans
    trans = inv_scale_trans @ trans
    root = jnp.tile(jnp.eye(4)[None, None], (B, 1, 1, 1))
    return jnp.concatenate([root, trans], axis=1)


def refine_joints(
    joints: jnp.ndarray,
    is_right: jnp.ndarray,
    mean_bone_length: jnp.ndarray,
    joint_refine_angle: Optional[jnp.ndarray] = None,
    palm_refine_angle: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse path: re-synthesize a 21-joint skeleton (repo-mano order)
    from canonicalized keypoints + refinement angles + target bone lengths
    (reference `get_refine_3d_joint`, :1183-1230)."""
    B = joints.shape[0]
    if joint_refine_angle is None:
        joint_refine_angle = jnp.zeros((B, 20))
    if palm_refine_angle is None:
        palm_refine_angle = jnp.zeros((B, 7))

    joints = preprocess_joints(joints, is_right)
    bones, _bone_lengths, _ = kp3d_to_bones(joints)
    plane_bones, plane_mat = normalize_root_planes(bones, palm_refine_angle)
    norm_bones, angle_mat = normalize_root_bone_angles(plane_bones, palm_refine_angle)
    root_norm_mat = angle_mat @ plane_mat

    cs = compute_local_coordinate_system(norm_bones)
    local_coords = compute_local_coordinates(norm_bones, cs)
    rot_angles = compute_rot_angles(local_coords)
    rot_mat = compute_rotation_matrix(rot_angles, joint_refine_angle)
    cs_t = compute_adjusted_transpose(cs, rot_mat)
    unpose3 = cs_t @ (rot_mat @ cs)

    rot_tpose = unpose3 @ root_norm_mat
    # the matrices are rotations (products of rotations), so the inverse is
    # the transpose — cheaper and better conditioned than a general inverse
    rot_tpose_inv = jnp.swapaxes(rot_tpose, -1, -2)
    p_bone = jnp.einsum(
        "bnij,nj->bni", rot_tpose_inv, jnp.asarray(INITIAL_BONE_VEC)
    )
    return forward_joints_from_bones(p_bone, mean_bone_length.reshape(B, 20, 1))


def forward_joints_from_bones(
    local_coords: jnp.ndarray, bone_lengths: jnp.ndarray
) -> jnp.ndarray:
    """Accumulate bone vectors into 21 joints, repo-mano contiguous-finger
    order (reference `forward_get_3djoint_use_bone_and_bone_length`,
    :261-277)."""
    B = local_coords.shape[0]
    scaled = local_coords * bone_lengths  # (B, 20, 3)
    joints = [jnp.zeros((B, 3))]
    for finger in range(5):
        start = jnp.zeros((B, 3))
        for level in range(4):
            idx = level * 5 + finger
            start = start + scaled[:, idx]
            joints.append(start)
    return jnp.stack(joints, axis=1)
