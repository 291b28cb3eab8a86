"""HALO kinematics tests: golden parity against the PyTorch reference
converter (imported as a test oracle from /root/reference — never shipped),
plus self-contained round-trip and invariance properties (SURVEY.md §4)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honerf_tpu.data.synthetic import canonical_hand_joints
from honerf_tpu.hand import (
    bone_transforms_from_mano_joints,
    convert_joints,
    pose_to_bone_transforms,
    refine_joints,
    refined_hand_joints,
    transform_to_canonical,
)

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "halo_util"))


def sample_hand(curl=0.3, noise=0.0, seed=0):
    """A generically-posed hand: canonical skeleton under a fixed rotation +
    translation (an axis-aligned hand makes the canonicalization axis
    degenerate — in the reference too)."""
    j = canonical_hand_joints(curl=curl).astype(np.float32)
    if noise:
        j = j + np.random.default_rng(seed).normal(0, noise, j.shape).astype(np.float32)
    # fixed generic rotation (Rodrigues about a skew axis) + translation
    axis = np.asarray([0.3, 0.8, 0.52])
    axis /= np.linalg.norm(axis)
    th = 0.9
    K = np.asarray(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
    j = (j @ R.T + np.asarray([0.05, -0.12, 0.65])).astype(np.float32)
    return j[None]  # (1, 21, 3)


def test_convert_joints_roundtrip():
    j = jnp.asarray(sample_hand())
    for a, b in [("mano", "biomech"), ("biomech", "halo"), ("mano", "halo")]:
        back = convert_joints(convert_joints(j, a, b), b, a)
        np.testing.assert_allclose(np.asarray(back), np.asarray(j))


def test_canonicalization_properties():
    j = jnp.asarray(sample_hand(curl=0.2))
    kps = convert_joints(j, "mano", "biomech")
    canon, glo = transform_to_canonical(kps, jnp.ones((1,)))
    c = np.asarray(canon)[0]
    # root at origin
    np.testing.assert_allclose(c[0], 0.0, atol=1e-6)
    # middle root bone along -y
    mrb = c[3] / np.linalg.norm(c[3])
    np.testing.assert_allclose(mrb, [0, -1, 0], atol=1e-5)
    # transform is rigid (rotation part orthonormal)
    R = np.asarray(glo)[0][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_bone_transforms_shape_and_rigidity():
    j = jnp.asarray(sample_hand(curl=0.4))
    bt = bone_transforms_from_mano_joints(j)
    assert bt.shape == (1, 21, 4, 4)
    bt_np = np.asarray(bt)
    np.testing.assert_allclose(bt_np[:, :, 3, :3], 0.0, atol=1e-6)
    np.testing.assert_allclose(bt_np[:, :, 3, 3], 1.0, atol=1e-6)


def test_refine_joints_preserves_bone_lengths():
    from honerf_tpu.data.datasets import get_bone_length

    j = sample_hand(curl=0.3)
    target_len = get_bone_length(canonical_hand_joints(0.0)).astype(np.float32)
    kps = convert_joints(jnp.asarray(j), "mano", "biomech")
    canon, _ = transform_to_canonical(kps, jnp.ones((1,)))
    out = refine_joints(canon, jnp.ones((1,)), jnp.asarray(target_len)[None])
    got_len = get_bone_length(np.asarray(out)[0])
    np.testing.assert_allclose(got_len, target_len, rtol=1e-4)


def test_refined_hand_joints_grad_flows():
    from honerf_tpu.data.datasets import get_bone_length

    j = jnp.asarray(sample_hand(curl=0.3))
    bl = jnp.asarray(get_bone_length(canonical_hand_joints(0.0)))[None]

    def loss(angles):
        out = refined_hand_joints(j, bl, joint_refine_angle=angles)
        return jnp.sum(out**2)

    g = jax.grad(loss)(jnp.zeros((1, 20)))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


# ---------------------------------------------------------------------------
# Golden parity vs the PyTorch reference (oracle import, not shipped code)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def reference_converter():
    if not HAS_REFERENCE:
        pytest.skip("reference repo not mounted")
    import torch

    sys.path.insert(0, REFERENCE)
    try:
        from halo_util.converter_fit_batch import (
            PoseConverter,
            transform_to_canonical as ref_canon,
        )
        from halo_util.utils import convert_joints as ref_convert
    finally:
        sys.path.pop(0)
    return PoseConverter(dev=torch.device("cpu")), ref_canon, ref_convert


@pytest.mark.parametrize(
    "curl,noise,seed,atol",
    [
        # curl=0 (perfectly straight fingers) sits at the acos clip boundary
        # (converter_fit_batch.py:680,747): angles are acos(~1-1e-6) there,
        # so framework-level fp noise amplifies to ~1e-3 — in the torch
        # reference as much as here.  Real hands are never exactly straight.
        (0.0, 0.0, 0, 2e-2),
        (0.35, 0.004, 1, 5e-4),
        (0.6, 0.002, 2, 5e-4),
    ],
)
def test_forward_parity_vs_reference(reference_converter, curl, noise, seed, atol):
    import torch

    converter, ref_canon, ref_convert = reference_converter
    j = sample_hand(curl=curl, noise=noise, seed=seed)

    # reference path
    jt = torch.from_numpy(j)
    kps_t = ref_convert(jt, source="mano", target="biomech")
    ones_t = torch.ones(1)
    canon_t, glo_t = ref_canon(kps_t, is_right=ones_t)
    trans_t, _, _ = converter(canon_t, ones_t)
    trans_t = ref_convert(trans_t, source="biomech", target="mano")
    want = (trans_t @ glo_t.unsqueeze(1)).detach().numpy()

    # ours
    got = np.asarray(bone_transforms_from_mano_joints(jnp.asarray(j)))
    np.testing.assert_allclose(got, want, atol=atol)


@pytest.mark.parametrize("seed", [0, 1])
def test_refine_parity_vs_reference(reference_converter, seed):
    import torch

    from honerf_tpu.data.datasets import get_bone_length

    converter, ref_canon, ref_convert = reference_converter
    rng = np.random.default_rng(seed)
    j = sample_hand(curl=0.3, noise=0.003, seed=seed)
    bl = get_bone_length(canonical_hand_joints(0.1)).astype(np.float32)[None]
    joint_angles = (rng.normal(0, 0.05, (1, 20))).astype(np.float32)
    palm_angles = (rng.normal(0, 0.02, (1, 7))).astype(np.float32)

    jt = torch.from_numpy(j)
    kps_t = ref_convert(jt, source="mano", target="biomech")
    ones_t = torch.ones(1)
    canon_t, glo_t = ref_canon(kps_t, is_right=ones_t)
    want = converter.get_refine_3d_joint(
        canon_t,
        ones_t,
        torch.from_numpy(bl),
        joint_refine_angle=torch.from_numpy(joint_angles),
        palm_refine_angle=torch.from_numpy(palm_angles),
    ).detach().numpy()

    kps = convert_joints(jnp.asarray(j), "mano", "biomech")
    canon, _ = transform_to_canonical(kps, jnp.ones((1,)))
    got = np.asarray(
        refine_joints(
            canon,
            jnp.ones((1,)),
            jnp.asarray(bl),
            jnp.asarray(joint_angles),
            jnp.asarray(palm_angles),
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-4)
