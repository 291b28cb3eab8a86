"""Field network tests: encoding layout, weight-norm parity vs torch,
geometric-init sphere property, gradient correctness (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honerf_tpu.models import (
    ColorConfig,
    SDFConfig,
    anerf_bone_embedding,
    color_hand_apply,
    color_obj_apply,
    init_color_params,
    init_sdf_params,
    init_se3_refine,
    init_variance_params,
    positional_encoding,
    sdf_hand_apply,
    sdf_hand_value_feat_grad,
    sdf_obj_apply,
    sdf_obj_value_feat_grad,
    variance_apply,
)
from honerf_tpu.models.mlp import apply_linear, init_linear, softplus_beta


def test_positional_encoding_layout():
    x = jnp.asarray([[0.5, -0.3]])
    L = 3
    enc = np.asarray(positional_encoding(x, L))
    assert enc.shape == (1, 2 * 2 * L)
    # per channel: [sin(2^0 x), sin(2^1 x), sin(2^2 x), cos(...) x3]
    expect = []
    for c in [0.5, -0.3]:
        expect += [np.sin(c * 2**k) for k in range(L)]
        expect += [np.cos(c * 2**k) for k in range(L)]
    np.testing.assert_allclose(enc[0], expect, atol=1e-6)


def test_anerf_embedding_identity_transforms(rng):
    pts = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    bt_inv = jnp.tile(jnp.eye(4)[None], (21, 1, 1))
    t_pose = jnp.zeros((21, 3))
    v, r, h = anerf_bone_embedding(pts, bt_inv, t_pose)
    assert v.shape == (5, 21, 1) and r.shape == (5, 21, 3) and h.shape == (5, 21, 1)
    np.testing.assert_allclose(
        np.asarray(v[:, 0, 0]), np.linalg.norm(np.asarray(pts), axis=-1), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r * v), np.broadcast_to(np.asarray(pts)[:, None], (5, 21, 3)),
        atol=1e-5,
    )
    # gate: 1 for v << cutoff, 0 for v >> cutoff
    near = anerf_bone_embedding(jnp.zeros((1, 3)) + 1e-4, bt_inv, t_pose)[2]
    far = anerf_bone_embedding(jnp.full((1, 3), 10.0), bt_inv, t_pose)[2]
    # smallest cutoff is 0.02: h(0) = 1 - sigmoid(-4) ~= 0.982
    assert float(near.min()) > 0.97
    assert float(far.max()) < 1e-6


def test_weight_norm_matches_torch(rng):
    import torch
    import torch.nn as nn

    lin = nn.Linear(16, 8)
    lin = nn.utils.weight_norm(lin)
    x = rng.normal(size=(4, 16)).astype(np.float32)
    with torch.no_grad():
        want = lin(torch.from_numpy(x)).numpy()
    # Build our params from torch's v/g/b
    p = {
        "v": jnp.asarray(lin.weight_v.detach().numpy()),
        "g": jnp.asarray(lin.weight_g.detach().numpy().reshape(-1)),
        "b": jnp.asarray(lin.bias.detach().numpy()),
    }
    got = np.asarray(apply_linear(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_softplus_beta_matches_torch(rng):
    import torch

    x = rng.normal(size=(100,)).astype(np.float32) * 0.1
    want = torch.nn.Softplus(beta=100)(torch.from_numpy(x)).numpy()
    got = np.asarray(softplus_beta(jnp.asarray(x), 100.0))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_obj_sdf_geometric_init_is_spherelike():
    cfg = SDFConfig(kind="obj", v_multires=10)
    params = init_sdf_params(jax.random.PRNGKey(0), cfg)
    # Geometric init should give sdf(x) ~ ||x|| - bias.
    radii = np.asarray([0.05, 0.2, 0.4, 0.6, 0.8, 1.0], dtype=np.float32)
    dirs = np.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32)
    pts = jnp.asarray((radii[:, None, None] * dirs[None]).reshape(-1, 3))
    out = sdf_obj_apply(params, cfg, pts)
    assert out.shape == (18, 257)
    sdf = np.asarray(out[:, 0]).reshape(6, 3).mean(axis=1)
    expect = radii - 0.5
    # approximate sphere: inside negative, outside positive, roughly linear
    assert sdf[0] < -0.2 and sdf[-1] > 0.2
    assert np.all(np.diff(sdf) > 0)  # monotone in radius
    np.testing.assert_allclose(sdf, expect, atol=0.25)


def test_obj_sdf_shrink_output_skip_shapes():
    cfg = SDFConfig(kind="obj")
    params = init_sdf_params(jax.random.PRNGKey(1), cfg)
    # Layer 3 (pre-skip) must output d_hidden - input_width.
    w3 = params["layers"][3]["v"]
    assert w3.shape[0] == cfg.d_hidden - cfg.input_width
    out = sdf_obj_apply(params, cfg, jnp.zeros((7, 3)))
    assert out.shape == (7, 257)


def test_hand_sdf_forward_shapes():
    cfg = SDFConfig(kind="hand", r_multires=7)
    params = init_sdf_params(jax.random.PRNGKey(2), cfg)
    # skip layer input is widened
    w4 = params["layers"][4]["v"]
    assert w4.shape[1] == cfg.d_hidden + cfg.input_width
    bt_inv = jnp.tile(jnp.eye(4)[None], (21, 1, 1))
    t_pose = jnp.asarray(np.random.default_rng(0).normal(size=(21, 3)) * 0.05)
    out, xyz_feature, r, h = sdf_hand_apply(
        params, cfg, jnp.zeros((9, 3)), bt_inv, t_pose
    )
    assert out.shape == (9, 257)
    assert xyz_feature.shape == (9, cfg.input_width)


def test_obj_sdf_gradient_matches_finite_difference(rng):
    cfg = SDFConfig(kind="obj")
    params = init_sdf_params(jax.random.PRNGKey(3), cfg)
    pts = jnp.asarray(rng.normal(size=(4, 3)) * 0.3, dtype=jnp.float32)
    sdf, feat, grad = sdf_obj_value_feat_grad(params, cfg, pts)
    assert sdf.shape == (4, 1) and feat.shape == (4, 256) and grad.shape == (4, 3)
    eps = 1e-3
    for axis in range(3):
        delta = jnp.zeros((1, 3)).at[0, axis].set(eps)
        plus = sdf_obj_apply(params, cfg, pts + delta)[:, 0]
        minus = sdf_obj_apply(params, cfg, pts - delta)[:, 0]
        fd = np.asarray((plus - minus) / (2 * eps))
        np.testing.assert_allclose(np.asarray(grad[:, axis]), fd, atol=2e-2)


def test_hand_sdf_gradient_matches_finite_difference(rng):
    cfg = SDFConfig(kind="hand", r_multires=4)
    params = init_sdf_params(jax.random.PRNGKey(4), cfg)
    bt_inv = jnp.tile(jnp.eye(4)[None], (21, 1, 1))
    t_pose = jnp.asarray(rng.normal(size=(21, 3)) * 0.05, dtype=jnp.float32)
    pts = jnp.asarray(rng.normal(size=(4, 3)) * 0.02, dtype=jnp.float32)
    sdf, feat, xyz_feature, r, h, grad = sdf_hand_value_feat_grad(
        params, cfg, pts, bt_inv, t_pose
    )
    eps = 1e-4
    for axis in range(3):
        delta = jnp.zeros((1, 3)).at[0, axis].set(eps)
        plus = sdf_hand_apply(params, cfg, pts + delta, bt_inv, t_pose)[0][:, 0]
        minus = sdf_hand_apply(params, cfg, pts - delta, bt_inv, t_pose)[0][:, 0]
        fd = np.asarray((plus - minus) / (2 * eps))
        np.testing.assert_allclose(np.asarray(grad[:, axis]), fd, atol=5e-2)


def test_color_nets_output_range(rng):
    hand_cfg = ColorConfig(kind="hand", r_multires=7)
    obj_cfg = ColorConfig(kind="obj", r_multires=4)
    hp = init_color_params(jax.random.PRNGKey(5), hand_cfg)
    op = init_color_params(jax.random.PRNGKey(6), obj_cfg)
    n = 6
    xyz_feature = jnp.asarray(rng.normal(size=(n, hand_cfg.input_width - 256 - 27)))
    feat = jnp.asarray(rng.normal(size=(n, 256)))
    grad = jnp.asarray(rng.normal(size=(n, 3)))
    c = color_hand_apply(hp, hand_cfg, xyz_feature, feat, grad)
    assert c.shape == (n, 3)
    assert float(c.min()) >= 0.0 and float(c.max()) <= 1.0
    pts = jnp.asarray(rng.normal(size=(n, 3)))
    dirs = jnp.asarray(rng.normal(size=(n, 3)))
    c2 = color_obj_apply(op, obj_cfg, pts, dirs, feat, grad)
    assert c2.shape == (n, 3)
    assert float(c2.min()) >= 0.0 and float(c2.max()) <= 1.0


def test_variance_and_se3_refine():
    vp = init_variance_params(0.3)
    np.testing.assert_allclose(float(variance_apply(vp)), np.exp(3.0), rtol=1e-6)
    hand_table = init_se3_refine(10, "hand")
    obj_table = init_se3_refine(10, "obj")
    assert hand_table.shape == (10, 36) and obj_table.shape == (10, 9)
    # identity rot6d in first 6 slots
    from honerf_tpu.utils.transforms import rot6d_to_matrix

    np.testing.assert_allclose(
        np.asarray(rot6d_to_matrix(hand_table[0, :6])), np.eye(3), atol=1e-6
    )
