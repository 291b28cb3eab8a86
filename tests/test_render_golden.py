"""Golden end-to-end render parity: our jitted single-volume renderer vs
the PyTorch reference `NeuSRenderer` running the SAME converted weights on
the SAME rays (perturb=0 -> fully deterministic on both sides).

The reference modules import native deps that are absent here (mcubes,
torchvision); they are stubbed at import time — only the pure-torch render
path is exercised.  Oracle-only usage; nothing from the reference ships.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(REFERENCE)


@pytest.fixture(scope="module")
def reference_renderer_mod():
    if not HAS_REFERENCE:
        pytest.skip("reference repo not mounted")
    # stub native deps the reference imports at module scope
    if "mcubes" not in sys.modules:
        sys.modules["mcubes"] = types.ModuleType("mcubes")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.SimpleNamespace(
            vgg19=lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("vgg not available in oracle stub")
            )
        )
        sys.modules["torchvision"] = tv
    sys.path.insert(0, REFERENCE)
    try:
        from utils import fields as ref_fields  # noqa: F401
        from utils import renderer as ref_renderer
    finally:
        sys.path.pop(0)
    return ref_fields, ref_renderer


def test_obj_render_golden_parity(reference_renderer_mod):
    import torch

    from honerf_tpu.models import (
        ColorConfig,
        SDFConfig,
        variance_apply,
    )
    from honerf_tpu.render import RenderConfig, make_obj_field, render_single
    from honerf_tpu.train.checkpoints import convert_torch_state_dict

    ref_fields, ref_renderer = reference_renderer_mod
    torch.manual_seed(0)
    torch.set_default_dtype(torch.float32)

    class _Emb(torch.nn.Module):
        def forward(self, x, L):
            shape = x.shape
            freq = 2 ** torch.arange(L, dtype=torch.float32)
            spectrum = x[..., None] * freq
            enc = torch.stack([spectrum.sin(), spectrum.cos()], dim=-2)
            return enc.reshape(*shape[:-1], -1)

    emb = _Emb()
    # small-but-real architecture (full 8x256 makes the oracle slow on CPU)
    t_sdf = ref_fields.SDFNetwork_OBJ(
        emb, 4, "real", d_in=3, d_out=129, d_hidden=128, n_layers=4,
        skip_in=(2,), v_multires=6, r_multires=4,
    )
    t_color = ref_fields.RenderingNetwork_OBJ(
        emb, "real", d_feature=128, d_in=3, d_out=3, d_hidden=64, n_layers=2,
        v_multires=6, r_multires=4, grad_multires=4,
    )
    t_var = ref_fields.SingleVarianceNetwork(0.3)
    # perturb must stay > 0: the reference's z_vals keeps a broadcast
    # batch dim of 1 when perturb == 0 and its up_sample reshape crashes
    # (utils/renderer.py:206-212 + :65).  Patch torch.rand to 0.5 so the
    # jitter term (rand - 0.5) is exactly zero -> deterministic.
    renderer = ref_renderer.NeuSRenderer(
        t_sdf, t_var, t_color, "obj",
        n_samples=16, n_importance=16, n_outside=0, up_sample_steps=2,
        perturb=1.0,
    )
    renderer.index = 0

    n_rays = 24
    rng = np.random.default_rng(0)
    rays_o = (rng.normal(size=(n_rays, 3)) * 0.1 + [0, 0, -0.9]).astype(np.float32)
    rays_d = np.tile(np.asarray([[0.0, 0, 1]], np.float32), (n_rays, 1))
    bt = torch.zeros(21, 4, 4)
    tp = torch.zeros(21, 3)
    from unittest import mock

    def _half_rand(*shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (list, tuple)):
            shape = tuple(shape[0])
        return torch.full(shape, 0.5)

    # grad must stay enabled: render_core uses autograd for the spatial
    # SDF gradient (utils/renderer.py:134)
    with mock.patch.object(torch, "rand", _half_rand):
        want = renderer.render(
            torch.from_numpy(rays_o), torch.from_numpy(rays_d), 0.4, 1.5,
            bt, tp, None, torch.eye(3), torch.zeros(3), 0,
        )
        want = {k: (v.detach() if torch.is_tensor(v) else v) for k, v in want.items()}
    want_color = want["color_fine"].numpy()
    want_ws = want["weight_sum"].numpy()

    # convert weights -> our parametrization
    sdf_cfg = SDFConfig(kind="obj", n_layers=4, d_hidden=128, d_out=129,
                        skip_in=(2,), v_multires=6)
    color_cfg = ColorConfig(kind="obj", d_feature=128, d_hidden=64, n_layers=2,
                            v_multires=6, r_multires=4, use_gradients=True)
    to_np = lambda sd: {k: v.detach().numpy() for k, v in sd.items()}
    params = {
        "sdf": {
            "layers": convert_torch_state_dict(to_np(t_sdf.state_dict()))["layers"]
        },
        "color": {
            "layers": convert_torch_state_dict(to_np(t_color.state_dict()))["layers"]
        },
        "variance": {"variance": jnp.asarray(float(t_var.variance))},
    }
    params = jax.tree.map(jnp.asarray, params)
    rcfg = RenderConfig(n_samples=16, n_importance=16, up_sample_steps=2,
                        perturb=0.0)
    field = make_obj_field(params, sdf_cfg, color_cfg)
    got = render_single(
        field, rcfg, jax.random.PRNGKey(0), jnp.asarray(rays_o),
        jnp.asarray(rays_d), 0.4, 1.5, cumprod_seed="prev_cdf",
    )
    np.testing.assert_allclose(
        float(variance_apply(params["variance"])),
        float(torch.exp(t_var.variance * 10)), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got["color_fine"]), want_color, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["weight_sum"]), want_ws, atol=2e-4
    )


def test_dual_render_golden_parity(reference_renderer_mod):
    """Dual hand+object fitting renderer vs the reference
    NeuSRenderer_fitting on identical converted weights, rays and pose —
    exercises the anerf bone embedding, per-model importance ladders, the
    merged 192-sample union and occlusion compositing."""
    import torch
    from unittest import mock

    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints
    from honerf_tpu.models import ColorConfig, SDFConfig
    from honerf_tpu.render import RenderConfig, rays_to_object_frame
    from honerf_tpu.render.dual import render_dual
    from honerf_tpu.render.neus import make_hand_field, make_obj_field
    from honerf_tpu.train.checkpoints import convert_torch_state_dict

    ref_fields, ref_renderer = reference_renderer_mod
    torch.manual_seed(1)

    class _Emb(torch.nn.Module):
        def forward(self, x, L):
            shape = x.shape
            freq = 2 ** torch.arange(L, dtype=torch.float32)
            spectrum = x[..., None] * freq
            enc = torch.stack([spectrum.sin(), spectrum.cos()], dim=-2)
            return enc.reshape(*shape[:-1], -1)

    emb = _Emb()
    t_hand_sdf = ref_fields.SDFNetwork(
        emb, 4, "real", d_in=3, d_out=65, d_hidden=64, n_layers=3,
        skip_in=(2,), v_multires=3, r_multires=2,
    )
    t_hand_color = ref_fields.RenderingNetwork(
        emb, "real", d_feature=64, d_in=3, d_out=3, d_hidden=64, n_layers=2,
        v_multires=3, r_multires=2, grad_multires=4, use_gradients=True,
    )
    t_obj_sdf = ref_fields.SDFNetwork_OBJ(
        emb, 4, "real", d_in=3, d_out=65, d_hidden=64, n_layers=3,
        skip_in=(2,), v_multires=6,
    )
    t_obj_color = ref_fields.RenderingNetwork_OBJ(
        emb, "real", d_feature=64, d_in=3, d_out=3, d_hidden=64, n_layers=2,
        v_multires=6, r_multires=4, grad_multires=4,
    )
    t_var_h = ref_fields.SingleVarianceNetwork(0.3)
    t_var_o = ref_fields.SingleVarianceNetwork(0.25)
    renderer = ref_renderer.NeuSRenderer_fitting(
        t_hand_sdf, t_var_h, t_hand_color, t_obj_sdf, t_var_o, t_obj_color,
        n_samples=16, n_importance=16, n_outside=0, up_sample_steps=2,
        perturb=1.0,
    )

    # a real posed hand -> bone transforms via our HALO chain (already
    # golden-tested against the reference converter in test_hand.py)
    joints = canonical_hand_joints(curl=0.35).astype(np.float32)
    axis = np.asarray([0.3, 0.8, 0.52]); axis /= np.linalg.norm(axis)
    K = np.asarray([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                    [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(0.9) * K + (1 - np.cos(0.9)) * (K @ K)
    joints = (joints @ R.T).astype(np.float32)
    bt_inv = np.asarray(
        bone_transforms_from_mano_joints(jnp.asarray(joints)[None])[0]
    )
    t_pose = canonical_hand_joints(0.0).astype(np.float32)
    obj_r = np.asarray(R, np.float32)
    obj_t = joints.mean(0) + np.asarray([0.0, 0.0, 0.05], np.float32)

    n_rays = 12
    rng = np.random.default_rng(1)
    center = joints.mean(0)
    rays_o = (center + [0, 0, -0.9] + rng.normal(size=(n_rays, 3)) * 0.05).astype(
        np.float32
    )
    rays_d = np.tile(np.asarray([[0.0, 0, 1]], np.float32), (n_rays, 1))

    def _half_rand(*shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (list, tuple)):
            shape = tuple(shape[0])
        return torch.full(shape, 0.5)

    with mock.patch.object(torch, "rand", _half_rand):
        want = renderer.render(
            torch.from_numpy(rays_o), torch.from_numpy(rays_d), 0.4, 1.5,
            torch.from_numpy(bt_inv), torch.from_numpy(t_pose), None,
            torch.from_numpy(obj_r).T, torch.from_numpy(obj_t),
        )
        want = {k: v.detach().numpy() for k, v in want.items()
                if torch.is_tensor(v)}

    to_np = lambda sd: {k: v.detach().numpy() for k, v in sd.items()}
    hand_sdf_cfg = SDFConfig(kind="hand", n_layers=3, d_hidden=64, d_out=65,
                             skip_in=(2,), v_multires=3, r_multires=2)
    hand_color_cfg = ColorConfig(kind="hand", d_feature=64, d_hidden=64,
                                 n_layers=2, v_multires=3, r_multires=2)
    obj_sdf_cfg = SDFConfig(kind="obj", n_layers=3, d_hidden=64, d_out=65,
                            skip_in=(2,), v_multires=6)
    obj_color_cfg = ColorConfig(kind="obj", d_feature=64, d_hidden=64,
                                n_layers=2, v_multires=6, r_multires=4)
    hp = {
        "sdf": {"layers": convert_torch_state_dict(to_np(t_hand_sdf.state_dict()))["layers"]},
        "color": {"layers": convert_torch_state_dict(to_np(t_hand_color.state_dict()))["layers"]},
        "variance": {"variance": jnp.asarray(float(t_var_h.variance))},
    }
    op = {
        "sdf": {"layers": convert_torch_state_dict(to_np(t_obj_sdf.state_dict()))["layers"]},
        "color": {"layers": convert_torch_state_dict(to_np(t_obj_color.state_dict()))["layers"]},
        "variance": {"variance": jnp.asarray(float(t_var_o.variance))},
    }
    hp = jax.tree.map(jnp.asarray, hp)
    op = jax.tree.map(jnp.asarray, op)
    hand_field = make_hand_field(
        hp, hand_sdf_cfg, hand_color_cfg, jnp.asarray(bt_inv), jnp.asarray(t_pose)
    )
    obj_field = make_obj_field(op, obj_sdf_cfg, obj_color_cfg)
    rcfg = RenderConfig(n_samples=16, n_importance=16, up_sample_steps=2,
                        perturb=0.0)
    oo, do = rays_to_object_frame(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(obj_r),
        jnp.asarray(obj_t),
    )
    got = render_dual(
        hand_field, obj_field, rcfg, jax.random.PRNGKey(0),
        jnp.asarray(rays_o), jnp.asarray(rays_d), oo, do, 0.4, 1.5,
    )
    np.testing.assert_allclose(
        np.asarray(got["color_fine"]), want["color_fine"], atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["weight_sum"]), want["weight_sum"], atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["sdf_hand"]).reshape(-1),
        want["sdf_hand"].reshape(-1), atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["sdf_obj"]).reshape(-1),
        want["sdf_obj"].reshape(-1), atol=5e-4,
    )
