"""FULL-SIZE golden render parity vs the PyTorch reference (VERDICT r2 #2).

Same oracle pattern as tests/test_render_golden.py but at the REAL paper
architecture — hand SDF 8x256 skip@4 d_out=257 v_multires=10 r_multires=7
(1386-wide bone embedding), obj SDF 8x256 v_multires=10, color nets 4x256,
renderer 64+64 samples with 4 up-sample steps (192-sample dual union) —
so the width-dependent code paths (the geometric-init skip slice
models/mlp.py, the channel-major gather at 1386 columns, the full ladder)
are pinned against the oracle at real widths, not just the small CI nets.

Slow on CPU (one-time jit of the full renderer); runs in the normal suite.
Reference: utils/fields.py:56-177, :251-347, utils/renderer.py:107-258,
:434-535; confs/wmask_realhand_hand1.conf / wmask_realobj_bean.conf.
"""

import os
import sys
import types
from unittest import mock

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


class _Emb:
    """Reference-compatible PE embedding module (NeRF sin/cos interleave,
    matching utils/fields.py:8-20 semantics used by the oracle nets)."""

    def __new__(cls):
        import torch

        class M(torch.nn.Module):
            def forward(self, x, L):
                shape = x.shape
                freq = 2 ** torch.arange(L, dtype=torch.float32)
                spectrum = x[..., None] * freq
                enc = torch.stack([spectrum.sin(), spectrum.cos()], dim=-2)
                return enc.reshape(*shape[:-1], -1)

        return M()


def _half_rand(*shape, **kw):
    import torch

    if len(shape) == 1 and isinstance(shape[0], (list, tuple)):
        shape = tuple(shape[0])
    return torch.full(shape, 0.5)


def _to_np(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


def _posed_hand():
    """A genuinely articulated + rotated hand and its bone transforms via
    our (golden-tested) HALO chain."""
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints

    joints = canonical_hand_joints(curl=0.35).astype(np.float32)
    axis = np.asarray([0.3, 0.8, 0.52])
    axis /= np.linalg.norm(axis)
    K = np.asarray([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                    [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(0.9) * K + (1 - np.cos(0.9)) * (K @ K)
    joints = (joints @ R.T).astype(np.float32)
    bt_inv = np.asarray(
        bone_transforms_from_mano_joints(jnp.asarray(joints)[None])[0]
    )
    t_pose = canonical_hand_joints(0.0).astype(np.float32)
    return joints, bt_inv, t_pose, np.asarray(R, np.float32)


def _full_hand_nets(ref_fields, seed=0, use_batch=False):
    import torch

    torch.manual_seed(seed)
    emb = _Emb()
    t_sdf = ref_fields.SDFNetwork(
        emb, 4, "real", d_in=3, d_out=257, d_hidden=256, n_layers=8,
        skip_in=(4,), v_multires=10, r_multires=7, use_batch=use_batch,
    )
    t_color = ref_fields.RenderingNetwork(
        emb, "real", d_feature=256, d_in=3, d_out=3, d_hidden=256,
        n_layers=4, v_multires=10, r_multires=7, grad_multires=4,
        use_gradients=True,
    )
    t_var = ref_fields.SingleVarianceNetwork(0.3)
    return t_sdf, t_color, t_var


def _full_obj_nets(ref_fields, seed=3):
    import torch

    torch.manual_seed(seed)
    emb = _Emb()
    t_sdf = ref_fields.SDFNetwork_OBJ(
        emb, 4, "real", d_in=3, d_out=257, d_hidden=256, n_layers=8,
        skip_in=(4,), v_multires=10, r_multires=4,
    )
    t_color = ref_fields.RenderingNetwork_OBJ(
        emb, "real", d_feature=256, d_in=3, d_out=3, d_hidden=256,
        n_layers=4, v_multires=10, r_multires=4, grad_multires=4,
    )
    t_var = ref_fields.SingleVarianceNetwork(0.25)
    return t_sdf, t_color, t_var


def _convert_triplet(t_sdf, t_color, t_var):
    from honerf_tpu.train.checkpoints import convert_torch_state_dict

    p = {
        "sdf": {"layers": convert_torch_state_dict(
            _to_np(t_sdf.state_dict()))["layers"]},
        "color": {"layers": convert_torch_state_dict(
            _to_np(t_color.state_dict()))["layers"]},
        "variance": {"variance": jnp.asarray(float(t_var.variance))},
    }
    return jax.tree.map(jnp.asarray, p)


HAND_SDF_CFG = dict(kind="hand", n_layers=8, d_hidden=256, d_out=257,
                    skip_in=(4,), v_multires=10, r_multires=7)
HAND_COLOR_CFG = dict(kind="hand", d_feature=256, d_hidden=256, n_layers=4,
                      v_multires=10, r_multires=7, grad_multires=4)
OBJ_SDF_CFG = dict(kind="obj", n_layers=8, d_hidden=256, d_out=257,
                   skip_in=(4,), v_multires=10)
OBJ_COLOR_CFG = dict(kind="obj", d_feature=256, d_hidden=256, n_layers=4,
                     v_multires=10, r_multires=4, grad_multires=4)


def test_hand_render_single_golden_fullsize(reference_renderer_mod):
    """Offline hand renderer at the real architecture: 8 rays through
    8x256/skip@4/v10/r7 (1386-ch embedding) with the full 64+64/up=4
    ladder vs the torch oracle."""
    import torch

    from honerf_tpu.models import ColorConfig, SDFConfig
    from honerf_tpu.render import RenderConfig, render_single
    from honerf_tpu.render.neus import make_hand_field

    ref_fields, ref_renderer = reference_renderer_mod
    t_sdf, t_color, t_var = _full_hand_nets(ref_fields)
    renderer = ref_renderer.NeuSRenderer(
        t_sdf, t_var, t_color, "hand",
        n_samples=64, n_importance=64, n_outside=0, up_sample_steps=4,
        perturb=1.0,
    )
    renderer.index = 0

    joints, bt_inv, t_pose, _R = _posed_hand()
    n_rays = 8
    rng = np.random.default_rng(7)
    center = joints.mean(0)
    rays_o = (center + [0, 0, -0.9]
              + rng.normal(size=(n_rays, 3)) * 0.05).astype(np.float32)
    rays_d = np.tile(np.asarray([[0.0, 0, 1]], np.float32), (n_rays, 1))

    with mock.patch.object(torch, "rand", _half_rand):
        want = renderer.render(
            torch.from_numpy(rays_o), torch.from_numpy(rays_d), 0.4, 1.5,
            torch.from_numpy(bt_inv), torch.from_numpy(t_pose), None,
            torch.eye(3), torch.zeros(3), 0,
        )
        want = {k: (v.detach().numpy() if torch.is_tensor(v) else v)
                for k, v in want.items()}

    params = _convert_triplet(t_sdf, t_color, t_var)
    field = make_hand_field(
        params, SDFConfig(**HAND_SDF_CFG), ColorConfig(**HAND_COLOR_CFG),
        jnp.asarray(bt_inv), jnp.asarray(t_pose),
    )
    rcfg = RenderConfig(n_samples=64, n_importance=64, up_sample_steps=4,
                        perturb=0.0)
    got = render_single(
        field, rcfg, jax.random.PRNGKey(0), jnp.asarray(rays_o),
        jnp.asarray(rays_d), 0.4, 1.5, cumprod_seed="prev_cdf",
    )
    np.testing.assert_allclose(
        np.asarray(got["color_fine"]), want["color_fine"], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["weight_sum"]), want["weight_sum"], atol=1e-3
    )
    np.testing.assert_allclose(
        float(got["gradient_error"]), float(want["gradient_error"]),
        atol=1e-3,
    )


def test_obj_render_single_golden_fullsize(reference_renderer_mod):
    """Offline object renderer at the real architecture (8x256/skip@4/v10,
    64+64/up=4) vs the torch oracle — pins the obj skip style
    (shrunk pre-skip output, utils/fields.py:281-284) at real widths."""
    import torch

    from honerf_tpu.models import ColorConfig, SDFConfig
    from honerf_tpu.render import RenderConfig, make_obj_field, render_single

    ref_fields, ref_renderer = reference_renderer_mod
    t_sdf, t_color, t_var = _full_obj_nets(ref_fields)
    renderer = ref_renderer.NeuSRenderer(
        t_sdf, t_var, t_color, "obj",
        n_samples=64, n_importance=64, n_outside=0, up_sample_steps=4,
        perturb=1.0,
    )
    renderer.index = 0

    n_rays = 8
    rng = np.random.default_rng(11)
    rays_o = (rng.normal(size=(n_rays, 3)) * 0.1
              + [0, 0, -0.9]).astype(np.float32)
    rays_d = np.tile(np.asarray([[0.0, 0, 1]], np.float32), (n_rays, 1))

    with mock.patch.object(torch, "rand", _half_rand):
        want = renderer.render(
            torch.from_numpy(rays_o), torch.from_numpy(rays_d), 0.4, 1.5,
            torch.zeros(21, 4, 4), torch.zeros(21, 3), None,
            torch.eye(3), torch.zeros(3), 0,
        )
        want = {k: (v.detach().numpy() if torch.is_tensor(v) else v)
                for k, v in want.items()}

    params = _convert_triplet(t_sdf, t_color, t_var)
    field = make_obj_field(
        params, SDFConfig(**OBJ_SDF_CFG), ColorConfig(**OBJ_COLOR_CFG)
    )
    rcfg = RenderConfig(n_samples=64, n_importance=64, up_sample_steps=4,
                        perturb=0.0)
    got = render_single(
        field, rcfg, jax.random.PRNGKey(0), jnp.asarray(rays_o),
        jnp.asarray(rays_d), 0.4, 1.5, cumprod_seed="prev_cdf",
    )
    np.testing.assert_allclose(
        np.asarray(got["color_fine"]), want["color_fine"], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["weight_sum"]), want["weight_sum"], atol=1e-3
    )


def test_dual_render_golden_fullsize(reference_renderer_mod):
    """Online dual hand+object renderer at the real architecture: the full
    192-sample merged union (64 coarse + 2x64 importance, up=4 per model)
    through both full-size nets vs the torch NeuSRenderer_fitting."""
    import torch

    from honerf_tpu.models import ColorConfig, SDFConfig
    from honerf_tpu.render import RenderConfig, rays_to_object_frame
    from honerf_tpu.render.dual import render_dual
    from honerf_tpu.render.neus import make_hand_field, make_obj_field

    ref_fields, ref_renderer = reference_renderer_mod
    t_hand_sdf, t_hand_color, t_var_h = _full_hand_nets(ref_fields, seed=1)
    t_obj_sdf, t_obj_color, t_var_o = _full_obj_nets(ref_fields, seed=2)
    renderer = ref_renderer.NeuSRenderer_fitting(
        t_hand_sdf, t_var_h, t_hand_color, t_obj_sdf, t_var_o, t_obj_color,
        n_samples=64, n_importance=64, n_outside=0, up_sample_steps=4,
        perturb=1.0,
    )

    joints, bt_inv, t_pose, R = _posed_hand()
    obj_r = R
    obj_t = joints.mean(0) + np.asarray([0.0, 0.0, 0.05], np.float32)

    n_rays = 8
    rng = np.random.default_rng(5)
    center = joints.mean(0)
    rays_o = (center + [0, 0, -0.9]
              + rng.normal(size=(n_rays, 3)) * 0.05).astype(np.float32)
    rays_d = np.tile(np.asarray([[0.0, 0, 1]], np.float32), (n_rays, 1))

    with mock.patch.object(torch, "rand", _half_rand):
        want = renderer.render(
            torch.from_numpy(rays_o), torch.from_numpy(rays_d), 0.4, 1.5,
            torch.from_numpy(bt_inv), torch.from_numpy(t_pose), None,
            torch.from_numpy(obj_r).T, torch.from_numpy(obj_t),
        )
        want = {k: v.detach().numpy() for k, v in want.items()
                if torch.is_tensor(v)}

    hp = _convert_triplet(t_hand_sdf, t_hand_color, t_var_h)
    op = _convert_triplet(t_obj_sdf, t_obj_color, t_var_o)
    hand_field = make_hand_field(
        hp, SDFConfig(**HAND_SDF_CFG), ColorConfig(**HAND_COLOR_CFG),
        jnp.asarray(bt_inv), jnp.asarray(t_pose),
    )
    obj_field = make_obj_field(
        op, SDFConfig(**OBJ_SDF_CFG), ColorConfig(**OBJ_COLOR_CFG)
    )
    rcfg = RenderConfig(n_samples=64, n_importance=64, up_sample_steps=4,
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
        np.asarray(got["color_fine"]), want["color_fine"], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["weight_sum"]), want["weight_sum"], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["sdf_hand"]).reshape(-1),
        want["sdf_hand"].reshape(-1), atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["sdf_obj"]).reshape(-1),
        want["sdf_obj"].reshape(-1), atol=1e-3,
    )


def _posed_hand_variant(curl: float, angle: float, seed: int):
    """A distinct articulated+rotated hand per video frame."""
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints

    rng = np.random.default_rng(seed)
    joints = canonical_hand_joints(curl=curl).astype(np.float32)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    K = np.asarray([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                    [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)
    joints = (joints @ R.T).astype(np.float32)
    bt_inv = np.asarray(
        bone_transforms_from_mano_joints(jnp.asarray(joints)[None])[0]
    )
    t_pose = canonical_hand_joints(0.0).astype(np.float32)
    return joints, bt_inv, t_pose, np.asarray(R, np.float32)


@pytest.fixture(scope="module")
def batched_video_setup(reference_renderer_mod):
    """Shared full-size nets + a 4-frame window of distinct hand/object
    poses for the renderer_batch.py parity tests."""
    ref_fields, _ = reference_renderer_mod
    sys.path.insert(0, REFERENCE)
    try:
        from utils import renderer_batch as ref_renderer_batch
    finally:
        sys.path.pop(0)

    # the video fitter constructs the hand SDF net with use_batch=True
    # (fitting_video.py:97) so anerf_emb_point_batch handles the frame axis
    t_hand_sdf, t_hand_color, t_var_h = _full_hand_nets(
        ref_fields, seed=4, use_batch=True
    )
    t_obj_sdf, t_obj_color, t_var_o = _full_obj_nets(ref_fields, seed=5)
    renderer = ref_renderer_batch.NeuSRenderer_fitting(
        t_hand_sdf, t_var_h, t_hand_color, t_obj_sdf, t_var_o, t_obj_color,
        n_samples=64, n_importance=64, n_outside=0, up_sample_steps=4,
        perturb=1.0,
    )

    F = 4
    frames = [
        _posed_hand_variant(curl, ang, seed)
        for curl, ang, seed in [(0.2, 0.5, 10), (0.3, 0.7, 11),
                                (0.4, 0.9, 12), (0.5, 1.1, 13)]
    ]
    joints = np.stack([f[0] for f in frames])          # (F, 21, 3)
    bt_inv = np.stack([f[1] for f in frames])          # (F, 21, 4, 4)
    t_pose = frames[0][2]
    rng = np.random.default_rng(17)
    obj_r = np.stack([f[3] for f in frames])           # (F, 3, 3)
    obj_t = (joints.mean(1)
             + np.asarray([0.0, 0.0, 0.05], np.float32)
             + rng.normal(size=(F, 3)).astype(np.float32) * 0.01)

    hp = _convert_triplet(t_hand_sdf, t_hand_color, t_var_h)
    op = _convert_triplet(t_obj_sdf, t_obj_color, t_var_o)
    return {
        "renderer": renderer, "F": F, "joints": joints, "bt_inv": bt_inv,
        "t_pose": t_pose, "obj_r": obj_r, "obj_t": obj_t,
        "hand_params": hp, "obj_params": op,
    }


def test_batched_video_render_golden_fullsize(
    batched_video_setup, reference_renderer_mod
):
    """The frame-batched video renderer — our `jax.vmap(render_dual)` over
    the (F, R) window exactly as fit/video.py:124-138 builds it — vs the
    reference renderers at the real architecture (VERDICT r3 #6).
    4 frames x 8 rays, per-frame bone transforms and object poses;
    reference takes Ro = inverse(obj_r) (fitting_video.py:280-285).

    REFERENCE BUG, deliberately NOT replicated: the batched
    `cat_z_vals` post-sort sdf gather builds its row index as
    `arange(pixel_sample)` expanded over the batch
    (utils/renderer_batch.py:109-111), so after flattening to
    (B*P, S) every frame gathers FRAME 0's sdf rows — frames >= 1 run
    their up-sample ladder on frame 0's sdf values.  Our vmapped
    renderer is frame-correct (each frame's ladder sees its own sdf), so:

      * frame 0 (where the gather is accidentally correct) is pinned
        against the BATCHED oracle at <=1e-3 on all outputs;
      * every frame is pinned against the SINGLE-frame
        NeuSRenderer_fitting (utils/renderer.py — the semantics the
        batched renderer is meant to vectorize) at <=1e-3;
      * color/weight_sum still agree with the batched oracle across all
        frames at <=1e-3 (the misplaced importance samples barely move
        the composited outputs at 192 samples/ray — which is why the
        bug is invisible in the reference's own results).
    """
    import torch

    from honerf_tpu.models import ColorConfig, SDFConfig
    from honerf_tpu.render import RenderConfig, rays_to_object_frame
    from honerf_tpu.render.dual import render_dual
    from honerf_tpu.render.neus import make_hand_field, make_obj_field

    s = batched_video_setup
    F, n_rays = s["F"], 8
    rng = np.random.default_rng(19)
    centers = s["joints"].mean(1)  # (F, 3)
    rays_o = (centers[:, None]
              + np.asarray([0, 0, -0.9], np.float32)
              + rng.normal(size=(F, n_rays, 3)) * 0.05).astype(np.float32)
    rays_d = np.tile(
        np.asarray([[[0.0, 0, 1]]], np.float32), (F, n_rays, 1)
    )

    with mock.patch.object(torch, "rand", _half_rand):
        want = s["renderer"].render(
            torch.from_numpy(rays_o), torch.from_numpy(rays_d), 0.4, 1.5,
            torch.from_numpy(s["bt_inv"]),
            torch.from_numpy(np.tile(s["t_pose"][None], (F, 1, 1))),
            None,
            torch.inverse(torch.from_numpy(s["obj_r"])),
            torch.from_numpy(s["obj_t"]),
        )
        want = {k: v.detach().numpy() for k, v in want.items()
                if torch.is_tensor(v)}

    hand_sdf_cfg = SDFConfig(**HAND_SDF_CFG)
    hand_color_cfg = ColorConfig(**HAND_COLOR_CFG)
    obj_field = make_obj_field(
        s["obj_params"], SDFConfig(**OBJ_SDF_CFG), ColorConfig(**OBJ_COLOR_CFG)
    )
    rcfg = RenderConfig(n_samples=64, n_importance=64, up_sample_steps=4,
                        perturb=0.0)

    def render_frame(o, d, bt, ro, to, sub):
        hand_field = make_hand_field(
            s["hand_params"], hand_sdf_cfg, hand_color_cfg, bt,
            jnp.asarray(s["t_pose"]),
        )
        oo, do = rays_to_object_frame(o, d, ro, to)
        return render_dual(
            hand_field, obj_field, rcfg, sub, o, d, oo, do, 0.4, 1.5,
        )

    keys = jax.random.split(jax.random.PRNGKey(0), F)
    got = jax.vmap(render_frame)(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(s["bt_inv"]),
        jnp.asarray(s["obj_r"]), jnp.asarray(s["obj_t"]), keys,
    )
    # composited outputs agree with the batched oracle on ALL frames
    np.testing.assert_allclose(
        np.asarray(got["color_fine"]), want["color_fine"], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["weight_sum"]).reshape(F, n_rays),
        want["weight_sum"].reshape(F, n_rays), atol=1e-3,
    )
    # frame 0: the batched gather is accidentally correct -> full parity
    n_z = want["sdf_hand"].reshape(F, -1).shape[1]
    np.testing.assert_allclose(
        np.asarray(got["sdf_hand"])[0].reshape(-1),
        want["sdf_hand"].reshape(F, n_z)[0], atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["sdf_obj"])[0].reshape(-1),
        want["sdf_obj"].reshape(F, n_z)[0], atol=1e-3,
    )

    # every frame vs the SINGLE-frame oracle (the intended semantics)
    ref_fields, ref_renderer = reference_renderer_mod
    t_hand_sdf, t_hand_color, t_var_h = _full_hand_nets(ref_fields, seed=4)
    t_obj_sdf, t_obj_color, t_var_o = _full_obj_nets(ref_fields, seed=5)
    single = ref_renderer.NeuSRenderer_fitting(
        t_hand_sdf, t_var_h, t_hand_color, t_obj_sdf, t_var_o, t_obj_color,
        n_samples=64, n_importance=64, n_outside=0, up_sample_steps=4,
        perturb=1.0,
    )
    for f in range(F):
        with mock.patch.object(torch, "rand", _half_rand):
            w = single.render(
                torch.from_numpy(rays_o[f]), torch.from_numpy(rays_d[f]),
                0.4, 1.5,
                torch.from_numpy(s["bt_inv"][f]),
                torch.from_numpy(s["t_pose"]), None,
                torch.from_numpy(s["obj_r"][f]).T,
                torch.from_numpy(s["obj_t"][f]),
            )
            w = {k: v.detach().numpy() for k, v in w.items()
                 if torch.is_tensor(v)}
        np.testing.assert_allclose(
            np.asarray(got["color_fine"])[f], w["color_fine"], atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(got["sdf_hand"])[f].reshape(-1),
            w["sdf_hand"].reshape(-1), atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(got["sdf_obj"])[f].reshape(-1),
            w["sdf_obj"].reshape(-1), atol=1e-3,
        )


def test_stable_loss_cross_golden_fullsize(batched_video_setup):
    """get_stable_loss_cross at the real architecture and a realistic V'
    (4 frames x 800 verts -> ::10 = 80 in-loss verts) vs the torch oracle
    (utils/renderer_batch.py:318-371), with our hand SDF evaluated exactly
    as fit/video.py:212-224 does (VERDICT r3 #6)."""
    import torch

    from honerf_tpu.models import ColorConfig, SDFConfig
    from honerf_tpu.render.losses import stable_loss_cross
    from honerf_tpu.render.neus import make_hand_field

    s = batched_video_setup
    F = s["F"]
    rng = np.random.default_rng(23)
    # object-local verts scaled to straddle the hand surface once posed
    verts = (rng.normal(size=(800, 3)) * 0.06).astype(np.float32)

    want = s["renderer"].get_stable_loss_cross(
        torch.from_numpy(np.tile(verts[None], (F, 1, 1))),
        torch.from_numpy(s["bt_inv"]),
        torch.from_numpy(np.tile(s["t_pose"][None], (F, 1, 1))),
        torch.from_numpy(s["obj_r"]), torch.from_numpy(s["obj_t"]),
    )
    want = float(want)
    # the quirk paths must actually engage for this to pin anything
    assert want > 0, "fixture produced no cross-frame penetration"

    hand_sdf_cfg = SDFConfig(**HAND_SDF_CFG)
    hand_color_cfg = ColorConfig(**HAND_COLOR_CFG)
    verts_ds = jnp.asarray(verts[::10])
    world_v = (
        jnp.einsum("fij,vj->fvi", jnp.asarray(s["obj_r"]), verts_ds)
        + jnp.asarray(s["obj_t"])[:, None]
    )

    def hand_sdf_frame(pts, bt):
        hand_field = make_hand_field(
            s["hand_params"], hand_sdf_cfg, hand_color_cfg, bt,
            jnp.asarray(s["t_pose"]),
        )
        return hand_field.sdf_fn(pts)

    hand_sdf_v = jax.vmap(hand_sdf_frame)(
        world_v, jnp.asarray(s["bt_inv"])
    )
    got = float(stable_loss_cross(hand_sdf_v.reshape(F, -1), verts_ds))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_geometric_init_zero_pattern_fullsize(reference_renderer_mod):
    """The geometric-init skip slice (models/mlp.py `w[:, -(dims[0]-3):]`)
    zeroes the SAME columns as the reference at REAL widths: the hand
    skip layer's trailing 1383 embedding columns (utils/fields.py:107-109)
    and the obj pre/post-skip handling (utils/fields.py:289-297)."""
    import torch

    from honerf_tpu.models import SDFConfig, init_sdf_params
    from honerf_tpu.models.mlp import linear_weight

    ref_fields, _ = reference_renderer_mod
    t_sdf, _, _ = _full_hand_nets(ref_fields)
    cfg = SDFConfig(**HAND_SDF_CFG)
    ours = init_sdf_params(jax.random.PRNGKey(0), cfg)
    for li in range(cfg.n_layers + 1):
        t_lin = getattr(t_sdf, f"lin{li}")
        # weight_norm stores the direction in weight_v
        tw = t_lin.weight_v.detach().numpy()
        ow = np.asarray(linear_weight(ours["layers"][li]))
        assert tw.shape == ow.shape, (li, tw.shape, ow.shape)
        t_zero_cols = np.flatnonzero((tw == 0).all(axis=0))
        o_zero_cols = np.flatnonzero((np.asarray(
            ours["layers"][li]["v"]) == 0).all(axis=0))
        np.testing.assert_array_equal(t_zero_cols, o_zero_cols)
