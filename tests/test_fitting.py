"""Online pose-fitting tests: dual render + interaction losses + pose
optimization for single-frame ('1'/'12') and video ('123'/'1234') fitters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honerf_tpu.data.synthetic import canonical_hand_joints
from honerf_tpu.fit import (
    FitHyper,
    init_pose_params,
    init_video_tables,
    make_single_fit_step,
    make_video_fit_step,
)
from honerf_tpu.models import (
    ColorConfig,
    SDFConfig,
    init_color_params,
    init_sdf_params,
    init_variance_params,
)
from honerf_tpu.render import RenderConfig
from honerf_tpu.render.losses import contact_loss, penetration_loss, stable_loss_cross


def tiny_nets():
    hand_sdf = SDFConfig(kind="hand", n_layers=3, d_hidden=64, d_out=65,
                         skip_in=(2,), v_multires=3, r_multires=2)
    hand_col = ColorConfig(kind="hand", d_feature=64, n_layers=2, d_hidden=64,
                           v_multires=3, r_multires=2)
    obj_sdf = SDFConfig(kind="obj", n_layers=3, d_hidden=64, d_out=65, skip_in=(2,))
    obj_col = ColorConfig(kind="obj", d_feature=64, n_layers=2, d_hidden=64)
    params = {
        "hand": {
            "sdf": init_sdf_params(jax.random.PRNGKey(0), hand_sdf),
            "color": init_color_params(jax.random.PRNGKey(1), hand_col),
            "variance": init_variance_params(0.3),
        },
        "obj": {
            "sdf": init_sdf_params(jax.random.PRNGKey(2), obj_sdf),
            "color": init_color_params(jax.random.PRNGKey(3), obj_col),
            "variance": init_variance_params(0.3),
        },
    }
    return params, hand_sdf, hand_col, obj_sdf, obj_col


def posed_hand():
    j = canonical_hand_joints(curl=0.35).astype(np.float32)
    axis = np.asarray([0.3, 0.8, 0.52]); axis /= np.linalg.norm(axis)
    K = np.asarray([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                    [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(0.9) * K + (1 - np.cos(0.9)) * (K @ K)
    return (j @ R.T).astype(np.float32)


def make_frame(n_rays=32, seed=0):
    from honerf_tpu.data.datasets import get_bone_length
    from honerf_tpu.data.synthetic import look_at_camera

    rng = np.random.default_rng(seed)
    joints = posed_hand()
    R, T = look_at_camera(np.asarray([0.0, 0.2, -0.9]), joints.mean(0))
    return {
        "joints_pred": jnp.asarray(joints),
        "bone_length": jnp.asarray(get_bone_length(canonical_hand_joints(0.0))),
        "t_pose_21": jnp.asarray(canonical_hand_joints(0.0)),
        "Ro_pred": jnp.eye(3),
        "To_pred": jnp.asarray(joints.mean(0) + np.asarray([0.0, 0.0, 0.05])),
        "obj_verts": jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32) * 0.05),
        "cam_R": jnp.asarray(R),
        "cam_T": jnp.asarray(T),
        "focal": jnp.asarray([3.0, 3.0]),
        "principal": jnp.zeros(2),
        "rays_xy": jnp.asarray(rng.uniform(-0.4, 0.4, (n_rays, 2)).astype(np.float32)),
        "true_rgb": jnp.asarray(rng.uniform(0, 1, (n_rays, 3)).astype(np.float32)),
        "true_mask": jnp.ones((n_rays, 1)),
    }


@pytest.mark.parametrize("fit_type", ["1", "12"])
def test_single_fit_step_updates_all_pose_tensors(fit_type):
    params, hs, hc, os_, oc = tiny_nets()
    rcfg = RenderConfig(n_samples=8, n_importance=8, up_sample_steps=2, perturb=0.0)
    fcfg = FitHyper(batch_size=32, fit_type=fit_type)
    step, opt = make_single_fit_step(params, hs, hc, os_, oc, rcfg, fcfg)
    step = jax.jit(step)
    pose = init_pose_params()
    state = (pose, opt.init(pose))
    batch = make_frame()
    key = jax.random.PRNGKey(0)
    for i in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        assert np.isfinite(float(metrics["loss"])), (fit_type, i)
    new_pose = state[0]
    for k in pose:
        delta = np.abs(np.asarray(new_pose[k]) - np.asarray(pose[k])).max()
        assert delta > 0, f"{k} did not update"
    if fit_type == "12":
        assert "contact_loss" in metrics and "penet_loss" in metrics


def test_pose_regularizer_pulls_back_perturbation():
    """With fit '1' and heavy pose weights, a perturbed palm translation
    should move back toward the initial estimate."""
    params, hs, hc, os_, oc = tiny_nets()
    rcfg = RenderConfig(n_samples=8, n_importance=0, up_sample_steps=1, perturb=0.0)
    fcfg = FitHyper(batch_size=16, fit_type="1")
    step, opt = make_single_fit_step(
        params, hs, hc, os_, oc, rcfg, fcfg,
        lrs={k: 2e-3 for k in init_pose_params()},
    )
    step = jax.jit(step)
    pose = init_pose_params()
    pose["palm_trans"] = jnp.asarray([[0.03, -0.02, 0.01]])
    state = (pose, opt.init(pose))
    batch = make_frame(n_rays=16)
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(25):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        if first is None:
            first = float(metrics["joint_loss"])
    assert float(metrics["joint_loss"]) < first


@pytest.mark.parametrize("fit_type", ["123", "1234"])
def test_video_fit_step(fit_type):
    params, hs, hc, os_, oc = tiny_nets()
    rcfg = RenderConfig(n_samples=8, n_importance=8, up_sample_steps=2, perturb=0.0)
    fcfg = FitHyper(batch_size=16, fit_type=fit_type)
    n_frames = 6
    step, opt = make_video_fit_step(
        params, hs, hc, os_, oc, rcfg, fcfg, n_frames
    )
    step = jax.jit(step)
    tables = init_video_tables(n_frames)
    state = (tables, opt.init(tables))
    F, R = 4, 16
    single = make_frame(n_rays=R)
    batch = {
        "index": jnp.asarray([0, 1, 2, 3]),
        "joints_pred": jnp.tile(single["joints_pred"][None], (F, 1, 1)),
        "bone_length": jnp.tile(single["bone_length"][None], (F, 1)),
        "t_pose_21": jnp.tile(single["t_pose_21"][None], (F, 1, 1)),
        "Ro_pred": jnp.tile(jnp.eye(3)[None], (F, 1, 1)),
        "To_pred": jnp.tile(single["To_pred"][None], (F, 1)),
        "obj_verts": single["obj_verts"],
        "cam_R": single["cam_R"],
        "cam_T": single["cam_T"],
        "focal": single["focal"],
        "principal": single["principal"],
        "rays_xy": jnp.tile(single["rays_xy"][None], (F, 1, 1)),
        "true_rgb": jnp.tile(single["true_rgb"][None], (F, 1, 1)),
        "true_mask": jnp.ones((F, R, 1)),
    }
    key = jax.random.PRNGKey(0)
    for i in range(2):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        assert np.isfinite(float(metrics["loss"]))
    assert "smooth_loss" in metrics
    if fit_type == "1234":
        assert "stable_loss" in metrics
    # only the window rows 0-3 of the tables changed
    new_tables = state[0]
    d = np.abs(np.asarray(new_tables["joint_angle"]) - np.asarray(tables["joint_angle"]))
    assert d[:4].max() > 0
    np.testing.assert_allclose(d[4:], 0.0)


def test_interaction_losses_masked_semantics():
    # contact: only |h|+|o| < 1e-2 samples contribute
    sdf_h = jnp.asarray([0.004, 0.5, -0.003, 0.2])
    sdf_o = jnp.asarray([0.004, 0.5, -0.004, -0.1])
    c = float(contact_loss(sdf_h, sdf_o))
    np.testing.assert_allclose(c, (0.008 + 0.007) / 2, rtol=1e-5)
    # penetration: both negative
    p = float(penetration_loss(sdf_h, sdf_o))
    np.testing.assert_allclose(p, 0.007, rtol=1e-5)
    # empty masks give 0 (denominator guard)
    assert float(penetration_loss(jnp.ones(4), jnp.ones(4))) == 0.0


def test_stable_loss_zero_when_single_frame_in_contact():
    verts = jnp.asarray(np.random.default_rng(0).normal(size=(30, 3)) * 0.05)
    sdf = jnp.ones((4, 30)) * 0.1
    sdf = sdf.at[1, :5].set(-0.01)  # only one frame penetrates
    assert float(stable_loss_cross(sdf, verts)) == 0.0
    sdf = sdf.at[2, 3:8].set(-0.02)  # two frames penetrate -> non-zero
    assert float(stable_loss_cross(sdf, verts)) > 0.0


REFERENCE = "/root/reference"


@pytest.mark.skipif(not __import__("os").path.isdir(REFERENCE),
                    reason="reference repo not mounted")
def test_stable_loss_cross_golden_vs_torch():
    """Oracle parity for the cross-frame stable loss, on a case where some
    frames have NO contact — pins the contributing-frames row restriction
    and the setdiff1d-on-boolean out-candidate quirk
    (reference utils/renderer_batch.py:318-371)."""
    import sys
    import types

    import torch

    if "mcubes" not in sys.modules:
        sys.modules["mcubes"] = types.ModuleType("mcubes")
    sys.path.insert(0, REFERENCE)
    try:
        from utils.renderer_batch import NeuSRenderer_fitting as RefBatch
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(3)
    F, N = 5, 370
    base = (rng.normal(size=(1, N, 3)) * 0.08).astype(np.float32)
    pts_np = np.repeat(base, F, axis=0)  # object-local verts, frame-invariant

    Ro = np.zeros((F, 3, 3), dtype=np.float32)
    for f in range(F):
        a = 0.1 * f
        Ro[f] = [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
                 [0, 0, 1]]
    To = np.zeros((F, 3), dtype=np.float32)
    To[1, 1] = 0.5  # lift frames 1 and 4 out of contact entirely
    To[4, 1] = 0.5

    def sdf_np(pw):
        return (np.sin(25.0 * pw[..., 0]) * 0.04 + pw[..., 1] * 0.3
                + 0.02).astype(np.float32)

    class FakeHandSDF:
        def sdf(self, pts_world, bt_inv, T_pose_21):
            return torch.as_tensor(sdf_np(pts_world.detach().cpu().numpy()))

    fake = types.SimpleNamespace(sdf_network_hand=FakeHandSDF())
    ref_val = float(RefBatch.get_stable_loss_cross(
        fake, torch.as_tensor(pts_np), None, None,
        torch.as_tensor(Ro), torch.as_tensor(To)))

    pts_ds = pts_np[:, ::10]
    world = np.einsum("fij,fvj->fvi", Ro, pts_ds) + To[:, None]
    sdf_v = sdf_np(world)
    in_counts = (sdf_v < 0).sum(1)
    assert (in_counts > 0).sum() >= 2 and (in_counts == 0).sum() >= 1, (
        "fixture must mix contact and no-contact frames")

    ours = float(stable_loss_cross(jnp.asarray(sdf_v), jnp.asarray(pts_ds[0])))
    assert ref_val > 0.0
    np.testing.assert_allclose(ours, ref_val, rtol=1e-5)


def test_video_anchor_gating_exclusive_and_first_step_skip():
    """Reference gating (fitting_video.py:313-320): boundary anchors are
    exclusive (elif — a window that touches both boundaries only anchors
    to the first frame) and disabled when anchor_enabled=0 (the very first
    (sub, view) step of each window in epoch 0)."""
    params, hs, hc, os_, oc = tiny_nets()
    rcfg = RenderConfig(n_samples=8, n_importance=8, up_sample_steps=2,
                        perturb=0.0)
    fcfg = FitHyper(batch_size=16, fit_type="123")

    def build(n_frames):
        step, opt = make_video_fit_step(params, hs, hc, os_, oc, rcfg, fcfg,
                                        n_frames)
        return jax.jit(step), opt

    F, R = 4, 16
    single = make_frame(n_rays=R)
    tables = init_video_tables(6)
    # identical nonzero refinement on every row: adjacent-frame diffs are
    # exactly 0, boundary anchors are nonzero
    tables["palm_trans"] = jnp.full((6, 3), 0.02)

    def smooth_at(n_frames, idx, anchor=None):
        step, opt = build(n_frames)
        batch = {
            "index": jnp.asarray(idx),
            "joints_pred": jnp.tile(single["joints_pred"][None], (F, 1, 1)),
            "bone_length": jnp.tile(single["bone_length"][None], (F, 1)),
            "t_pose_21": jnp.tile(single["t_pose_21"][None], (F, 1, 1)),
            "Ro_pred": jnp.tile(jnp.eye(3)[None], (F, 1, 1)),
            "To_pred": jnp.tile(single["To_pred"][None], (F, 1)),
            "obj_verts": single["obj_verts"],
            "cam_R": single["cam_R"],
            "cam_T": single["cam_T"],
            "focal": single["focal"],
            "principal": single["principal"],
            "rays_xy": jnp.tile(single["rays_xy"][None], (F, 1, 1)),
            "true_rgb": jnp.tile(single["true_rgb"][None], (F, 1, 1)),
            "true_mask": jnp.ones((F, R, 1)),
        }
        if anchor is not None:
            batch["anchor_enabled"] = jnp.asarray(anchor, jnp.float32)
        state = (tables, opt.init(tables))
        _, metrics = step(state, batch, jax.random.PRNGKey(0))
        return float(metrics["smooth_loss"])

    s_first = smooth_at(6, [0, 1, 2, 3])      # first-boundary window
    s_mid = smooth_at(6, [1, 2, 3, 4])        # interior window: no anchor
    s_last = smooth_at(6, [2, 3, 4, 5])       # last-boundary window
    s_both = smooth_at(4, [0, 1, 2, 3])       # touches BOTH boundaries
    s_gated = smooth_at(6, [0, 1, 2, 3], anchor=0.0)  # step (0,0) of epoch 0

    assert s_first > 1e-6 and s_last > 1e-6
    np.testing.assert_allclose(s_mid, 0.0, atol=1e-7)
    np.testing.assert_allclose(s_gated, 0.0, atol=1e-7)
    # exclusive: the both-boundary window equals the first-only window,
    # not first+last
    np.testing.assert_allclose(s_both, s_first, rtol=1e-5)


def test_batched_fit_step_matches_sequential():
    """vmapped G-frame fit step == G sequential single-frame steps at
    perturb=0 (frames are independent; fit.single.make_batched_single_fit_step).

    Uses the coarse-only renderer and fit '1' (the importance-sampling
    ladder and the '12' interaction masks are DISCRETE in the sdf values,
    so vmap's float reassociation can legitimately flip a sample/mask
    choice), and perturbed initial poses: at the identity init some
    joint-angle gradients are ~0 (the regularizer minimum) and Adam's
    first step is lr*sign(grad) — a sign-of-noise flip, not a semantic
    difference.  Discrete modes are covered by the semantic test below."""
    from honerf_tpu.fit.single import (
        init_pose_params_batched,
        make_batched_single_fit_step,
    )

    params, hs, hc, os_, oc = tiny_nets()
    rcfg = RenderConfig(n_samples=16, n_importance=0, up_sample_steps=1,
                        perturb=0.0)
    fcfg = FitHyper(batch_size=16, fit_type="1")
    G = 3
    frames = [make_frame(n_rays=16, seed=s) for s in range(G)]
    keys = jax.random.split(jax.random.PRNGKey(7), G)
    rng = np.random.default_rng(5)

    def perturbed_init():
        p = init_pose_params()
        return jax.tree.map(
            lambda x: x + jnp.asarray(
                rng.normal(size=x.shape).astype(np.float32) * 0.01
            ),
            p,
        )

    inits = [perturbed_init() for _ in range(G)]

    # sequential reference: 2 steps per frame
    step, opt = make_single_fit_step(params, hs, hc, os_, oc, rcfg, fcfg)
    step = jax.jit(step)
    seq_poses, seq_metrics = [], []
    for g in range(G):
        st = (inits[g], opt.init(inits[g]))
        for _ in range(2):
            st, m = step(st, frames[g], keys[g])
        seq_poses.append(st[0])
        seq_metrics.append(m)

    # batched: same two steps for all frames at once
    bstep, bopt = make_batched_single_fit_step(params, hs, hc, os_, oc,
                                               rcfg, fcfg)
    bstep = jax.jit(bstep)
    poses = jax.tree.map(lambda *xs: jnp.stack(xs), *inits)
    bst = (poses, jax.vmap(bopt.init)(poses))
    batch = {
        k: jnp.stack([f[k] for f in frames]) for k in frames[0]
    }
    for _ in range(2):
        bst, bm = bstep(bst, batch, keys)

    for g in range(G):
        for k in seq_poses[g]:
            np.testing.assert_allclose(
                np.asarray(bst[0][k][g]), np.asarray(seq_poses[g][k]),
                rtol=1e-4, atol=1e-6, err_msg=f"frame {g} pose {k}",
            )
        np.testing.assert_allclose(
            float(bm["loss"][g]), float(seq_metrics[g]["loss"]),
            rtol=1e-5, err_msg=f"frame {g} loss",
        )


def test_batched_fit_step_12_semantic():
    """Frame-batched fit '12' with the full ladder: finite, every pose
    tensor of every frame updates, per-frame metrics present."""
    from honerf_tpu.fit.single import (
        init_pose_params_batched,
        make_batched_single_fit_step,
    )

    params, hs, hc, os_, oc = tiny_nets()
    rcfg = RenderConfig(n_samples=8, n_importance=8, up_sample_steps=2,
                        perturb=1.0)
    fcfg = FitHyper(batch_size=16, fit_type="12")
    G = 2
    frames = [make_frame(n_rays=16, seed=s) for s in range(G)]
    batch = {k: jnp.stack([f[k] for f in frames]) for k in frames[0]}
    bstep, bopt = make_batched_single_fit_step(params, hs, hc, os_, oc,
                                               rcfg, fcfg)
    bstep = jax.jit(bstep)
    poses0 = init_pose_params_batched(G)
    bst = (poses0, jax.vmap(bopt.init)(poses0))
    keys = jax.random.split(jax.random.PRNGKey(3), G)
    for _ in range(3):
        bst, bm = bstep(bst, batch, keys)
    assert bm["loss"].shape == (G,)
    assert np.isfinite(np.asarray(bm["loss"])).all()
    assert {"contact_loss", "penet_loss"} <= set(bm)
    for k in poses0:
        for g in range(G):
            delta = np.abs(np.asarray(bst[0][k][g])
                           - np.asarray(poses0[k][g])).max()
            assert delta > 0, f"frame {g} pose {k} did not update"
