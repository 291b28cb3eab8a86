"""Frame-axis-sharded video fitting: numerical equivalence with the
single-device (vmapped) step on the virtual CPU mesh — exercises the
ppermute smooth-loss halo, the masked-psum anchor gating, and the
all_gather'ed cross-frame stable loss (SURVEY.md §5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from honerf_tpu.fit import FitHyper, init_video_tables, make_video_fit_step
from honerf_tpu.parallel.mesh import make_mesh
from honerf_tpu.parallel.video_shard import make_video_fit_step_sharded
from honerf_tpu.render import RenderConfig

from test_fitting import make_frame, tiny_nets


@pytest.mark.parametrize("fit_type", ["123", "1234"])
@pytest.mark.parametrize("idx", [[0, 1, 2, 3], [1, 2, 3, 4], [2, 3, 4, 5]])
def test_sharded_video_step_matches_vmapped(fit_type, idx):
    params, hs, hc, os_, oc = tiny_nets()
    rcfg = RenderConfig(n_samples=8, n_importance=8, up_sample_steps=2,
                        perturb=0.0)
    fcfg = FitHyper(batch_size=16, fit_type=fit_type)
    n_frames = 6
    F, R = 4, 16
    single = make_frame(n_rays=R)
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
        "anchor_enabled": jnp.asarray(1.0),
        # GT poses so both steps emit the live gt_* diagnostics
        "gt_joint3d": jnp.tile(single["joints_pred"][None], (F, 1, 1)) * 1.02,
        "Ro_gt": jnp.tile(jnp.eye(3)[None], (F, 1, 1)),
        "To_gt": jnp.tile(single["To_pred"][None], (F, 1)) + 0.01,
    }
    tables = init_video_tables(n_frames)
    # nonzero refinements so pose/smooth/anchor terms are all active
    tables["palm_trans"] = jnp.asarray(
        np.random.default_rng(0).normal(size=(n_frames, 3)) * 0.01
    )
    tables["obj_trans"] = jnp.asarray(
        np.random.default_rng(1).normal(size=(n_frames, 3)) * 0.01
    )
    key = jax.random.PRNGKey(0)

    ref_step, ref_opt = make_video_fit_step(
        params, hs, hc, os_, oc, rcfg, fcfg, n_frames
    )
    ref_state = (tables, ref_opt.init(tables))
    (ref_tables, _), ref_m = jax.jit(ref_step)(ref_state, batch, key)

    mesh = make_mesh(4, axis_name="frame")
    sh_step, sh_opt = make_video_fit_step_sharded(
        params, hs, hc, os_, oc, rcfg, fcfg, n_frames, mesh, batch
    )
    sh_state = (tables, sh_opt.init(tables))
    (sh_tables, _), sh_m = sh_step(sh_state, batch, key)

    assert {"gt_joint_loss", "gt_obj_verts_loss"} <= set(ref_m) & set(sh_m)
    for k in ref_m:
        np.testing.assert_allclose(
            float(sh_m[k]), float(ref_m[k]), rtol=2e-4, atol=1e-6,
            err_msg=f"metric {k}",
        )
    for k in ref_tables:
        np.testing.assert_allclose(
            np.asarray(sh_tables[k]), np.asarray(ref_tables[k]),
            rtol=2e-4, atol=1e-7, err_msg=f"table {k}",
        )
