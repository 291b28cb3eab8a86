"""Video pose fitting (fit types '123' and '1234').

Functional equivalent of fitting_video.py:121-474: per-frame refinement
tables over the whole sequence, optimized over sliding 4-frame windows with
render + pose-regularizer + interaction + smoothness (+ cross-frame
stability for '1234') losses.

TPU design: the frame axis is a `jax.vmap` axis over the SAME dual-volume
renderer used by the single-frame fitter — the reference's hand-written
[frames, pixels]-batched renderer (utils/renderer_batch.py) collapses into
a transform.  The gather of table rows inside the jitted step makes the
backward pass a scatter-add into the tables, so one compiled program serves
every window.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from honerf_tpu.camera import Camera, xy_to_ray_bundle
from honerf_tpu.hand import bone_transforms_from_mano_joints, refined_hand_joints
from honerf_tpu.models.fields import ColorConfig, SDFConfig
from honerf_tpu.render.dual import render_dual
from honerf_tpu.render.losses import (
    contact_loss,
    mask_bce,
    penetration_loss,
    pose_l2,
    stable_loss_cross,
)
from honerf_tpu.render.neus import (
    RenderConfig,
    make_hand_field,
    make_obj_field,
    rays_to_object_frame,
)
from honerf_tpu.fit.single import FitHyper
from honerf_tpu.utils.transforms import rot6d_to_matrix

Params = Dict[str, Any]

# Per-tensor Adam learning rates (fitting_video.py:177-184).
VIDEO_FIT_LRS = {
    "obj_rot6": 1e-4,
    "obj_trans": 1e-4,
    "palm_rot6": 1e-4,
    "palm_trans": 1e-4,
    "joint_angle": 1e-4,
    "palm_angle": 5e-4,
}


def init_video_tables(n_frames: int) -> Params:
    """Per-frame refinement tables (fitting_video.py:159-176)."""
    eye62 = jnp.tile(jnp.eye(3)[:, :2][None], (n_frames, 1, 1))
    return {
        "obj_rot6": eye62,
        "obj_trans": jnp.zeros((n_frames, 3)),
        "palm_rot6": eye62,
        "palm_trans": jnp.zeros((n_frames, 3)),
        "joint_angle": jnp.zeros((n_frames, 20)),
        "palm_angle": jnp.zeros((n_frames, 7)),
    }


def window_pose(tables: Params, batch: Dict[str, jnp.ndarray]):
    """Gather the window's rows and apply refinements.

    Returns (joint_3d (F,21,3), obj_r (F,3,3), obj_t (F,3))
    (fitting_video.py:223-253)."""
    idx = batch["index"]  # (F,)
    F = idx.shape[0]
    joint_3d = refined_hand_joints(
        batch["joints_pred"],
        batch["bone_length"],
        joint_refine_angle=tables["joint_angle"][idx],
        palm_refine_angle=tables["palm_angle"][idx] * 0.1,
        palm_rot6d=tables["palm_rot6"][idx].reshape(F, 6),
        palm_trans=tables["palm_trans"][idx],
    )
    d_rot = rot6d_to_matrix(tables["obj_rot6"][idx].reshape(F, 6))
    obj_r = d_rot @ batch["Ro_pred"]
    obj_t = batch["To_pred"] + tables["obj_trans"][idx]
    return joint_3d, obj_r, obj_t


def make_video_fit_step(
    net_params: Params,
    hand_sdf_cfg: SDFConfig,
    hand_color_cfg: ColorConfig,
    obj_sdf_cfg: SDFConfig,
    obj_color_cfg: ColorConfig,
    rcfg: RenderConfig,
    fcfg: FitHyper,
    n_frames: int,
    lrs: Dict[str, float] = VIDEO_FIT_LRS,
):
    """Build the jittable per-(window, view) fit step.

    The batch carries the whole 4-frame window: rays (F, R, 2), per-frame
    initial poses, a shared camera, and boundary flags.
    """
    transforms = {k: optax.adam(lr) for k, lr in lrs.items()}
    opt = optax.multi_transform(transforms, lambda params: {k: k for k in params})
    obj_field = None  # built inside (params are closed over)

    def loss_fn(tables: Params, batch: Dict[str, jnp.ndarray], key):
        F = batch["index"].shape[0]
        joint_3d, obj_r, obj_t = window_pose(tables, batch)
        bt_inv = bone_transforms_from_mano_joints(joint_3d)  # (F, 21, 4, 4)
        obj_field_local = make_obj_field(
            net_params["obj"], obj_sdf_cfg, obj_color_cfg
        )
        cam = Camera(
            R=batch["cam_R"], T=batch["cam_T"],
            focal=batch["focal"], principal=batch["principal"],
        )
        rb = xy_to_ray_bundle(cam, batch["rays_xy"])  # (F, R, 3) via broadcast

        def render_frame(o, d, bt, ro, to, sub):
            hand_field = make_hand_field(
                net_params["hand"], hand_sdf_cfg, hand_color_cfg, bt,
                batch["t_pose_21"][0],
            )
            oo, do = rays_to_object_frame(o, d, ro, to)
            return render_dual(
                hand_field, obj_field_local, rcfg, sub, o, d, oo, do,
                fcfg.near, fcfg.far,
            )

        keys = jax.random.split(key, F)
        out = jax.vmap(render_frame)(
            rb.origins, rb.directions, bt_inv, obj_r, obj_t, keys
        )

        true_mask = batch["true_mask"]  # (F, R, 1)
        color_err = (out["color_fine"] - batch["true_rgb"]) * true_mask
        # reference divides by F * R (fitting_video.py:288)
        color_loss = jnp.sum(jnp.abs(color_err)) / (
            true_mask.shape[0] * true_mask.shape[1]
        )
        m_loss = mask_bce(out["weight_sum"], true_mask)
        render_loss = 0.5 * (color_loss + 0.5 * m_loss)

        joint_loss = pose_l2(joint_3d, batch["joints_pred"])
        verts = batch["obj_verts"]  # (V, 3)
        pred_v = jnp.einsum("fij,vj->fvi", obj_r, verts) + obj_t[:, None]
        compare_v = (
            jnp.einsum("fij,vj->fvi", batch["Ro_pred"], verts)
            + batch["To_pred"][:, None]
        )
        verts_loss = pose_l2(pred_v, compare_v)

        sdf_h = out["sdf_hand"][..., 0].reshape(-1)
        sdf_o = out["sdf_obj"][..., 0].reshape(-1)
        c_loss = contact_loss(sdf_h, sdf_o)
        p_loss = penetration_loss(sdf_h, sdf_o)

        if F > 1:
            smooth = pose_l2(joint_3d[1:], joint_3d[:-1]) + pose_l2(
                pred_v[1:], pred_v[:-1]
            )
        else:  # degenerate 1-frame window: no adjacent-frame term
            smooth = jnp.asarray(0.0)
        # Boundary anchors (fitting_video.py:313-320).  Reference gating:
        # `if step > 0 and index[0] == 0: ... elif step > 0 and
        # index[-1] == last: ...` — the first- and last-frame anchors are
        # EXCLUSIVE (a window that is both boundary windows only gets the
        # first anchor), and neither applies on the very first
        # (sub_iter, view) = (0, 0) step of each window in epoch 0
        # (anchor_enabled, set by the runner).
        first = (batch["index"][0] == 0).astype(jnp.float32)
        last = (batch["index"][-1] == n_frames - 1).astype(jnp.float32)
        anchor = batch.get("anchor_enabled", jnp.asarray(1.0))
        smooth = smooth + anchor * first * (
            pose_l2(joint_3d[:1], batch["joints_pred"][:1])
            + pose_l2(pred_v[:1], compare_v[:1])
        )
        smooth = smooth + anchor * (1.0 - first) * last * (
            pose_l2(joint_3d[-1:], batch["joints_pred"][-1:])
            + pose_l2(pred_v[-1:], compare_v[-1:])
        )

        loss = (
            render_loss
            + 30.0 * c_loss + 20.0 * p_loss
            + 30.0 * joint_loss + 20.0 * verts_loss
            + 50.0 * smooth
        )
        metrics = {
            "color_loss": color_loss,
            "mask_loss": m_loss,
            "joint_loss": joint_loss,
            "obj_verts_loss": verts_loss,
            "contact_loss": c_loss,
            "penet_loss": p_loss,
            "smooth_loss": smooth,
        }
        # Live GT-vs-pred diagnostics, printed every step by the reference
        # (fitting_video.py:327-331) — the operator's convergence signal.
        if "gt_joint3d" in batch:
            metrics["gt_joint_loss"] = pose_l2(batch["gt_joint3d"], joint_3d)
            gt_v = (
                jnp.einsum("fij,vj->fvi", batch["Ro_gt"], verts)
                + batch["To_gt"][:, None]
            )
            metrics["gt_obj_verts_loss"] = pose_l2(pred_v, gt_v)
        if fcfg.fit_type == "1234":
            verts_ds = verts[::10]
            world_v = jnp.einsum("fij,vj->fvi", obj_r, verts_ds) + obj_t[:, None]

            def hand_sdf_frame(pts, bt):
                hand_field = make_hand_field(
                    net_params["hand"], hand_sdf_cfg, hand_color_cfg, bt,
                    batch["t_pose_21"][0],
                )
                return hand_field.sdf_fn(pts)

            hand_sdf_v = jax.vmap(hand_sdf_frame)(world_v, bt_inv)  # (F, V')
            s_loss = stable_loss_cross(hand_sdf_v, verts_ds)
            loss = loss + 100.0 * s_loss
            metrics["stable_loss"] = s_loss
        metrics["loss"] = loss
        return loss, metrics

    def step_fn(state, batch, key):
        tables, opt_state = state
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            tables, batch, key
        )
        updates, opt_state = opt.update(grads, opt_state, tables)
        tables = optax.apply_updates(tables, updates)
        return (tables, opt_state), metrics

    return step_fn, opt
