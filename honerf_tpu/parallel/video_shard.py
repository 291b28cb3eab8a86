"""Frame-axis-sharded video fitting step (SURVEY.md §5).

The video fitter optimizes 4-frame sliding windows; here the WINDOW'S
frame axis is sharded over a device mesh (`frame` axis): each device
renders its local frames' rays and the temporal couplings become
explicit ICI collectives —

  * smooth loss: adjacent-frame differences need a 1-frame halo; the
    left neighbor's last (joint_3d, pred_v) arrive via `ppermute`;
  * boundary anchors: owned by the first / last device, combined through
    masked `psum` terms so the gating (exclusive elif + anchor_enabled,
    fitting_video.py:313-320) matches the single-device step;
  * stable loss ('1234'): the per-frame hand-SDF-at-verts rows are
    `all_gather`ed (small: V' ~ tens of verts), each device evaluates the
    cross-frame terms for ITS frames only, and the per-frame
    contributions `psum` — gradients route back through the gather, so
    nothing is double-counted;
  * per-ray losses: numerators / denominators `psum` so masked-mean
    normalization equals the unsharded (vmapped) step.

Numerically equivalent to `fit.video.make_video_fit_step` at perturb=0
(tested on the virtual CPU mesh); the stratified jitter is drawn per
device (fold_in on the frame axis index), so perturbed runs are
statistically — not bitwise — equivalent.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from honerf_tpu.camera import Camera, xy_to_ray_bundle
from honerf_tpu.fit.single import FitHyper
from honerf_tpu.fit.video import VIDEO_FIT_LRS, window_pose
from honerf_tpu.hand import bone_transforms_from_mano_joints
from honerf_tpu.models.fields import ColorConfig, SDFConfig
from honerf_tpu.render.dual import render_dual
from honerf_tpu.render.neus import (
    RenderConfig,
    make_hand_field,
    make_obj_field,
    rays_to_object_frame,
)

FRAME_AXIS = "frame"

# batch leaves sharded on the frame axis; everything else replicated
FRAME_KEYS = (
    "index", "joints_pred", "bone_length", "t_pose_21", "Ro_pred", "To_pred",
    "rays_xy", "true_rgb", "true_mask", "gt_joint3d", "Ro_gt", "To_gt",
)


def frame_batch_specs(batch: Dict[str, Any]) -> Dict[str, P]:
    return {k: P(FRAME_AXIS) if k in FRAME_KEYS else P() for k in batch}


def _norm_sum(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum over all points of ||a - b|| (safe at 0 like losses.pose_l2)."""
    d = a - b
    return jnp.sum(jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-24))


def make_video_fit_step_sharded(
    net_params: Dict[str, Any],
    hand_sdf_cfg: SDFConfig,
    hand_color_cfg: ColorConfig,
    obj_sdf_cfg: SDFConfig,
    obj_color_cfg: ColorConfig,
    rcfg: RenderConfig,
    fcfg: FitHyper,
    n_frames: int,
    mesh: Mesh,
    batch_template: Dict[str, Any],
    lrs: Dict[str, float] = VIDEO_FIT_LRS,
):
    """Build step(state, batch, key) with the window's frame axis sharded
    over `mesh` (1-D, axis name 'frame').  Per-frame batch leaves must be
    device_put with the frame sharding; the window size must divide the
    mesh size evenly."""
    transforms = {k: optax.adam(lr) for k, lr in lrs.items()}
    opt = optax.multi_transform(transforms, lambda params: {k: k for k in params})
    n_dev = mesh.devices.size
    specs = frame_batch_specs(batch_template)
    perm_fwd = [(i, i + 1) for i in range(n_dev - 1)]

    def local_loss(tables, batch, key):
        F_l = batch["index"].shape[0]
        R = batch["rays_xy"].shape[1]
        dev = jax.lax.axis_index(FRAME_AXIS)
        F_g = float(F_l * n_dev)  # static: equal shards

        joint_3d, obj_r, obj_t = window_pose(tables, batch)  # local frames
        bt_inv = bone_transforms_from_mano_joints(joint_3d)
        obj_field = make_obj_field(net_params["obj"], obj_sdf_cfg, obj_color_cfg)
        cam = Camera(
            R=batch["cam_R"], T=batch["cam_T"],
            focal=batch["focal"], principal=batch["principal"],
        )
        rb = xy_to_ray_bundle(cam, batch["rays_xy"])

        def render_frame(o, d, bt, ro, to, sub):
            hand_field = make_hand_field(
                net_params["hand"], hand_sdf_cfg, hand_color_cfg, bt,
                batch["t_pose_21"][0],
            )
            oo, do = rays_to_object_frame(o, d, ro, to)
            return render_dual(
                hand_field, obj_field, rcfg, sub, o, d, oo, do,
                fcfg.near, fcfg.far,
            )

        keys = jax.random.split(jax.random.fold_in(key, dev), F_l)
        out = jax.vmap(render_frame)(
            rb.origins, rb.directions, bt_inv, obj_r, obj_t, keys
        )

        true_mask = batch["true_mask"]
        # color: sum|err| / (F * R) globally (fitting_video.py:288)
        err = (out["color_fine"] - batch["true_rgb"]) * true_mask
        color_loss = jax.lax.psum(jnp.sum(jnp.abs(err)), FRAME_AXIS) / (
            F_g * R
        )
        # mask BCE: global mean
        p = jnp.clip(out["weight_sum"], 1e-3, 1.0 - 1e-3)
        bce = -(true_mask * jnp.log(p) + (1 - true_mask) * jnp.log(1 - p))
        m_loss = jax.lax.psum(jnp.sum(bce), FRAME_AXIS) / jax.lax.psum(
            jnp.asarray(bce.size, jnp.float32), FRAME_AXIS
        )
        render_loss = 0.5 * (color_loss + 0.5 * m_loss)

        # pose regularizers: global means over frames
        joint_loss = jax.lax.psum(
            _norm_sum(joint_3d, batch["joints_pred"]), FRAME_AXIS
        ) / (F_g * 21.0)
        verts = batch["obj_verts"]  # (V, 3) replicated
        V = verts.shape[0]
        pred_v = jnp.einsum("fij,vj->fvi", obj_r, verts) + obj_t[:, None]
        compare_v = (
            jnp.einsum("fij,vj->fvi", batch["Ro_pred"], verts)
            + batch["To_pred"][:, None]
        )
        verts_loss = jax.lax.psum(
            _norm_sum(pred_v, compare_v), FRAME_AXIS
        ) / (F_g * float(V))

        # interaction: masked sums with GLOBAL denominators
        sdf_h = out["sdf_hand"][..., 0].reshape(-1)
        sdf_o = out["sdf_obj"][..., 0].reshape(-1)
        s = jnp.abs(sdf_h) + jnp.abs(sdf_o)
        cm = (s < 1e-2).astype(s.dtype)
        c_loss = jax.lax.psum(jnp.sum(s * cm), FRAME_AXIS) / (
            jax.lax.psum(jnp.sum(cm), FRAME_AXIS) + 1e-9
        )
        pm = ((sdf_o < 0) & (sdf_h < 0)).astype(s.dtype)
        p_loss = jax.lax.psum(jnp.sum(s * pm), FRAME_AXIS) / (
            jax.lax.psum(jnp.sum(pm), FRAME_AXIS) + 1e-9
        )

        # smooth: local adjacent pairs + the 1-frame halo from the left
        # neighbor (ppermute); device 0's boundary term is masked off
        prev_j = jax.lax.ppermute(joint_3d[-1], FRAME_AXIS, perm_fwd)
        prev_v = jax.lax.ppermute(pred_v[-1], FRAME_AXIS, perm_fwd)
        has_left = (dev > 0).astype(jnp.float32)
        j_sum = _norm_sum(joint_3d[1:], joint_3d[:-1]) + has_left * _norm_sum(
            joint_3d[0], prev_j
        )
        v_sum = _norm_sum(pred_v[1:], pred_v[:-1]) + has_left * _norm_sum(
            pred_v[0], prev_v
        )
        pairs = max(F_g - 1.0, 1.0)
        smooth = jax.lax.psum(j_sum, FRAME_AXIS) / (pairs * 21.0) + jax.lax.psum(
            v_sum, FRAME_AXIS
        ) / (pairs * float(V))

        # boundary anchors (fitting_video.py:313-320): exclusive elif +
        # anchor_enabled gating, owned by the first / last device
        is_first_dev = (dev == 0).astype(jnp.float32)
        is_last_dev = (dev == n_dev - 1).astype(jnp.float32)
        first_flag = jax.lax.psum(
            is_first_dev * (batch["index"][0] == 0).astype(jnp.float32),
            FRAME_AXIS,
        )
        last_flag = jax.lax.psum(
            is_last_dev
            * (batch["index"][-1] == n_frames - 1).astype(jnp.float32),
            FRAME_AXIS,
        )
        anchor = batch.get("anchor_enabled", jnp.asarray(1.0))
        t_first = (
            _norm_sum(joint_3d[:1], batch["joints_pred"][:1]) / 21.0
            + _norm_sum(pred_v[:1], compare_v[:1]) / float(V)
        )
        t_last = (
            _norm_sum(joint_3d[-1:], batch["joints_pred"][-1:]) / 21.0
            + _norm_sum(pred_v[-1:], compare_v[-1:]) / float(V)
        )
        smooth = smooth + anchor * first_flag * jax.lax.psum(
            is_first_dev * t_first, FRAME_AXIS
        )
        smooth = smooth + anchor * (1.0 - first_flag) * last_flag * jax.lax.psum(
            is_last_dev * t_last, FRAME_AXIS
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
        # live GT-vs-pred diagnostics (fitting_video.py:327-331), global
        # means over the sharded frame axis — matches the vmapped step's
        # pose_l2 values
        if "gt_joint3d" in batch:
            metrics["gt_joint_loss"] = jax.lax.psum(
                _norm_sum(batch["gt_joint3d"], joint_3d), FRAME_AXIS
            ) / (F_g * 21.0)
            gt_v = (
                jnp.einsum("fij,vj->fvi", batch["Ro_gt"], verts)
                + batch["To_gt"][:, None]
            )
            metrics["gt_obj_verts_loss"] = jax.lax.psum(
                _norm_sum(pred_v, gt_v), FRAME_AXIS
            ) / (F_g * float(V))

        if fcfg.fit_type == "1234":
            # cross-frame stability: gather the tiny (F, V') hand-SDF
            # matrix, evaluate the reference per-frame terms for LOCAL
            # frames, psum the contributions (renderer_batch.py:318-371
            # semantics incl. the setdiff1d quirk — see
            # render.losses.stable_loss_cross)
            verts_ds = verts[::10]
            Vp = verts_ds.shape[0]
            world_v = (
                jnp.einsum("fij,vj->fvi", obj_r, verts_ds) + obj_t[:, None]
            )

            def hand_sdf_frame(pts, bt):
                hand_field = make_hand_field(
                    net_params["hand"], hand_sdf_cfg, hand_color_cfg, bt,
                    batch["t_pose_21"][0],
                )
                return hand_field.sdf_fn(pts)

            sdf_local = jax.vmap(hand_sdf_frame)(world_v, bt_inv)  # (F_l, V')
            sdf_all = jax.lax.all_gather(
                sdf_local, FRAME_AXIS, tiled=True
            )  # (F_g, V')
            dt = sdf_all.dtype
            in_mask_all = (sdf_all < 0).astype(dt)
            frame_has_in = (jnp.sum(in_mask_all, axis=1) > 0).astype(dt)
            in_time = jnp.sum(frame_has_in)
            sdf_pos = jnp.clip(sdf_all, 0.0, 1e7) * frame_has_in[:, None]
            sdf_neg = (
                jnp.abs(jnp.clip(sdf_all, -1e7, 0.0)) * frame_has_in[:, None]
            )
            d2 = jnp.sum(
                (verts_ds[:, None, :] - verts_ds[None, :, :]) ** 2, axis=-1
            )
            vid = jnp.arange(Vp)

            def per_frame(c_in_mask):
                n_in = jnp.sum(c_in_mask)
                in_err = jnp.sum(sdf_pos * c_in_mask[None, :])
                fully_in = n_in >= Vp
                out_ok = (vid != 1) & ((vid != 0) | fully_in)
                big = jnp.asarray(1e10, d2.dtype)
                masked_d2 = jnp.where(out_ok[None, :], d2, big)
                nearest_out = jnp.argmin(masked_d2, axis=1)
                is_near_out = jnp.zeros((Vp,), dt).at[nearest_out].max(c_in_mask)
                out_err = jnp.sum(sdf_neg * is_near_out[None, :])
                denom = jnp.maximum(in_time - 1.0, 1.0) * jnp.maximum(n_in, 1.0)
                return (in_err + 0.05 * out_err) / denom

            local_rows = jax.lax.dynamic_slice_in_dim(
                in_mask_all, dev * F_l, F_l, axis=0
            )
            local_has = jax.lax.dynamic_slice_in_dim(
                frame_has_in, dev * F_l, F_l, axis=0
            )
            per = jax.vmap(per_frame)(local_rows)
            total = jax.lax.psum(
                jnp.sum(per * local_has), FRAME_AXIS
            ) / jnp.maximum(in_time, 1.0)
            s_loss = jnp.where(in_time > 1, total, 0.0)
            loss = loss + 100.0 * s_loss
            metrics["stable_loss"] = s_loss
        metrics["loss"] = loss
        return loss, metrics

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), specs, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step_fn(state, batch, key):
        tables, opt_state = state
        (loss, metrics), grads = jax.value_and_grad(local_loss, has_aux=True)(
            tables, batch, key
        )
        grads = jax.lax.psum(grads, FRAME_AXIS)
        updates, opt_state = opt.update(grads, opt_state, tables)
        tables = optax.apply_updates(tables, updates)
        return (tables, opt_state), metrics

    return jax.jit(step_fn), opt
