"""Single-frame pose fitting (fit types '1' and '12').

Functional equivalent of fitting_single.py:117-315: six trainable pose
tensors per frame (object rot6d/trans, palm rot6d/trans, 20 joint angles,
7 palm angles), Adam with per-tensor learning rates, and a loss of
render (masked L1 + 0.5 BCE) + pose regularizer (+ contact/penetration
interaction for '12') — the entire chain (inverse HALO refinement -> bone
transforms -> dual NeuS render) differentiated end-to-end in ONE compiled
XLA program per step.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

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
)
from honerf_tpu.render.neus import (
    RenderConfig,
    make_hand_field,
    make_obj_field,
    rays_to_object_frame,
)
from honerf_tpu.utils.transforms import rot6d_to_matrix

Params = Dict[str, Any]


class FitHyper(NamedTuple):
    """Static fitting hyperparameters (`train`/`general` conf sections)."""

    near: float = 0.4
    far: float = 1.5
    batch_size: int = 196
    fit_type: str = "12"  # '1' | '12'

    @classmethod
    def from_conf(cls, conf) -> "FitHyper":
        return cls(
            near=float(conf["train.near"]),
            far=float(conf["train.far"]),
            batch_size=int(conf["train.batch_size"]),
            fit_type=str(conf["general.fit_type"]),
        )


def init_pose_params() -> Params:
    """The six per-frame trainable tensors (fitting_single.py:177-190):
    rot6d refinements start at identity (eye(3)[:, :2])."""
    eye62 = jnp.eye(3)[:, :2]
    return {
        "obj_rot6": eye62,
        "obj_trans": jnp.zeros(3),
        "palm_rot6": eye62[None],
        "palm_trans": jnp.zeros((1, 3)),
        "joint_angle": jnp.zeros((1, 20)),
        "palm_angle": jnp.zeros((1, 7)),
    }


# Per-tensor Adam learning rates (fitting_single.py:191-198).
SINGLE_FIT_LRS = {
    "obj_rot6": 5e-4,
    "obj_trans": 5e-4,
    "palm_rot6": 5e-4,
    "palm_trans": 3e-4,
    "joint_angle": 1e-3,
    "palm_angle": 1e-3,
}


def make_pose_optimizer(lrs: Dict[str, float]) -> optax.GradientTransformation:
    transforms = {k: optax.adam(lr) for k, lr in lrs.items()}
    return optax.multi_transform(transforms, lambda params: {k: k for k in params})


def current_pose(pose: Params, frame: Dict[str, jnp.ndarray]):
    """Apply the trainable refinements to the frame's initial estimates.

    Returns (joint_3d (1,21,3), obj_r (3,3), obj_t (3,))
    (fitting_single.py:206-230)."""
    joint_3d = refined_hand_joints(
        frame["joints_pred"][None],
        frame["bone_length"][None],
        joint_refine_angle=pose["joint_angle"],
        palm_refine_angle=pose["palm_angle"] * 0.1,
        palm_rot6d=pose["palm_rot6"].reshape(1, 6),
        palm_trans=pose["palm_trans"],
    )
    d_rot = rot6d_to_matrix(pose["obj_rot6"].reshape(6))
    obj_r = d_rot @ frame["Ro_pred"]
    obj_t = frame["To_pred"] + pose["obj_trans"]
    return joint_3d, obj_r, obj_t


def make_single_fit_step(
    net_params: Params,
    hand_sdf_cfg: SDFConfig,
    hand_color_cfg: ColorConfig,
    obj_sdf_cfg: SDFConfig,
    obj_color_cfg: ColorConfig,
    rcfg: RenderConfig,
    fcfg: FitHyper,
    lrs: Dict[str, float] = SINGLE_FIT_LRS,
    fused_ladder: bool = False,
    fused_fine=False,
):
    """Build the jittable fit step.  `net_params` holds the FROZEN offline
    models: {'hand': {sdf,color,variance}, 'obj': {...}}.

    fused_ladder serves the hand side of the dual importance-sampling
    ladder from the Pallas kernel (ops/fused_hand.py) — the ladder is
    non-differentiable, so pose gradients are unaffected; sample
    placement shifts slightly (bf16 kernel weights).  Quality-gated on
    the synthetic catch sequence (scripts/quality_fit_fused.py); leave
    False under vmap (the frame-batched step).

    fused_fine ('full'/'xla'/False, conf train.fused_fine): serve the
    hand FINE pass from the fully-fused differentiable op
    (ops/fused_fine_full.py) — pose gradients flow through its
    hand-written VJP (validated <=1e-3 vs XLA incl. the HALO chain,
    tests/test_fused_fine_full.py).  The fit step only differentiates
    POSE (net_params are frozen constants), so 'full' is upgraded to
    the 'full_frozen' kernel variant: the backward skips every
    dW = X^T dY matmul (pose grads identical,
    tests/test_fused_fine_full.py::test_frozen_color_pose_grads)."""
    opt = make_pose_optimizer(lrs)
    if fused_fine in (True, "full"):
        fused_fine = "full_frozen"

    def loss_fn(pose: Params, batch: Dict[str, jnp.ndarray], key):
        joint_3d, obj_r, obj_t = current_pose(pose, batch)
        bt_inv = bone_transforms_from_mano_joints(joint_3d)[0]
        hand_field = make_hand_field(
            net_params["hand"], hand_sdf_cfg, hand_color_cfg, bt_inv,
            batch["t_pose_21"], fused_ladder=fused_ladder,
            fused_fine=fused_fine,
        )
        obj_field = make_obj_field(net_params["obj"], obj_sdf_cfg, obj_color_cfg)
        cam = Camera(
            R=batch["cam_R"], T=batch["cam_T"],
            focal=batch["focal"], principal=batch["principal"],
        )
        rb = xy_to_ray_bundle(cam, batch["rays_xy"])
        o_obj, d_obj = rays_to_object_frame(rb.origins, rb.directions, obj_r, obj_t)
        out = render_dual(
            hand_field, obj_field, rcfg, key,
            rb.origins, rb.directions, o_obj, d_obj, fcfg.near, fcfg.far,
        )

        true_mask = batch["true_mask"]
        color_err = (out["color_fine"] - batch["true_rgb"]) * true_mask
        # reference divides by the ray count here, NOT the mask sum
        # (fitting_single.py:254)
        color_loss = jnp.sum(jnp.abs(color_err)) / true_mask.shape[0]
        m_loss = mask_bce(out["weight_sum"], true_mask)
        render_loss = color_loss + 0.5 * m_loss

        joint_loss = pose_l2(batch["joints_pred"], joint_3d[0])
        verts = batch["obj_verts"]
        pred_v = verts @ obj_r.T + obj_t
        compare_v = verts @ batch["Ro_pred"].T + batch["To_pred"]
        verts_loss = pose_l2(compare_v, pred_v)

        metrics = {
            "color_loss": color_loss,
            "mask_loss": m_loss,
            "joint_loss": joint_loss,
            "obj_verts_loss": verts_loss,
        }
        # Live GT-vs-pred diagnostics, printed every step by the reference
        # (fitting_single.py:258-265) — the operator's convergence signal.
        if "gt_joint3d" in batch:
            metrics["gt_joint_loss"] = pose_l2(batch["gt_joint3d"], joint_3d[0])
            gt_v = verts @ batch["Ro_gt"].T + batch["To_gt"]
            metrics["gt_obj_verts_loss"] = pose_l2(pred_v, gt_v)
        if fcfg.fit_type == "1":
            loss = render_loss + 100.0 * joint_loss + 5.0 * verts_loss
        else:  # '12'
            sdf_h = out["sdf_hand"][:, 0]
            sdf_o = out["sdf_obj"][:, 0]
            c_loss = contact_loss(sdf_h, sdf_o)
            p_loss = penetration_loss(sdf_h, sdf_o)
            loss = (
                render_loss
                + 30.0 * joint_loss + 20.0 * verts_loss
                + 30.0 * c_loss + 20.0 * p_loss
            )
            metrics.update(contact_loss=c_loss, penet_loss=p_loss)
        metrics["loss"] = loss
        return loss, metrics

    def step_fn(pose_state, batch, key):
        pose, opt_state = pose_state
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            pose, batch, key
        )
        updates, opt_state = opt.update(grads, opt_state, pose)
        pose = optax.apply_updates(pose, updates)
        return (pose, opt_state), metrics

    return step_fn, opt


def init_pose_params_batched(n_frames: int) -> Params:
    """Pose tables for `n_frames` independent frames (leading frame axis)."""
    return jax.tree.map(
        lambda x: jnp.tile(x[None], (n_frames,) + (1,) * x.ndim),
        init_pose_params(),
    )


def make_batched_single_fit_step(
    net_params: Params,
    hand_sdf_cfg: SDFConfig,
    hand_color_cfg: ColorConfig,
    obj_sdf_cfg: SDFConfig,
    obj_color_cfg: ColorConfig,
    rcfg: RenderConfig,
    fcfg: FitHyper,
    lrs: Dict[str, float] = SINGLE_FIT_LRS,
):
    """`jax.vmap` of the single-frame fit step over a leading FRAME axis:
    optimizes G independent frames in ONE compiled program.

    The reference fits frames strictly sequentially
    (fitting_single.py:200); at 196 rays/step one frame leaves most of the
    chip idle, so batching frames multiplies fitting throughput at the
    same per-frame math (frames share nothing — each carries its own pose
    tensors, Adam state, rays, and constants).  State/batch/key all gain a
    leading (G, ...) axis; optimizer state must be built with
    `jax.vmap(opt.init)(poses)`.
    """
    step_fn, opt = make_single_fit_step(
        net_params, hand_sdf_cfg, hand_color_cfg, obj_sdf_cfg,
        obj_color_cfg, rcfg, fcfg, lrs,
    )
    return jax.vmap(step_fn), opt


def final_poses_numpy(poses: Params, frames: Dict[str, jnp.ndarray],
                      n_real: int):
    """Batched `final_pose_numpy`: one packed transfer for all G frames;
    returns the first `n_real` (the rest are padding duplicates)."""
    import numpy as np

    from honerf_tpu.utils.profiling import packed_fetch

    joint_3d, obj_r, obj_t = jax.vmap(current_pose)(poses, frames)
    (h,) = packed_fetch([{"j": joint_3d[:, 0], "r": obj_r, "t": obj_t}])
    G = obj_t.shape[0]
    js = h["j"].reshape(G, 21, 3).astype(np.float32)
    rs = h["r"].reshape(G, 3, 3).astype(np.float32)
    ts = h["t"].reshape(G, 3).astype(np.float32)
    return [
        {"pred_joint3d": js[g], "pred_Ro": rs[g], "pred_To": ts[g]}
        for g in range(n_real)
    ]


def final_pose_numpy(pose: Params, frame: Dict[str, jnp.ndarray]):
    """Materialize the fitted pose for the output pickle
    (fitting_single.py:293-311) — one packed device->host transfer."""
    import numpy as np

    from honerf_tpu.utils.profiling import packed_fetch

    joint_3d, obj_r, obj_t = current_pose(pose, frame)
    (h,) = packed_fetch([{"j": joint_3d[0], "r": obj_r, "t": obj_t}])
    return {
        "pred_joint3d": h["j"].reshape(21, 3).astype(np.float32),
        "pred_Ro": h["r"].reshape(3, 3).astype(np.float32),
        "pred_To": h["t"].reshape(3).astype(np.float32),
    }
