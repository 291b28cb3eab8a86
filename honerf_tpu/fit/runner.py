"""Fitting-stage runners: single-frame, video, and result extraction.

Driver parity (fitting_single.py:21-315, fitting_video.py:23-474,
get_res.py:24-302): config-driven workflows that load the frozen offline
checkpoints, optimize pose parameters per frame / per sequence, and persist
pose pickles, meshes, penetration ids and renders under ./fit_res with the
reference's directory scheme — fitting resumes by skipping frames whose
output pickle exists.
"""

from __future__ import annotations

import logging
import os
import pickle
import shutil
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from honerf_tpu.camera import full_image_ndc_grid
from honerf_tpu.config import load_config
from honerf_tpu.data.fit_datasets import (
    FitFrame,
    FitSequence,
    VIEW_LISTS,
    list_fit_sequences,
    load_fit_sequence,
)
from honerf_tpu.data.pixels import sample_rays
from honerf_tpu.extract import bounds_from_points, extract_geometry, inner_point_ids
from honerf_tpu.fit.single import (
    FitHyper,
    final_pose_numpy,
    init_pose_params,
    make_single_fit_step,
)
from honerf_tpu.fit.video import init_video_tables, make_video_fit_step, window_pose
from honerf_tpu.hand import bone_transforms_from_mano_joints
from honerf_tpu.models import (
    color_config_from_conf,
    sdf_config_from_conf,
)
from honerf_tpu.render import RenderConfig
from honerf_tpu.render.dual import render_dual
from honerf_tpu.render.neus import (
    make_hand_field,
    make_obj_field,
    rays_to_object_frame,
)
from honerf_tpu.camera import Camera, xy_to_ray_bundle
from honerf_tpu.train.checkpoints import (
    latest_checkpoint,
    load_checkpoint,
    load_torch_checkpoint,
)
from honerf_tpu.utils.ply import save_ply

logger = logging.getLogger(__name__)

# Per-(window, view) batch keys seen by the video fit step — the union of
# `_window_view_batch`, `_window_consts`, and the runner's anchor flag.
# Used as the sharding-spec template for the frame-sharded step.
_WINDOW_BATCH_KEYS = (
    "rays_xy", "true_rgb", "true_mask", "cam_R", "cam_T", "focal",
    "principal", "index", "joints_pred", "bone_length", "t_pose_21",
    "Ro_pred", "To_pred", "obj_verts", "gt_joint3d", "Ro_gt", "To_gt",
    "anchor_enabled",
)


def load_model_params(model_dir: str) -> Dict[str, Any]:
    """Load the latest offline checkpoint under <model_dir>/checkpoints —
    ours (.npz) or a reference .pth (converted on the fly)."""
    ckpt_dir = os.path.join(model_dir, "checkpoints")
    path = latest_checkpoint(ckpt_dir)
    if path is not None:
        tree = load_checkpoint(path)
        params = tree["params"] if "params" in tree else tree
        return jax.tree.map(jnp.asarray, {
            "sdf": params["sdf"],
            "color": params["color"],
            "variance": params["variance"],
        })
    pths = sorted(
        n for n in os.listdir(ckpt_dir) if n.endswith(".pth")
    ) if os.path.isdir(ckpt_dir) else []
    if pths:
        conv = load_torch_checkpoint(os.path.join(ckpt_dir, pths[-1]))
        return jax.tree.map(jnp.asarray, {
            "sdf": conv["sdf"], "color": conv["color"], "variance": conv["variance"],
        })
    raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")


class _FitBase:
    def __init__(self, conf_path: str, case: str = ""):
        self.conf_path = conf_path
        self.conf = load_config(conf_path, case)
        self.save_dir = self.conf["general.save_dir"]
        os.makedirs(self.save_dir, exist_ok=True)
        self.fit_type = self.conf.get_string("general.fit_type")
        self.view_num = str(self.conf["dataset.view_num"])
        self.data_root = self.conf.get_string("dataset.fitdata_dir")
        self.H, self.W = self.conf.get_list("dataset.image_size")
        self.fcfg = FitHyper.from_conf(self.conf)
        self.rcfg = RenderConfig.from_conf(self.conf["model.neus_renderer"])
        self.hand_sdf_cfg = sdf_config_from_conf(
            "hand", self.conf["model.sdf_hand_network"]
        )
        self.hand_color_cfg = color_config_from_conf(
            "hand", self.conf["model.rendering_hand_network"]
        )
        self.obj_sdf_cfg = sdf_config_from_conf(
            "obj", self.conf["model.sdf_obj_network"]
        )
        self.obj_color_cfg = color_config_from_conf(
            "obj", self.conf["model.rendering_obj_network"]
        )
        self.fit_res_root = self.conf.get_string("general.fit_res_root", "./fit_res")
        self.exp_root = self.conf.get_string("general.exp_root", "./exp")
        self._net_params: Optional[Dict[str, Any]] = None
        self._net_key: Optional[str] = None
        self.rng = np.random.default_rng(0)

    def nets_for(self, seq: FitSequence) -> Dict[str, Any]:
        key = seq.hand_model_path + "|" + seq.obj_model_path
        if self._net_key != key:
            self._net_params = {
                "hand": load_model_params(seq.hand_model_path),
                "obj": load_model_params(seq.obj_model_path),
            }
            self._net_key = key
        return self._net_params

    def frame_consts(self, seq: FitSequence, frame: FitFrame) -> Dict[str, jnp.ndarray]:
        return {
            "joints_pred": jnp.asarray(frame.joints_pred),
            "bone_length": jnp.asarray(seq.bone_length),
            "t_pose_21": jnp.asarray(seq.t_pose_21),
            "Ro_pred": jnp.asarray(frame.obj_pose_pred[:3, :3]),
            "To_pred": jnp.asarray(frame.obj_pose_pred[:3, 3]),
            "obj_verts": jnp.asarray(seq.obj_verts),
            # GT carried for the per-step convergence diagnostics
            # (fitting_single.py:258-265); NOT part of any loss.
            "gt_joint3d": jnp.asarray(frame.joints_gt),
            "Ro_gt": jnp.asarray(frame.Ro_gt),
            "To_gt": jnp.asarray(frame.To_gt),
        }

    def _log_fit_steps(self, labels, chunks, frame_ids=None) -> None:
        """Per-step fit diagnostics, mirroring the reference's every-step
        print (fitting_single.py:262-265, fitting_video.py:327-331).
        `labels` yields one tuple per step, `chunks` the per-chunk stacked
        metrics; fetched once per frame, after the device work is queued.
        With `frame_ids` (frame-batched fitting) metric values carry a
        trailing frame axis — one line per (step, frame); None entries are
        padding frames and are skipped."""
        if not self.conf.get_bool("train.verbose_steps", True):
            return
        from honerf_tpu.utils.profiling import packed_fetch

        li = 0
        ids = frame_ids if frame_ids is not None else [""]
        G = len(ids)
        for m in packed_fetch(chunks):  # ONE device->host round trip
            n = len(next(iter(m.values()))) // G
            v = {k: np.asarray(x).reshape(n, G) for k, x in m.items()}
            nan = np.full((n, G), np.nan)
            for s in range(n):
                lab = labels[li]
                li += 1
                for g, fid in enumerate(ids):
                    if fid is None:
                        continue  # padding frame
                    prefix = f"frame: {fid}, " if frame_ids is not None else ""
                    logger.info(
                        "%s%s loss: %.6f, color: %.6f, mask: %.6f, "
                        "joint: %.6f, obj_verts: %.6f, gt_joint: %.6f, "
                        "gt_obj_verts: %.6f",
                        prefix, lab, v["loss"][s, g], v["color_loss"][s, g],
                        v["mask_loss"][s, g], v["joint_loss"][s, g],
                        v["obj_verts_loss"][s, g],
                        v.get("gt_joint_loss", nan)[s, g],
                        v.get("gt_obj_verts_loss", nan)[s, g],
                    )

    def view_batch(self, frame: FitFrame, view_id: int, n_rays: int):
        """Host-side (numpy) per-view ray batch — upload happens once per
        stacked chunk, not per array."""
        v = frame.views[view_id]
        xy, rgb, m = sample_rays(
            v.image, v.mask, v.mask_xy, n_rays, threshold=1.0, rng=self.rng
        )
        return {
            "rays_xy": xy,
            "true_rgb": rgb,
            "true_mask": m,
            "cam_R": v.cam_R,
            "cam_T": v.cam_T,
            "focal": v.focal,
            "principal": v.principal,
        }

    def save_pose(self, path: str, pose_np: Dict[str, np.ndarray],
                  frame: FitFrame) -> None:
        param = dict(pose_np)
        param["gt_joint3d"] = np.asarray(frame.joints_gt)
        param["gt_Ro"] = np.asarray(frame.Ro_gt)
        param["gt_To"] = np.asarray(frame.To_gt)
        with open(path, "wb") as f:
            pickle.dump(param, f)


class SingleFitRunner(_FitBase):
    """fitting_single.py equivalent (fit types '1' and '12')."""

    def fitting(self) -> None:
        # reference budgets (fitting_single.py:124-132); overridable
        iter_num = {"1": 30, "12": 25}[self.fit_type]
        if self.view_num == "3":
            iter_num += 10
        iter_num = self.conf.get_int("train.iter_num", iter_num)
        # G>1: optimize G independent frames per compiled step (vmapped
        # frame axis — the reference is strictly sequential per frame)
        frames_per_batch = max(1, self.conf.get_int("train.frames_per_batch", 1))
        for obj_name, frame_name in list_fit_sequences(self.data_root):
            seq = load_fit_sequence(
                self.data_root, obj_name, frame_name, self.view_num,
                self.fit_type, self.fit_res_root, self.exp_root,
                image_hw=(self.H, self.W),
            )
            nets = self.nets_for(seq)
            save_base = os.path.join(
                self.fit_res_root, f"view_{len(seq.frames[0].views)}",
                self.fit_type, obj_name, frame_name,
            )
            pose_path = os.path.join(save_base, "pose_" + self.fit_type)
            os.makedirs(pose_path, exist_ok=True)
            cfg_dir = os.path.join(save_base, "config")
            os.makedirs(cfg_dir, exist_ok=True)
            if not os.path.exists(os.path.join(cfg_dir, "config.conf")):
                shutil.copy(self.conf_path, os.path.join(cfg_dir, "config.conf"))
            if frames_per_batch > 1:
                self._fit_sequence_batched(
                    seq, nets, iter_num, pose_path, frames_per_batch
                )
                continue
            # fused Pallas hand ladder on one TPU chip (gradient-severed;
            # train.fused_ladder=false opts out — quality gate in
            # scripts/quality_fit_fused.py)
            fused = self.conf.get_bool(
                "train.fused_ladder",
                jax.default_backend() != "cpu" and len(jax.devices()) == 1,
            )
            # fused differentiable fine pass for the hand side of the
            # dual render (False | 'full' | 'xla').  DEFAULT ON for the
            # single-TPU-chip configuration (round 4, VERDICT r3 #4): the
            # frozen-nets backward cuts the '12' device step 38.7 ->
            # 21.47 ms with pose gradients identical to the XLA path
            # (tests/test_fused_fine_full.py::test_frozen_color_pose_grads;
            # e2e + pose-quality gates in BENCH_NOTES round 4).  Set
            # train.fused_fine = false to opt out.
            fine = self.conf.get("train.fused_fine", None)
            single_chip = (jax.default_backend() != "cpu"
                           and len(jax.devices()) == 1)
            if fine is None:
                fine = "full" if single_chip else False
                if fine:
                    # Default changes the fit-stage kernels (bf16 fused
                    # Pallas backward instead of XLA) for configs that
                    # omit the key — say so in the fit log, mirroring
                    # train/offline.py's selection log (ADVICE r4).
                    logger.info(
                        "train.fused_fine unset: defaulting to 'full' "
                        "(single TPU chip) — fused Pallas fine backward; "
                        "set train.fused_fine = false to opt out")
            if fine and fine != "xla" and not single_chip:
                fine = False
            step, opt = make_single_fit_step(
                nets, self.hand_sdf_cfg, self.hand_color_cfg,
                self.obj_sdf_cfg, self.obj_color_cfg, self.rcfg, self.fcfg,
                fused_ladder=fused, fused_fine=fine,
            )
            step = jax.jit(step)
            from honerf_tpu.train.offline import make_multi_step

            # K (iter, view) steps per device dispatch: rays for the whole
            # chunk are presampled on the host and uploaded as one stack
            # (per-step dispatch + upload through the TPU tunnel would
            # otherwise dominate the 38.7 ms fit step)
            chunk_k = max(1, self.conf.get_int("train.steps_per_dispatch", 40))
            multi_step = jax.jit(make_multi_step(step))
            key = jax.random.PRNGKey(0)
            for frame in seq.frames:
                pose_file = os.path.join(pose_path, f"{frame.frame_id}.pickle")
                if os.path.exists(pose_file):
                    continue  # resume-by-artifact
                consts = self.frame_consts(seq, frame)
                pose = init_pose_params()
                state = (pose, opt.init(pose))
                n_views = len(frame.views)
                schedule = [
                    (it, view_id)
                    for it in range(iter_num)
                    for view_id in range(n_views)
                ]
                metric_chunks = []
                for start in range(0, len(schedule), chunk_k):
                    part = schedule[start:start + chunk_k]
                    view_batches = [
                        self.view_batch(frame, view_id, self.fcfg.batch_size)
                        for (_it, view_id) in part
                    ]
                    # stack on the HOST: jnp.stack over a python list
                    # uploads every element as its own transfer
                    stacked = {
                        name: jnp.asarray(
                            np.stack([np.asarray(b[name]) for b in view_batches])
                        )
                        for name in view_batches[0]
                    }
                    # frame constants broadcast over the chunk axis
                    for name in consts:
                        stacked[name] = jnp.broadcast_to(
                            consts[name][None],
                            (len(part),) + consts[name].shape,
                        )
                    key, sub = jax.random.split(key)
                    keys = jax.random.split(sub, len(part))
                    state, metrics = multi_step(state, stacked, keys)
                    metric_chunks.append(metrics)
                self._log_fit_steps(
                    [f"iter: {it}, view: {v}," for (it, v) in schedule],
                    metric_chunks,
                )
                from honerf_tpu.utils.profiling import packed_fetch

                (rep,) = packed_fetch([{k: metrics[k][-1]
                                        for k in ("loss", "joint_loss")}])
                logger.info(
                    "frame %d: loss=%.4f joint=%.4f", frame.frame_id,
                    rep["loss"][0], rep["joint_loss"][0],
                )
                self.save_pose(
                    pose_file, final_pose_numpy(state[0], consts), frame
                )

    def _fit_sequence_batched(self, seq: FitSequence, nets, iter_num: int,
                              pose_path: str, G: int) -> None:
        """Frame-batched fitting: G independent frames optimized per
        compiled step (fit.single.make_batched_single_fit_step).  Short
        final groups are padded by repeating the last frame (one program
        shape, no recompile); padded results are discarded."""
        from honerf_tpu.fit.single import (
            final_poses_numpy,
            init_pose_params_batched,
            make_batched_single_fit_step,
        )
        from honerf_tpu.train.offline import make_multi_step

        step, opt = make_batched_single_fit_step(
            nets, self.hand_sdf_cfg, self.hand_color_cfg,
            self.obj_sdf_cfg, self.obj_color_cfg, self.rcfg, self.fcfg,
        )
        chunk_k = max(1, self.conf.get_int("train.steps_per_dispatch", 40))
        multi_step = jax.jit(make_multi_step(step))
        key = jax.random.PRNGKey(0)
        # multi-device: the G frames are independent, so the frame axis
        # shards embarrassingly-parallel over the mesh (each device fits
        # its own frames; no collectives).  One v5e chip is already
        # compute-bound at 196 rays (BENCH_NOTES), so G>1 pays off only
        # here.  Disable with train.data_parallel = false.
        frame_shardings = None
        n_dev = len(jax.devices())
        if (n_dev > 1 and G % n_dev == 0
                and self.conf.get_bool("train.data_parallel", True)):
            from jax.sharding import NamedSharding, PartitionSpec as P

            from honerf_tpu.parallel import make_mesh

            mesh = make_mesh()
            frame_shardings = {
                "state": NamedSharding(mesh, P("data")),      # (G, ...)
                "chunk": NamedSharding(mesh, P(None, "data")),  # (K, G, ...)
            }
            logger.info(
                "batched fitting: frame axis sharded over %d devices", n_dev
            )
        pending = [
            f for f in seq.frames
            if not os.path.exists(
                os.path.join(pose_path, f"{f.frame_id}.pickle")
            )
        ]
        for gs in range(0, len(pending), G):
            group = pending[gs:gs + G]
            n_real = len(group)
            group = group + [group[-1]] * (G - n_real)
            consts_np = [
                {k: np.asarray(v)
                 for k, v in self.frame_consts(seq, f).items()}
                for f in group
            ]
            consts = {
                k: (jnp.asarray(np.stack([c[k] for c in consts_np]))
                    if frame_shardings is None else
                    jax.device_put(np.stack([c[k] for c in consts_np]),
                                   frame_shardings["state"]))
                for k in consts_np[0]
            }
            poses = init_pose_params_batched(G)
            state = (poses, jax.vmap(opt.init)(poses))
            if frame_shardings is not None:
                state = jax.device_put(state, frame_shardings["state"])
            n_views = len(group[0].views)
            schedule = [
                (it, v) for it in range(iter_num) for v in range(n_views)
            ]
            metric_chunks = []
            for start in range(0, len(schedule), chunk_k):
                part = schedule[start:start + chunk_k]
                rows = [
                    [self.view_batch(f, view_id, self.fcfg.batch_size)
                     for f in group]
                    for (_it, view_id) in part
                ]
                put = (
                    (lambda a: jax.device_put(a, frame_shardings["chunk"]))
                    if frame_shardings is not None else jnp.asarray
                )
                stacked = {
                    name: put(np.stack([
                        np.stack([np.asarray(b[name]) for b in row])
                        for row in rows
                    ]))
                    for name in rows[0][0]
                }
                for name in consts:
                    stacked[name] = jnp.broadcast_to(
                        consts[name][None],
                        (len(part),) + consts[name].shape,
                    )
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, (len(part), G))
                state, metrics = multi_step(state, stacked, keys)
                metric_chunks.append(metrics)
            self._log_fit_steps(
                [f"iter: {it}, view: {v}," for (it, v) in schedule],
                metric_chunks,
                frame_ids=[f.frame_id for f in group[:n_real]]
                + [None] * (G - n_real),
            )
            for f, pose_np in zip(
                group[:n_real], final_poses_numpy(state[0], consts, n_real)
            ):
                self.save_pose(
                    os.path.join(pose_path, f"{f.frame_id}.pickle"),
                    pose_np, f,
                )
            logger.info(
                "fitted frames %s (batched G=%d)",
                [f.frame_id for f in group[:n_real]], G,
            )


class VideoFitRunner(_FitBase):
    """fitting_video.py equivalent (fit types '123' and '1234')."""

    def _frame_shard_mesh(self, window: int):
        """`train.frame_shard = true` shards the 4-frame window's frame
        axis over a device mesh (parallel/video_shard.py: ppermute smooth
        halo, masked-psum anchors, all_gather'ed stable loss — SURVEY.md
        §5).  The shard count is the largest common divisor of the window
        size and the device count; falls back to the single-device vmapped
        step when that is 1."""
        if not self.conf.get_bool("train.frame_shard", False):
            return None
        import math

        n_dev = len(jax.devices())
        n_shard = math.gcd(window, n_dev)
        if n_shard < 2:
            logger.warning(
                "train.frame_shard requested but %d device(s) share no "
                "divisor with the %d-frame window — using the "
                "single-device step", n_dev, window,
            )
            return None
        from honerf_tpu.parallel import make_mesh

        return make_mesh(n_shard, axis_name="frame")

    def fitting(self) -> None:
        fit_id = self.conf.get_int("general.fit_id", 0)
        manifest_path = self.conf.get_string(
            "general.sequence_list", "./sequence_list_for_fitting.pickle"
        )
        if os.path.exists(manifest_path):
            from honerf_tpu.data.fit_datasets import load_sequence_manifest

            entry = load_sequence_manifest(manifest_path)[fit_id]
            pairs = [(entry["obj_name"], entry["frame_name"])]
        else:
            pairs = [list_fit_sequences(self.data_root)[fit_id]]
        for obj_name, frame_name in pairs:
            self._fit_sequence(obj_name, frame_name)

    def _fit_sequence(self, obj_name: str, frame_name: str) -> None:
        seq = load_fit_sequence(
            self.data_root, obj_name, frame_name, self.view_num,
            self.fit_type, self.fit_res_root, self.exp_root,
            image_hw=(self.H, self.W),
        )
        n_frames = len(seq)
        nets = self.nets_for(seq)
        window = 4
        shard_mesh = (
            self._frame_shard_mesh(window) if n_frames >= window else None
        )
        if shard_mesh is not None:
            from honerf_tpu.parallel.video_shard import (
                make_video_fit_step_sharded,
            )

            step, opt = make_video_fit_step_sharded(
                nets, self.hand_sdf_cfg, self.hand_color_cfg,
                self.obj_sdf_cfg, self.obj_color_cfg, self.rcfg, self.fcfg,
                n_frames, shard_mesh,
                {k: None for k in _WINDOW_BATCH_KEYS},
            )
            logger.info(
                "video fitting: window frame axis sharded over %d devices",
                shard_mesh.devices.size,
            )
        else:
            step, opt = make_video_fit_step(
                nets, self.hand_sdf_cfg, self.hand_color_cfg,
                self.obj_sdf_cfg, self.obj_color_cfg, self.rcfg, self.fcfg,
                n_frames,
            )
            step = jax.jit(step)
        tables = init_video_tables(n_frames)
        state = (tables, opt.init(tables))
        save_base = os.path.join(
            self.fit_res_root, f"view_{len(seq.frames[0].views)}",
            self.fit_type, obj_name, frame_name,
        )
        key = jax.random.PRNGKey(0)
        n_epochs = self.conf.get_int("train.epochs", 5)
        sub_iters = self.conf.get_int("train.sub_iters", 4)
        rays_per_frame = self.conf.get_int("train.rays_per_frame", 40)
        from honerf_tpu.data import FrameWindowSampler

        sampler = FrameWindowSampler(n_frames, window)
        from honerf_tpu.train.offline import make_multi_step

        # one dispatch per (window, sub_iters x views) chunk — see the
        # single-frame fitter for the rationale
        multi_step = jax.jit(make_multi_step(step))
        n_views = len(seq.frames[0].views)
        for epoch in range(n_epochs):
            for idx in sampler:
                frames = [seq.frames[i] for i in idx]
                consts = self._window_consts(seq, frames, idx)
                view_batches = [
                    self._window_view_batch(frames, view_id, rays_per_frame)
                    for _sub in range(sub_iters)
                    for view_id in range(n_views)
                ]
                k = len(view_batches)
                stacked = {
                    name: jnp.asarray(
                        np.stack([np.asarray(b[name]) for b in view_batches])
                    )
                    for name in view_batches[0]
                }
                for name in consts:
                    stacked[name] = jnp.broadcast_to(
                        consts[name][None], (k,) + consts[name].shape
                    )
                # Reference anchor gating (fitting_video.py:313-318): the
                # boundary anchor is skipped on the (sub, view) = (0, 0)
                # step of every window during the first epoch.
                anchor = np.ones((k,), np.float32)
                if epoch == 0:
                    anchor[0] = 0.0
                stacked["anchor_enabled"] = jnp.asarray(anchor)
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, k)
                state, metrics = multi_step(state, stacked, keys)
                self._log_fit_steps(
                    [
                        f"iter: {epoch}, index: {int(idx[0])}, view: {v},"
                        for _sub in range(sub_iters)
                        for v in range(n_views)
                    ],
                    [metrics],
                )
            from honerf_tpu.utils.profiling import packed_fetch

            (rep,) = packed_fetch([{k: metrics[k][-1]
                                    for k in ("loss", "smooth_loss")}])
            logger.info(
                "epoch %d: loss=%.4f smooth=%.4f", epoch,
                rep["loss"][0], rep["smooth_loss"][0],
            )
            self._save_epoch_poses(
                seq, state[0], save_base, epoch,
                final=(epoch == n_epochs - 1),
            )

    def _window_consts(self, seq: FitSequence, frames: List[FitFrame], idx):
        return {
            "index": jnp.asarray(idx, jnp.int32),
            "joints_pred": jnp.asarray(
                np.stack([f.joints_pred for f in frames])
            ),
            "bone_length": jnp.asarray(
                np.tile(seq.bone_length[None], (len(frames), 1))
            ),
            "t_pose_21": jnp.asarray(
                np.tile(seq.t_pose_21[None], (len(frames), 1, 1))
            ),
            "Ro_pred": jnp.asarray(
                np.stack([f.obj_pose_pred[:3, :3] for f in frames])
            ),
            "To_pred": jnp.asarray(
                np.stack([f.obj_pose_pred[:3, 3] for f in frames])
            ),
            "obj_verts": jnp.asarray(seq.obj_verts),
            "gt_joint3d": jnp.asarray(np.stack([f.joints_gt for f in frames])),
            "Ro_gt": jnp.asarray(np.stack([f.Ro_gt for f in frames])),
            "To_gt": jnp.asarray(np.stack([f.To_gt for f in frames])),
        }

    def _window_view_batch(self, frames: List[FitFrame], view_id: int, n_rays: int):
        xs, rgbs, ms = [], [], []
        for f in frames:
            v = f.views[view_id]
            xy, rgb, m = sample_rays(
                v.image, v.mask, v.mask_xy, n_rays, threshold=1.0, rng=self.rng
            )
            xs.append(xy)
            rgbs.append(rgb)
            ms.append(m)
        v0 = frames[0].views[view_id]
        return {
            "rays_xy": jnp.asarray(np.stack(xs)),
            "true_rgb": jnp.asarray(np.stack(rgbs)),
            "true_mask": jnp.asarray(np.stack(ms)),
            "cam_R": jnp.asarray(v0.cam_R),
            "cam_T": jnp.asarray(v0.cam_T),
            "focal": jnp.asarray(v0.focal),
            "principal": jnp.asarray(v0.principal),
        }

    def _save_epoch_poses(self, seq: FitSequence, tables, save_base: str,
                          epoch: int, final: bool = False) -> None:
        pose_path = os.path.join(save_base, f"pose_{epoch}")
        os.makedirs(pose_path, exist_ok=True)
        # optional per-frame full renders.  Reference parity: get_render_all
        # renders ONLY after the final epoch (fitting_video.py:345-348:
        # `if get_render_all and iter_id + 1 == iter_num`); the
        # render_every_epoch superset flag renders after EVERY epoch save
        # (VERDICT r2 #8).
        do_render = self.conf.get_bool("general.get_render_all", False) and (
            final or self.conf.get_bool("general.render_every_epoch", False)
        )
        render_path = os.path.join(save_base, f"render_{epoch}")
        if do_render:
            os.makedirs(render_path, exist_ok=True)
        for i, frame in enumerate(seq.frames):
            consts = self._window_consts(seq, [frame], [i])
            joint_3d, obj_r, obj_t = window_pose(tables, consts)
            self.save_pose(
                os.path.join(pose_path, f"{frame.frame_id}.pickle"),
                {
                    "pred_joint3d": np.asarray(joint_3d[0]),
                    "pred_Ro": np.asarray(obj_r[0]),
                    "pred_To": np.asarray(obj_t[0]),
                },
                frame,
            )
            if do_render:
                render_dual_views(
                    self.nets_for(seq), self.hand_sdf_cfg, self.hand_color_cfg,
                    self.obj_sdf_cfg, self.obj_color_cfg, self.rcfg, self.fcfg,
                    seq, np.asarray(joint_3d[0]), np.asarray(obj_r[0]),
                    np.asarray(obj_t[0]), frame.views[:1], self.H, self.W,
                    render_path,
                )


class GetResRunner(_FitBase):
    """get_res.py equivalent: meshes, penetration ids, renders from fitted
    poses."""

    def __init__(self, conf_path: str, case: str = "", render: bool = False):
        super().__init__(conf_path, case)
        self.render = render

    def _pose_dir_name(self, base_dir: str) -> str:
        """'1'/'12' read their own pose dir; video types read the FINAL
        epoch's table (reference get_res.py:838-842 hardcodes pose_4 =
        epochs-1 at the default 5 epochs).  Prefer the highest pose_<n>
        actually on disk so non-default train.epochs works; fall back to
        train.epochs-1 when nothing is there yet."""
        if self.fit_type in ("1", "12"):
            return "pose_" + self.fit_type
        nums = []
        if os.path.isdir(base_dir):
            for name in os.listdir(base_dir):
                if name.startswith("pose_"):
                    try:
                        nums.append(int(name[5:]))
                    except ValueError:
                        pass
        if nums:
            return f"pose_{max(nums)}"
        return f"pose_{self.conf.get_int('train.epochs', 5) - 1}"

    def fitting(self) -> None:
        for obj_name, frame_name in list_fit_sequences(self.data_root):
            seq = load_fit_sequence(
                self.data_root, obj_name, frame_name, self.view_num, "1",
                self.fit_res_root, self.exp_root, image_hw=(self.H, self.W),
                load_test_views=self.render,
            )
            nets = self.nets_for(seq)
            view_dir = f"view_{len(VIEW_LISTS[self.view_num])}"
            save_base = os.path.join(
                self.fit_res_root, "analys_res", view_dir, self.fit_type,
                obj_name, frame_name,
            )
            if self.fit_type == "0":
                # render from the raw network predictions
                # (get_res.py:856-862, fit-type '0' render path)
                for frame in seq.frames:
                    fitted = {
                        "pred_joint3d": frame.joints_pred,
                        "pred_Ro": frame.obj_pose_pred[:3, :3],
                        "pred_To": frame.obj_pose_pred[:3, 3],
                    }
                    self._process_frame(seq, frame, fitted, save_base, nets)
                continue
            fit_base = os.path.join(
                self.fit_res_root, view_dir, self.fit_type, obj_name,
                frame_name,
            )
            pose_dir = os.path.join(fit_base, self._pose_dir_name(fit_base))
            if not os.path.isdir(pose_dir):
                logger.warning("no fitted poses at %s", pose_dir)
                continue
            for frame in seq.frames:
                pose_file = os.path.join(pose_dir, f"{frame.frame_id}.pickle")
                if not os.path.exists(pose_file):
                    continue
                with open(pose_file, "rb") as f:
                    fitted = pickle.load(f)
                self._process_frame(seq, frame, fitted, save_base, nets)

    def _process_frame(self, seq, frame, fitted, save_base, nets) -> None:
        joints = np.asarray(fitted["pred_joint3d"], np.float32)
        obj_r = np.asarray(fitted["pred_Ro"], np.float32)
        obj_t = np.asarray(fitted["pred_To"], np.float32)
        bt_inv = bone_transforms_from_mano_joints(jnp.asarray(joints)[None])[0]
        t_pose = jnp.asarray(seq.t_pose_21)
        hand_params = nets["hand"]
        obj_params = nets["obj"]

        from honerf_tpu.ops.fused_hand import best_hand_sdf_fn
        from honerf_tpu.ops.fused_sdf import best_obj_sdf_fn

        hand_sdf = best_hand_sdf_fn(
            hand_params["sdf"], self.hand_sdf_cfg, bt_inv, t_pose
        )

        obj_sdf_local = best_obj_sdf_fn(obj_params["sdf"], self.obj_sdf_cfg)

        def obj_sdf_world(pts):
            local = (pts - jnp.asarray(obj_t)) @ jnp.asarray(obj_r)
            return obj_sdf_local(local)

        cur_obj_verts = seq.obj_verts @ obj_r.T + obj_t
        if self.render:
            render_path = os.path.join(save_base, "render_" + self.fit_type)
            os.makedirs(render_path, exist_ok=True)
            self._render_views(seq, frame, joints, obj_r, obj_t, render_path, nets)
            return
        resolution = self.conf.get_int("train.mesh_resolution", 64)
        if self.fit_type in ("1", "12"):
            mesh_path = os.path.join(save_base, "mesh_" + self.fit_type)
            os.makedirs(mesh_path, exist_ok=True)
            lo, hi = bounds_from_points(joints, 0.08)
            hv, hf = extract_geometry(hand_sdf, lo, hi, resolution)
            save_ply(os.path.join(mesh_path, f"{frame.frame_id}_hand.ply"), hv, hf)
            lo, hi = bounds_from_points(cur_obj_verts, 0.08)
            ov, of = extract_geometry(obj_sdf_world, lo, hi, resolution)
            save_ply(os.path.join(mesh_path, f"{frame.frame_id}_obj.ply"), ov, of)
        if self.fit_type in ("12", "123", "1234"):
            inner_path = os.path.join(save_base, "inner_" + self.fit_type)
            os.makedirs(inner_path, exist_ok=True)
            ids = inner_point_ids(hand_sdf, cur_obj_verts)
            with open(os.path.join(inner_path, f"{frame.frame_id}.pickle"), "wb") as f:
                pickle.dump({"inner_point_id": ids}, f)

    def _render_views(self, seq, frame, joints, obj_r, obj_t, render_path, nets):
        render_dual_views(
            nets, self.hand_sdf_cfg, self.hand_color_cfg, self.obj_sdf_cfg,
            self.obj_color_cfg, self.rcfg, self.fcfg, seq, joints, obj_r,
            obj_t, frame.test_views, self.H, self.W, render_path,
        )


def render_dual_views(
    nets, hand_sdf_cfg, hand_color_cfg, obj_sdf_cfg, obj_color_cfg,
    rcfg, fcfg, seq, joints, obj_r, obj_t, views, H, W, render_path,
    chunk: int = 0,
):
    """Full-image dual-volume renders of `views` at a fitted pose — shared
    by GetResRunner (get_res.py:246-287) and the video fitter's optional
    per-epoch renders (fitting_video.py:426-474).

    The reference chunks at 128 rays (get_res.py:271-272); renders are
    inference-only so larger host chunks just amortize dispatch, and all
    chunk outputs are fetched in ONE device->host transfer per image — on
    the tunneled TPU a per-chunk np.asarray is a full round trip (~38 ms
    x 478 chunks at the reference size).  Inside each dispatch the render
    body lax.maps 882-ray sub-chunks on non-CPU backends: large
    single-dispatch forward renders are MISCOMPILED by the tunneled
    backend (>=1764 silently black, >=4096 all-NaN —
    train.offline.eval_ray_chunk, BENCH_NOTES "Known issues")."""
    bt_inv = bone_transforms_from_mano_joints(jnp.asarray(joints)[None])[0]
    # fwd-only, unbatched: safe for the fused Pallas ladder on one chip
    use_fused = jax.default_backend() != "cpu" and len(jax.devices()) == 1
    hand_field = make_hand_field(
        nets["hand"], hand_sdf_cfg, hand_color_cfg, bt_inv,
        jnp.asarray(seq.t_pose_21), fused_ladder=use_fused,
    )
    obj_field = make_obj_field(nets["obj"], obj_sdf_cfg, obj_color_cfg)
    rcfg = rcfg._replace(perturb=0.0)
    from honerf_tpu.utils.backend_probe import round_chunk, safe_ray_chunk

    inner = safe_ray_chunk()
    if not chunk:
        chunk = 4 * inner if inner else 2048
    elif inner:
        # a caller chunk > inner that is not a multiple of it would skip
        # the lax.map guard and single-dispatch a miscompiled-size render
        # (ADVICE r2) — round up instead
        chunk = round_chunk(chunk, inner) if chunk > inner else chunk

    @jax.jit
    def render_chunk(cam_R, cam_T, focal, principal, rays_xy):
        cam = Camera(R=cam_R, T=cam_T, focal=focal, principal=principal)
        rb = xy_to_ray_bundle(cam, rays_xy)

        def body(args):
            o, d = args
            oo, do = rays_to_object_frame(
                o, d, jnp.asarray(obj_r), jnp.asarray(obj_t)
            )
            out = render_dual(
                hand_field, obj_field, rcfg, jax.random.PRNGKey(0),
                o, d, oo, do, fcfg.near, fcfg.far,
            )
            return out["color_fine"]

        n = rays_xy.shape[0]
        if inner and n > inner and n % inner == 0:
            o = rb.origins.reshape(-1, inner, 3)
            d = rb.directions.reshape(-1, inner, 3)
            return jax.lax.map(body, (o, d)).reshape(n, 3)
        return body((rb.origins, rb.directions))

    grid = np.asarray(full_image_ndc_grid(H, W))
    for tv in views:
        n = grid.shape[0]
        outs = []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            rays = grid[s:e]
            if rays.shape[0] < chunk:
                rays = np.pad(rays, ((0, chunk - rays.shape[0]), (0, 0)))
            outs.append(render_chunk(
                jnp.asarray(tv.cam_R), jnp.asarray(tv.cam_T),
                jnp.asarray(tv.focal), jnp.asarray(tv.principal),
                jnp.asarray(rays),
            ))
        img = np.asarray(jnp.concatenate(outs, axis=0))[:n]  # one fetch
        img_u8 = np.clip(img.reshape(H, W, 3) * 255, 0, 255).astype(np.uint8)
        from honerf_tpu.train.runner import _write_image

        _write_image(os.path.join(render_path, tv.name), img_u8)
