"""Offline-stage Runner: config-driven training/test/mesh workflows.

The `exp_runner.py` equivalent (reference :26-537): owns config, data,
networks, optimizer, loop, checkpointing and metrics, with the same CLI
surface (train / test / mesh modes, --is_continue resume from the
lexicographically-latest checkpoint, per-run source snapshots) — but the
per-step work is one jitted XLA program and observability is a JSONL
metrics stream instead of TensorBoard.
"""

from __future__ import annotations

import json
import logging
import math
import os
import tempfile
import time
from shutil import copyfile
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp

from honerf_tpu.camera import full_image_ndc_grid
from honerf_tpu.config import load_config
from honerf_tpu.data import RayBatchLoader, load_offline_dataset
from honerf_tpu.extract import bounds_from_points, extract_geometry
from honerf_tpu.models import (
    color_config_from_conf,
    init_color_params,
    init_sdf_params,
    init_se3_refine,
    init_variance_params,
    sdf_config_from_conf,
)
from honerf_tpu.render import RenderConfig
from honerf_tpu.train.checkpoints import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from honerf_tpu.train.offline import (
    TrainHyper,
    init_train_state,
    make_hand_eval_render,
    make_hand_train_step,
    make_obj_eval_render,
    make_obj_train_step,
)
from honerf_tpu.utils.ply import save_ply

logger = logging.getLogger(__name__)


class MetricsLogger:
    """JSONL scalar stream (the TensorBoard-writer equivalent,
    exp_runner.py:244-251).

    Deferred: device scalars are buffered and materialized every
    `flush_every` steps — fetching a value per step would sync the
    tunneled TPU every iteration (a ~38 ms round trip that was dominating
    the training loop at 2.8 steps/s).  The flush itself packs every
    buffered array into ONE transfer (utils.profiling.packed_fetch):
    per-array fetches were costing ~15 ms/step at flush_every=20
    (scripts/diag_e2e_overhead.py, runs B vs D)."""

    # JSONL metric name -> reference TensorBoard tag (exp_runner.py:244-251)
    TB_TAGS = {
        "loss": "Loss/loss",
        "color_loss": "Loss/color_loss",
        "mask_loss": "Loss/mask_loss",
        "eikonal_loss": "Loss/eikonal_loss",
        "s_val": "Statistics/s_val",
        "cdf": "Statistics/cdf",
        "weight_max": "Statistics/weight_max",
        "psnr": "Statistics/psnr",
    }

    def __init__(self, path: str, flush_every: int = 100,
                 tensorboard_dir: str = None):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self._f = open(path, "a")
        self._buf: list = []
        self._flush_every = flush_every
        self._tb = None
        if tensorboard_dir is not None:
            from honerf_tpu.utils.tbevents import TBEventWriter

            self._tb = TBEventWriter(tensorboard_dir)

    def log(self, step: int, scalars: Dict[str, Any]) -> None:
        self._buf.append((step, 1, time.time(), dict(scalars)))
        if sum(b[1] for b in self._buf) >= self._flush_every:
            self.flush()

    def log_chunk(self, first_step: int, k: int, stacked: Dict[str, Any]) -> None:
        """Buffer a K-step metrics chunk (leading K axis on every value)
        WITHOUT touching the device arrays — even slicing `arr[i]` at log
        time dispatches a device op through the tunnel; materialization
        happens wholesale at flush."""
        self._buf.append((first_step, k, time.time(), dict(stacked)))
        if sum(b[1] for b in self._buf) >= self._flush_every:
            self.flush()

    def flush(self) -> None:
        from honerf_tpu.utils.profiling import packed_fetch

        fetched = packed_fetch([b[3] for b in self._buf])
        for (step, k, t, _), host in zip(self._buf, fetched):
            for i in range(k):
                rec = {"step": step + i, "time": t}
                rec.update(
                    {
                        name: float(v[i] if v.shape[0] > 1 else v[0])
                        for name, v in host.items()
                    }
                )
                self._f.write(json.dumps(rec) + "\n")
                if self._tb is not None:
                    self._tb.add_scalars(
                        rec["step"],
                        {
                            tag: rec[name]
                            for name, tag in self.TB_TAGS.items()
                            if name in rec
                        },
                        wall_time=t,
                    )
        self._buf.clear()
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()


class OfflineRunner:
    def __init__(self, conf_path: str, mode: str = "train", case: str = "",
                 is_continue: bool = False):
        self.conf_path = conf_path
        self.conf = load_config(conf_path, case)
        self.base_exp_dir = self.conf["general.base_exp_dir"]
        os.makedirs(self.base_exp_dir, exist_ok=True)
        self.model_type = self.conf.get_string("general.model_type")
        self.data_type = self.conf.get_string("general.data_type")
        self.H, self.W = self.conf.get_list("dataset.image_size")
        self.mode = mode

        self.tcfg = TrainHyper.from_conf(self.conf)
        self.rcfg = RenderConfig.from_conf(self.conf["model.neus_renderer"])
        self.sdf_cfg = sdf_config_from_conf(
            self.model_type, self.conf["model.sdf_network"]
        )
        self.color_cfg = color_config_from_conf(
            self.model_type, self.conf["model.rendering_network"]
        )
        init_val = float(self.conf["model.variance_network"]["init_val"])

        self.train_scene = load_offline_dataset(
            self.conf.get_string("dataset.traindata_dir"), self.model_type,
            "train", self.data_type,
        )
        self.test_scene = load_offline_dataset(
            self.conf.get_string("dataset.testdata_dir"), self.model_type,
            "test", self.data_type,
        )
        self.loader = RayBatchLoader(self.train_scene, self.tcfg.batch_size)

        key = jax.random.PRNGKey(0)
        params = {
            "sdf": init_sdf_params(key, self.sdf_cfg),
            "color": init_color_params(jax.random.PRNGKey(1), self.color_cfg),
            "variance": init_variance_params(init_val),
            "se3_refine": init_se3_refine(len(self.train_scene), self.model_type),
        }
        self.state = init_train_state(params, self.tcfg)
        self.iter_step = 0

        # VGG perceptual loss on patch batches after 30% of training
        # (exp_runner.py:228-236); requires pretrained weights — disabled
        # with a warning when they are unavailable
        self._vgg_loss_fn = None
        if self.tcfg.vgg_weight > 0:
            from honerf_tpu.models.vgg import (
                load_torchvision_vgg19,
                make_patch_vgg_loss,
            )

            vgg_params = load_torchvision_vgg19()
            if vgg_params is None:
                logger.warning(
                    "vgg_weight=%.2f but no pretrained VGG19 weights found "
                    "(no network egress in this environment) — VGG loss "
                    "disabled; patch sampling after vgg_start still applies",
                    self.tcfg.vgg_weight,
                )
            else:
                self._vgg_loss_fn = make_patch_vgg_loss(
                    jax.tree.map(jnp.asarray, vgg_params)
                )
        if self.model_type == "obj":
            self._raw_step = make_obj_train_step(
                self.sdf_cfg, self.color_cfg, self.rcfg, self.tcfg,
                vgg_loss_fn=self._vgg_loss_fn,
            )
            self._eval_render = jax.jit(
                make_obj_eval_render(self.sdf_cfg, self.color_cfg, self.rcfg, self.tcfg)
            )
        else:
            self._raw_step = make_hand_train_step(
                self.sdf_cfg, self.color_cfg, self.rcfg, self.tcfg,
                vgg_loss_fn=self._vgg_loss_fn,
            )
            self._eval_render = jax.jit(
                make_hand_eval_render(self.sdf_cfg, self.color_cfg, self.rcfg, self.tcfg)
            )
        from honerf_tpu.train.offline import resolve_grad_clip

        clip = resolve_grad_clip(self.tcfg, self.sdf_cfg)
        if clip > 0:
            logger.info(
                "grad clip: global-norm %.1f (%s; train.grad_clip=0 "
                "disables)", clip,
                "bf16-trunk auto" if self.tcfg.grad_clip is None
                else "conf override",
            )
        self._step = jax.jit(self._raw_step)
        # built once: re-wrapping per train() call would re-trace the whole
        # K-step scan (~20 s for the full-size program) on every resume
        from honerf_tpu.train.offline import make_multi_step

        self._multi_step = jax.jit(make_multi_step(self._raw_step))
        self.key = jax.random.PRNGKey(42)

        # Multi-device ray-axis data parallelism (SURVEY.md §2.2): train
        # chunks are device_put with the ray axis sharded over the mesh
        # (params replicated; GSPMD inserts the gradient all-reduce over
        # ICI).  Engages when >1 device is visible and the batch divides
        # the mesh; `train.data_parallel = false` disables.
        self._mesh = None
        n_dev = len(jax.devices())
        if (n_dev > 1 and self.conf.get_bool("train.data_parallel", True)
                and self.tcfg.batch_size % n_dev == 0):
            from jax.sharding import NamedSharding, PartitionSpec as P

            from honerf_tpu.parallel import DATA_AXIS, make_mesh

            self._mesh = make_mesh()
            self._chunk_ray_sharding = NamedSharding(
                self._mesh, P(None, DATA_AXIS)  # (K, rays, ...) chunks
            )
            self._chunk_repl_sharding = NamedSharding(self._mesh, P())
            logger.info(
                "train data parallelism: ray axis sharded over %d devices",
                n_dev,
            )

        metrics_path = os.path.join(self.base_exp_dir, "logs",
                                    "metrics.jsonl")
        if is_continue:
            ckpt = latest_checkpoint(os.path.join(self.base_exp_dir, "checkpoints"))
            if ckpt:
                logger.info("resuming from %s", ckpt)
                self.load_checkpoint_file(ckpt)
                # crash consistency: a previous process may have flushed
                # metric lines PAST the checkpoint we resume from (it
                # died between a flush and its next save).  Re-training
                # those steps would append duplicates — truncate to the
                # checkpoint step so the stream stays gapless and
                # duplicate-free across any crash/resume pattern
                # (observed in the round-4 soak; scripts/soak_resume.py
                # gate 1).
                self._truncate_metrics(metrics_path, self.iter_step)
        if mode.startswith("train"):
            self.file_backup()
        self.metrics = MetricsLogger(
            metrics_path,
            tensorboard_dir=(
                os.path.join(self.base_exp_dir, "logs")
                if self.conf.get_bool("train.tensorboard", False) else None
            ),
        )

    @staticmethod
    def _truncate_metrics(path: str, max_step: int) -> None:
        """Drop metric lines past the resume step AND any torn/unparseable
        lines (a killed process can leave a partial trailing line that the
        next append would otherwise concatenate onto).  The rewrite goes
        through a same-directory temp file + os.replace so a crash here
        never loses the retained history — this IS the crash-recovery
        path, it must itself be crash-safe (ADVICE r4)."""
        if not os.path.exists(path):
            return
        kept, dropped, torn = [], 0, 0
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    torn += 1  # partial trailing write from a kill
                    continue
                # valid JSON without a "step" (e.g. a future summary
                # record) is NOT torn: keep it rather than silently
                # deleting history in the crash-recovery path
                step = rec.get("step") if isinstance(rec, dict) else None
                if step is not None and step > max_step:
                    dropped += 1
                    continue
                if not line.endswith("\n"):
                    line += "\n"
                kept.append(line)
        if dropped or torn:
            logger.info(
                "dropping %d metric lines past resume step %d "
                "(+%d torn/unparseable)", dropped, max_step, torn)
            fd, tmp = tempfile.mkstemp(
                dir=os.path.dirname(os.path.abspath(path)),
                prefix=".metrics_trunc_")
            try:
                with os.fdopen(fd, "w") as f:
                    f.writelines(kept)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, path)
            except BaseException:
                if os.path.exists(tmp):
                    os.unlink(tmp)
                raise

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------

    def file_backup(self) -> None:
        """Per-run source snapshot (exp_runner.py:276-286)."""
        rec_dir = os.path.join(self.base_exp_dir, "recording")
        os.makedirs(rec_dir, exist_ok=True)
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            rel = os.path.relpath(dirpath, os.path.dirname(pkg_root))
            for fname in filenames:
                if fname.endswith(".py"):
                    dst_dir = os.path.join(rec_dir, rel)
                    os.makedirs(dst_dir, exist_ok=True)
                    copyfile(os.path.join(dirpath, fname), os.path.join(dst_dir, fname))
        copyfile(self.conf_path, os.path.join(rec_dir, "config.conf"))

    def save_checkpoint_file(self) -> None:
        # checkpoint durability implies metrics durability: flush the
        # buffered metric lines FIRST, so a crash after this save never
        # leaves a metrics gap behind a durable checkpoint (the round-4
        # soak's mid-run kill lost 72 buffered lines preceding
        # ckpt_001000 before this ordering existed)
        if getattr(self, "metrics", None) is not None:
            self.metrics.flush()
        path = os.path.join(
            self.base_exp_dir, "checkpoints", f"ckpt_{self.iter_step:06d}.npz"
        )
        tree = dict(self.state)
        tree["iter_step"] = np.asarray(self.iter_step)
        save_checkpoint(path, tree)

    def load_checkpoint_file(self, path: str) -> None:
        tree = load_checkpoint(path)
        self.iter_step = int(tree.pop("iter_step"))
        # The npz round trip turns optax NamedTuple states into plain lists;
        # re-hang the loaded leaves on the freshly-initialized state's
        # treedef so optimizer updates keep working after resume.  Leaf
        # order matches because jax.tree sorts dict keys on both sides and
        # NamedTuple fields serialize positionally.
        ref_leaves, treedef = jax.tree.flatten(self.state)
        leaves = jax.tree.leaves(tree)
        assert len(leaves) == len(ref_leaves), (
            f"checkpoint structure mismatch: {len(leaves)} leaves vs "
            f"{len(ref_leaves)} expected"
        )
        self.state = jax.tree.unflatten(
            treedef, [jnp.asarray(l) for l in leaves]
        )
        self.state["step"] = jnp.asarray(self.iter_step)

    # ------------------------------------------------------------------
    # workflows
    # ------------------------------------------------------------------

    def _batch_stream(self, vgg_start: float):
        """Infinite shuffled per-view batch generator (patch sampling after
        vgg_start, exp_runner.py:134-143) with the VGG ramp weight
        (0 before vgg_start, linear to 1 over 10k iters after,
        exp_runner.py:231-234)."""
        counter = self.iter_step
        while True:
            for batch_np in self.loader.epoch(patch=self.iter_step > vgg_start):
                counter += 1
                if self._vgg_loss_fn is not None:
                    ramp = min(max(counter - vgg_start, 0.0) / 10000.0, 1.0)
                    batch_np = dict(batch_np, vgg_ramp=np.float32(ramp))
                yield batch_np

    def train(self, stop_at: int = None) -> None:
        """Run the training loop to end_iter, or to `stop_at` if given.

        stop_at pauses the run WITHOUT changing the schedule: the LR
        decay, warm-up and the 0.3*end_iter patch-sampling switch all
        stay anchored to the conf's end_iter, so a run split across
        processes (checkpoint at stop_at -> --is_continue) follows the
        exact single-process trajectory (scripts/soak_resume.py)."""
        t = self.tcfg
        stop = t.end_iter if stop_at is None else min(stop_at, t.end_iter)
        report_freq = self.conf.get_int("train.report_freq", 100)
        save_freq = self.conf.get_int("train.save_freq", 5000)
        val_freq = self.conf.get_int("train.val_freq", 5000)
        # K optimizer steps per device dispatch (lax.scan): amortizes the
        # ~3.5 ms tunnel dispatch + per-array upload costs.  Checkpoints/
        # validation run on chunk boundaries.  Default K=8 under the
        # tunneled-backend workarounds (K=16 diverged there), 16 on a
        # healthy backend (utils.backend_probe).
        from honerf_tpu.utils.backend_probe import default_steps_per_dispatch

        chunk_k = max(1, self.conf.get_int(
            "train.steps_per_dispatch", default_steps_per_dispatch()
        ))
        vgg_start = t.end_iter * 0.3
        stream = self._batch_stream(vgg_start)
        multi_step = self._multi_step
        while self.iter_step < stop:
            # align chunks to the next save/val/end boundary so checkpoint
            # and validation iteration numbers match the single-step loop
            k = min(
                chunk_k,
                stop - self.iter_step,
                save_freq - self.iter_step % save_freq,
                val_freq - self.iter_step % val_freq,
            )
            batch_list = [next(stream) for _ in range(k)]
            stacked_np = {
                key: np.stack([b[key] for b in batch_list])
                for key in batch_list[0]
            }
            if self._mesh is not None:
                ray_keys = ("rays_xy", "true_rgb", "true_mask")
                stacked = {
                    key: jax.device_put(
                        v,
                        self._chunk_ray_sharding if key in ray_keys
                        else self._chunk_repl_sharding,
                    )
                    for key, v in stacked_np.items()
                }
            else:
                stacked = {k2: jnp.asarray(v) for k2, v in stacked_np.items()}
            self.key, sub = jax.random.split(self.key)
            keys = jax.random.split(sub, k)
            self.state, ms = multi_step(self.state, stacked, keys)
            self.metrics.log_chunk(self.iter_step + 1, k, ms)
            self.iter_step += k
            if self.iter_step % report_freq < k:
                # one packed fetch — five separate float() materializations
                # were five tunnel round trips per report
                from honerf_tpu.utils.profiling import packed_fetch

                names = ("loss", "color_loss", "mask_loss", "eikonal_loss",
                         "psnr")
                (rep,) = packed_fetch([{n: ms[n][-1] for n in names}])
                logger.info(
                    "iter %d loss=%.4f color=%.4f mask=%.4f eik=%.4f psnr=%.2f",
                    self.iter_step, rep["loss"][0], rep["color_loss"][0],
                    rep["mask_loss"][0], rep["eikonal_loss"][0],
                    rep["psnr"][0],
                )
            if self.iter_step % save_freq == 0:
                self.save_checkpoint_file()
            if self.iter_step % val_freq == 0:
                self.validate_image()
        self.metrics.flush()

    def _render_full_image(self, view_idx: int, scene=None) -> np.ndarray:
        scene = scene or self.test_scene
        v = scene.views[view_idx]
        grid = np.asarray(full_image_ndc_grid(self.H, self.W))
        # full-image renders are inference-only: larger chunks amortize
        # dispatch overhead (the reference chunks at batch_size,
        # exp_runner.py:356).  On non-CPU backends the host chunk is a
        # multiple of the 882-ray safe body so the eval render's lax.map
        # path engages — large SINGLE-dispatch forward renders are
        # miscompiled by the tunneled backend (>=1764 silently black,
        # >=4096 all-NaN; offline.eval_ray_chunk / BENCH_NOTES "Known
        # issues").  `train.eval_chunk` overrides (keep it a multiple of
        # train.ray_chunk's effective value).
        from honerf_tpu.train.offline import eval_ray_chunk

        from honerf_tpu.utils.backend_probe import round_chunk

        inner = eval_ray_chunk(self.tcfg)
        default_chunk = (
            8 * inner if inner else max(self.tcfg.batch_size, 4096)
        )
        chunk = self.conf.get_int("train.eval_chunk", default_chunk)
        # a user-set eval_chunk that is not a multiple of the inner body
        # would silently skip the lax.map guard (ADVICE r2 medium)
        chunk = round_chunk(chunk, inner)
        n = grid.shape[0]
        base = {
            "cam_R": jnp.asarray(v.cam_R),
            "cam_T": jnp.asarray(v.cam_T),
            "focal": jnp.asarray(v.focal),
            "principal": jnp.asarray(v.principal),
            "Ro": jnp.asarray(v.Ro),
            "To": jnp.asarray(v.To),
            "joints": jnp.asarray(v.joints),
            "t_pose_21": jnp.asarray(scene.t_pose_21),
            "bone_length": jnp.asarray(scene.bone_length),
            "index": jnp.asarray(view_idx, jnp.int32),
        }
        # multi-device: shard the chunk's ray axis over the mesh (params
        # replicated); GSPMD partitions the eval render automatically
        n_dev = len(jax.devices())
        mesh = None
        if n_dev > 1:
            from honerf_tpu.parallel import data_sharding, make_mesh

            mesh = make_mesh()
            # round up to divide the mesh WITHOUT breaking the
            # multiple-of-`inner` invariant the lax.map body needs
            # (e.g. 7056 on 32 devices must become 28224, not 7072 —
            # ADVICE r2 medium)
            chunk = round_chunk(chunk, inner, n_dev)
            ray_sharding = data_sharding(mesh)
        outs = []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            rays = grid[s:e]
            if rays.shape[0] < chunk:
                rays = np.pad(rays, ((0, chunk - rays.shape[0]), (0, 0)))
            rays_dev = (
                jax.device_put(rays, ray_sharding) if mesh is not None
                else jnp.asarray(rays)
            )
            batch = dict(base, rays_xy=rays_dev)
            color, _ws = self._eval_render(
                self.state["params"], batch, jax.random.PRNGKey(0)
            )
            outs.append(color)
        # one device->host fetch per image (per-chunk np.asarray is a full
        # tunnel round trip)
        out = np.asarray(jnp.concatenate(outs, axis=0))[:n]
        return out.reshape(self.H, self.W, 3)

    def test(self) -> None:
        out_dir = os.path.join(self.base_exp_dir, "test_render")
        os.makedirs(out_dir, exist_ok=True)
        for i, v in enumerate(self.test_scene.views):
            img = self._render_full_image(i)
            img_u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
            name = v.name.replace(".pickle", ".png")
            _write_image(os.path.join(out_dir, name), img_u8)
            logger.info("wrote %s", name)

    def validate_image(self, idx: int = 0) -> None:
        out_dir = os.path.join(self.base_exp_dir, "validations_fine")
        os.makedirs(out_dir, exist_ok=True)
        img = self._render_full_image(idx)
        img_u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        _write_image(
            os.path.join(out_dir, f"{self.iter_step:08d}_{idx}.png"), img_u8
        )

    def validate_mesh(self, resolution: int = 64, threshold: float = 0.0) -> None:
        """Mesh extraction for each test view's pose
        (exp_runner.py:462-536)."""
        from honerf_tpu.hand import bone_transforms_from_mano_joints

        mesh_dir = os.path.join(self.base_exp_dir, "meshes")
        os.makedirs(mesh_dir, exist_ok=True)
        params = self.state["params"]
        for i, v in enumerate(self.test_scene.views):
            if self.model_type == "hand":
                from honerf_tpu.ops.fused_hand import best_hand_sdf_fn

                bt_inv = bone_transforms_from_mano_joints(
                    jnp.asarray(v.joints)[None]
                )[0]
                t_pose = jnp.asarray(self.test_scene.t_pose_21)
                sdf_fn = best_hand_sdf_fn(
                    params["sdf"], self.sdf_cfg, bt_inv, t_pose
                )
                lo, hi = mesh_bounds(self.model_type, self.data_type, v.joints)
            else:
                from honerf_tpu.ops.fused_sdf import best_obj_sdf_fn

                sdf_fn = best_obj_sdf_fn(params["sdf"], self.sdf_cfg)
                lo, hi = mesh_bounds(self.model_type, self.data_type, v.joints)
            verts, tris = extract_geometry(sdf_fn, lo, hi, resolution, threshold)
            save_ply(os.path.join(mesh_dir, f"{i:08d}.ply"), verts * 1000.0, tris)
            logger.info("mesh %d: %d verts", i, len(verts))


def mesh_bounds(model_type: str, data_type: str, pts: np.ndarray):
    """Marching-cube grid bounds (exp_runner.py:493-517): hand and obj-syn
    use the carried points +-0.15 (the obj test item carries zeros(21,3),
    so obj-syn is a +-0.15 origin box); obj-real uses the fixed r=0.2
    origin box."""
    if model_type == "hand" or data_type == "syn":
        return bounds_from_points(pts, 0.15)
    return np.full(3, -0.2), np.full(3, 0.2)


def _write_image(path: str, img_u8: np.ndarray) -> None:
    try:
        import cv2

        cv2.imwrite(path, img_u8[..., ::-1])  # RGB -> BGR
    except ImportError:
        from PIL import Image

        Image.fromarray(img_u8).save(path)
