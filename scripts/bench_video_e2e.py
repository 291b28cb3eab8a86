"""End-to-end VideoFitRunner throughput + pose-quality gate (VERDICT r3 #5).

Times fit '123' and '1234' over a synthetic full-size catch sequence
(230x266, 8 views, FULL-SIZE networks) at the reference budget
(fitting_video.py:121-474: 4-frame windows, 5 epochs x 4 sub-iters x
8 views x 40 rays/frame), reporting window-steps/s and s/epoch.  Then
gates quality: the fitted poses must IMPROVE over the '12'-style noisy
initialization on MPJPE, object-vert ADD, and joint acceleration error
(temporal smoothness — the video stage's whole point).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_video_e2e.py [n_frames] [epochs]
"""

import os
import pickle
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_fit_e2e import CONF, write_full_checkpoints  # noqa: E402


def write_tiny_checkpoints(exp_root: str) -> None:
    """Tiny-net checkpoints matching the TINY conf (CPU smoke mode)."""
    from honerf_tpu.models import (
        ColorConfig,
        SDFConfig,
        init_color_params,
        init_sdf_params,
        init_variance_params,
    )
    from honerf_tpu.train.checkpoints import save_checkpoint

    def triplet(kind, seed):
        sdf = SDFConfig(kind=kind, n_layers=3, d_hidden=64, d_out=65,
                        skip_in=(2,), v_multires=3,
                        **({"r_multires": 2} if kind == "hand" else {}))
        col = ColorConfig(kind=kind, d_feature=64, n_layers=2, d_hidden=64,
                          v_multires=3, r_multires=2, grad_multires=2)
        return {
            "params": {
                "sdf": init_sdf_params(jax.random.PRNGKey(seed), sdf),
                "color": init_color_params(jax.random.PRNGKey(seed + 1), col),
                "variance": init_variance_params(0.3),
            }
        }

    save_checkpoint(
        os.path.join(exp_root, "person1", "wmask_realhand", "checkpoints",
                     "ckpt_000010.npz"), triplet("hand", 0))
    save_checkpoint(
        os.path.join(exp_root, "bean", "wmask_realobj", "checkpoints",
                     "ckpt_000010.npz"), triplet("obj", 2))


def synth_pose12(ws: str, seq) -> None:
    """Synthesize the fit-'12' output pickles the video stage initializes
    from (load_fit_sequence reads pose_12/<id>.pickle for '123'/'1234' —
    data/fit_datasets.py:164-174); values = the sequence's noisy
    predictions, i.e. what a converged '12' stage hands over."""
    base = os.path.join(ws, "fit_res", "view_8", "12", "person1_bean",
                        "seq0", "pose_12")
    os.makedirs(base, exist_ok=True)
    for f in seq.frames:
        with open(os.path.join(base, f"{f.frame_id}.pickle"), "wb") as fh:
            pickle.dump(
                {
                    "pred_joint3d": np.asarray(f.joints_pred),
                    "pred_Ro": np.asarray(f.obj_pose_pred[:3, :3]),
                    "pred_To": np.asarray(f.obj_pose_pred[:3, 3]),
                },
                fh,
            )


def pose_errors(seq, poses):
    """(mpjpe_mm, obj_add_mm, joint_acc_err_mm) over the sequence."""
    from honerf_tpu.eval.pose import add, mpjpe, transform_verts
    from honerf_tpu.eval.temporal import acceleration_error

    js, gts, j_errs, o_errs = [], [], [], []
    for f, p in zip(seq.frames, poses):
        j_errs.append(mpjpe(p["pred_joint3d"], f.joints_gt) * 1000.0)
        pred_v = transform_verts(seq.obj_verts, p["pred_Ro"], p["pred_To"])
        gt_v = transform_verts(seq.obj_verts, f.Ro_gt, f.To_gt)
        o_errs.append(add(pred_v, gt_v) * 1000.0)
        js.append(p["pred_joint3d"])
        gts.append(f.joints_gt)
    acc = float(
        np.mean(acceleration_error(np.stack(gts), np.stack(js))) * 1000.0
    )
    return float(np.mean(j_errs)), float(np.mean(o_errs)), acc


TINY = bool(os.environ.get("HONERF_BENCH_TINY"))  # CPU smoke mode
HW = (48, 56) if TINY else (230, 266)


def _conf_text(ws: str, fit_type: str, epochs: int) -> str:
    text = CONF.format(ws=ws, fit_type=fit_type, G=1).replace(
        "batch_size = 196",
        f"batch_size = 196\n  rays_per_frame = 40\n  epochs = {epochs}",
    )
    if TINY:
        text = (
            text.replace("[230, 266]", "[48, 56]")
            .replace("d_hidden = 256", "d_hidden = 64")
            .replace("n_layers = 8", "n_layers = 3")
            .replace("skip_in = [4]", "skip_in = [2]")
            .replace("d_out = 257", "d_out = 65")
            .replace("d_feature = 256", "d_feature = 64")
            .replace("n_layers = 4", "n_layers = 2")
            .replace("v_multires = 10", "v_multires = 3")
            .replace("r_multires = 7", "r_multires = 2")
            .replace("r_multires = 4", "r_multires = 2")
            .replace("grad_multires = 4", "grad_multires = 2")
            .replace("n_samples = 64", "n_samples = 8")
            .replace("n_importance = 64", "n_importance = 8")
            .replace("up_sample_steps = 4", "up_sample_steps = 2")
            .replace("rays_per_frame = 40", "rays_per_frame = 8")
        )
    return text


def run_stage(ws: str, fit_type: str, n_frames: int, epochs: int) -> None:
    from honerf_tpu.data.fit_datasets import load_fit_sequence
    from honerf_tpu.fit.runner import VideoFitRunner

    conf = os.path.join(ws, f"fit_video_{fit_type}.conf")
    with open(conf, "w") as f:
        f.write(_conf_text(ws, fit_type, epochs))
    runner = VideoFitRunner(conf, case=f"benchv{fit_type}")

    epoch_marks = [time.perf_counter()]
    orig = runner._save_epoch_poses

    def timed_save(*a, **k):
        out = orig(*a, **k)
        epoch_marks.append(time.perf_counter())
        return out

    runner._save_epoch_poses = timed_save
    runner.fitting()
    per_epoch = np.diff(epoch_marks)
    warm = per_epoch[1:] if len(per_epoch) > 1 else per_epoch
    n_windows = max(n_frames - 4 + 1, 1)
    steps_per_epoch = n_windows * 4 * 8  # windows x sub_iters x views
    print(
        f"video fit '{fit_type}': epoch0 (incl. compile) {per_epoch[0]:.1f}s, "
        f"warm {warm.mean():.2f}s/epoch = "
        f"{steps_per_epoch / warm.mean():.1f} window-steps/s "
        f"({steps_per_epoch} steps/epoch, {n_frames} frames)",
        flush=True,
    )

    # ---- quality gate: fitted final-epoch poses vs the '12' init ----
    seq = load_fit_sequence(
        os.path.join(ws, "data", "catch_sequence", "test"),
        "person1_bean", "seq0", "8", "123",
        os.path.join(ws, "fit_res"), os.path.join(ws, "exp"),
        image_hw=HW,
    )
    init_poses = [
        {
            "pred_joint3d": np.asarray(f.joints_pred),
            "pred_Ro": np.asarray(f.obj_pose_pred[:3, :3]),
            "pred_To": np.asarray(f.obj_pose_pred[:3, 3]),
        }
        for f in seq.frames
    ]
    pose_dir = os.path.join(ws, "fit_res", "view_8", fit_type,
                            "person1_bean", "seq0", f"pose_{epochs - 1}")
    fit_poses = []
    for f in seq.frames:
        with open(os.path.join(pose_dir, f"{f.frame_id}.pickle"), "rb") as fh:
            fit_poses.append(pickle.load(fh))
    ij, io, ia = pose_errors(seq, init_poses)
    fj, fo, fa = pose_errors(seq, fit_poses)
    print(
        f"  quality '{fit_type}': mpjpe {ij:.2f} -> {fj:.2f} mm, "
        f"obj ADD {io:.2f} -> {fo:.2f} mm, joint-acc {ia:.3f} -> {fa:.3f} mm",
        flush=True,
    )
    ok = (fj <= ij) and (fo <= io) and (fa <= ia)
    print(f"  gate '{fit_type}': {'PASS' if ok else 'FAIL'} "
          "(joint, obj and acceleration error must all improve over the "
          "'12' init)", flush=True)
    if not ok:
        raise SystemExit(1)


def main() -> None:
    import tempfile

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    ws = tempfile.mkdtemp(prefix="bench_video_")
    from honerf_tpu.data.fit_datasets import load_fit_sequence
    from honerf_tpu.data.synthetic import generate_catch_sequence

    generate_catch_sequence(
        os.path.join(ws, "data", "catch_sequence", "test"),
        n_frames=n_frames, n_views=8, H=HW[0], W=HW[1],
    )
    if TINY:
        write_tiny_checkpoints(os.path.join(ws, "exp"))
    else:
        write_full_checkpoints(os.path.join(ws, "exp"))
    seq = load_fit_sequence(
        os.path.join(ws, "data", "catch_sequence", "test"),
        "person1_bean", "seq0", "8", "1",
        os.path.join(ws, "fit_res"), os.path.join(ws, "exp"),
        image_hw=HW,
    )
    synth_pose12(ws, seq)
    run_stage(ws, "123", n_frames, epochs)
    run_stage(ws, "1234", n_frames, epochs)


if __name__ == "__main__":
    main()
