"""VideoFitRunner with `train.frame_shard = true`: the 4-frame window's
frame axis runs on the sharded step (parallel/video_shard.py) end-to-end —
pose pickles written per epoch, finite results, GT diagnostics present
(SURVEY.md §5 frame-axis parallelism, runner integration)."""

import os
import pickle

import numpy as np
import pytest

from honerf_tpu.data.synthetic import generate_catch_sequence

from test_fit_pipeline import FIT_CONF, TINY_NET, write_tiny_checkpoints


@pytest.fixture(scope="module", autouse=True)
def four_views():
    from honerf_tpu.data import fit_datasets

    fit_datasets.VIEW_LISTS["4"] = fit_datasets.VIEW_LISTS["8"][:4]
    yield


@pytest.fixture(scope="module")
def shard_ws(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("vidshard"))
    data_root = os.path.join(ws, "data", "catch_sequence", "test")
    # 4 frames: full-size windows so the 4-way frame shard engages
    generate_catch_sequence(data_root, n_frames=4, n_views=4, H=48, W=56)
    write_tiny_checkpoints(os.path.join(ws, "exp"))
    return ws


def _conf(ws, fit_type, frame_shard):
    path = os.path.join(ws, f"fit_{fit_type}_{frame_shard}.conf")
    body = FIT_CONF.format(ws=ws, fit_type=fit_type, net=TINY_NET.format())
    body = body.replace(
        "epochs = 2", f"epochs = 2\n  frame_shard = {str(frame_shard).lower()}"
    )
    with open(path, "w") as f:
        f.write(body)
    return path


def _seed_stage12_poses(ws, frames=4):
    """Video fitting ('123') reads stage-12 pose pickles
    (fit_datasets.py:165-174); seed them from the sequence's network
    predictions instead of running the single-frame stages."""
    data_root = os.path.join(ws, "data", "catch_sequence", "test",
                             "person1_bean", "seq0")
    pose_dir = os.path.join(ws, "fit_res", "view_4", "12", "person1_bean",
                            "seq0", "pose_12")
    os.makedirs(pose_dir, exist_ok=True)
    for i in range(frames):
        with open(os.path.join(data_root, "pred_joint3d_4view",
                               f"{i}.pickle"), "rb") as f:
            jd = pickle.load(f)
        obj_pose = np.loadtxt(
            os.path.join(data_root, "pred_objpose_4view", f"{i}.txt")
        ).astype(np.float32)
        with open(os.path.join(pose_dir, f"{i}.pickle"), "wb") as f:
            pickle.dump(
                {
                    "pred_joint3d": np.asarray(jd["pred_joint_3d"],
                                               np.float32),
                    "pred_Ro": obj_pose[:3, :3],
                    "pred_To": obj_pose[:3, 3],
                },
                f,
            )


def test_video_runner_frame_sharded(shard_ws):
    from honerf_tpu.fit.runner import VideoFitRunner

    ws = shard_ws
    _seed_stage12_poses(ws)
    runner = VideoFitRunner(_conf(ws, "123", True), case="tshard")
    mesh = runner._frame_shard_mesh(4)
    assert mesh is not None and mesh.devices.size == 4  # 8-dev CPU conftest

    runner.fitting()
    vid_dir = os.path.join(ws, "fit_res", "view_4", "123", "person1_bean",
                           "seq0")
    for epoch in (0, 1):
        pose_dir = os.path.join(vid_dir, f"pose_{epoch}")
        names = sorted(os.listdir(pose_dir))
        assert names == [f"{i}.pickle" for i in range(4)]
        with open(os.path.join(pose_dir, "0.pickle"), "rb") as f:
            p = pickle.load(f)
        assert np.isfinite(p["pred_joint3d"]).all()
        assert np.isfinite(p["pred_Ro"]).all()


def test_frame_shard_falls_back_without_divisible_devices(shard_ws,
                                                          monkeypatch):
    import jax

    from honerf_tpu.fit.runner import VideoFitRunner

    runner = VideoFitRunner(_conf(shard_ws, "123", True), case="tfall")
    monkeypatch.setattr(jax, "devices", lambda *a: [object()])  # 1 device
    assert runner._frame_shard_mesh(4) is None
