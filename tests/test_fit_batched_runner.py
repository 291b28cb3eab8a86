"""SingleFitRunner with `train.frames_per_batch > 1`: G independent
frames optimized per compiled (vmapped) step, including group padding for
the short final group and resume-by-artifact."""

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
def batched_ws(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("fitbatched"))
    data_root = os.path.join(ws, "data", "catch_sequence", "test")
    # 3 frames with G=2: one full group + one padded group
    generate_catch_sequence(data_root, n_frames=3, n_views=4, H=48, W=56)
    write_tiny_checkpoints(os.path.join(ws, "exp"))
    return ws


def _conf(ws, fit_type, frames_per_batch):
    path = os.path.join(ws, f"fit_{fit_type}_g{frames_per_batch}.conf")
    body = FIT_CONF.format(ws=ws, fit_type=fit_type, net=TINY_NET.format())
    body = body.replace(
        "iter_num = 2",
        f"iter_num = 2\n  frames_per_batch = {frames_per_batch}",
    )
    with open(path, "w") as f:
        f.write(body)
    return path


def test_batched_runner_fits_all_frames(batched_ws):
    from honerf_tpu.fit.runner import SingleFitRunner

    ws = batched_ws
    SingleFitRunner(_conf(ws, "1", 2), case="tg2").fitting()
    pose_dir = os.path.join(ws, "fit_res", "view_4", "1", "person1_bean",
                            "seq0", "pose_1")
    names = sorted(os.listdir(pose_dir))
    assert names == ["0.pickle", "1.pickle", "2.pickle"]
    for n in names:
        with open(os.path.join(pose_dir, n), "rb") as f:
            p = pickle.load(f)
        for k in ["pred_joint3d", "pred_Ro", "pred_To", "gt_joint3d"]:
            assert k in p
        assert np.isfinite(p["pred_joint3d"]).all()
        assert p["pred_joint3d"].dtype == np.float32

    # frames differ: padding duplicates must not leak between frames
    with open(os.path.join(pose_dir, "0.pickle"), "rb") as f:
        p0 = pickle.load(f)
    with open(os.path.join(pose_dir, "2.pickle"), "rb") as f:
        p2 = pickle.load(f)
    assert np.abs(p0["pred_joint3d"] - p2["pred_joint3d"]).max() > 1e-6


def test_batched_runner_resumes_by_artifact(batched_ws):
    """A second fitting() run with existing pickles must fit nothing new
    (mtimes unchanged)."""
    from honerf_tpu.fit.runner import SingleFitRunner

    ws = batched_ws
    pose_dir = os.path.join(ws, "fit_res", "view_4", "1", "person1_bean",
                            "seq0", "pose_1")
    if not os.path.isdir(pose_dir):
        test_batched_runner_fits_all_frames(batched_ws)
    before = {n: os.path.getmtime(os.path.join(pose_dir, n))
              for n in os.listdir(pose_dir)}
    SingleFitRunner(_conf(ws, "1", 2), case="tg2b").fitting()
    after = {n: os.path.getmtime(os.path.join(pose_dir, n))
             for n in os.listdir(pose_dir)}
    assert before == after


def test_batched_runner_frame_sharded_over_mesh(tmp_path_factory):
    """G=8 on the 8-device CPU mesh: the frame axis shards embarrassingly
    parallel (each device fits its own frame); all poses written and
    finite."""
    import jax

    from honerf_tpu.fit.runner import SingleFitRunner

    assert len(jax.devices()) == 8
    ws = str(tmp_path_factory.mktemp("fitshard8"))
    data_root = os.path.join(ws, "data", "catch_sequence", "test")
    generate_catch_sequence(data_root, n_frames=8, n_views=4, H=48, W=56)
    write_tiny_checkpoints(os.path.join(ws, "exp"))
    conf = _conf(ws, "1", 8)
    with open(conf) as f:
        body = f.read().replace("iter_num = 2", "iter_num = 1")
    with open(conf, "w") as f:
        f.write(body)
    SingleFitRunner(conf, case="tg8").fitting()
    pose_dir = os.path.join(ws, "fit_res", "view_4", "1", "person1_bean",
                            "seq0", "pose_1")
    names = sorted(os.listdir(pose_dir), key=lambda n: int(n.split(".")[0]))
    assert names == [f"{i}.pickle" for i in range(8)]
    for n in names:
        with open(os.path.join(pose_dir, n), "rb") as f:
            p = pickle.load(f)
        assert np.isfinite(p["pred_joint3d"]).all()
