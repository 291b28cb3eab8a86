"""Long-sequence fitting pipeline: 5 frames through '1' -> '12' -> '1234'
-> GetRes -> ALL FOUR analysis CLIs (VERDICT r4 #7c).

The short pipeline test (test_fit_pipeline.py) runs 2 frames and stops at
'123'; with 2 frames the acceleration metric has no data (needs >= 3) and
the '1234' video stage (object pose tables enabled, fitting_video.py '1234'
branch) is only exercised at the step level (test_fitting.py).  This module
drives the reference's full acceptance workflow (SURVEY.md §3.3-3.5, §4) on
a nontrivial frame count: multiple 4-frame windows per epoch, real
acceleration numbers from analys_acc_err, PCI over 5 frames, and the
interaction volumes for fit-1 vs fit-12."""

import os
import pickle
import re
import sys

import numpy as np
import pytest

from honerf_tpu.data.synthetic import generate_catch_sequence
from tests.test_fit_pipeline import (
    FIT_CONF,
    TINY_NET,
    write_tiny_checkpoints,
)

N_FRAMES = 5


@pytest.fixture(scope="module", autouse=True)
def four_views():
    from honerf_tpu.data import fit_datasets

    fit_datasets.VIEW_LISTS["4"] = fit_datasets.VIEW_LISTS["8"][:4]
    yield


@pytest.fixture(scope="module")
def long_ws(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("fitpipe_long"))
    data_root = os.path.join(ws, "data", "catch_sequence", "test")
    generate_catch_sequence(data_root, n_frames=N_FRAMES, n_views=4,
                            H=48, W=56)
    write_tiny_checkpoints(os.path.join(ws, "exp"))
    return ws


def _conf(ws, fit_type):
    path = os.path.join(ws, f"fit_{fit_type}.conf")
    with open(path, "w") as f:
        f.write(FIT_CONF.format(ws=ws, fit_type=fit_type,
                                net=TINY_NET.format()))
    return path


def test_long_pipeline_1234_and_analysis(long_ws, capsys):
    from honerf_tpu.fit.runner import (
        GetResRunner,
        SingleFitRunner,
        VideoFitRunner,
    )

    ws = long_ws
    frames = [f"{i}.pickle" for i in range(N_FRAMES)]

    SingleFitRunner(_conf(ws, "1"), case="l1").fitting()
    pose1 = os.path.join(ws, "fit_res", "view_4", "1", "person1_bean",
                         "seq0", "pose_1")
    assert sorted(os.listdir(pose1), key=lambda n: int(n.split(".")[0])) \
        == frames

    SingleFitRunner(_conf(ws, "12"), case="l12").fitting()

    # '1234': video windows with the object pose tables enabled
    # (fitting_video.py fit_type '1234'); 5 frames -> the window sampler
    # covers multiple overlapping 4-frame windows per epoch.
    VideoFitRunner(_conf(ws, "1234"), case="l1234").fitting()
    vid = os.path.join(ws, "fit_res", "view_4", "1234", "person1_bean",
                       "seq0")
    # epochs=2 in FIT_CONF -> pose_0, pose_1 with every frame present
    assert sorted(os.listdir(os.path.join(vid, "pose_1")),
                  key=lambda n: int(n.split(".")[0])) == frames
    with open(os.path.join(vid, "pose_1", "4.pickle"), "rb") as f:
        p = pickle.load(f)
    assert np.isfinite(p["pred_joint3d"]).all()
    # '1234' fits the object pose too: Ro/To must have moved off the init
    assert "pred_Ro" in p and np.isfinite(p["pred_Ro"]).all()

    # extraction over the VIDEO poses: inner ids for all 5 frames (meshes
    # are extracted for fit types '1'/'12' only — fit/runner.py:795
    # reference parity; the lres1/lres12 runs below cover them)
    GetResRunner(_conf(ws, "1234"), case="lres1234").fitting()
    analys = os.path.join(ws, "fit_res", "analys_res", "view_4", "1234",
                          "person1_bean", "seq0")
    inner = sorted(os.listdir(os.path.join(analys, "inner_1234")),
                   key=lambda n: int(n.split(".")[0]))
    assert inner == frames

    # ---- the four analysis CLIs over the long-sequence artifacts ----
    import shutil

    model_base = os.path.join(ws, "offline_stage_data")
    os.makedirs(os.path.join(model_base, "bean_cppose"), exist_ok=True)
    shutil.copy(
        os.path.join(ws, "data", "catch_sequence", "test", "person1_bean",
                     "seq0", "bean_ours.ply"),
        os.path.join(model_base, "bean_cppose", "bean_ours.ply"),
    )

    from honerf_tpu.cli import (
        analys_acc_err,
        analys_hand_obj_pose,
        analys_interaction,
        analys_pci,
    )

    sys.argv = [
        "analys_hand_obj_pose",
        "--base_path", os.path.join(ws, "fit_res"),
        "--fit_type", "1234", "--view_num", "4",
        "--model_base_path", model_base,
        "--init_path", os.path.join(ws, "data", "catch_sequence", "test"),
        "--objects", "bean",
    ]
    analys_hand_obj_pose.main()
    out = capsys.readouterr().out
    assert f"object bean: {N_FRAMES} frames" in out
    m = re.search(r"ours joint: ([\d.]+)mm", out)
    assert m and float(m.group(1)) < 50.0

    sys.argv = [
        "analys_pci",
        "--base_path", os.path.join(ws, "fit_res", "analys_res", "view_4"),
        "--stages", "1234",
    ]
    analys_pci.main()
    out = capsys.readouterr().out
    assert "inner_1234 pci:" in out

    # 5 frames -> the acceleration metric has real data (>= 3 frames),
    # unlike the short pipeline where it degrades to 'no data'
    sys.argv = [
        "analys_acc_err",
        "--base_path", os.path.join(ws, "fit_res", "view_4"),
        "--model_base_path", model_base,
        "--stages", "1234:pose_1",
    ]
    analys_acc_err.main()
    out = capsys.readouterr().out
    assert "acc_joint" in out and "no data" not in out
    m = re.search(r"acc_joint[^\d]*([\d.]+)", out)
    assert m and np.isfinite(float(m.group(1)))

    # interaction volumes need fit-1 and fit-12 extraction artifacts
    GetResRunner(_conf(ws, "1"), case="lres1").fitting()
    GetResRunner(_conf(ws, "12"), case="lres12").fitting()
    mesh12 = os.listdir(os.path.join(ws, "fit_res", "analys_res", "view_4",
                                     "12", "person1_bean", "seq0", "mesh_12"))
    for i in range(N_FRAMES):
        assert f"{i}_hand.ply" in mesh12 and f"{i}_obj.ply" in mesh12
    sys.argv = [
        "analys_interaction",
        "--base_path", os.path.join(ws, "fit_res", "analys_res", "view_4"),
        "--objects", "bean",
    ]
    analys_interaction.main()
    out = capsys.readouterr().out
    assert "fit1  int_vol:" in out and "fit12 int_vol:" in out
    # per-frame caching pickles for every frame (analys_interaction.py:21-42)
    for i in range(N_FRAMES):
        assert os.path.exists(
            os.path.join(ws, "fit_res", "analys_res", "view_4", "1",
                         "person1_bean", "seq0", "int", f"{i}.pickle")
        )
