"""Full fitting-pipeline integration test: synthetic catch sequence +
tiny offline checkpoints -> SingleFitRunner ('1' then '12') ->
VideoFitRunner ('123') -> GetResRunner meshes/inner ids — the reference's
whole online-stage workflow (SURVEY.md §3.3-3.5) end-to-end on disk."""

import os
import pickle
import textwrap

import numpy as np
import pytest

import jax

from honerf_tpu.data.synthetic import generate_catch_sequence
from honerf_tpu.models import (
    ColorConfig,
    SDFConfig,
    init_color_params,
    init_sdf_params,
    init_variance_params,
)
from honerf_tpu.train.checkpoints import save_checkpoint

TINY_NET = """
  sdf_hand_network {{
    d_out = 65
    d_in = 3
    d_hidden = 64
    n_layers = 3
    skip_in = [2]
    v_multires = 3
    r_multires = 2
    bias = 0.5
    scale = 1.0
    geometric_init = true
    weight_norm = true
  }}
  rendering_hand_network {{
    d_feature = 64
    d_in = 3
    d_out = 3
    d_hidden = 64
    n_layers = 2
    weight_norm = true
    v_multires = 3
    r_multires = 2
    grad_multires = 4
    squeeze_out = true
    use_gradients = true
  }}
  sdf_obj_network {{
    d_out = 65
    d_in = 3
    d_hidden = 64
    n_layers = 3
    skip_in = [2]
    v_multires = 6
    r_multires = 4
    bias = 0.5
    scale = 1.0
    geometric_init = true
    weight_norm = true
  }}
  rendering_obj_network {{
    d_feature = 64
    d_in = 3
    d_out = 3
    d_hidden = 64
    n_layers = 2
    weight_norm = true
    v_multires = 6
    r_multires = 4
    grad_multires = 4
    squeeze_out = true
    use_gradients = true
  }}
  variance_network {{ init_val = 0.3 }}
  neus_renderer {{
    n_samples = 8
    n_importance = 8
    n_outside = 0
    up_sample_steps = 2
    perturb = 1.0
  }}
"""

FIT_CONF = """
general {{
  save_dir = "{ws}/fit_res/CASE_NAME/wmask"
  model_type = "hand"
  data_type = "real"
  fit_type = "{fit_type}"
  fit_id = 0
  fit_res_root = "{ws}/fit_res"
  exp_root = "{ws}/exp"
}}
dataset {{
  fitdata_dir = "{ws}/data/catch_sequence/test"
  view_num = 4
  image_size = [48, 56]
}}
train {{
  near = 0.4
  far = 1.5
  batch_size = 24
  iter_num = 2
  epochs = 2
  sub_iters = 1
  rays_per_frame = 12
  mesh_resolution = 24
}}
model {{
{net}
}}
"""


def write_tiny_checkpoints(exp_root: str):
    """Write random tiny offline checkpoints at the model paths the fit
    sequence expects (exp/<per>/wmask_realhand, exp/<obj>/wmask_realobj)."""
    hand_sdf = SDFConfig(kind="hand", n_layers=3, d_hidden=64, d_out=65,
                         skip_in=(2,), v_multires=3, r_multires=2)
    hand_col = ColorConfig(kind="hand", d_feature=64, n_layers=2, d_hidden=64,
                           v_multires=3, r_multires=2)
    obj_sdf = SDFConfig(kind="obj", n_layers=3, d_hidden=64, d_out=65,
                        skip_in=(2,), v_multires=6)
    obj_col = ColorConfig(kind="obj", d_feature=64, n_layers=2, d_hidden=64,
                          v_multires=6)
    hand_params = {
        "params": {
            "sdf": init_sdf_params(jax.random.PRNGKey(0), hand_sdf),
            "color": init_color_params(jax.random.PRNGKey(1), hand_col),
            "variance": init_variance_params(0.3),
        }
    }
    obj_params = {
        "params": {
            "sdf": init_sdf_params(jax.random.PRNGKey(2), obj_sdf),
            "color": init_color_params(jax.random.PRNGKey(3), obj_col),
            "variance": init_variance_params(0.3),
        }
    }
    save_checkpoint(
        os.path.join(exp_root, "person1", "wmask_realhand", "checkpoints",
                     "ckpt_000010.npz"),
        hand_params,
    )
    save_checkpoint(
        os.path.join(exp_root, "bean", "wmask_realobj", "checkpoints",
                     "ckpt_000010.npz"),
        obj_params,
    )


# VIEW_LISTS has no "4"; patch a 4-view list for the test
@pytest.fixture(scope="module", autouse=True)
def four_views():
    from honerf_tpu.data import fit_datasets

    fit_datasets.VIEW_LISTS["4"] = fit_datasets.VIEW_LISTS["8"][:4]
    yield


@pytest.fixture(scope="module")
def pipeline_ws(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("fitpipe"))
    data_root = os.path.join(ws, "data", "catch_sequence", "test")
    generate_catch_sequence(data_root, n_frames=2, n_views=4, H=48, W=56)
    write_tiny_checkpoints(os.path.join(ws, "exp"))
    return ws


def _conf(ws, fit_type, extra_general: str = ""):
    path = os.path.join(ws, f"fit_{fit_type}.conf")
    text = FIT_CONF.format(ws=ws, fit_type=fit_type, net=TINY_NET.format())
    if extra_general:
        text = text.replace("  fit_id = 0", "  fit_id = 0\n" + extra_general)
    with open(path, "w") as f:
        f.write(text)
    return path


def test_fit_pipeline_end_to_end(pipeline_ws):
    from honerf_tpu.fit.runner import GetResRunner, SingleFitRunner, VideoFitRunner

    ws = pipeline_ws
    # stage 1
    SingleFitRunner(_conf(ws, "1"), case="t1").fitting()
    pose_dir = os.path.join(ws, "fit_res", "view_4", "1", "person1_bean",
                            "seq0", "pose_1")
    poses = sorted(os.listdir(pose_dir))
    assert poses == ["0.pickle", "1.pickle"]
    with open(os.path.join(pose_dir, "0.pickle"), "rb") as f:
        p = pickle.load(f)
    for k in ["pred_joint3d", "pred_Ro", "pred_To", "gt_joint3d", "gt_Ro", "gt_To"]:
        assert k in p
    assert np.isfinite(p["pred_joint3d"]).all()

    # stage 12 reads stage-1 outputs
    SingleFitRunner(_conf(ws, "12"), case="t12").fitting()
    assert os.path.exists(
        os.path.join(ws, "fit_res", "view_4", "12", "person1_bean", "seq0",
                     "pose_12", "0.pickle")
    )

    # video stage reads stage-12 outputs
    VideoFitRunner(_conf(ws, "123"), case="t123").fitting()
    vid_dir = os.path.join(ws, "fit_res", "view_4", "123", "person1_bean", "seq0")
    assert os.path.isdir(os.path.join(vid_dir, "pose_0"))
    assert os.path.isdir(os.path.join(vid_dir, "pose_1"))

    # extraction from VIDEO poses with non-default epochs (2): the pose
    # dir must resolve to the highest pose_<n> on disk (pose_1), not the
    # reference's hardcoded pose_4
    GetResRunner(_conf(ws, "123"), case="res123").fitting()
    analys123 = os.path.join(ws, "fit_res", "analys_res", "view_4", "123",
                             "person1_bean", "seq0")
    inner123 = sorted(os.listdir(os.path.join(analys123, "inner_123")))
    assert inner123 == ["0.pickle", "1.pickle"]

    # extraction: meshes + inner ids from stage-12 poses
    GetResRunner(_conf(ws, "12"), case="res12").fitting()
    analys = os.path.join(ws, "fit_res", "analys_res", "view_4", "12",
                          "person1_bean", "seq0")
    meshes = sorted(os.listdir(os.path.join(analys, "mesh_12")))
    assert "0_hand.ply" in meshes and "0_obj.ply" in meshes
    inner = sorted(os.listdir(os.path.join(analys, "inner_12")))
    assert inner == ["0.pickle", "1.pickle"]
    with open(os.path.join(analys, "inner_12", "0.pickle"), "rb") as f:
        ids = pickle.load(f)["inner_point_id"]
    assert ids.ndim == 1


def test_analysis_clis_over_pipeline_artifacts(pipeline_ws, capsys):
    """Drive the analys_* CLI mains over the artifacts the pipeline test
    produced (the reference acceptance-suite workflow, SURVEY.md §4)."""
    import shutil
    import sys

    ws = pipeline_ws
    # artifacts come from the end-to-end flow; produce them if this test
    # runs in isolation
    if not os.path.isdir(os.path.join(ws, "fit_res", "view_4", "12")):
        test_fit_pipeline_end_to_end(pipeline_ws)
    # model zoo layout the pose CLI expects: <base>/<obj>_cppose/<obj>_ours.ply
    model_base = os.path.join(ws, "offline_stage_data")
    os.makedirs(os.path.join(model_base, "bean_cppose"), exist_ok=True)
    shutil.copy(
        os.path.join(ws, "data", "catch_sequence", "test", "person1_bean",
                     "seq0", "bean_ours.ply"),
        os.path.join(model_base, "bean_cppose", "bean_ours.ply"),
    )

    from honerf_tpu.cli import analys_hand_obj_pose, analys_pci

    sys.argv = [
        "analys_hand_obj_pose",
        "--base_path", os.path.join(ws, "fit_res"),
        "--fit_type", "12", "--view_num", "4",
        "--model_base_path", model_base,
        "--init_path", os.path.join(ws, "data", "catch_sequence", "test"),
        "--objects", "bean",
    ]
    analys_hand_obj_pose.main()
    out = capsys.readouterr().out
    assert "object bean: 2 frames" in out
    assert "ours joint:" in out and "ADD:" in out
    # fitted joints started 3mm from GT; errors must be in a sane range
    import re

    m = re.search(r"ours joint: ([\d.]+)mm", out)
    assert m and float(m.group(1)) < 50.0

    sys.argv = [
        "analys_pci",
        "--base_path", os.path.join(ws, "fit_res", "analys_res", "view_4"),
        "--stages", "12",
    ]
    analys_pci.main()
    out = capsys.readouterr().out
    assert "inner_12 pci:" in out

    from honerf_tpu.cli import analys_acc_err

    sys.argv = [
        "analys_acc_err",
        "--base_path", os.path.join(ws, "fit_res", "view_4"),
        "--model_base_path", model_base,
        "--stages", "12:pose_12", "123:pose_1",
    ]
    analys_acc_err.main()
    out = capsys.readouterr().out
    # only 2 frames -> acceleration needs >= 3; the CLI must degrade
    # gracefully, not crash
    assert "no data" in out or "acc_joint" in out

    # interaction analysis needs fit-1 meshes too
    from honerf_tpu.cli import analys_interaction
    from honerf_tpu.fit.runner import GetResRunner

    GetResRunner(_conf(ws, "1"), case="res1").fitting()
    sys.argv = [
        "analys_interaction",
        "--base_path", os.path.join(ws, "fit_res", "analys_res", "view_4"),
        "--objects", "bean",
    ]
    analys_interaction.main()
    out = capsys.readouterr().out
    assert "fit1  int_vol:" in out and "fit12 int_vol:" in out
    # per-frame caching pickles written (analys_interaction.py:21-42 parity)
    assert os.path.exists(
        os.path.join(ws, "fit_res", "analys_res", "view_4", "1",
                     "person1_bean", "seq0", "int", "0.pickle")
    )


def test_video_per_epoch_renders(pipeline_ws, tmp_path):
    """general.render_every_epoch renders ALL epoch saves, not only the
    final one (VERDICT r2 #8; the reference's get_render_all alone keeps
    parity with fitting_video.py:345-348 = final epoch only)."""
    import shutil

    from honerf_tpu.fit.runner import VideoFitRunner

    ws = pipeline_ws
    if not os.path.exists(
        os.path.join(ws, "fit_res", "view_4", "12", "person1_bean", "seq0",
                     "pose_12", "0.pickle")
    ):
        test_fit_pipeline_end_to_end(pipeline_ws)
    vid_dir = os.path.join(ws, "fit_res", "view_4", "123", "person1_bean",
                           "seq0")
    shutil.rmtree(vid_dir, ignore_errors=True)  # rerun the video stage
    conf = _conf(
        ws, "123",
        "  get_render_all = true\n  render_every_epoch = true",
    )
    VideoFitRunner(conf, case="tpe").fitting()
    for epoch in (0, 1):
        rdir = os.path.join(vid_dir, f"render_{epoch}")
        assert os.path.isdir(rdir), f"missing {rdir}"
        imgs = [n for n in os.listdir(rdir)
                if n.endswith((".png", ".jpeg", ".jpg"))]
        assert imgs, f"no renders in {rdir}"


def test_get_res_render_path(pipeline_ws, monkeypatch):
    """GetResRunner --render: full-image dual renders of the held-out
    views at the fitted pose (get_res.py:246-287) through the one-fetch
    chunked path."""
    import numpy as np

    from honerf_tpu.data import fit_datasets
    from honerf_tpu.fit.runner import GetResRunner

    ws = pipeline_ws
    if not os.path.isdir(os.path.join(ws, "fit_res", "view_4", "12")):
        test_fit_pipeline_end_to_end(pipeline_ws)
    # the synthetic fixture has no dedicated test cameras; reuse view 0
    monkeypatch.setattr(
        fit_datasets, "RENDER_TEST_VIEWS", fit_datasets.VIEW_LISTS["8"][:1]
    )
    GetResRunner(_conf(ws, "12"), case="render12", render=True).fitting()
    render_dir = os.path.join(ws, "fit_res", "analys_res", "view_4", "12",
                              "person1_bean", "seq0", "render_12")
    pngs = sorted(os.listdir(render_dir))
    assert pngs, "no renders written"
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(render_dir, pngs[0])))
    assert img.shape[:2] == (48, 56)
    assert np.isfinite(img).all()
