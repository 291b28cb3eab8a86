"""data_type='syn' support (reference utils/dataset.py:336-339,
exp_runner.py:155/:163/:495-501): IMG-listing-driven loader naming,
refine-pose gating, and obj-syn mesh bounds."""

import os

import numpy as np

from honerf_tpu.config.hocon import parse_string
from honerf_tpu.data.datasets import load_offline_dataset
from honerf_tpu.data.synthetic import generate_hand_dataset
from honerf_tpu.train.offline import TrainHyper
from honerf_tpu.train.runner import mesh_bounds


def test_hand_loader_follows_img_listing_with_png_names(tmp_path):
    """The reference hand loaders enumerate IMG and map image names to
    PARAM_266 pickles ('.png' for syn).  A syn-layout dataset whose IMG
    dir holds .png files for a SUBSET of params must load exactly that
    subset."""
    root = str(tmp_path / "hand_syn")
    generate_hand_dataset(root, n_frames=1, n_views=4, H=32, W=36)
    img_dir = os.path.join(root, "IMG")
    all_params = sorted(os.listdir(os.path.join(root, "PARAM_266")))
    assert len(all_params) == 4
    for name in os.listdir(img_dir):
        os.remove(os.path.join(img_dir, name))
    keep = [all_params[0], all_params[2]]
    for pname in keep:
        stem = pname.split(".")[0]
        open(os.path.join(img_dir, stem + ".png"), "wb").close()

    scene = load_offline_dataset(root, "hand", "train", data_type="syn")
    assert len(scene.views) == 2
    assert sorted(v.name for v in scene.views) == sorted(keep)


TRAIN_CONF = """
general {{ data_type = {dt} }}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = 10
    near = 0.4
    far = 1.5
    batch_size = 8
    igr_weight = 1.0
    mask_weight = 1.0
    refine_pose = True
}}
"""


def test_refine_pose_gated_off_for_syn():
    """se3 refinement applies only when data_type == 'real'
    (exp_runner.py:155, :163)."""
    real = TrainHyper.from_conf(parse_string(TRAIN_CONF.format(dt="real")))
    syn = TrainHyper.from_conf(parse_string(TRAIN_CONF.format(dt="syn")))
    assert real.refine_pose is True
    assert syn.refine_pose is False


def test_mesh_bounds_per_model_and_data_type():
    """exp_runner.py:493-517: hand and obj-syn use pts +- 0.15; obj-real
    the fixed r=0.2 origin box."""
    zeros = np.zeros((21, 3), np.float32)
    lo, hi = mesh_bounds("obj", "syn", zeros)
    np.testing.assert_allclose(lo, -0.15)
    np.testing.assert_allclose(hi, 0.15)
    lo, hi = mesh_bounds("obj", "real", zeros)
    np.testing.assert_allclose(lo, -0.2)
    np.testing.assert_allclose(hi, 0.2)
    pts = np.asarray([[0.1, -0.3, 0.05]], np.float32)
    lo, hi = mesh_bounds("hand", "real", pts)
    np.testing.assert_allclose(lo, pts[0] - 0.15)
    np.testing.assert_allclose(hi, pts[0] + 0.15)
