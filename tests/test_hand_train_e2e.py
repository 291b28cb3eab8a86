"""End-to-end hand-model training smoke test: HALO kinematics in-graph,
pose-conditioned SDF, se3_refine gradients (SURVEY.md §7 step 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honerf_tpu.data import RayBatchLoader, load_offline_dataset
from honerf_tpu.data.synthetic import generate_hand_dataset
from honerf_tpu.models import (
    ColorConfig,
    SDFConfig,
    init_color_params,
    init_sdf_params,
    init_se3_refine,
    init_variance_params,
)
from honerf_tpu.render import RenderConfig
from honerf_tpu.train import TrainHyper, init_train_state
from honerf_tpu.train.offline import make_hand_train_step


@pytest.fixture(scope="module")
def hand_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_hand"))
    generate_hand_dataset(root, n_frames=1, n_views=4, H=48, W=56)
    return load_offline_dataset(root, "hand", split="train")


def test_hand_dataset_loads(hand_scene):
    assert len(hand_scene) == 4
    v = hand_scene.views[0]
    assert v.mask.sum() > 30
    assert v.joints.shape == (21, 3)
    assert hand_scene.t_pose_21.shape == (21, 3)
    assert hand_scene.bone_length.shape == (20,)


def test_hand_training_step_and_refine_grads(hand_scene):
    sdf_cfg = SDFConfig(
        kind="hand", n_layers=3, d_hidden=64, d_out=65, skip_in=(2,),
        v_multires=4, r_multires=2,
    )
    color_cfg = ColorConfig(
        kind="hand", d_feature=64, n_layers=2, d_hidden=64,
        v_multires=4, r_multires=2,
    )
    rcfg = RenderConfig(n_samples=12, n_importance=12, up_sample_steps=2, perturb=1.0)
    tcfg = TrainHyper(
        learning_rate=1e-3, end_iter=100, warm_up_end=5, vgg_weight=0.0,
        batch_size=48, refine_pose=True,
    )
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(len(hand_scene), "hand"),
    }
    state = init_train_state(params, tcfg)
    step = jax.jit(make_hand_train_step(sdf_cfg, color_cfg, rcfg, tcfg))
    loader = RayBatchLoader(hand_scene, tcfg.batch_size, seed=0)
    key = jax.random.PRNGKey(9)
    mask_losses = []
    for i in range(60):
        batch = {k: jnp.asarray(v) for k, v in loader.get(i % len(hand_scene)).items()}
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        assert np.isfinite(float(metrics["loss"])), i
        mask_losses.append(float(metrics["mask_loss"]))
    # at this tiny scale the opaque-everywhere init takes ~50 steps to
    # start carving; require a downward trend, not convergence
    assert np.mean(mask_losses[-6:]) < np.mean(mask_losses[:6])
    # the se3_refine table received gradient updates (pose refinement active)
    delta = np.abs(
        np.asarray(state["params"]["se3_refine"]) - np.asarray(params["se3_refine"])
    ).max()
    assert delta > 0
