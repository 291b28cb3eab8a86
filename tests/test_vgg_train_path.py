"""VGG perceptual-loss training path: the patch branch of the offline step
(exp_runner.py:228-236 parity) with a random-init VGG backbone."""

import jax
import jax.numpy as jnp
import numpy as np

from honerf_tpu.data import RayBatchLoader, load_offline_dataset
from honerf_tpu.data.synthetic import generate_object_dataset
from honerf_tpu.models import (
    ColorConfig,
    SDFConfig,
    init_color_params,
    init_sdf_params,
    init_se3_refine,
    init_variance_params,
)
from honerf_tpu.models.vgg import init_vgg19_params, make_patch_vgg_loss
from honerf_tpu.render import RenderConfig
from honerf_tpu.train import TrainHyper, init_train_state, make_obj_train_step


def test_obj_step_with_vgg_patch_loss(tmp_path):
    root = str(tmp_path / "synth")
    generate_object_dataset(root, n_frames=1, n_views=2, H=48, W=56)
    scene = load_offline_dataset(root, "obj", split="train")
    sdf_cfg = SDFConfig(kind="obj", n_layers=3, d_hidden=64, d_out=65, skip_in=(2,),
                        v_multires=6)
    color_cfg = ColorConfig(kind="obj", d_feature=64, n_layers=2, d_hidden=64,
                            v_multires=6)
    rcfg = RenderConfig(n_samples=8, n_importance=8, up_sample_steps=2, perturb=0.0)
    # the patch side must survive VGG's 4 poolings (>= 16 px); the
    # reference's 441-ray (21x21) patches satisfy this
    tcfg = TrainHyper(batch_size=256, vgg_weight=1.0, end_iter=100, warm_up_end=5)
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(len(scene), "obj"),
    }
    vgg_loss_fn = make_patch_vgg_loss(init_vgg19_params(jax.random.PRNGKey(7)))
    step = jax.jit(make_obj_train_step(sdf_cfg, color_cfg, rcfg, tcfg,
                                       vgg_loss_fn=vgg_loss_fn))
    loader = RayBatchLoader(scene, tcfg.batch_size, seed=0, patch=True)
    batch = loader.get(0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # ramp 0 -> vgg contributes nothing; ramp 1 -> it adds to the loss
    state = init_train_state(params, tcfg)
    b0 = dict(batch, vgg_ramp=jnp.asarray(0.0))
    _, m0 = step(state, b0, jax.random.PRNGKey(0))
    state = init_train_state(params, tcfg)
    b1 = dict(batch, vgg_ramp=jnp.asarray(1.0))
    _, m1 = step(state, b1, jax.random.PRNGKey(0))
    assert np.isfinite(float(m0["loss"])) and np.isfinite(float(m1["loss"]))
    assert float(m1["vgg_loss"]) > 0
    np.testing.assert_allclose(
        float(m1["loss"]) - float(m0["loss"]), float(m1["vgg_loss"]), rtol=1e-4
    )


def test_runner_warns_without_vgg_weights(tmp_path, caplog):
    """vgg_weight > 0 without pretrained weights must warn, not crash."""
    import logging

    from honerf_tpu.train.runner import OfflineRunner

    root = str(tmp_path / "synth")
    generate_object_dataset(root, n_frames=1, n_views=2, H=48, W=56)
    conf = tmp_path / "c.conf"
    conf.write_text(f"""
general {{ base_exp_dir = {tmp_path}/exp \n model_type = obj \n data_type = real }}
dataset {{ traindata_dir = {root} \n testdata_dir = {root} \n image_size = [48, 56] }}
train {{ learning_rate = 1e-4 \n learning_rate_alpha = 0.05 \n end_iter = 4
  near = 0.4 \n far = 1.5 \n batch_size = 16 \n warm_up_end = 2
  save_freq = 100 \n val_freq = 100 \n report_freq = 100
  igr_weight = 1.0 \n mask_weight = 1.0 \n vgg_weight = 1.0 \n refine_pose = True }}
model {{
  sdf_network {{ d_out = 65 \n d_in = 3 \n d_hidden = 64 \n n_layers = 3 \n skip_in = [2]
    v_multires = 6 \n r_multires = 4 \n bias = 0.5 \n scale = 1.0
    geometric_init = True \n weight_norm = True }}
  variance_network {{ init_val = 0.3 }}
  rendering_network {{ d_feature = 64 \n d_in = 3 \n d_out = 3 \n d_hidden = 64
    n_layers = 2 \n weight_norm = True \n v_multires = 6 \n r_multires = 4
    grad_multires = 4 \n squeeze_out = True \n use_gradients = True }}
  neus_renderer {{ n_samples = 8 \n n_importance = 8 \n n_outside = 0
    up_sample_steps = 2 \n perturb = 1.0 }}
}}
""".replace("\\n", "\n"))
    with caplog.at_level(logging.WARNING):
        runner = OfflineRunner(str(conf), mode="train", case="x")
    assert runner._vgg_loss_fn is None
    assert any("VGG" in r.message or "vgg" in r.message for r in caplog.records)
