"""Explicit shard_map train step vs the GSPMD (jit-with-shardings) path:
identical numerics on the 8-device CPU mesh."""

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
from honerf_tpu.parallel import make_mesh, shard_ray_batch
from honerf_tpu.parallel.shard_step import make_obj_train_step_shardmap
from honerf_tpu.render import RenderConfig
from honerf_tpu.train import TrainHyper, init_train_state, make_obj_train_step


def test_shardmap_matches_gspmd(tmp_path):
    root = str(tmp_path / "synth")
    generate_object_dataset(root, n_frames=1, n_views=4, H=48, W=56)
    scene = load_offline_dataset(root, "obj", split="train")

    sdf_cfg = SDFConfig(kind="obj", n_layers=3, d_hidden=64, d_out=65, skip_in=(2,),
                        v_multires=6)
    color_cfg = ColorConfig(kind="obj", d_feature=64, n_layers=2, d_hidden=64,
                            v_multires=6)
    # perturb=0 so both paths see identical sample positions
    rcfg = RenderConfig(n_samples=8, n_importance=8, up_sample_steps=2, perturb=0.0)
    tcfg = TrainHyper(batch_size=64, end_iter=100, warm_up_end=5, vgg_weight=0.0)
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(len(scene), "obj"),
    }
    loader = RayBatchLoader(scene, tcfg.batch_size, seed=0)
    batch_np = loader.get(0)
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(3)

    # GSPMD path
    state_a = init_train_state(params, tcfg)
    jit_step = jax.jit(make_obj_train_step(sdf_cfg, color_cfg, rcfg, tcfg))
    batch_sharded = shard_ray_batch(batch_np, mesh)
    state_a, m_a = jit_step(state_a, batch_sharded, key)

    # explicit shard_map path
    state_b = init_train_state(params, tcfg)
    sm_step = make_obj_train_step_shardmap(
        sdf_cfg, color_cfg, rcfg, tcfg, mesh, batch_np
    )
    state_b, m_b = sm_step(state_b, batch_sharded, key)

    for k in ("loss", "color_loss", "mask_loss", "eikonal_loss"):
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=2e-4), k
    wa = np.asarray(state_a["params"]["sdf"]["layers"][0]["v"])
    wb = np.asarray(state_b["params"]["sdf"]["layers"][0]["v"])
    np.testing.assert_allclose(wa, wb, rtol=1e-3, atol=1e-6)
