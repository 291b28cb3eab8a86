"""End-to-end offline object training smoke test on the synthetic sphere
dataset — the minimum end-to-end slice (SURVEY.md §7 step 4), plus the
multi-device sharded step on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
from honerf_tpu.render import RenderConfig
from honerf_tpu.train import (
    TrainHyper,
    init_train_state,
    make_obj_train_step,
)


@pytest.fixture(scope="module")
def sphere_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_obj"))
    generate_object_dataset(root, n_frames=1, n_views=8, H=48, W=56)
    return load_offline_dataset(root, "obj", split="train")


def small_setup(scene, batch_size=64):
    sdf_cfg = SDFConfig(kind="obj", n_layers=4, d_hidden=128, d_out=129, skip_in=(2,))
    color_cfg = ColorConfig(kind="obj", d_feature=128, n_layers=2, d_hidden=64)
    rcfg = RenderConfig(n_samples=16, n_importance=16, up_sample_steps=2, perturb=1.0)
    tcfg = TrainHyper(
        near=0.4, far=1.5, learning_rate=5e-4, end_iter=200, warm_up_end=10,
        vgg_weight=0.0, batch_size=batch_size,
    )
    key = jax.random.PRNGKey(0)
    params = {
        "sdf": init_sdf_params(key, sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(len(scene), "obj"),
    }
    return sdf_cfg, color_cfg, rcfg, tcfg, params


def test_dataset_loads(sphere_scene):
    assert len(sphere_scene) == 8
    v = sphere_scene.views[0]
    assert v.image.shape == (48, 56, 3)
    assert v.mask.sum() > 50  # sphere visible
    assert sphere_scene.obj_verts.shape[1] == 3


def test_obj_training_reduces_loss(sphere_scene):
    sdf_cfg, color_cfg, rcfg, tcfg, params = small_setup(sphere_scene)
    state = init_train_state(params, tcfg)
    step = jax.jit(make_obj_train_step(sdf_cfg, color_cfg, rcfg, tcfg))
    loader = RayBatchLoader(sphere_scene, tcfg.batch_size, seed=0)
    key = jax.random.PRNGKey(42)
    mask_losses, psnrs = [], []
    n_steps = 80
    for i in range(n_steps):
        batch = loader.get(i % len(sphere_scene))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        assert np.isfinite(float(metrics["loss"]))
        mask_losses.append(float(metrics["mask_loss"]))
        psnrs.append(float(metrics["psnr"]))
    # occupancy converges toward the mask and reconstruction sharpens;
    # (total loss is eikonal-noise dominated at this tiny scale, so assert
    # on the two stable signals)
    assert np.mean(mask_losses[-10:]) < np.mean(mask_losses[:10]) * 0.75
    assert np.mean(psnrs[-10:]) > np.mean(psnrs[:10]) + 1.0
    assert int(state["step"]) == n_steps


def test_obj_training_sharded_matches_single(sphere_scene):
    """The same step jitted with the ray axis sharded over 8 CPU devices
    must produce the same numbers as the unsharded run."""
    from honerf_tpu.parallel import make_mesh, shard_ray_batch

    sdf_cfg, color_cfg, rcfg, tcfg, params = small_setup(sphere_scene)
    step = make_obj_train_step(sdf_cfg, color_cfg, rcfg, tcfg)
    loader = RayBatchLoader(sphere_scene, tcfg.batch_size, seed=3)
    batch_np = loader.get(0)

    state_a = init_train_state(params, tcfg)
    jstep = jax.jit(step)
    key = jax.random.PRNGKey(7)
    batch_single = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state_a, metrics_a = jstep(state_a, batch_single, key)

    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    state_b = init_train_state(params, tcfg)
    batch_sharded = shard_ray_batch(batch_np, mesh)
    state_b, metrics_b = jstep(state_b, batch_sharded, key)

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-4
    )
    # parameters after the step agree too
    wa = np.asarray(state_a["params"]["sdf"]["layers"][0]["v"])
    wb = np.asarray(state_b["params"]["sdf"]["layers"][0]["v"])
    np.testing.assert_allclose(wa, wb, rtol=1e-4, atol=1e-6)


def test_grad_clip_bounds_update_and_defaults(sphere_scene):
    """grad_clip semantics (BENCH_NOTES round-5 soak: bf16 collapse guard).

    - default: OFF for f32 trunks (reference parity — exp_runner.py has a
      bare backward/step), AUTO-ON for bf16 trunks;
    - the clipped step's update global-norm is bounded by clip * lr-ish
      (we assert vs the unclipped update, which must shrink);
    - grad_norm is reported in the step metrics either way.
    """
    from honerf_tpu.train.offline import (
        DEFAULT_BF16_GRAD_CLIP,
        resolve_grad_clip,
    )

    sdf_cfg, color_cfg, rcfg, tcfg, params = small_setup(sphere_scene)
    assert resolve_grad_clip(tcfg, sdf_cfg) == 0.0
    assert (resolve_grad_clip(tcfg, sdf_cfg._replace(trunk_dtype="bf16"))
            == DEFAULT_BF16_GRAD_CLIP)
    # explicit conf value beats the auto rule in both directions
    assert resolve_grad_clip(
        tcfg._replace(grad_clip=0.0), sdf_cfg._replace(trunk_dtype="bf16")
    ) == 0.0
    assert resolve_grad_clip(tcfg._replace(grad_clip=3.5), sdf_cfg) == 3.5

    # exact _clipped_grads semantics
    from honerf_tpu.train.offline import _clipped_grads

    g = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([[0.0, 12.0]])}
    clipped, gnorm = _clipped_grads(g, 6.5)
    assert float(gnorm) == pytest.approx(13.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]), [1.5, 2.0],
                               rtol=1e-6)
    same, gnorm2 = _clipped_grads(g, 100.0)  # above the norm: no-op
    np.testing.assert_allclose(np.asarray(same["b"]), np.asarray(g["b"]))
    assert float(gnorm2) == pytest.approx(13.0)

    # integration: clipping ONE spike step from a shared warm optimizer
    # state shrinks that update (NOTE: from a FRESH init Adam is
    # grad-scale invariant, and clipping EVERY step re-normalizes
    # through nu — a single clipped step against unclipped history is
    # the scenario the guard exists for)
    loader = RayBatchLoader(sphere_scene, tcfg.batch_size, seed=5)
    key = jax.random.PRNGKey(11)
    step_off = jax.jit(make_obj_train_step(sdf_cfg, color_cfg, rcfg, tcfg))
    state = init_train_state(params, tcfg)
    for i in range(7):  # unclipped warmup builds nu history
        batch = {k: jnp.asarray(v)
                 for k, v in loader.get(i % len(sphere_scene)).items()}
        key, sub = jax.random.split(key)
        state, metrics = step_off(state, batch, sub)
    warm = jax.tree.map(lambda x: x, state)
    batch = {k: jnp.asarray(v) for k, v in loader.get(0).items()}
    key, sub = jax.random.split(key)

    def update_norm(new_state):
        delta = jax.tree.map(
            lambda a, b: np.asarray(a, np.float64) - np.asarray(b, np.float64),
            new_state["params"], warm["params"])
        return float(np.sqrt(sum(
            float((d ** 2).sum()) for d in jax.tree.leaves(delta))))

    s_off, m_off = step_off(warm, batch, sub)
    g_obs = float(m_off["grad_norm"])
    assert np.isfinite(g_obs) and g_obs > 0
    step_on = jax.jit(make_obj_train_step(
        sdf_cfg, color_cfg, rcfg, tcfg._replace(grad_clip=g_obs / 50.0)))
    s_on, m_on = step_on(warm, batch, sub)
    # reported norm is pre-clip
    assert float(m_on["grad_norm"]) == pytest.approx(g_obs, rel=1e-4)
    # the update shrinks (momentum carries unclipped history, so the
    # one-step effect is partial)...
    assert update_norm(s_on) < update_norm(s_off)
    # ...but the second-moment increment — what a spike poisons for
    # thousands of subsequent steps (soak: layer-8 bias nu jumped 21->50
    # at the collapse) — shrinks quadratically with the clip (50^2)
    def nu_delta(new_state):
        d = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a, np.float64)
                                      - np.asarray(b, np.float64)).sum()),
            new_state["opt_state"][0].nu, warm["opt_state"][0].nu)
        return sum(jax.tree.leaves(d))

    assert nu_delta(s_on) < nu_delta(s_off) / 100.0


def test_checkpoint_roundtrip(sphere_scene, tmp_path):
    from honerf_tpu.train import load_checkpoint, save_checkpoint

    sdf_cfg, color_cfg, rcfg, tcfg, params = small_setup(sphere_scene)
    state = init_train_state(params, tcfg)
    path = str(tmp_path / "checkpoints" / "ckpt_000001.npz")
    save_checkpoint(path, state)
    loaded = load_checkpoint(path)
    flat_a = jax.tree.leaves(state)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_torch_checkpoint_converter(tmp_path):
    """Round-trip: a torch weight-normed net saved in the reference ckpt
    format converts to our parametrization with identical outputs."""
    import torch
    import torch.nn as nn

    from honerf_tpu.models.mlp import apply_linear
    from honerf_tpu.train import load_torch_checkpoint

    torch.manual_seed(0)
    lin0 = nn.utils.weight_norm(nn.Linear(8, 4))
    sdf_sd = {
        "lin0.weight_v": lin0.weight_v.detach(),
        "lin0.weight_g": lin0.weight_g.detach(),
        "lin0.bias": lin0.bias.detach(),
        "se3_refine": torch.zeros(5, 9),
    }
    ckpt = {
        "sdf_network_fine": sdf_sd,
        "color_network_fine": {
            "lin0.weight": torch.randn(3, 4),
            "lin0.bias": torch.randn(3),
        },
        "variance_network_fine": {"variance": torch.tensor(0.3)},
        "iter_step": 77,
    }
    path = str(tmp_path / "ckpt_000077.pth")
    torch.save(ckpt, path)
    out = load_torch_checkpoint(path)
    assert out["iter_step"] == 77
    assert out["se3_refine"].shape == (5, 9)
    x = np.random.default_rng(0).normal(size=(6, 8)).astype(np.float32)
    with torch.no_grad():
        want = lin0(torch.from_numpy(x)).numpy()
    got = np.asarray(
        apply_linear(jax.tree.map(jnp.asarray, out["sdf"]["layers"][0]), jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert float(out["variance"]["variance"]) == pytest.approx(0.3)


def test_ray_chunked_render_matches_unchunked():
    """train.ray_chunk (the tunneled-backend miscompile workaround, see
    BENCH_NOTES.md) must be numerically equivalent at perturb=0 up to
    reassociation."""
    from honerf_tpu.models import (
        ColorConfig, SDFConfig, init_color_params, init_sdf_params,
        init_se3_refine, init_variance_params,
    )
    from honerf_tpu.render import RenderConfig
    from honerf_tpu.train import TrainHyper
    from honerf_tpu.train.offline import obj_render_from_batch
    from honerf_tpu.data.synthetic import look_at_camera

    sdf_cfg = SDFConfig(kind="obj", n_layers=3, d_hidden=64, d_out=65,
                        skip_in=(2,), v_multires=6)
    color_cfg = ColorConfig(kind="obj", d_feature=64, n_layers=2,
                            d_hidden=64, v_multires=6)
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(64, "obj"),
    }
    rcfg = RenderConfig(n_samples=8, n_importance=8, up_sample_steps=2,
                        perturb=0.0)
    rng = np.random.default_rng(0)
    n = 64
    R, T = look_at_camera(np.asarray([0.0, 0.2, -0.9]), np.zeros(3))
    batch = {
        "rays_xy": jnp.asarray(rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32)),
        "true_rgb": jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        "true_mask": jnp.ones((n, 1), jnp.float32),
        "cam_R": jnp.asarray(R), "cam_T": jnp.asarray(T),
        "focal": jnp.asarray([3.0, 3.0], dtype=jnp.float32),
        "principal": jnp.zeros(2, dtype=jnp.float32),
        "Ro": jnp.eye(3), "To": jnp.zeros(3),
        "index": jnp.asarray(0, jnp.int32),
    }
    key = jax.random.PRNGKey(3)
    a = obj_render_from_batch(params, sdf_cfg, color_cfg, rcfg,
                              TrainHyper(batch_size=n, ray_chunk=0), batch, key)
    b = obj_render_from_batch(params, sdf_cfg, color_cfg, rcfg,
                              TrainHyper(batch_size=n, ray_chunk=16), batch, key)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-4, atol=5e-5, err_msg=k)
