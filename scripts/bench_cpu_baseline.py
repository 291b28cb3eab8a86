"""Honest in-container baseline: the torch reference object train step vs
ours, BOTH on this machine's CPU, same workload (441 rays, 64+64 samples,
4 up-sample steps, full 8x256 nets, eikonal double-backprop + Adam).

The reference's camera stage (pytorch3d) is bypassed on BOTH sides: rays
are precomputed host-side and the timed region is the render + loss +
backward + optimizer step — the hot path (SURVEY.md §6: ~106k field evals
per step).

Run: env PYTHONPATH=/root/repo python scripts/bench_cpu_baseline.py
"""

import os
import sys
import time
import types

import numpy as np

REFERENCE = "/root/reference"
ITERS = 5
WARMUP = 2
BATCH = 441


def bench_torch():
    import torch

    if "mcubes" not in sys.modules:
        sys.modules["mcubes"] = types.ModuleType("mcubes")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.SimpleNamespace(vgg19=None)
        sys.modules["torchvision"] = tv
    sys.path.insert(0, REFERENCE)
    from utils import fields as rf
    from utils import renderer as rr
    sys.path.pop(0)

    class _Emb(torch.nn.Module):
        def forward(self, x, L):
            shape = x.shape
            freq = 2 ** torch.arange(L, dtype=torch.float32)
            spectrum = x[..., None] * freq
            enc = torch.stack([spectrum.sin(), spectrum.cos()], dim=-2)
            return enc.reshape(*shape[:-1], -1)

    emb = _Emb()
    torch.manual_seed(0)
    sdf = rf.SDFNetwork_OBJ(emb, 64, "real", d_in=3, d_out=257, d_hidden=256,
                            n_layers=8, skip_in=(4,), v_multires=10)
    color = rf.RenderingNetwork_OBJ(emb, "real", d_feature=256, d_in=3,
                                    d_out=3, d_hidden=256, n_layers=4,
                                    v_multires=10, r_multires=4,
                                    grad_multires=4)
    var = rf.SingleVarianceNetwork(0.3)
    renderer = rr.NeuSRenderer(sdf, var, color, "obj", n_samples=64,
                               n_importance=64, n_outside=0,
                               up_sample_steps=4, perturb=1.0)
    renderer.index = 0
    params = (list(sdf.parameters()) + list(color.parameters())
              + list(var.parameters()))
    opt = torch.optim.Adam(params, lr=5e-4)

    rng = np.random.default_rng(0)
    rays_o = torch.from_numpy(
        (rng.normal(size=(BATCH, 3)) * 0.05 + [0, 0, -0.9]).astype(np.float32))
    rays_d = torch.from_numpy(
        np.tile(np.asarray([[0.0, 0, 1]], np.float32), (BATCH, 1)))
    true_rgb = torch.from_numpy(rng.uniform(0, 1, (BATCH, 3)).astype(np.float32))
    mask = torch.from_numpy(
        (rng.uniform(0, 1, (BATCH, 1)) > 0.4).astype(np.float32))
    bt = torch.zeros(21, 4, 4)
    tp = torch.zeros(21, 3)

    def step():
        out = renderer.render(rays_o, rays_d, 0.4, 1.5, bt, tp, None,
                              torch.eye(3), torch.zeros(3), 0)
        color_fine = out["color_fine"]
        weight_sum = out["weight_sum"]
        mask_sum = mask.sum() + 1e-5
        color_error = (color_fine - true_rgb) * mask
        color_loss = torch.nn.functional.l1_loss(
            color_error, torch.zeros_like(color_error), reduction="sum"
        ) / mask_sum
        mask_loss = torch.nn.functional.binary_cross_entropy(
            weight_sum.clip(1e-3, 1.0 - 1e-3), mask)
        eik = out["gradient_error"]
        loss = color_loss + mask_loss + eik
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(WARMUP):
        step()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        loss = step()
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(loss)
    return dt


def bench_ours():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from honerf_tpu.models import (
        ColorConfig, SDFConfig, init_color_params, init_sdf_params,
        init_se3_refine, init_variance_params,
    )
    from honerf_tpu.render import RenderConfig
    from honerf_tpu.train import TrainHyper, init_train_state, make_obj_train_step
    from honerf_tpu.data.synthetic import look_at_camera

    sdf_cfg = SDFConfig(kind="obj")
    color_cfg = ColorConfig(kind="obj")
    rcfg = RenderConfig()
    tcfg = TrainHyper(batch_size=BATCH, vgg_weight=0.0)
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(64, "obj"),
    }
    state = init_train_state(params, tcfg)
    step = jax.jit(make_obj_train_step(sdf_cfg, color_cfg, rcfg, tcfg))
    rng = np.random.default_rng(0)
    R, T = look_at_camera(np.asarray([0.0, 0.2, -0.9]), np.zeros(3))
    batch = {
        "rays_xy": jnp.asarray(rng.uniform(-0.5, 0.5, (BATCH, 2)).astype(np.float32)),
        "true_rgb": jnp.asarray(rng.uniform(0, 1, (BATCH, 3)).astype(np.float32)),
        "true_mask": jnp.asarray(
            (rng.uniform(0, 1, (BATCH, 1)) > 0.4).astype(np.float32)),
        "cam_R": jnp.asarray(R),
        "cam_T": jnp.asarray(T),
        "focal": jnp.asarray([3.0, 3.0], dtype=jnp.float32),
        "principal": jnp.zeros(2, dtype=jnp.float32),
        "Ro": jnp.eye(3),
        "To": jnp.zeros(3),
        "joints": jnp.zeros((21, 3)),
        "t_pose_21": jnp.zeros((21, 3)),
        "bone_length": jnp.zeros((20,)),
        "index": jnp.asarray(0, dtype=jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
    assert np.isfinite(float(metrics["loss"]))
    return (time.perf_counter() - t0) / ITERS


if __name__ == "__main__":
    dt_ours = bench_ours()
    print(f"ours (jax CPU): {dt_ours*1e3:.0f} ms/step "
          f"({BATCH/dt_ours:.0f} rays/s)", flush=True)
    dt_torch = bench_torch()
    print(f"reference (torch CPU): {dt_torch*1e3:.0f} ms/step "
          f"({BATCH/dt_torch:.0f} rays/s)", flush=True)
    print(f"ratio ours/reference (same CPU): {dt_torch/dt_ours:.2f}x",
          flush=True)
