"""NaN bisect round 2: is batch-1764 a shape-dependent backend issue or
data-dependent numerics?  Checks, per (batch, seed):
  * pure forward render finiteness,
  * grad-program color-loss finiteness,
and at 1764: ladder ablation (up_sample_steps=0, perturb=0).

Run: env PYTHONPATH=/root/repo python scripts/diag_nan_1764b.py
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from honerf_tpu.models import (
    ColorConfig, SDFConfig, init_color_params, init_sdf_params,
    init_se3_refine, init_variance_params,
)
from honerf_tpu.render import RenderConfig
from honerf_tpu.render.losses import masked_l1_color
from honerf_tpu.train import TrainHyper
from honerf_tpu.train.offline import obj_render_from_batch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from diag_nan_1764 import make_batch

sdf_cfg = SDFConfig(kind="obj")
color_cfg = ColorConfig(kind="obj")
params = {
    "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
    "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
    "variance": init_variance_params(0.3),
    "se3_refine": init_se3_refine(64, "obj"),
}


def color_loss(p, batch, key, rcfg):
    tcfg = TrainHyper(batch_size=batch["rays_xy"].shape[0], vgg_weight=0.0)
    out = obj_render_from_batch(p, sdf_cfg, color_cfg, rcfg, tcfg, batch, key)
    tm = (batch["true_mask"] > 0.5).astype(jnp.float32)
    return masked_l1_color(out["color_fine"], batch["true_rgb"], tm)


def fwd_ok(batch, key, rcfg):
    tcfg = TrainHyper(batch_size=batch["rays_xy"].shape[0], vgg_weight=0.0)
    out = jax.jit(
        lambda p, b, k: obj_render_from_batch(
            p, sdf_cfg, color_cfg, rcfg, tcfg, b, k)
    )(params, batch, key)
    c = np.asarray(out["color_fine"])
    w = np.asarray(out["weight_sum"])
    return np.isfinite(c).all() and np.isfinite(w).all()


def grad_ok(batch, key, rcfg):
    val, grad = jax.jit(jax.value_and_grad(
        lambda p, b, k: color_loss(p, b, k, rcfg)))(params, batch, key)
    finite = np.isfinite(float(val)) and all(
        bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(grad))
    return float(val), finite


def main():
    rcfg = RenderConfig()
    key = jax.random.PRNGKey(7)
    for n, seed in [(882, 0), (1764, 0), (1764, 1), (1764, 2), (3528, 0)]:
        batch = make_batch(n, seed)
        f = fwd_ok(batch, key, rcfg)
        v, g = grad_ok(batch, key, rcfg)
        print(f"batch={n} seed={seed}: fwd_finite={f} "
              f"grad_loss={v} grad_finite={g}", flush=True)
    # key dependence at 1764
    for ks in [8, 9]:
        batch = make_batch(1764, 0)
        v, g = grad_ok(batch, jax.random.PRNGKey(ks), rcfg)
        print(f"batch=1764 key={ks}: grad_loss={v} grad_finite={g}", flush=True)
    # ladder ablations at 1764
    batch = make_batch(1764, 0)
    for label, rc in [
        ("no_upsample", RenderConfig(n_samples=64, n_importance=0,
                                     up_sample_steps=0, perturb=1.0)),
        ("no_perturb", RenderConfig(perturb=0.0)),
        ("up2", RenderConfig(n_samples=64, n_importance=32,
                             up_sample_steps=2, perturb=1.0)),
    ]:
        v, g = grad_ok(batch, key, rc)
        print(f"batch=1764 {label}: grad_loss={v} grad_finite={g}", flush=True)


if __name__ == "__main__":
    main()
