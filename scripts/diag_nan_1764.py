"""Bisect the batch-1764 grad NaN on TPU (BENCH_NOTES 'Known issues').

Round-1 facts: the grad-augmented object train step NaNs at batch 1764 on
TPU; forward-only is finite; the identical program at the same batch is
finite on CPU; 'highest' matmul precision does not fix it.

This script evaluates, at the same params/batch: each loss term's value
and grad norm separately, plus per-leaf NaN counts of the combined grad,
at several batch sizes.

Run: env PYTHONPATH=/root/repo python scripts/diag_nan_1764.py [batch...]
"""

import os
import sys
import time

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
from honerf_tpu.render.losses import mask_bce, masked_l1_color
from honerf_tpu.train import TrainHyper
from honerf_tpu.train.offline import obj_render_from_batch
from honerf_tpu.data.synthetic import look_at_camera


def make_batch(n, seed=0):
    rng = np.random.default_rng(seed)
    R, T = look_at_camera(np.asarray([0.0, 0.2, -0.9]), np.zeros(3))
    return {
        "rays_xy": jnp.asarray(rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32)),
        "true_rgb": jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        "true_mask": jnp.asarray(
            (rng.uniform(0, 1, (n, 1)) > 0.4).astype(np.float32)),
        "cam_R": jnp.asarray(R),
        "cam_T": jnp.asarray(T),
        "focal": jnp.asarray([3.0, 3.0], dtype=jnp.float32),
        "principal": jnp.zeros(2, dtype=jnp.float32),
        "Ro": jnp.eye(3),
        "To": jnp.zeros(3),
        "index": jnp.asarray(0, dtype=jnp.int32),
    }


def main():
    batches = [int(a) for a in sys.argv[1:]] or [441, 882, 1764]
    sdf_cfg = SDFConfig(kind="obj")
    color_cfg = ColorConfig(kind="obj")
    rcfg = RenderConfig()
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(64, "obj"),
    }

    TERMS = ("color", "mask", "eik", "all")

    def term_loss(p, batch, key, term):
        tcfg = TrainHyper(batch_size=batch["rays_xy"].shape[0], vgg_weight=0.0)
        out = obj_render_from_batch(p, sdf_cfg, color_cfg, rcfg, tcfg, batch, key)
        tm = (batch["true_mask"] > 0.5).astype(jnp.float32)
        color = masked_l1_color(out["color_fine"], batch["true_rgb"], tm)
        m = mask_bce(out["weight_sum"], tm)
        eik = out["gradient_error"]
        if term == "color":
            return color
        if term == "mask":
            return m
        if term == "eik":
            return eik
        return color + m + eik

    for n in batches:
        batch = make_batch(n)
        key = jax.random.PRNGKey(7)
        print(f"=== batch {n} ===", flush=True)
        for term in TERMS:
            f = jax.jit(jax.value_and_grad(
                lambda p, b, k, term=term: term_loss(p, b, k, term)))
            t0 = time.perf_counter()
            val, grad = f(params, batch, key)
            leaves = jax.tree.leaves(grad)
            nan_leaves = []
            flat, treedef = jax.tree_util.tree_flatten_with_path(grad)
            for path, leaf in flat:
                bad = int(jnp.sum(~jnp.isfinite(leaf)))
                if bad:
                    nan_leaves.append((jax.tree_util.keystr(path), bad,
                                       int(leaf.size)))
            gn = float(jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2)
                                    for l in leaves)))
            print(f"  {term}: loss={float(val):.6f} gnorm={gn:.4f} "
                  f"({time.perf_counter()-t0:.1f}s)", flush=True)
            for name, bad, size in nan_leaves[:8]:
                print(f"    NONFINITE {name}: {bad}/{size}", flush=True)


if __name__ == "__main__":
    main()
