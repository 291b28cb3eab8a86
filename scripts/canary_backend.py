"""Backend canary: decide whether the tunneled-libtpu miscompile
workarounds are needed on THIS backend.

Compiles and runs the exact program families diagnosed as miscompiled in
round 2 (BENCH_NOTES.md "Known issues"):

  1. forward full-render body at 441 (reference-good anchor), 1764 and
     4096 rays — the tunnel renders >= ~1764 silently BLACK and >= 4096
     all-NaN;
  2. the composite render+grad program at 882 (good anchor) and 1764
     rays — the tunnel produces NaN grads at >= ~1756.

Prints one JSON verdict line and the recommended
HONERF_BACKEND_WORKAROUNDS setting (utils/backend_probe.py consumes it).
Record the output in BENCH_NOTES.md per environment.

Run: env PYTHONPATH=/root/repo python scripts/canary_backend.py
(~4 programs to compile; cached runs take seconds, cold TPU-tunnel
compiles can take minutes each).
"""

import json
import os
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

from diag_nan_1764 import make_batch  # same synthetic scene as the diagnosis


def main():
    sdf_cfg = SDFConfig(kind="obj")
    color_cfg = ColorConfig(kind="obj")
    rcfg = RenderConfig()
    rcfg_eval = rcfg._replace(perturb=0.0)
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(64, "obj"),
    }
    key = jax.random.PRNGKey(7)
    report = {"backend": jax.default_backend(),
              "n_devices": len(jax.devices()), "probes": {}}
    bad = []

    def fwd(p, batch, k, n):
        tcfg = TrainHyper(batch_size=n, vgg_weight=0.0, ray_chunk=0)
        out = obj_render_from_batch(p, sdf_cfg, color_cfg, rcfg_eval, tcfg,
                                    batch, k)
        return out["color_fine"]

    # --- probe 1: forward renders (black / NaN detection) ---------------
    ref_mean = None
    for n in (441, 1764, 4096):
        batch = make_batch(n)
        t0 = time.perf_counter()
        color = np.asarray(jax.jit(fwd, static_argnums=3)(
            params, batch, key, n))
        dt = time.perf_counter() - t0
        mean = float(np.nanmean(color))
        finite = bool(np.isfinite(color).all())
        if n == 441:
            ref_mean = mean
        # "black": a nonzero reference mean collapses by >50x
        black = bool(ref_mean and abs(mean) < abs(ref_mean) / 50.0)
        ok = finite and not black
        report["probes"][f"forward_{n}"] = {
            "mean": mean, "finite": finite, "black": black, "ok": ok,
            "seconds": round(dt, 1),
        }
        if not ok:
            bad.append(f"forward_{n}")
        print(f"forward {n}: mean={mean:.5f} finite={finite} "
              f"black={black} ({dt:.1f}s)", flush=True)

    # --- probe 2: render+grad at the NaN batch sizes --------------------
    def loss(p, batch, k, n):
        tcfg = TrainHyper(batch_size=n, vgg_weight=0.0, ray_chunk=0)
        out = obj_render_from_batch(p, sdf_cfg, color_cfg, rcfg, tcfg,
                                    batch, k)
        tm = (batch["true_mask"] > 0.5).astype(jnp.float32)
        return (masked_l1_color(out["color_fine"], batch["true_rgb"], tm)
                + mask_bce(out["weight_sum"], tm) + out["gradient_error"])

    for n in (882, 1764):
        batch = make_batch(n)
        t0 = time.perf_counter()
        val, grad = jax.jit(jax.value_and_grad(loss), static_argnums=3)(
            params, batch, key, n)
        leaves = jax.tree.leaves(grad)
        nonfinite = int(sum(int(jnp.sum(~jnp.isfinite(l))) for l in leaves))
        finite = bool(np.isfinite(float(val))) and nonfinite == 0
        dt = time.perf_counter() - t0
        report["probes"][f"grad_{n}"] = {
            "loss": float(val), "nonfinite_grad_elems": nonfinite,
            "ok": finite, "seconds": round(dt, 1),
        }
        if not finite:
            bad.append(f"grad_{n}")
        print(f"grad {n}: loss={float(val):.5f} nonfinite={nonfinite} "
              f"({dt:.1f}s)", flush=True)

    report["verdict"] = "MISCOMPILES" if bad else "CLEAN"
    report["failing_probes"] = bad
    report["recommend"] = {
        "HONERF_BACKEND_WORKAROUNDS": "on" if bad else "off"
    }
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
