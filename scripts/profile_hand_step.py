"""Capture a jax.profiler trace of the hand train step and print the top
device ops by total duration (via jax.profiler.ProfileData — no
TensorBoard needed).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_hand_step.py [bf16]
"""

import glob
import gzip
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    bf16 = "bf16" in sys.argv[1:]
    from honerf_tpu.models import (
        ColorConfig, SDFConfig, init_color_params, init_sdf_params,
        init_se3_refine, init_variance_params,
    )
    from honerf_tpu.render import RenderConfig
    from honerf_tpu.train import TrainHyper, init_train_state
    from honerf_tpu.train.offline import make_hand_train_step
    import __graft_entry__ as g

    dtype = "bf16" if bf16 else "f32"
    sdf_cfg = SDFConfig(kind="hand", r_multires=7, trunk_dtype=dtype)
    color_cfg = ColorConfig(kind="hand", r_multires=7, trunk_dtype=dtype)
    rcfg = RenderConfig()
    tcfg = TrainHyper(batch_size=441, vgg_weight=0.0)
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(8, "hand"),
    }
    state = init_train_state(params, tcfg)
    step = jax.jit(make_hand_train_step(sdf_cfg, color_cfg, rcfg, tcfg))
    batch = g._hand_batch(441)
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, ms = step(state, batch, sub)
    print("warm loss", float(ms["loss"]), flush=True)

    logdir = "/tmp/hand_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        key, sub = jax.random.split(key)
        state, ms = step(state, batch, sub)
    float(ms["loss"])
    jax.profiler.stop_trace()

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths, flush=True)
    if not paths:
        return
    with open(paths[0], "rb") as f:
        data = f.read()
    pd = jax.profiler.ProfileData.from_serialized_xspace(data)
    for plane in pd.planes:
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                totals[ev.name] += ev.duration_ns
                counts[ev.name] += 1
        if not totals:
            continue
        grand = sum(totals.values())
        print(f"\n== plane {plane.name}: {grand/1e6:.2f} ms total over "
              f"{sum(counts.values())} events ==")
        for name, ns in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {ns/1e6/5:8.3f} ms/step x{counts[name]//5:4d}  {name[:90]}")


if __name__ == "__main__":
    main()
