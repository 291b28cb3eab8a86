"""Full-image eval-render throughput (230x266 = 61,180 rays) on TPU.

Measures OfflineRunner._render_full_image (the test/validate path) for
both models at the full reference architecture, after the one-fetch +
fused-ladder changes.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_render.py [obj|hand]
"""

import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_runner_e2e import CONF


def main() -> None:
    model_type = sys.argv[1] if len(sys.argv) > 1 else "obj"
    root = tempfile.mkdtemp(prefix=f"bench_render_{model_type}_")
    data_dir = os.path.join(root, "data")
    if model_type == "obj":
        from honerf_tpu.data.synthetic import generate_object_dataset

        generate_object_dataset(data_dir, n_views=4, H=230, W=266)
    else:
        from honerf_tpu.data.synthetic import generate_hand_dataset

        generate_hand_dataset(data_dir, n_frames=1, n_views=4, H=230, W=266)
    conf_path = os.path.join(root, "r.conf")
    with open(conf_path, "w") as f:
        f.write(CONF.format(
            exp_dir=os.path.join(root, "exp"), data_dir=data_dir,
            model_type=model_type,
            lr="5e-4", end_iter=8,
            r_multires=4 if model_type == "obj" else 7,
            trunk="",
        ))
    from honerf_tpu.train.runner import OfflineRunner

    runner = OfflineRunner(conf_path, mode="test")
    n_rays = runner.H * runner.W
    img = runner._render_full_image(0)  # compile
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        img = runner._render_full_image(0)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"{model_type} full-image render: {dt:.2f} s/image = "
        f"{n_rays / dt / 1e3:.1f}k rays/s (img mean {img.mean():.4f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
