"""End-to-end OfflineRunner.train throughput at the reference protocol.

Measures the WHOLE runner loop (host ray sampling, chunk stacking, upload,
K=8 scan dispatch, metrics logging) on a synthetic dataset at the real
230x266 image size and full reference architecture — the number reported
in BENCH_NOTES.md as "End-to-end OfflineRunner.train".

Usage:
  env PYTHONPATH=/root/repo python scripts/bench_runner_e2e.py obj
  env PYTHONPATH=/root/repo python scripts/bench_runner_e2e.py hand [bf16]
"""

import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

CONF = """
general {{
    base_exp_dir = {exp_dir}
    model_type = {model_type}
    data_type = real
}}
dataset {{
    traindata_dir = {data_dir}
    testdata_dir = {data_dir}
    image_size = [230, 266]
}}
train {{
    learning_rate = {lr}
    learning_rate_alpha = 0.05
    end_iter = {end_iter}
    near = 0.4
    far = 1.5
    batch_size = 441
    warm_up_end = 5000
    save_freq = 1000000
    val_freq = 1000000
    report_freq = 1000000
    igr_weight = 1.0
    mask_weight = 1.0
    vgg_weight = 0.0
    refine_pose = True
}}
model {{
    sdf_network {{
        d_out = 257
        d_in = 3
        d_hidden = 256
        n_layers = 8
        skip_in = [4]
        v_multires = 10
        r_multires = {r_multires}
        bias = 0.5
        scale = 1.0
        geometric_init = True
        weight_norm = True
        {trunk}
    }}
    variance_network {{ init_val = 0.3 }}
    rendering_network {{
        d_feature = 256
        d_in = 3
        d_out = 3
        d_hidden = 256
        n_layers = 4
        weight_norm = True
        v_multires = 10
        r_multires = {r_multires}
        grad_multires = 4
        squeeze_out = True
        use_gradients = True
        {trunk}
    }}
    neus_renderer {{
        n_samples = 64
        n_importance = 64
        n_outside = 0
        up_sample_steps = 4
        perturb = 1.0
    }}
}}
"""

WARM, MEASURE = 48, 400


def main() -> None:
    model_type = sys.argv[1] if len(sys.argv) > 1 else "obj"
    bf16 = "bf16" in sys.argv[2:]
    root = tempfile.mkdtemp(prefix=f"bench_e2e_{model_type}_")
    data_dir = os.path.join(root, "data")
    exp_dir = os.path.join(root, "exp")
    if model_type == "obj":
        from honerf_tpu.data.synthetic import generate_object_dataset

        generate_object_dataset(data_dir, n_views=8, H=230, W=266)
    else:
        from honerf_tpu.data.synthetic import generate_hand_dataset

        generate_hand_dataset(data_dir, n_frames=1, n_views=8, H=230, W=266)
    conf_path = os.path.join(root, "bench.conf")
    with open(conf_path, "w") as f:
        f.write(CONF.format(
            exp_dir=exp_dir, data_dir=data_dir, model_type=model_type,
            lr="5e-4" if model_type == "obj" else "1e-4",
            end_iter=WARM,
            r_multires=4 if model_type == "obj" else 7,
            trunk='trunk_dtype = "bf16"' if bf16 else "",
        ))

    from honerf_tpu.train.runner import OfflineRunner

    runner = OfflineRunner(conf_path, mode="train")
    t0 = time.perf_counter()
    runner.train()  # includes compile
    print(f"warm {WARM} iters (incl. compile): {time.perf_counter()-t0:.1f}s",
          flush=True)

    runner.tcfg = runner.tcfg._replace(end_iter=WARM + MEASURE)
    t0 = time.perf_counter()
    runner.train()
    dt = time.perf_counter() - t0
    sps = MEASURE / dt
    print(
        f"e2e {model_type}{' bf16' if bf16 else ''}: {MEASURE} iters in "
        f"{dt:.2f}s = {sps:.2f} steps/s ({sps * 441 / 1000:.1f}k rays/s)",
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
