"""End-to-end SingleFitRunner throughput at the reference fit protocol.

Fit '1' (30 iters x 8 views x 196 rays) then '12' (25 x 8 x 196, dual
192-sample render + interaction losses) over a synthetic 230x266 catch
sequence with FULL-SIZE networks.  Reports warm per-frame wall time (the
first frame pays the remote compile and is excluded) — the number quoted
in BENCH_NOTES.md as "SingleFitRunner end-to-end per frame".

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fit_e2e.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

N_FRAMES = 4

CONF = """
general {{
  save_dir = "{ws}/fit_res/CASE_NAME/wmask"
  model_type = "hand"
  data_type = "real"
  fit_type = "{fit_type}"
  fit_id = 0
  fit_res_root = "{ws}/fit_res"
  exp_root = "{ws}/exp"
}}
dataset {{
  fitdata_dir = "{ws}/data/catch_sequence/test"
  view_num = 8
  image_size = [230, 266]
}}
train {{
  near = 0.4
  far = 1.5
  batch_size = 196
  verbose_steps = true
  frames_per_batch = {G}
}}
model {{
  sdf_hand_network {{
    d_out = 257
    d_in = 3
    d_hidden = 256
    n_layers = 8
    skip_in = [4]
    v_multires = 10
    r_multires = 7
    bias = 0.5
    scale = 1.0
    geometric_init = true
    weight_norm = true
  }}
  rendering_hand_network {{
    d_feature = 256
    d_in = 3
    d_out = 3
    d_hidden = 256
    n_layers = 4
    weight_norm = true
    v_multires = 10
    r_multires = 7
    grad_multires = 4
    squeeze_out = true
    use_gradients = true
  }}
  sdf_obj_network {{
    d_out = 257
    d_in = 3
    d_hidden = 256
    n_layers = 8
    skip_in = [4]
    v_multires = 10
    r_multires = 4
    bias = 0.5
    scale = 1.0
    geometric_init = true
    weight_norm = true
  }}
  rendering_obj_network {{
    d_feature = 256
    d_in = 3
    d_out = 3
    d_hidden = 256
    n_layers = 4
    weight_norm = true
    v_multires = 10
    r_multires = 4
    grad_multires = 4
    squeeze_out = true
    use_gradients = true
  }}
  variance_network {{ init_val = 0.3 }}
  neus_renderer {{
    n_samples = 64
    n_importance = 64
    n_outside = 0
    up_sample_steps = 4
    perturb = 1.0
  }}
}}
"""


def write_full_checkpoints(exp_root: str) -> None:
    from honerf_tpu.models import (
        ColorConfig,
        SDFConfig,
        init_color_params,
        init_sdf_params,
        init_variance_params,
    )
    from honerf_tpu.train.checkpoints import save_checkpoint

    hand = {
        "params": {
            "sdf": init_sdf_params(
                jax.random.PRNGKey(0), SDFConfig(kind="hand", r_multires=7)
            ),
            "color": init_color_params(
                jax.random.PRNGKey(1), ColorConfig(kind="hand", r_multires=7)
            ),
            "variance": init_variance_params(0.3),
        }
    }
    obj = {
        "params": {
            "sdf": init_sdf_params(jax.random.PRNGKey(2), SDFConfig(kind="obj")),
            "color": init_color_params(jax.random.PRNGKey(3),
                                       ColorConfig(kind="obj")),
            "variance": init_variance_params(0.3),
        }
    }
    save_checkpoint(
        os.path.join(exp_root, "person1", "wmask_realhand", "checkpoints",
                     "ckpt_000010.npz"), hand)
    save_checkpoint(
        os.path.join(exp_root, "bean", "wmask_realobj", "checkpoints",
                     "ckpt_000010.npz"), obj)


def run_stage(ws: str, fit_type: str, G: int = 1,
              fused_fine: bool = False) -> None:
    from honerf_tpu.fit.runner import SingleFitRunner

    conf = os.path.join(ws, f"fit_{fit_type}_g{G}_{int(fused_fine)}.conf")
    text = CONF.format(ws=ws, fit_type=fit_type, G=G)
    # ALWAYS explicit: the runner's default is now fused-on for a single
    # TPU chip, so the baseline mode must opt out to stay an A/B
    fine_line = '  fused_fine = "full"' if fused_fine else \
        "  fused_fine = false"
    text = text.replace("verbose_steps = true",
                        "verbose_steps = true\n" + fine_line)
    with open(conf, "w") as f:
        f.write(text)
    runner = SingleFitRunner(conf, case=f"bench{fit_type}")
    times = []
    orig = runner.save_pose

    def timed_save(path, pose_np, frame):
        times.append(time.perf_counter())
        return orig(path, pose_np, frame)

    runner.save_pose = timed_save
    t0 = time.perf_counter()
    runner.fitting()
    if G > 1:
        # batched groups: all frames of a group land at ~the same time;
        # report group wall / G for warm groups
        dt = time.perf_counter() - t0
        n = len(times)
        warm_groups = [
            times[i] - times[i - G] for i in range(2 * G - 1, n, G)
        ]
        per_frame = (np.asarray(warm_groups) / G if warm_groups
                     else np.asarray([dt / max(n, 1)]))
        print(
            f"fit '{fit_type}' G={G}: total {dt:.1f}s for {n} frames; warm "
            f"{per_frame.mean():.2f}s/frame "
            f"({', '.join(f'{t:.2f}' for t in per_frame)})",
            flush=True,
        )
        return
    times.insert(0, t0)
    per_frame = np.diff(times)
    warm = per_frame[1:]
    print(
        f"fit '{fit_type}': frame0 (incl. compile) {per_frame[0]:.1f}s, "
        f"warm {warm.mean():.2f}s/frame over {len(warm)} frames "
        f"({', '.join(f'{t:.2f}' for t in warm)})",
        flush=True,
    )


def main() -> None:
    import sys
    import tempfile

    args = [a for a in sys.argv[1:] if a != "fine"]
    fused_fine = "fine" in sys.argv[1:]
    G = int(args[0]) if args else 1
    n_frames = int(args[1]) if len(args) > 1 else N_FRAMES
    ws = tempfile.mkdtemp(prefix="bench_fit_")
    from honerf_tpu.data.synthetic import generate_catch_sequence

    generate_catch_sequence(
        os.path.join(ws, "data", "catch_sequence", "test"),
        n_frames=n_frames, n_views=8, H=230, W=266,
    )
    write_full_checkpoints(os.path.join(ws, "exp"))
    run_stage(ws, "1", G, fused_fine)
    run_stage(ws, "12", G, fused_fine)


if __name__ == "__main__":
    main()
