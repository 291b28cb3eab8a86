"""bf16-trunk fast-mode quality check on a synthetic scene.

Trains the full reference architecture for 1200 steps twice (f32 trunk vs
model.*.trunk_dtype=bf16) on the same synthetic dataset and compares the
PSNR trajectory — the acceptance gate for the bf16 fast mode.  For the
hand model the bf16 run also exercises the fused Pallas up-sample ladder
(ops/fused_hand.py), so this gates both together.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_obj_bf16.py [obj|hand]
"""

import json
import os
import shutil
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache")

import sys

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_runner_e2e import CONF  # same full-architecture conf template

STEPS = 1200


def run(trunk: str, model_type: str = "obj") -> dict:
    root = tempfile.mkdtemp(prefix=f"quality_{model_type}_{trunk}_")
    data_dir = os.path.join(root, "data")
    exp_dir = os.path.join(root, "exp")
    if model_type == "obj":
        from honerf_tpu.data.synthetic import generate_object_dataset

        generate_object_dataset(data_dir, n_views=8, H=230, W=266)
    else:
        from honerf_tpu.data.synthetic import generate_hand_dataset

        generate_hand_dataset(data_dir, n_frames=1, n_views=8, H=230, W=266)
    conf_path = os.path.join(root, "q.conf")
    with open(conf_path, "w") as f:
        f.write(CONF.format(
            exp_dir=exp_dir, data_dir=data_dir, model_type=model_type,
            lr="5e-4" if model_type == "obj" else "1e-4",
            end_iter=STEPS,
            r_multires=4 if model_type == "obj" else 7,
            trunk='trunk_dtype = "bf16"' if trunk == "bf16" else "",
        ))
    from honerf_tpu.train.runner import OfflineRunner

    t0 = time.perf_counter()
    runner = OfflineRunner(conf_path, mode="train")
    runner.train()
    dt = time.perf_counter() - t0
    recs = [json.loads(l) for l in open(
        os.path.join(exp_dir, "logs", "metrics.jsonl"))]
    out = {
        "model": model_type,
        "trunk": trunk,
        "wall_s": round(dt, 1),
        "psnr_first100": round(float(np.mean(
            [r["psnr"] for r in recs[:100]])), 2),
        "psnr_last100": round(float(np.mean(
            [r["psnr"] for r in recs[-100:]])), 2),
        "loss_last100": round(float(np.mean(
            [r["loss"] for r in recs[-100:]])), 4),
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    model_type = sys.argv[1] if len(sys.argv) > 1 else "obj"
    for trunk in ("f32", "bf16"):
        print(json.dumps(run(trunk, model_type)), flush=True)


if __name__ == "__main__":
    main()
