"""Train-quality gate for the staged-bf16 dW accumulators (_DW_STAGE).

Trains the FULL-SIZE hand model (synthetic single-frame scene, bf16
trunks, the production fused path) twice in subprocesses —
HONERF_DW_STAGE=0 (exact f32 dW accumulate) vs =S — and compares the
loss/psnr trajectories.  The staged mode only perturbs the WEIGHT
gradients of the fine pass (~0.5% relative, point/pose grads
bit-identical), so the trajectories should track within run noise.

Gate: final-window psnr within 0.5 dB and loss within 10%.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_hand_staged.py [steps] [S]
"""

import json
import os
import subprocess
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_runner_e2e import CONF  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(ws: str, data_dir: str, steps: int, stage: int, tag: str):
    conf_path = os.path.join(ws, f"staged_{tag}.conf")
    exp_dir = os.path.join(ws, f"exp_{tag}")
    with open(conf_path, "w") as f:
        f.write(CONF.format(
            exp_dir=exp_dir, data_dir=data_dir, model_type="hand",
            lr="1e-4", end_iter=steps, r_multires=7,
            trunk='trunk_dtype = "bf16"',
        ).replace("warm_up_end = 5000", f"warm_up_end = {steps // 10}"))
    code = (
        "import os\n"
        "os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',"
        " '/tmp/honerf_jax_cache')\n"
        "import jax\n"
        "jax.config.update('jax_compilation_cache_dir',"
        " os.environ['JAX_COMPILATION_CACHE_DIR'])\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs',"
        " 10.0)\n"
        "from honerf_tpu.train.runner import OfflineRunner\n"
        f"r = OfflineRunner({conf_path!r}, mode='train')\n"
        "r.train()\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["HONERF_DW_STAGE"] = str(stage)
    res = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=5400)
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-4000:])
        raise RuntimeError(f"leg {tag} failed rc={res.returncode}")
    recs = [json.loads(l)
            for l in open(os.path.join(exp_dir, "logs", "metrics.jsonl"))]
    return (np.array([r["step"] for r in recs]),
            np.array([r["loss"] for r in recs]),
            np.array([r["psnr"] for r in recs]))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ws = tempfile.mkdtemp(prefix="staged_gate_")
    data_dir = os.path.join(ws, "data")
    from honerf_tpu.data.synthetic import generate_hand_dataset

    generate_hand_dataset(data_dir, n_frames=1, n_views=8, H=230, W=266)

    import time
    t0 = time.perf_counter()
    s0, l0, p0 = run_leg(ws, data_dir, steps, 0, "exact")
    t1 = time.perf_counter()
    print(f"exact leg: {t1 - t0:.0f}s", flush=True)
    s1, l1, p1 = run_leg(ws, data_dir, steps, S, f"staged{S}")
    print(f"staged leg: {time.perf_counter() - t1:.0f}s", flush=True)

    w = max(steps // 10, 50)
    for mark in range(w, steps + 1, max(steps // 5, w)):
        m0 = (s0 > mark - w) & (s0 <= mark)
        m1 = (s1 > mark - w) & (s1 <= mark)
        print(f"step {mark}: loss {l0[m0].mean():.4f} vs {l1[m1].mean():.4f},"
              f" psnr {p0[m0].mean():.2f} vs {p1[m1].mean():.2f}", flush=True)
    m0 = s0 > steps - w
    m1 = s1 > steps - w
    dpsnr = abs(p0[m0].mean() - p1[m1].mean())
    dloss = abs(l0[m0].mean() - l1[m1].mean()) / max(abs(l0[m0].mean()), 1e-9)
    ok = dpsnr <= 0.5 and dloss <= 0.10
    print(f"gate S={S}: dpsnr {dpsnr:.3f} dB, dloss {100 * dloss:.1f}% -> "
          f"{'PASS' if ok else 'FAIL'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
