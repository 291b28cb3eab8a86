"""Quality gate for the fused Pallas paths in single-frame fitting.

Runs SingleFitRunner fit '1' then '12' at the reference budget over a
synthetic catch sequence in three modes — xla (no fused paths), ladder
(fused hand ladder only, the round-2 default), ladder_fine (+ the
fully-fused frozen-nets fine pass, train.fused_fine='full') — and
compares the final GT-vs-pred convergence diagnostics per frame.  The
ladder is non-differentiable (sample placement only); the fused fine
pass carries pose gradients through its hand-written VJP (validated
<=1e-3 vs XLA, tests/test_fused_fine_full.py), so all modes must land at
the same pose error.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_fit_fused.py
"""

import json
import os
import pickle
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_fit_e2e import CONF, write_full_checkpoints


# every mode is EXPLICIT about both fused paths: the runner's defaults
# are now fused-on for a single TPU chip, so omitting a key would break
# the A/B
MODES = {
    "xla": "  fused_ladder = false\n  fused_fine = false",
    "ladder": "  fused_ladder = true\n  fused_fine = false",
    "ladder_fine": '  fused_ladder = true\n  fused_fine = "full"',
}


def run(mode: str) -> dict:
    ws = tempfile.mkdtemp(prefix=f"qfit_{mode}_")
    from honerf_tpu.data.synthetic import generate_catch_sequence
    from honerf_tpu.fit.runner import SingleFitRunner

    generate_catch_sequence(
        os.path.join(ws, "data", "catch_sequence", "test"),
        n_frames=2, n_views=8, H=230, W=266,
    )
    write_full_checkpoints(os.path.join(ws, "exp"))
    out = {"mode": mode}
    for fit_type in ("1", "12"):
        conf = os.path.join(ws, f"f{fit_type}.conf")
        with open(conf, "w") as f:
            f.write(CONF.format(ws=ws, fit_type=fit_type, G=1).replace(
                "verbose_steps = true",
                "verbose_steps = false\n" + MODES[mode],
            ))
        SingleFitRunner(conf, case=f"q{fit_type}").fitting()
        pose_dir = os.path.join(ws, "fit_res", "view_8", fit_type,
                                "person1_bean", "seq0", f"pose_{fit_type}")
        errs_j = []
        for name in sorted(os.listdir(pose_dir)):
            with open(os.path.join(pose_dir, name), "rb") as f:
                p = pickle.load(f)
            errs_j.append(float(np.linalg.norm(
                p["pred_joint3d"] - p["gt_joint3d"], axis=-1).mean()) * 1000)
        out[f"fit{fit_type}_joint_err_mm"] = round(float(np.mean(errs_j)), 3)
    return out


def main() -> None:
    modes = sys.argv[1:] or list(MODES)
    for mode in modes:
        print(json.dumps(run(mode)), flush=True)


if __name__ == "__main__":
    main()
