"""Benchmark: offline-stage training throughput in rays/sec/chip.

Headline metric: the FLAGSHIP pose-conditioned hand model — the paper's
actual contribution (reference `utils/fields.py:56-177`, SDFNetwork with the
21-bone pose embedding; `exp_runner.py:127-263` hand branch).  Measures the
FULL hand train step: HALO bone transforms, hierarchical 64+64 sampling with
4 up-sample steps, the 128-sample fine pass (fully-fused Pallas kernel:
embedding + 9-layer trunk + spatial gradient + color net with hand-written
second-order backward), eikonal double-backprop, masked losses, Adam — at
the reference batch size of 441 rays/step on
confs/wmask_realhand_hand1.conf (SURVEY.md §6).

The easier object model (reference `utils/fields.py:180-242`) is measured
the same way and reported in the same JSON line as `obj_rays_per_sec`.

Runs in the bf16-trunk fast mode (bfloat16 activations through the MLP
trunks, f32 matmul accumulation and losses): quality-gated against f32 out
to 10k-step synthetic runs for both models — PSNR/loss AND extracted-mesh
geometry match (BENCH_NOTES.md "Quality gates").

Baseline: the reference publishes no throughput numbers (BASELINE.md).  We
normalize against an ESTIMATED 4410 rays/s for the PyTorch reference on its
RTX 3080 Ti (10 train steps/s at 441 rays — ~106k field evals + autograd
double-backprop per step; see BASELINE.md's workload table).  That
estimate was derived for the OBJECT workload; the reference hand step is
strictly slower (21-bone pose embedding + HALO transforms per eval), so
the hand vs_baseline reported here is a conservative LOWER BOUND on the
true speedup.  vs_baseline is measured_rays_per_sec / 4410.

Output contract (VERDICT r4 #2 — a driver SIGKILL must never leave an
empty BENCH json): stdout carries ONLY JSON lines, each one flushed the
moment it exists, ordered so the LAST line is always the best available
record.  The object step (small program, known-warm compile path) is
measured and printed FIRST as its own labeled line; the flagship combined
hand-headline line {"metric", "value", "unit", "vs_baseline", ...} is
printed last once the hand measurement lands.  If the TPU backend stays
unavailable past a bounded wait (default 480 s, HONERF_BENCH_WAIT_S to
override), a labeled-error JSON line is flushed and the process exits —
`timeout 600 python bench.py` with the tunnel dark still yields a
parseable line.  Progress notes go to stderr.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

BASELINE_RAYS_PER_SEC = 4410.0
BATCH = 441
WARMUP = 3
ITERS = 20


def _measure(step, state, batch) -> float:
    """rays/s with a value-fetch barrier (block_until_ready does not wait on
    the tunneled TPU backend — only materializing a scalar does)."""
    key = jax.random.PRNGKey(0)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
    assert np.isfinite(float(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
    assert np.isfinite(float(metrics["loss"]))
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def _common_batch(rng):
    return {
        "rays_xy": jnp.asarray(rng.uniform(-0.5, 0.5, (BATCH, 2)).astype(np.float32)),
        "true_rgb": jnp.asarray(rng.uniform(0, 1, (BATCH, 3)).astype(np.float32)),
        "true_mask": jnp.asarray(
            (rng.uniform(0, 1, (BATCH, 1)) > 0.4).astype(np.float32)
        ),
        "focal": jnp.asarray([3.0, 3.0], dtype=jnp.float32),
        "principal": jnp.zeros(2, dtype=jnp.float32),
        "index": jnp.asarray(0, dtype=jnp.int32),
    }


def bench_hand() -> float:
    """Flagship: pose-conditioned hand model at the reference architecture
    (8x256 trunk, v_multires=10, r_multires=7, 21-bone embedding)."""
    from honerf_tpu.data.datasets import get_bone_length
    from honerf_tpu.data.synthetic import canonical_hand_joints, posed_hand_example
    from honerf_tpu.models import (
        ColorConfig,
        SDFConfig,
        init_color_params,
        init_sdf_params,
        init_se3_refine,
        init_variance_params,
    )
    from honerf_tpu.render import RenderConfig
    from honerf_tpu.train import TrainHyper, init_train_state
    from honerf_tpu.train.offline import make_hand_train_step

    sdf_cfg = SDFConfig(kind="hand", r_multires=7, trunk_dtype="bf16")
    color_cfg = ColorConfig(kind="hand", r_multires=7, trunk_dtype="bf16")
    rcfg = RenderConfig()  # 64 + 64, up=4, perturb=1 — reference config
    tcfg = TrainHyper(batch_size=BATCH, vgg_weight=0.0, learning_rate=1e-4)

    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(8, "hand"),
    }
    state = init_train_state(params, tcfg)
    step = jax.jit(make_hand_train_step(sdf_cfg, color_cfg, rcfg, tcfg))

    rng = np.random.default_rng(0)
    joints, R, T = posed_hand_example()
    batch = dict(
        _common_batch(rng),
        cam_R=jnp.asarray(R),
        cam_T=jnp.asarray(T),
        joints=jnp.asarray(joints),
        t_pose_21=jnp.asarray(canonical_hand_joints(0.0)),
        bone_length=jnp.asarray(get_bone_length(canonical_hand_joints(0.0))),
    )
    return _measure(step, state, batch)


def bench_obj() -> float:
    from honerf_tpu.data.synthetic import look_at_camera
    from honerf_tpu.models import (
        ColorConfig,
        SDFConfig,
        init_color_params,
        init_sdf_params,
        init_se3_refine,
        init_variance_params,
    )
    from honerf_tpu.render import RenderConfig
    from honerf_tpu.train import TrainHyper, init_train_state, make_obj_train_step

    sdf_cfg = SDFConfig(kind="obj", trunk_dtype="bf16")
    color_cfg = ColorConfig(kind="obj", trunk_dtype="bf16")
    rcfg = RenderConfig()
    tcfg = TrainHyper(batch_size=BATCH, vgg_weight=0.0)

    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(64, "obj"),
    }
    state = init_train_state(params, tcfg)
    step = jax.jit(make_obj_train_step(sdf_cfg, color_cfg, rcfg, tcfg))

    rng = np.random.default_rng(0)
    R, T = look_at_camera(np.asarray([0.0, 0.2, -0.9]), np.zeros(3))
    batch = dict(
        _common_batch(rng),
        cam_R=jnp.asarray(R),
        cam_T=jnp.asarray(T),
        Ro=jnp.eye(3),
        To=jnp.zeros(3),
        joints=jnp.zeros((21, 3)),
        t_pose_21=jnp.zeros((21, 3)),
        bone_length=jnp.zeros((20,)),
    )
    return _measure(step, state, batch)


#: Last successful in-round measurement, re-emitted (clearly labeled
#: stale) at startup so a driver SIGKILL during the ~30-min cold hand
#: compile still leaves the best-known real number in the tail instead
#: of nothing (BENCH_r01..r03 captured only the obj line; r04 nothing).
_LAST_PATH = os.environ.get(
    "HONERF_BENCH_LAST_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".bench_last.json"),
)


def _emit(rec: dict, remember: bool = False) -> None:
    """One JSON line to stdout, flushed immediately — a SIGKILL at any
    later moment leaves this line intact in the driver's tail."""
    print(json.dumps(rec), flush=True)
    if remember:
        try:
            tmp = _LAST_PATH + ".tmp"
            with open(tmp, "w") as f:
                json.dump(dict(rec, measured_at=time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime())), f)
            os.replace(tmp, _LAST_PATH)
        except OSError:
            pass


def _emit_stale_record() -> None:
    """Re-emit the previous successful measurement FIRST, labeled stale:
    every later (fresh) line supersedes it in the driver's last-line
    parse; if the process dies mid-compile this is still a real, dated
    measurement rather than an empty tail."""
    try:
        with open(_LAST_PATH) as f:
            rec = json.load(f)
    except (OSError, ValueError):
        return
    rec["stale"] = ("re-emitted from the last successful run "
                    "(%s); superseded by any later line"
                    % rec.get("measured_at", "unknown time"))
    _emit(rec)


def _note(msg: str) -> None:
    import sys

    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _wait_for_backend() -> None:
    """The tunneled TPU backend goes UNAVAILABLE transiently (observed
    round 4: init failing for hours).  jax caches a failed backend init
    for the process lifetime, so probe in SUBPROCESSES and only proceed
    once a trivial value fetch succeeds.  The wait is BOUNDED (default
    480 s — well inside any plausible driver budget; round 4's 30-min
    silent wait turned 'tunnel down' into an empty BENCH json): at the
    cap a labeled-error JSON line is flushed before exiting."""
    import subprocess
    import sys

    max_wait_s = float(os.environ.get("HONERF_BENCH_WAIT_S", "480"))
    probe = os.environ.get(
        "HONERF_BENCH_PROBE_CMD",
        "import jax, jax.numpy as jnp;"
        "print(float(jnp.ones((8, 128)).sum()))",
    )
    start = time.time()
    deadline = start + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        budget = max(min(240.0, deadline - time.time()), 5.0)
        try:
            res = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                text=True, timeout=budget,
            )
            if "1024.0" in res.stdout:
                _note(f"backend up after {time.time() - start:.0f}s "
                      f"({attempt} probes)")
                return
        except subprocess.TimeoutExpired:
            pass
        _note(f"backend probe {attempt} failed "
              f"({time.time() - start:.0f}s elapsed)")
        if time.time() >= deadline:
            err = ("TPU backend unavailable after "
                   f"{max_wait_s:.0f}s ({attempt} probes)")
            try:  # keep the last REAL measurement as the final line
                with open(_LAST_PATH) as f:
                    rec = json.load(f)
                rec["stale"] = ("last successful run (%s); this "
                                "invocation could not measure: %s"
                                % (rec.get("measured_at", "unknown"), err))
            except (OSError, ValueError):
                rec = {
                    "metric": "offline_hand_train_rays_per_sec_per_chip",
                    "value": 0.0, "unit": "rays/s", "vs_baseline": 0.0,
                    "error": err,
                }
            _emit(rec)
            raise SystemExit(1)
        time.sleep(min(20.0, max(deadline - time.time(), 0.1)))


def main() -> None:
    # NOTE: must not call jax.default_backend() here — a failed init is
    # cached for the whole process; probe via subprocesses instead.  The
    # probe is unconditional (JAX_PLATFORMS=cpu in the env is OVERRIDDEN
    # by this container's sitecustomize, so it cannot be trusted as a
    # skip signal); HONERF_BENCH_NO_WAIT=1 is the explicit escape hatch
    # for genuinely-CPU runs (tests force cpu via jax.config).
    _emit_stale_record()
    if not os.environ.get("HONERF_BENCH_NO_WAIT"):
        _wait_for_backend()
    # Object first: the smaller program with the proven-fast compile path
    # (r3 measured it end-to-end), emitted as its own line so a driver
    # timeout during the hand compile still records a real measurement.
    _note("measuring object step (compiles first in a fresh process)")
    obj = bench_obj()
    _emit({
        "metric": "offline_obj_train_rays_per_sec_per_chip",
        "value": round(obj, 1),
        "unit": "rays/s",
        "vs_baseline": round(obj / BASELINE_RAYS_PER_SEC, 3),
        "partial": "hand headline still measuring; prefer the later "
                   "combined line when present",
    })
    _note(f"obj = {obj:.1f} rays/s; measuring flagship hand step")
    hand = bench_hand()
    _emit({
        "metric": "offline_hand_train_rays_per_sec_per_chip",
        "value": round(hand, 1),
        "unit": "rays/s",
        "vs_baseline": round(hand / BASELINE_RAYS_PER_SEC, 3),
        "obj_rays_per_sec": round(obj, 1),
        "obj_vs_baseline": round(obj / BASELINE_RAYS_PER_SEC, 3),
        "baseline_note": "vs ESTIMATED obj-workload 4410 rays/s "
                         "(reference publishes none); hand ratio "
                         "is a lower bound",
    }, remember=True)


if __name__ == "__main__":
    main()
