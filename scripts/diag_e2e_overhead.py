"""Isolate the end-to-end runner overhead on the tunneled TPU.

BENCH_NOTES round 2: obj device step 19.2 ms (52 steps/s potential) but
OfflineRunner.train measures 29.9 steps/s; hand 37.6 ms (26.6/s) vs 21.95/s
e2e.  Host batch assembly measures 0.17 ms/step on CPU, so the gap is in
per-chunk dispatch/upload/sync costs.  This script measures, at the
reference object config (441 rays, 64+64, 4 up-sample steps, K=8 scan):

  A. pure device chunk loop — constant pre-uploaded stacked batch, keys
     precomputed, one value fetch at the end (device-bound ceiling)
  B. A + fresh np.stack + per-leaf jnp.asarray upload every chunk
  C. B + jax.random.split dispatch every chunk
  D. C + MetricsLogger.log_chunk with flush_every=20 (runner default)

Run: env PYTHONPATH=/root/repo python scripts/diag_e2e_overhead.py
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/honerf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

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
from honerf_tpu.train.offline import make_multi_step
from honerf_tpu.data.synthetic import look_at_camera

BATCH, K, CHUNKS = 441, 8, 25


def make_batch(rng):
    R, T = look_at_camera(np.asarray([0.0, 0.2, -0.9]), np.zeros(3))
    return {
        "rays_xy": rng.uniform(-0.5, 0.5, (BATCH, 2)).astype(np.float32),
        "true_rgb": rng.uniform(0, 1, (BATCH, 3)).astype(np.float32),
        "true_mask": (rng.uniform(0, 1, (BATCH, 1)) > 0.4).astype(np.float32),
        "cam_R": np.asarray(R, np.float32),
        "cam_T": np.asarray(T, np.float32),
        "focal": np.asarray([3.0, 3.0], np.float32),
        "principal": np.zeros(2, np.float32),
        "Ro": np.eye(3, dtype=np.float32),
        "To": np.zeros(3, np.float32),
        "joints": np.zeros((21, 3), np.float32),
        "t_pose_21": np.zeros((21, 3), np.float32),
        "bone_length": np.zeros((20,), np.float32),
        "index": np.asarray(0, np.int32),
    }


def main():
    sdf_cfg = SDFConfig(kind="obj")
    color_cfg = ColorConfig(kind="obj")
    rcfg = RenderConfig()
    tcfg = TrainHyper(batch_size=BATCH, vgg_weight=0.0)
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
        "se3_refine": init_se3_refine(64, "obj"),
    }
    state0 = init_train_state(params, tcfg)
    multi = jax.jit(make_multi_step(make_obj_train_step(sdf_cfg, color_cfg, rcfg, tcfg)))

    rng = np.random.default_rng(0)
    bl = [make_batch(rng) for _ in range(K)]
    stacked_np = {k: np.stack([b[k] for b in bl]) for k in bl[0]}
    stacked_dev = {k: jnp.asarray(v) for k, v in stacked_np.items()}
    keys_dev = jax.random.split(jax.random.PRNGKey(0), K)

    # warm / compile
    state, ms = multi(state0, stacked_dev, keys_dev)
    print("compiled, loss=", float(ms["loss"][-1]), flush=True)

    def timed(name, body):
        state = state0
        t0 = time.perf_counter()
        ms = body(state)
        dt = time.perf_counter() - t0
        sps = K * CHUNKS / dt
        print(f"{name}: {dt/CHUNKS*1000:7.1f} ms/chunk  {sps:6.2f} steps/s", flush=True)

    # A: device-bound ceiling
    def run_a(state):
        for _ in range(CHUNKS):
            state, ms = multi(state, stacked_dev, keys_dev)
        float(ms["loss"][-1])
    timed("A device-only        ", run_a)

    # B: + per-leaf uploads each chunk
    def run_b(state):
        for _ in range(CHUNKS):
            dev = {k: jnp.asarray(v) for k, v in stacked_np.items()}
            state, ms = multi(state, dev, keys_dev)
        float(ms["loss"][-1])
    timed("B +per-leaf uploads  ", run_b)

    # B2: single packed upload, unpack on host-side device arrays via one transfer
    flat = np.concatenate([stacked_np[k].reshape(K, -1).astype(np.float32)
                           for k in sorted(stacked_np) if k != "index"], axis=1)
    shapes = {k: stacked_np[k].shape for k in sorted(stacked_np) if k != "index"}
    def unpack(buf):
        out, off = {}, 0
        for k in sorted(shapes):
            n = int(np.prod(shapes[k][1:]))
            out[k] = buf[:, off:off + n].reshape(shapes[k])
            off += n
        out["index"] = jnp.zeros((K,), jnp.int32)
        return out
    multi_packed = jax.jit(lambda s, buf, keys: multi_raw(s, buf, keys))
    step_fn = make_obj_train_step(sdf_cfg, color_cfg, rcfg, tcfg)
    raw_multi = make_multi_step(step_fn)
    def multi_raw(s, buf, keys):
        return raw_multi(s, unpack(buf), keys)
    state, ms = multi_packed(state0, jnp.asarray(flat), keys_dev)
    float(ms["loss"][-1])
    def run_b2(state):
        for _ in range(CHUNKS):
            buf = jnp.asarray(flat)
            state, ms = multi_packed(state, buf, keys_dev)
        float(ms["loss"][-1])
    timed("B2 +one packed upload", run_b2)

    # C: + random.split per chunk
    def run_c(state):
        key = jax.random.PRNGKey(0)
        for _ in range(CHUNKS):
            dev = {k: jnp.asarray(v) for k, v in stacked_np.items()}
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, K)
            state, ms = multi(state, dev, keys)
        float(ms["loss"][-1])
    timed("C +random.split      ", run_c)

    # D: + metrics chunk logging, flush_every=20
    from honerf_tpu.train.runner import MetricsLogger
    import tempfile
    mpath = os.path.join(tempfile.mkdtemp(), "m.jsonl")
    def run_d(state):
        key = jax.random.PRNGKey(0)
        metrics = MetricsLogger(mpath, flush_every=20)
        step = 0
        for _ in range(CHUNKS):
            dev = {k: jnp.asarray(v) for k, v in stacked_np.items()}
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, K)
            state, ms = multi(state, dev, keys)
            metrics.log_chunk(step, K, ms)
            step += K
        metrics.flush()
        float(ms["loss"][-1])
    timed("D +metrics log/flush ", run_d)

    # E: D but at the packed-fetch logger's default flush_every=100
    def run_e(state):
        key = jax.random.PRNGKey(0)
        metrics = MetricsLogger(mpath)
        step = 0
        for _ in range(CHUNKS):
            dev = {k: jnp.asarray(v) for k, v in stacked_np.items()}
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, K)
            state, ms = multi(state, dev, keys)
            metrics.log_chunk(step, K, ms)
            step += K
        metrics.flush()
        float(ms["loss"][-1])
    timed("E +packed metrics    ", run_e)


if __name__ == "__main__":
    main()
