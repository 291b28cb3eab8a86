"""Fused hand-SDF kernel vs the XLA paths on TPU (full hand net, r=7).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fused_hand.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/honerf_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from honerf_tpu.models import SDFConfig, init_sdf_params
from honerf_tpu.models.fields import sdf_hand_apply
from honerf_tpu.ops.fused_hand import FusedHandSDF
from honerf_tpu.data.synthetic import canonical_hand_joints
from honerf_tpu.hand import bone_transforms_from_mano_joints


def bench(fn, x, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(x)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = SDFConfig(kind="hand", r_multires=7)
    params = init_sdf_params(jax.random.PRNGKey(0), cfg)
    joints = jnp.asarray(canonical_hand_joints(0.3))
    bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
    t_pose = jnp.asarray(canonical_hand_joints(0.0))
    rng = np.random.default_rng(0)

    fused = FusedHandSDF(params, cfg)
    bone_cfg = cfg._replace(flat_embedding=False)

    @jax.jit
    def xla_bone(pts):
        return sdf_hand_apply(params, bone_cfg, pts, bt_inv, t_pose)[0][:, 0]

    @jax.jit
    def xla_flat(pts):
        return sdf_hand_apply(params, cfg, pts, bt_inv, t_pose)[0][:, 0]

    from honerf_tpu.ops.fused_hand import FusedHandSDF as FH

    for n in (131072, 1048576):
        pts = jnp.asarray(
            rng.normal(size=(n, 3)).astype(np.float32) * 0.1
            + np.asarray(joints.mean(0))
        )
        tb = bench(xla_bone, pts)
        rows = [f"xla bone-major {tb*1e3:.1f} ms ({n/tb/1e6:.1f} M)"]
        if n <= 200000:  # the flat build OOMs HBM at 1M pts
            tl = bench(xla_flat, pts)
            rows.append(f"xla flat {tl*1e3:.1f} ms ({n/tl/1e6:.1f} M)")
        best = None
        for block, n_split, layout in (
                (256, 2, "piece"), (256, 4, "piece"), (512, 2, "piece"),
                (512, 4, "piece"), (1024, 4, "piece"),
                (256, 2, "slot"), (512, 2, "slot"), (512, 4, "slot"),
                (1024, 4, "slot")):
            try:
                f = FH(params, cfg, block=block, n_split=n_split,
                       layout=layout)
                tf = bench(lambda p: f(p, bt_inv, t_pose), pts)
            except Exception as e:
                rows.append(
                    f"b{block}/s{n_split}/{layout}: FAIL {type(e).__name__}")
                continue
            rows.append(f"b{block}/s{n_split}/{layout} {tf*1e3:.1f} ms "
                        f"({n/tf/1e6:.1f} M)")
            if best is None or tf < best[0]:
                best = (tf, block, n_split, f)
        err = float(jnp.max(jnp.abs(
            best[3](pts[:4096], bt_inv, t_pose) - xla_bone(pts[:4096])
        )))
        print(f"n={n}: " + " | ".join(rows)
              + f" | best {best[1]}/{best[2]} speedup {tb/best[0]:.2f}x"
              + f" | max_err {err:.1e}", flush=True)


if __name__ == "__main__":
    main()
