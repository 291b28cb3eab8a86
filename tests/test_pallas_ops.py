"""Pallas fused-SDF kernel tests (interpreter mode on CPU; the real Mosaic
compile is exercised by the TPU benchmark)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from honerf_tpu.models import SDFConfig, init_sdf_params, sdf_obj_apply


def fused_eval(params, cfg, pts, interpret=True):
    """Run the fused kernel in interpreter mode for CPU testing."""
    from honerf_tpu.ops import fused_sdf as F

    ws, bs, meta = F.pack_obj_sdf_weights(params, cfg)
    n = pts.shape[0]
    n_pad = F._round_up(max(n, F.BLOCK), F.BLOCK)
    pts_pad = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    in_specs = [
        pl.BlockSpec((F.BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        F._make_kernel(meta),
        out_shape=jax.ShapeDtypeStruct((n_pad, F._LANE), jnp.float32),
        grid=(n_pad // F.BLOCK,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (F.BLOCK, F._LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(pts_pad, *ws, *bs)
    return out[:n, 0]


@pytest.mark.parametrize("n_pts", [64, 512, 700])
def test_fused_obj_sdf_matches_xla(n_pts):
    cfg = SDFConfig(kind="obj")
    params = init_sdf_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(n_pts, 3)).astype(np.float32) * 0.3)
    want = np.asarray(sdf_obj_apply(params, cfg, pts)[:, 0])
    got = np.asarray(fused_eval(params, cfg, pts))
    # bf16 matmuls: tolerance accounts for reduced mantissa
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)


def test_fused_small_config():
    cfg = SDFConfig(kind="obj", n_layers=4, d_hidden=128, d_out=129, skip_in=(2,),
                    v_multires=6)
    params = init_sdf_params(jax.random.PRNGKey(1), cfg)
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(100, 3)).astype(np.float32))
    want = np.asarray(sdf_obj_apply(params, cfg, pts)[:, 0])
    got = np.asarray(fused_eval(params, cfg, pts))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)
