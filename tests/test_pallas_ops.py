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


class TestFusedHand:
    def _setup(self, cfg):
        from honerf_tpu.data.synthetic import canonical_hand_joints
        from honerf_tpu.hand import bone_transforms_from_mano_joints

        params = init_sdf_params(jax.random.PRNGKey(0), cfg)
        joints = jnp.asarray(canonical_hand_joints(0.3))
        bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
        t_pose = jnp.asarray(canonical_hand_joints(0.0))
        rng = np.random.default_rng(0)
        pts = jnp.asarray(
            rng.normal(size=(300, 3)).astype(np.float32) * 0.1
            + np.asarray(joints.mean(0))
        )
        return params, bt_inv, t_pose, pts

    @pytest.mark.parametrize("layout", ["piece", "slot"])
    @pytest.mark.parametrize("cfg", [
        SDFConfig(kind="hand", n_layers=3, d_hidden=64, d_out=65,
                  skip_in=(2,), v_multires=3, r_multires=2),
        SDFConfig(kind="hand", r_multires=7),
    ], ids=["tiny", "full"])
    def test_matches_xla_forward(self, cfg, layout):
        """Fused hand kernel (interpret mode) == XLA bone-major forward to
        bf16-weight tolerance, tiny and full architectures, both
        embedding lane layouts."""
        from honerf_tpu.models.fields import sdf_hand_apply
        from honerf_tpu.ops.fused_hand import FusedHandSDF

        params, bt_inv, t_pose, pts = self._setup(cfg)
        ref, _, _, _ = sdf_hand_apply(
            params, cfg._replace(flat_embedding=False), pts, bt_inv, t_pose
        )
        fused = FusedHandSDF(params, cfg, interpret=True, layout=layout)
        got = np.asarray(fused(pts, bt_inv, t_pose))
        np.testing.assert_allclose(got, np.asarray(ref[:, 0]),
                                   atol=2e-3, rtol=1e-3)

    def test_best_hand_sdf_fn_cpu_falls_back_to_xla(self):
        from honerf_tpu.ops.fused_hand import best_hand_sdf_fn

        cfg = SDFConfig(kind="hand", n_layers=3, d_hidden=64, d_out=65,
                        skip_in=(2,), v_multires=3, r_multires=2)
        params, bt_inv, t_pose, pts = self._setup(cfg)
        fn = best_hand_sdf_fn(params, cfg, bt_inv, t_pose)
        out = np.asarray(fn(pts))
        assert out.shape == (300,) and np.isfinite(out).all()

    def test_vmap_misuse_raises(self):
        """VERDICT r2 #4: placing the fused ladder under vmap must raise
        loudly instead of silently severing gradients / exercising
        untested pallas batching."""
        from honerf_tpu.ops.fused_hand import FusedHandSDF

        cfg = SDFConfig(kind="hand", n_layers=3, d_hidden=64, d_out=65,
                        skip_in=(2,), v_multires=3, r_multires=2)
        params, bt_inv, t_pose, pts = self._setup(cfg)
        fused = FusedHandSDF(params, cfg, interpret=True)
        batched = jnp.stack([pts, pts])
        with pytest.raises(ValueError, match="vmap"):
            jax.vmap(lambda p: fused(p, bt_inv, t_pose))(batched)

    def test_make_hand_field_fused_refuses_unsupported_backend(self):
        """make_hand_field(fused_ladder=True) raises at build time on an
        unsupported configuration (CPU backend here) instead of failing
        deep inside Mosaic."""
        from honerf_tpu.render.neus import make_hand_field
        from honerf_tpu.models import ColorConfig, init_color_params, \
            init_variance_params

        cfg = SDFConfig(kind="hand", n_layers=3, d_hidden=64, d_out=65,
                        skip_in=(2,), v_multires=3, r_multires=2)
        params, bt_inv, t_pose, _pts = self._setup(cfg)
        ccfg = ColorConfig(kind="hand", n_layers=2, d_hidden=64,
                           v_multires=3, r_multires=2)
        full = {
            "sdf": params,
            "color": init_color_params(jax.random.PRNGKey(2), ccfg),
            "variance": init_variance_params(0.3),
        }
        with pytest.raises(RuntimeError, match="fused hand ladder"):
            make_hand_field(full, cfg, ccfg, bt_inv, t_pose,
                            fused_ladder=True)

    def test_fused_hand_under_shard_map(self):
        """VERDICT r2 #9 capability check: the fused kernel inside a
        shard_map per-device body (interpret mode, 2-device CPU mesh)
        matches the XLA forward — the basis for the
        HONERF_FUSED_LADDER_MULTIDEV opt-in."""
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        from honerf_tpu.models.fields import sdf_hand_apply
        from honerf_tpu.ops.fused_hand import FusedHandSDF

        if len(jax.devices()) < 2:
            pytest.skip("needs >= 2 devices")
        cfg = SDFConfig(kind="hand", n_layers=3, d_hidden=64, d_out=65,
                        skip_in=(2,), v_multires=3, r_multires=2)
        params, bt_inv, t_pose, pts = self._setup(cfg)
        n = (pts.shape[0] // 2) * 2
        pts = pts[:n]
        fused = FusedHandSDF(params, cfg, interpret=True)
        mesh = Mesh(np.array(jax.devices()[:2]), ("d",))

        sharded = shard_map(
            lambda p: fused(p, bt_inv, t_pose),
            mesh=mesh, in_specs=P("d"), out_specs=P("d"),
            check_rep=False,
        )
        got = np.asarray(sharded(pts))
        ref, _, _, _ = sdf_hand_apply(
            params, cfg._replace(flat_embedding=False), pts, bt_inv, t_pose
        )
        np.testing.assert_allclose(got, np.asarray(ref[:, 0]),
                                   atol=2e-3, rtol=1e-3)

    def test_double_angle_recurrence_accuracy(self):
        """sin/cos(2^l x) via the doubling recurrence stays well inside
        bf16 feature precision across the hand PE range."""
        from honerf_tpu.ops.fused_hand import _pe_pieces

        x = jnp.asarray(np.linspace(0.0, 1.5, 257, dtype=np.float32))[None]
        gate = jnp.ones_like(x)
        sins, coss = _pe_pieces(x, gate, 10)
        for l in range(10):
            np.testing.assert_allclose(
                np.asarray(sins[l][0], np.float32),
                np.sin(np.asarray(x[0]) * 2.0 ** l), atol=8e-3,
            )
            np.testing.assert_allclose(
                np.asarray(coss[l][0], np.float32),
                np.cos(np.asarray(x[0]) * 2.0 ** l), atol=8e-3,
            )
