"""Differentiable fused fine pass (ops/fused_fine.py): the hand-derived
trunk-with-u-chain math and its hand-transposed VJP against jax autodiff,
then the Pallas kernels (interpret mode) against the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from honerf_tpu.ops.fused_fine import (
    BETA,
    TrunkMeta,
    hand_trunk_sdf_u,
    trunk_sdf_u_bwd_ref,
    trunk_sdf_u_ref,
)

META = TrunkMeta(emb_width=30, d_hidden=16, n_layers=5, skip=2, d_out=17)
META_F32 = META._replace(dtype="f32")


def _rand_weights(meta: TrunkMeta, seed=0):
    rng = np.random.default_rng(seed)
    ws, bs = [], []
    for l in range(meta.n_layers):
        d_in = meta.emb_width if l == 0 else meta.d_hidden
        if l == meta.skip:
            d_in = meta.d_hidden + meta.emb_width
        d_out = meta.d_out if l == meta.n_layers - 1 else meta.d_hidden
        ws.append(jnp.asarray(
            rng.normal(size=(d_in, d_out)).astype(np.float32)
            / np.sqrt(d_in)))
        bs.append(jnp.asarray(
            rng.normal(size=(d_out,)).astype(np.float32) * 0.05))
    return ws, bs


def _naive_trunk(e, ws, bs, meta):
    """Straight trunk forward, the autodiff oracle."""
    a = e
    for l in range(meta.n_layers):
        x = (jnp.concatenate([a, e], axis=-1) / np.sqrt(2.0)
             if l == meta.skip else a)
        z = x @ ws[l] + bs[l]
        a = jax.nn.softplus(BETA * z) / BETA if l < meta.n_layers - 1 else z
    return a


def test_forward_and_u_match_autodiff():
    ws, bs = _rand_weights(META_F32)
    rng = np.random.default_rng(1)
    e = jnp.asarray(rng.normal(size=(13, META.emb_width)).astype(np.float32))
    out, u = trunk_sdf_u_ref(e, ws, bs, META_F32)
    want_out = _naive_trunk(e, ws, bs, META_F32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               atol=1e-5, rtol=1e-5)
    # u = d out[:, 0] / d e via autodiff
    want_u = jax.vmap(jax.grad(
        lambda ei: _naive_trunk(ei[None], ws, bs, META_F32)[0, 0]
    ))(e)
    np.testing.assert_allclose(np.asarray(u), np.asarray(want_u),
                               atol=1e-4, rtol=1e-4)


def test_bwd_matches_autodiff():
    """The hand-transposed VJP (incl. the second-order softplus'' term)
    == jax.grad of a scalarized (out, u) objective."""
    ws, bs = _rand_weights(META_F32, seed=2)
    rng = np.random.default_rng(3)
    N = 9
    e = jnp.asarray(rng.normal(size=(N, META.emb_width)).astype(np.float32))
    dout = jnp.asarray(
        rng.normal(size=(N, META.d_out)).astype(np.float32))
    du = jnp.asarray(
        rng.normal(size=(N, META.emb_width)).astype(np.float32))

    def objective(e_, ws_, bs_):
        out, u = trunk_sdf_u_ref(e_, ws_, bs_, META_F32)
        return jnp.sum(out * dout) + jnp.sum(u * du)

    want_de, want_dws, want_dbs = jax.grad(objective, argnums=(0, 1, 2))(
        e, ws, bs)
    got_de, got_dws, got_dbs = trunk_sdf_u_bwd_ref(
        e, ws, bs, META_F32, dout, du)
    np.testing.assert_allclose(np.asarray(got_de), np.asarray(want_de),
                               atol=2e-4, rtol=2e-4)
    for l, (g, w) in enumerate(zip(got_dws, want_dws)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=2e-4, err_msg=f"dW{l}")
    for l, (g, w) in enumerate(zip(got_dbs, want_dbs)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=2e-4, err_msg=f"db{l}")


class TestPallasKernels:
    """Interpret-mode kernels vs the reference math (bf16 matmul
    tolerance), including multi-block dW accumulation."""

    def _setup(self, meta, n_pts, seed=0, scale=1.0):
        ws, bs = _rand_weights(meta, seed=seed)
        ws = [w * scale for w in ws]
        rng = np.random.default_rng(seed + 10)
        e = jnp.asarray(
            rng.normal(size=(n_pts, meta.emb_width)).astype(np.float32))
        return tuple(ws), tuple(bs), e

    @pytest.mark.parametrize("n_pts,block", [(40, 32), (100, 32)],
                             ids=["one-pad", "multi-block"])
    def test_fwd_kernel_matches_ref_f32(self, n_pts, block):
        meta = META._replace(dtype="f32")
        ws, bs, e = self._setup(meta, n_pts)
        want_out, want_u = trunk_sdf_u_ref(e, list(ws), list(bs), meta)
        out, u = hand_trunk_sdf_u(e, ws, bs, meta, block, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(u), np.asarray(want_u),
                                   atol=1e-4, rtol=1e-4)

    def test_fwd_kernel_bf16_close(self):
        """bf16 fast mode: beta=100 softplus amplifies activation
        rounding (sigmoid(100 z) shifts ~25x an input perturbation), so
        tolerances are loose — the same regime as the quality-gated XLA
        bf16 trunk."""
        ws, bs, e = self._setup(META, 64)
        want_out, want_u = trunk_sdf_u_ref(e, list(ws), list(bs), META)
        out, u = hand_trunk_sdf_u(e, ws, bs, META, 32, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                                   atol=5e-2, rtol=5e-2)

    def test_vjp_matches_autodiff_of_ref_f32(self):
        """jax.grad through the custom-VJP op == jax.grad through the
        pure-JAX reference at <=1e-3 in f32 mode — the grad-of-grad
        (eikonal double-backprop) path validated end-to-end
        (VERDICT r2 #1 done-criterion)."""
        meta = META._replace(dtype="f32")
        ws, bs, e = self._setup(meta, 64, seed=4)
        rng = np.random.default_rng(42)
        dout = jnp.asarray(
            rng.normal(size=(64, meta.d_out)).astype(np.float32))
        du = jnp.asarray(
            rng.normal(size=(64, meta.emb_width)).astype(np.float32))

        def loss_fused(e_, ws_, bs_):
            out, u = hand_trunk_sdf_u(e_, ws_, bs_, meta, 32, True)
            return jnp.sum(out * dout) + jnp.sum(u * du)

        def loss_ref(e_, ws_, bs_):
            out, u = trunk_sdf_u_ref(e_, list(ws_), list(bs_), meta)
            return jnp.sum(out * dout) + jnp.sum(u * du)

        got = jax.grad(loss_fused, argnums=(0, 1, 2))(e, ws, bs)
        want = jax.grad(loss_ref, argnums=(0, 1, 2))(e, ws, bs)
        for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            scale = max(1.0, float(jnp.max(jnp.abs(w))))
            np.testing.assert_allclose(
                np.asarray(g) / scale, np.asarray(w) / scale,
                atol=1e-3, rtol=1e-3,
            )


def test_render_loss_grad_parity_end_to_end():
    """Full offline-hand render loss (color + mask + eikonal, i.e. the
    grad-of-grad eikonal path) differentiated w.r.t. ALL params through
    the fused fine pass (interpret, f32) vs the pure XLA path — <=1e-3.
    This is the VERDICT r2 #1 done-criterion at the render level."""
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints
    from honerf_tpu.models import (
        ColorConfig,
        SDFConfig,
        init_color_params,
        init_sdf_params,
        init_variance_params,
    )
    from honerf_tpu.render import RenderConfig, render_single
    from honerf_tpu.render.losses import mask_bce, masked_l1_color
    from honerf_tpu.render.neus import make_hand_field

    sdf_cfg = SDFConfig(kind="hand", n_layers=3, d_hidden=64, d_out=65,
                        skip_in=(2,), v_multires=3, r_multires=2)
    color_cfg = ColorConfig(kind="hand", d_feature=64, d_hidden=64,
                            n_layers=2, v_multires=3, r_multires=2)
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
    }
    joints = jnp.asarray(canonical_hand_joints(0.3))
    bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
    t_pose = jnp.asarray(canonical_hand_joints(0.0))
    rng = np.random.default_rng(0)
    n_rays = 8
    center = np.asarray(joints.mean(0))
    rays_o = jnp.asarray(
        (center + [0, 0, -0.9]
         + rng.normal(size=(n_rays, 3)) * 0.05).astype(np.float32))
    rays_d = jnp.asarray(
        np.tile(np.asarray([[0.0, 0, 1]], np.float32), (n_rays, 1)))
    rcfg = RenderConfig(n_samples=8, n_importance=8, up_sample_steps=2,
                        perturb=0.0)
    true_rgb = jnp.asarray(
        rng.uniform(0, 1, (n_rays, 3)).astype(np.float32))
    true_mask = jnp.asarray(
        (rng.uniform(0, 1, (n_rays, 1)) > 0.4).astype(np.float32))

    def loss(p, fused):
        field = make_hand_field(
            p, sdf_cfg, color_cfg, bt_inv, t_pose,
            fused_fine=fused, interpret=True,
        )
        out = render_single(field, rcfg, jax.random.PRNGKey(0),
                            rays_o, rays_d, 0.4, 1.5)
        return (masked_l1_color(out["color_fine"], true_rgb, true_mask)
                + mask_bce(out["weight_sum"], true_mask)
                + out["gradient_error"])

    l_x, g_x = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_f, g_f = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l_f), float(l_x), atol=1e-4,
                               rtol=1e-4)
    flat_x = jax.tree_util.tree_flatten_with_path(g_x)[0]
    flat_f = jax.tree.leaves(g_f)
    assert len(flat_x) == len(flat_f)
    for (path, wv), gv in zip(flat_x, flat_f):
        scale = max(1.0, float(jnp.max(jnp.abs(wv))))
        np.testing.assert_allclose(
            np.asarray(gv) / scale, np.asarray(wv) / scale,
            atol=1e-3, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )
