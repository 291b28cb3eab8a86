"""Fully-fused fine pass (ops/fused_fine_full.py): the embedding
forward / reverse-chain / transpose block bodies against jax autodiff,
then the integrated op against the XLA sdf_hand_value_feat_grad path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from honerf_tpu.ops import fused_fine_full as FF
from honerf_tpu.ops.fused_hand import pack_hand_pose

META = FF.FineMeta(v_multires=3, r_multires=2, d_hidden=16, n_layers=5,
                   skip=2, d_out=17, dtype="f32")


def _pose(seed=0):
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints

    joints = jnp.asarray(canonical_hand_joints(0.3))
    bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
    t_pose = jnp.asarray(canonical_hand_joints(0.0))
    rotT, off, cut = pack_hand_pose(bt_inv, t_pose)
    center = np.asarray(joints.mean(0))
    return rotT, off, cut, center


def _pts(center, n, seed=1):
    rng = np.random.default_rng(seed)
    p = (rng.normal(size=(n, 3)) * 0.05 + center).astype(np.float32)
    return jnp.asarray(np.pad(p, ((0, 0), (0, 5))))


def test_emb_fwd_matches_flat_embedding():
    """_emb_fwd_block's e == hand_embedding_flat (channel-major)."""
    from honerf_tpu.models.embedding import hand_embedding_flat
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints

    joints = jnp.asarray(canonical_hand_joints(0.3))
    bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
    t_pose = jnp.asarray(canonical_hand_joints(0.0))
    rotT, off, cut, center = _pose()
    p8 = _pts(center, 16)
    st = FF._emb_fwd_block(p8, rotT, off, cut, META)
    want, _r, _h = hand_embedding_flat(
        p8[:, :3], bt_inv, t_pose, META.v_multires, META.r_multires)
    np.testing.assert_allclose(np.asarray(st["e"]), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_emb_reverse_chain_is_vjp():
    """g from the in-kernel reverse chain == jax.grad of sum(e * u) wrt
    pts — i.e. the chain IS the embedding VJP."""
    rotT, off, cut, center = _pose()
    p8 = _pts(center, 12)
    rng = np.random.default_rng(2)
    u = jnp.asarray(
        rng.normal(size=(12, META.emb_width)).astype(np.float32))

    st = FF._emb_fwd_block(p8, rotT, off, cut, META)
    g8, _chain = FF._emb_rev_block(st, rotT, u, META)

    def e_of_p(p3):
        pp = jnp.pad(p3, ((0, 0), (0, 5)))
        return FF._emb_fwd_block(pp, rotT, off, cut, META)["e"]

    want = jax.grad(lambda p3: jnp.sum(e_of_p(p3) * u))(p8[:, :3])
    np.testing.assert_allclose(np.asarray(g8[:, :3]), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_emb_transposes_match_autodiff():
    """The composed transposes (R-transpose + fwd-transpose) == jax.grad
    of the scalarized (e, g) objective w.r.t. (pts, rotT, off, u) — the
    full second-order embedding backward, hand-derived."""
    rotT, off, cut, center = _pose()
    n = 10
    p8 = _pts(center, n)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(n, META.emb_width)).astype(np.float32))
    de_ct = jnp.asarray(
        rng.normal(size=(n, META.emb_width)).astype(np.float32))
    t8 = jnp.asarray(np.pad(
        rng.normal(size=(n, 3)).astype(np.float32), ((0, 0), (0, 5))))

    def obj(p8_, rotT_, off_, u_):
        st = FF._emb_fwd_block(p8_, rotT_, off_, cut, META)
        g8, _ = FF._emb_rev_block(st, rotT_, u_, META)
        return jnp.sum(st["e"] * de_ct) + jnp.sum(g8 * t8)

    want = jax.grad(obj, argnums=(0, 1, 2, 3))(p8, rotT, off, u)

    # hand-derived composition
    st = FF._emb_fwd_block(p8, rotT, off, cut, META)
    _g8, chain = FF._emb_rev_block(st, rotT, u, META)
    du, adj, drotT_direct = FF._emb_rev_transpose_block(
        st, chain, rotT, u, t8, META)
    dq = FF._emb_fwd_transpose_block(st, de_ct, adj, cut, META)
    dp = jnp.dot(dq, rotT.T)
    drotT = drotT_direct + jnp.dot(p8.T, dq)
    doff = jnp.sum(dq, axis=0, keepdims=True)

    np.testing.assert_allclose(np.asarray(dp), np.asarray(want[0]),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(drotT), np.asarray(want[1]),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(doff), np.asarray(want[2]),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(du), np.asarray(want[3]),
                               atol=2e-3, rtol=2e-3)


SMETA = META._replace(layout="slot", with_color=True)


def test_slot_emb_fwd_matches_flat_embedding():
    """Slot-layout e, un-permuted via slot_channel_map, equals
    hand_embedding_flat — and slot-pad lanes are exactly zero."""
    from honerf_tpu.models.embedding import hand_embedding_flat
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints

    joints = jnp.asarray(canonical_hand_joints(0.3))
    bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
    t_pose = jnp.asarray(canonical_hand_joints(0.0))
    rotT, off, cut, center = _pose()
    p8 = _pts(center, 16)
    st = FF._emb_fwd_block_slots(p8, rotT, off, cut, SMETA)
    assert st["e"].shape[1] == SMETA.e_kernel_width
    cmap = FF.slot_channel_map(SMETA)
    want, _r, _h = hand_embedding_flat(
        p8[:, :3], bt_inv, t_pose, SMETA.v_multires, SMETA.r_multires)
    e = np.asarray(st["e"])
    np.testing.assert_allclose(e[:, cmap >= 0][:, np.argsort(cmap[cmap >= 0])],
                               np.asarray(want), atol=2e-5, rtol=2e-5)
    np.testing.assert_array_equal(e[:, cmap < 0], 0.0)


def test_slot_emb_reverse_chain_is_vjp():
    """Slot-layout reverse chain g == jax.grad of sum(e_slot * u_slot)
    w.r.t. pts (u given in slot layout)."""
    rotT, off, cut, center = _pose()
    p8 = _pts(center, 12)
    rng = np.random.default_rng(2)
    cmap = FF.slot_channel_map(SMETA)
    u = jnp.asarray(rng.normal(
        size=(12, SMETA.e_kernel_width)).astype(np.float32))
    u = u * jnp.asarray((cmap >= 0).astype(np.float32))  # pads carry 0

    st = FF._emb_fwd_block_slots(p8, rotT, off, cut, SMETA)
    g8, _chain = FF._emb_rev_block_slots(st, rotT, u, SMETA)

    def e_of_p(p3):
        pp = jnp.pad(p3, ((0, 0), (0, 5)))
        return FF._emb_fwd_block_slots(pp, rotT, off, cut, SMETA)["e"]

    want = jax.grad(lambda p3: jnp.sum(e_of_p(p3) * u))(p8[:, :3])
    np.testing.assert_allclose(np.asarray(g8[:, :3]), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_slot_emb_transposes_match_autodiff():
    """Slot-layout composed transposes == jax.grad of the scalarized
    (e, g) objective w.r.t. (pts, rotT, off, u) — the full second-order
    embedding backward in the slot layout."""
    rotT, off, cut, center = _pose()
    n = 10
    p8 = _pts(center, n)
    rng = np.random.default_rng(3)
    cmap = FF.slot_channel_map(SMETA)
    live = jnp.asarray((cmap >= 0).astype(np.float32))
    u = jnp.asarray(rng.normal(
        size=(n, SMETA.e_kernel_width)).astype(np.float32)) * live
    de_ct = jnp.asarray(rng.normal(
        size=(n, SMETA.e_kernel_width)).astype(np.float32)) * live
    t8 = jnp.asarray(np.pad(
        rng.normal(size=(n, 3)).astype(np.float32), ((0, 0), (0, 5))))

    def obj(p8_, rotT_, off_, u_):
        st = FF._emb_fwd_block_slots(p8_, rotT_, off_, cut, SMETA)
        g8, _ = FF._emb_rev_block_slots(st, rotT_, u_, SMETA)
        return jnp.sum(st["e"] * de_ct) + jnp.sum(g8 * t8)

    want = jax.grad(obj, argnums=(0, 1, 2, 3))(p8, rotT, off, u)

    st = FF._emb_fwd_block_slots(p8, rotT, off, cut, SMETA)
    _g8, chain = FF._emb_rev_block_slots(st, rotT, u, SMETA)
    du, adj, drotT_direct = FF._emb_rev_transpose_block_slots(
        st, chain, rotT, u, t8, SMETA)
    dq = FF._emb_fwd_transpose_block_slots(st, de_ct, adj, cut, SMETA)
    dp = jnp.dot(dq, rotT.T)
    drotT = drotT_direct + jnp.dot(p8.T, dq)
    doff = jnp.sum(dq, axis=0, keepdims=True)

    np.testing.assert_allclose(np.asarray(dp), np.asarray(want[0]),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(drotT), np.asarray(want[1]),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(doff), np.asarray(want[2]),
                               atol=2e-3, rtol=2e-3)
    # du at live lanes only (pads receive arbitrary-but-unused values
    # multiplied into zero weight rows; autodiff sees the masked u)
    np.testing.assert_allclose(np.asarray(du * live),
                               np.asarray(want[3] * live),
                               atol=2e-3, rtol=2e-3)


SDF_CFG_SMALL = dict(kind="hand", n_layers=3, d_hidden=64, d_out=65,
                     skip_in=(2,), v_multires=3, r_multires=2)


def _small_net():
    from honerf_tpu.models import SDFConfig, init_sdf_params

    cfg = SDFConfig(**SDF_CFG_SMALL)
    params = init_sdf_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_integrated_fwd_matches_xla():
    """hand_fine_full (interpret) == sdf_hand_value_feat_grad (XLA flat)
    for sdf, features, embedding, AND the spatial gradient."""
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints
    from honerf_tpu.models.fields import (
        sdf_hand_value_feat_grad,
        sdf_hand_value_feat_grad_full,
    )

    cfg, params = _small_net()
    joints = jnp.asarray(canonical_hand_joints(0.3))
    bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
    t_pose = jnp.asarray(canonical_hand_joints(0.0))
    rng = np.random.default_rng(5)
    center = np.asarray(joints.mean(0))
    pts = jnp.asarray(
        (rng.normal(size=(50, 3)) * 0.05 + center).astype(np.float32))

    sdf_x, feat_x, e_x, _r, _h, g_x = sdf_hand_value_feat_grad(
        params, cfg, pts, bt_inv, t_pose)
    sdf_f, feat_f, e_f, _rn, _hn, g_f = sdf_hand_value_feat_grad_full(
        params, cfg, pts, bt_inv, t_pose, block=32, interpret=True)
    np.testing.assert_allclose(np.asarray(sdf_f), np.asarray(sdf_x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(feat_f), np.asarray(feat_x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(e_f), np.asarray(e_x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               atol=1e-3, rtol=1e-3)


def test_integrated_render_loss_grad_parity():
    """Full offline-hand render loss (color + mask + eikonal, grad-of-
    grad eikonal path) differentiated w.r.t. ALL params AND the pose
    (se3-style joint perturbation through bt_inv) via the fully-fused
    op vs the XLA path — <=1e-3 (the VERDICT r2 #1 done-criterion for
    the fully-fused design)."""
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints
    from honerf_tpu.models import (
        ColorConfig,
        init_color_params,
        init_variance_params,
    )
    from honerf_tpu.render import RenderConfig, render_single
    from honerf_tpu.render.losses import mask_bce, masked_l1_color
    from honerf_tpu.render.neus import make_hand_field

    sdf_cfg, sdf_params = _small_net()
    color_cfg = ColorConfig(kind="hand", d_feature=64, d_hidden=64,
                            n_layers=2, v_multires=3, r_multires=2)
    params = {
        "sdf": sdf_params,
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
    }
    joints0 = jnp.asarray(canonical_hand_joints(0.3))
    t_pose = jnp.asarray(canonical_hand_joints(0.0))
    rng = np.random.default_rng(0)
    n_rays = 8
    center = np.asarray(joints0.mean(0))
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

    def loss(p, djoints, fused):
        joints = joints0 + djoints  # pose-gradient path through HALO
        bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
        field = make_hand_field(
            p, sdf_cfg, color_cfg, bt_inv, t_pose,
            fused_fine=fused, interpret=True,
        )
        out = render_single(field, rcfg, jax.random.PRNGKey(0),
                            rays_o, rays_d, 0.4, 1.5)
        return (masked_l1_color(out["color_fine"], true_rgb, true_mask)
                + mask_bce(out["weight_sum"], true_mask)
                + out["gradient_error"])

    dj0 = jnp.zeros_like(joints0)
    l_x, (gp_x, gj_x) = jax.value_and_grad(
        lambda p, dj: loss(p, dj, False), argnums=(0, 1))(params, dj0)
    l_f, (gp_f, gj_f) = jax.value_and_grad(
        lambda p, dj: loss(p, dj, "full_nocolor"), argnums=(0, 1))(params, dj0)
    np.testing.assert_allclose(float(l_f), float(l_x), atol=1e-4,
                               rtol=1e-4)
    flat_x = jax.tree_util.tree_flatten_with_path(gp_x)[0]
    flat_f = jax.tree.leaves(gp_f)
    for (path, wv), gv in zip(flat_x, flat_f):
        scale = max(1.0, float(jnp.max(jnp.abs(wv))))
        np.testing.assert_allclose(
            np.asarray(gv) / scale, np.asarray(wv) / scale,
            atol=1e-3, rtol=1e-3, err_msg=jax.tree_util.keystr(path),
        )
    # pose gradient (the HALO/se3 path through the embedding operands)
    scale = max(1.0, float(jnp.max(jnp.abs(gj_x))))
    np.testing.assert_allclose(
        np.asarray(gj_f) / scale, np.asarray(gj_x) / scale,
        atol=1e-3, rtol=1e-3,
    )


@pytest.mark.parametrize("layout", ["piece", "slot"])
def test_frozen_color_pose_grads(layout, monkeypatch):
    """The 'full_frozen' (want_dw=False) kernel variant: POSE gradients
    identical to 'full' while the net-param cotangents come back as
    exact zeros (the fit-stage contract — nets are frozen there);
    HONERF_DEBUG_FROZEN_NAN=1 NaN-poisons them instead so accidental
    weight differentiation in frozen mode fails loudly (ADVICE r3)."""
    monkeypatch.setenv("HONERF_FINE_LAYOUT", layout)
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints
    from honerf_tpu.models import (
        ColorConfig,
        init_color_params,
        init_variance_params,
    )
    from honerf_tpu.render import RenderConfig, render_single
    from honerf_tpu.render.losses import mask_bce, masked_l1_color
    from honerf_tpu.render.neus import make_hand_field

    sdf_cfg, sdf_params = _small_net()
    color_cfg = ColorConfig(kind="hand", d_feature=64, d_hidden=64,
                            n_layers=2, v_multires=3, r_multires=2)
    params = {
        "sdf": sdf_params,
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
    }
    joints0 = jnp.asarray(canonical_hand_joints(0.3))
    t_pose = jnp.asarray(canonical_hand_joints(0.0))
    rng = np.random.default_rng(0)
    n_rays = 6
    center = np.asarray(joints0.mean(0))
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

    def loss(djoints, fused):
        joints = joints0 + djoints  # only POSE is differentiated
        bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
        field = make_hand_field(
            params, sdf_cfg, color_cfg, bt_inv, t_pose,
            fused_fine=fused, interpret=True,
        )
        out = render_single(field, rcfg, jax.random.PRNGKey(0),
                            rays_o, rays_d, 0.4, 1.5)
        return (masked_l1_color(out["color_fine"], true_rgb, true_mask)
                + mask_bce(out["weight_sum"], true_mask)
                + out["gradient_error"])

    dj0 = jnp.zeros_like(joints0)
    l_full, gj_full = jax.value_and_grad(
        lambda dj: loss(dj, "full"))(dj0)
    l_froz, gj_froz = jax.value_and_grad(
        lambda dj: loss(dj, "full_frozen"))(dj0)
    # forward identical (same fwd kernel)
    np.testing.assert_allclose(float(l_froz), float(l_full), atol=1e-6,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gj_froz), np.asarray(gj_full),
                               atol=1e-5, rtol=1e-5)

    # the frozen contract: weight cotangents from the op are zeros
    from honerf_tpu.ops import fused_fine_full as FFF
    meta = FFF.FineMeta(v_multires=3, r_multires=2, d_hidden=64,
                        n_layers=len(sdf_cfg.dims) - 1, skip=2, d_out=65,
                        dtype="f32", want_dw=False)
    from honerf_tpu.models.fields import _fine_trunk_weights
    from honerf_tpu.ops.fused_hand import pack_hand_pose
    bt_inv = bone_transforms_from_mano_joints(joints0[None])[0]
    rotT, off, _ = pack_hand_pose(bt_inv, t_pose)
    ws, bs = _fine_trunk_weights(params["sdf"], sdf_cfg)
    pts = jnp.asarray(
        (rng.normal(size=(16, 3)) * 0.05 + center).astype(np.float32))

    def wloss(ws_):
        out, g, e = FFF.hand_fine_full(pts, rotT, off, ws_, bs, meta,
                                       16, True)
        return jnp.sum(out) + jnp.sum(g) + jnp.sum(e)

    gws = jax.grad(wloss)(ws)
    for gw in jax.tree.leaves(gws):
        assert float(jnp.max(jnp.abs(gw))) == 0.0

    # debug build: the zero cotangents become NaN poison (ADVICE r3)
    monkeypatch.setenv("HONERF_DEBUG_FROZEN_NAN", "1")
    gws_nan = jax.grad(wloss)(ws)
    for gw in jax.tree.leaves(gws_nan):
        assert np.isnan(np.asarray(gw)).all()


@pytest.mark.parametrize("layout", ["piece", "slot"])
def test_color_fused_fwd_matches_xla(layout):
    """hand_fine_color_apply (interpret) == XLA full_fn (sdf, grad,
    color) on the small architecture — both embedding lane layouts."""
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints
    from honerf_tpu.models import (
        ColorConfig,
        init_color_params,
        init_variance_params,
    )
    from honerf_tpu.models.fields import hand_fine_color_apply
    from honerf_tpu.render.neus import make_hand_field

    sdf_cfg, sdf_params = _small_net()
    color_cfg = ColorConfig(kind="hand", d_feature=64, d_hidden=64,
                            n_layers=2, v_multires=3, r_multires=2)
    params = {
        "sdf": sdf_params,
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
    }
    joints = jnp.asarray(canonical_hand_joints(0.3))
    bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
    t_pose = jnp.asarray(canonical_hand_joints(0.0))
    rng = np.random.default_rng(6)
    center = np.asarray(joints.mean(0))
    pts = jnp.asarray(
        (rng.normal(size=(40, 3)) * 0.05 + center).astype(np.float32))
    dirs = jnp.zeros_like(pts)

    field_x = make_hand_field(params, sdf_cfg, color_cfg, bt_inv, t_pose)
    sdf_x, g_x, c_x = field_x.full_fn(pts, dirs)
    sdf_f, g_f, c_f = hand_fine_color_apply(
        params, sdf_cfg, color_cfg, pts, bt_inv, t_pose, block=32,
        interpret=True, layout=layout)
    np.testing.assert_allclose(np.asarray(sdf_f), np.asarray(sdf_x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_x),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("layout", ["piece", "slot"])
def test_color_fused_render_loss_grad_parity(layout, monkeypatch):
    """Render-loss gradients (params + pose) through the COLOR-fused op
    == XLA at <=1e-3 — the production 'full' mode's correctness gate,
    in both embedding lane layouts."""
    monkeypatch.setenv("HONERF_FINE_LAYOUT", layout)
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints
    from honerf_tpu.models import (
        ColorConfig,
        init_color_params,
        init_variance_params,
    )
    from honerf_tpu.render import RenderConfig, render_single
    from honerf_tpu.render.losses import mask_bce, masked_l1_color
    from honerf_tpu.render.neus import make_hand_field

    sdf_cfg, sdf_params = _small_net()
    color_cfg = ColorConfig(kind="hand", d_feature=64, d_hidden=64,
                            n_layers=2, v_multires=3, r_multires=2)
    params = {
        "sdf": sdf_params,
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
    }
    joints0 = jnp.asarray(canonical_hand_joints(0.3))
    t_pose = jnp.asarray(canonical_hand_joints(0.0))
    rng = np.random.default_rng(0)
    n_rays = 8
    center = np.asarray(joints0.mean(0))
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

    def loss(p, djoints, fused):
        joints = joints0 + djoints
        bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
        field = make_hand_field(
            p, sdf_cfg, color_cfg, bt_inv, t_pose,
            fused_fine=fused, interpret=True,
        )
        out = render_single(field, rcfg, jax.random.PRNGKey(0),
                            rays_o, rays_d, 0.4, 1.5)
        return (masked_l1_color(out["color_fine"], true_rgb, true_mask)
                + mask_bce(out["weight_sum"], true_mask)
                + out["gradient_error"])

    dj0 = jnp.zeros_like(joints0)
    l_x, (gp_x, gj_x) = jax.value_and_grad(
        lambda p, dj: loss(p, dj, False), argnums=(0, 1))(params, dj0)
    l_f, (gp_f, gj_f) = jax.value_and_grad(
        lambda p, dj: loss(p, dj, "full"), argnums=(0, 1))(params, dj0)
    np.testing.assert_allclose(float(l_f), float(l_x), atol=1e-4,
                               rtol=1e-4)
    flat_x = jax.tree_util.tree_flatten_with_path(gp_x)[0]
    flat_f = jax.tree.leaves(gp_f)
    assert len(flat_x) == len(flat_f)
    for (path, wv), gv in zip(flat_x, flat_f):
        scale = max(1.0, float(jnp.max(jnp.abs(wv))))
        np.testing.assert_allclose(
            np.asarray(gv) / scale, np.asarray(wv) / scale,
            atol=1e-3, rtol=1e-3, err_msg=jax.tree_util.keystr(path),
        )
    scale = max(1.0, float(jnp.max(jnp.abs(gj_x))))
    np.testing.assert_allclose(
        np.asarray(gj_f) / scale, np.asarray(gj_x) / scale,
        atol=1e-3, rtol=1e-3,
    )


def test_dw_scratch_placement_bit_exact(monkeypatch):
    """_DW_PLACE='scratch' (VMEM-scratch dW accumulators, outputs written
    at the last grid step) produces BIT-identical gradients to the
    production 'out' placement — same adds in the same order (round-5
    ablation record; BENCH_NOTES dW decomposition)."""
    import honerf_tpu.ops.fused_fine_full as FFF
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints
    from honerf_tpu.models import (
        ColorConfig,
        init_color_params,
        init_variance_params,
    )
    from honerf_tpu.models.fields import hand_fine_color_apply

    sdf_cfg, sdf_params = _small_net()
    color_cfg = ColorConfig(kind="hand", d_feature=64, d_hidden=64,
                            n_layers=2, v_multires=3, r_multires=2)
    params = {
        "sdf": sdf_params,
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
    }
    joints = jnp.asarray(canonical_hand_joints(0.3))
    bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
    t_pose = jnp.asarray(canonical_hand_joints(0.0))
    rng = np.random.default_rng(9)
    center = np.asarray(joints.mean(0))
    pts = jnp.asarray(
        (rng.normal(size=(64, 3)) * 0.05 + center).astype(np.float32))
    tg = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    tc = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))

    def loss(p):
        sdf, g, c = hand_fine_color_apply(
            p, sdf_cfg, color_cfg, pts, bt_inv, t_pose, block=32,
            interpret=True, layout="piece")
        return jnp.sum(sdf) * 0.3 + jnp.sum(g * tg) + jnp.sum(c * tc)

    g_out = jax.grad(loss)(params)
    assert FFF._DW_PLACE == "out"  # production default
    monkeypatch.setattr(FFF, "_DW_PLACE", "scratch")
    # jax's jit cache keys on the underlying fn — _bwd_call is a
    # module-level jit, so without clearing, the 'scratch' call would
    # silently reuse the 'out' executable and this test would compare
    # an executable to itself (the round-5 ablation bug)
    jax.clear_caches()
    g_scratch = jax.grad(loss)(params)
    for a, b in zip(jax.tree.leaves(g_out), jax.tree.leaves(g_scratch)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dw_staged_bf16_accumulation(monkeypatch):
    """_DW_STAGE=S (bf16 staged dW accumulators): point/pose gradients
    BIT-identical to production; weight gradients within the staged
    rounding budget (~1% — each stage partial carries bf16 rounding on
    top of the bf16-matmul noise already in its inputs)."""
    import honerf_tpu.ops.fused_fine_full as FFF
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints
    from honerf_tpu.models import ColorConfig, init_color_params
    from honerf_tpu.models.fields import hand_fine_color_apply

    sdf_cfg, sdf_params = _small_net()
    sdf_cfg = sdf_cfg._replace(trunk_dtype="bf16")
    color_cfg = ColorConfig(kind="hand", d_feature=64, d_hidden=64,
                            n_layers=2, v_multires=3, r_multires=2,
                            trunk_dtype="bf16")
    params = {
        "sdf": sdf_params,
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
    }
    joints = jnp.asarray(canonical_hand_joints(0.3))
    bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
    t_pose = jnp.asarray(canonical_hand_joints(0.0))
    rng = np.random.default_rng(13)
    center = np.asarray(joints.mean(0))
    pts0 = (rng.normal(size=(96, 3)) * 0.05 + center).astype(np.float32)
    tg = jnp.asarray(rng.normal(size=(96, 3)).astype(np.float32))
    tc = jnp.asarray(rng.normal(size=(96, 3)).astype(np.float32))

    def loss(p, pts):
        sdf, g, c = hand_fine_color_apply(
            p, sdf_cfg, color_cfg, pts, bt_inv, t_pose, block=32,
            interpret=True, layout="piece")
        return jnp.sum(sdf) * 0.3 + jnp.sum(g * tg) + jnp.sum(c * tc)

    gp_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(params,
                                                    jnp.asarray(pts0))
    assert FFF._DW_STAGE == 0  # production default
    monkeypatch.setattr(FFF, "_DW_STAGE", 2)  # 96/32 = 3 steps: 2 stages
    jax.clear_caches()
    gp_st, gx_st = jax.grad(loss, argnums=(0, 1))(params,
                                                  jnp.asarray(pts0))
    # point gradients don't touch the dW path: bit-identical
    np.testing.assert_array_equal(np.asarray(gx_st), np.asarray(gx_ref))
    changed = 0
    for a, b in zip(jax.tree.leaves(gp_ref), jax.tree.leaves(gp_st)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-6)
        # the tiny test net amplifies relative error (few elements,
        # partial-sum cancellation); at the production architecture the
        # same check measures ~0.5% (BENCH_NOTES round-5 staged-dW).
        # The end-to-end guards are the TPU pose-quality gates.
        np.testing.assert_allclose(b / scale, a / scale, atol=8e-2)
        changed += int(not np.array_equal(a, b))
    assert changed > 0  # the staged path actually engaged


def test_fwd_block_policy(monkeypatch):
    """The forward kernel's grid block maps default-128 to 256 on
    hardware (no dW accumulators forward — measured faster, BENCH_NOTES
    round-5 block sweep), honors explicit non-default blocks and
    interpret mode, and obeys HONERF_FINE_FWD_BLOCK."""
    import honerf_tpu.ops.fused_fine_full as FFF

    monkeypatch.delenv("HONERF_FINE_FWD_BLOCK", raising=False)
    assert FFF._fwd_block(128, interpret=False) == 256
    assert FFF._fwd_block(128, interpret=True) == 128  # CPU tests as-is
    assert FFF._fwd_block(32, interpret=False) == 32   # explicit wins
    assert FFF._fwd_block(512, interpret=False) == 512
    monkeypatch.setenv("HONERF_FINE_FWD_BLOCK", "128")
    assert FFF._fwd_block(128, interpret=False) == 128
    monkeypatch.setenv("HONERF_FINE_FWD_BLOCK", "0")  # disable the remap
    assert FFF._fwd_block(128, interpret=False) == 128
    assert FFF._fwd_block(64, interpret=False) == 64
    monkeypatch.setenv("HONERF_FINE_FWD_BLOCK", "banana")
    with pytest.raises(ValueError, match="HONERF_FINE_FWD_BLOCK"):
        FFF._fwd_block(128, interpret=False)


def _stash_fixture():
    from honerf_tpu.data.synthetic import canonical_hand_joints
    from honerf_tpu.hand import bone_transforms_from_mano_joints
    from honerf_tpu.models import (
        ColorConfig,
        init_color_params,
    )

    sdf_cfg, sdf_params = _small_net()
    color_cfg = ColorConfig(kind="hand", d_feature=64, d_hidden=64,
                            n_layers=2, v_multires=3, r_multires=2)
    params = {
        "sdf": sdf_params,
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
    }
    joints = jnp.asarray(canonical_hand_joints(0.3))
    bt_inv = bone_transforms_from_mano_joints(joints[None])[0]
    t_pose = jnp.asarray(canonical_hand_joints(0.0))
    rng = np.random.default_rng(11)
    center = np.asarray(joints.mean(0))
    pts = jnp.asarray(
        (rng.normal(size=(40, 3)) * 0.05 + center).astype(np.float32))
    wmix = (
        jnp.asarray(rng.normal(size=(40,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32)),
    )
    return sdf_cfg, color_cfg, params, bt_inv, t_pose, pts, wmix


def _color_op_operands(sdf_cfg, color_cfg, params, bt_inv, t_pose,
                       layout, frozen, dtype):
    """Replicates hand_fine_color_apply's operand construction so the
    block bodies can be driven directly (pure jnp, outside pallas)."""
    from honerf_tpu.models.fields import (
        _cm_index,
        _fine_trunk_weights,
        _gather_cols,
        hand_embedding_width,
        linear_weight,
    )
    from honerf_tpu.ops.fused_hand import pack_hand_pose

    rotT, off, _ = pack_hand_pose(bt_inv, t_pose)
    ws, bs = _fine_trunk_weights(params["sdf"], sdf_cfg)
    meta = FF.FineMeta(
        v_multires=sdf_cfg.v_multires, r_multires=sdf_cfg.r_multires,
        d_hidden=sdf_cfg.d_hidden, n_layers=len(sdf_cfg.dims) - 1,
        skip=sdf_cfg.skip_in[0], d_out=sdf_cfg.d_out, dtype=dtype,
        with_color=True, c_hidden=color_cfg.d_hidden,
        c_layers=len(color_cfg.dims) - 1,
        grad_L=color_cfg.grad_multires, want_dw=not frozen,
        layout=layout, stash=True)
    clayers = list(params["color"]["layers"])
    clayers[0] = _gather_cols(
        clayers[0],
        _cm_index(sdf_cfg.v_multires, sdf_cfg.r_multires, 0,
                  color_cfg.input_width
                  - hand_embedding_width(sdf_cfg.v_multires,
                                         sdf_cfg.r_multires)))
    W0 = linear_weight(clayers[0]).T
    rows = FF.color_row_map(meta)
    W0e = jnp.concatenate(
        [W0, jnp.zeros((1, W0.shape[1]), W0.dtype)], axis=0)
    idx = jnp.asarray(np.where(rows < 0, W0.shape[0], rows))
    cws = (W0e[idx],) + tuple(linear_weight(l).T for l in clayers[1:])
    cbs = tuple(l["b"] for l in clayers)
    from honerf_tpu.ops import fused_fine as FT
    if layout == "slot":
        wps, bps = FF._pad_weights_slots(ws, bs, meta)
    else:
        wps, bps = FT._pad_weights(ws, bs, meta.trunk_meta)
    cwps, cbps = FF._pad_color_weights(cws, cbs, meta)
    from honerf_tpu.models.embedding import BONE_CUTOFFS
    cut = jnp.pad(BONE_CUTOFFS,
                  (0, 128 - 21))[None, :].astype(jnp.float32)
    return meta, rotT.astype(jnp.float32), off.astype(jnp.float32), \
        cut, wps, bps, cwps, cbps


@pytest.mark.parametrize("layout", ["piece", "slot"])
@pytest.mark.parametrize("dtype", ["f32", "bf16"])
@pytest.mark.parametrize("frozen", [False, True])
def test_stash_block_body_bit_exact(layout, dtype, frozen):
    """The MATH of the round-5 streamed-residual backward is an exact
    rewrite: on one block, _fine_bwd_block(stash=_build_stash(fwd)) is
    BIT-IDENTICAL to the rematerializing _fine_bwd_block() — every
    stashed value is either the f32 intermediate itself (ss, cs, u,
    sigmoid) or an activation in its in-kernel cast dtype that only
    feeds matmul operands.  Includes zero-padded tail rows (the fwd-
    block-padding case the integrated op hits at N % block != 0).
    The integrated-op check lives in test_stash_integrated_grads —
    there the two pallas programs may differ by compiler scheduling
    rounding (~1e-7), which this block-level pin excludes by running
    both paths as plain jnp."""
    sdf_cfg, color_cfg, params, bt_inv, t_pose, pts, _ = \
        _stash_fixture()
    meta, rotT, off, cut, wps, bps, cwps, cbps = _color_op_operands(
        sdf_cfg, color_cfg, params, bt_inv, t_pose, layout, frozen,
        dtype)
    # 8 real rows + 24 zero-pad rows (cotangents zero there)
    p8 = jnp.pad(pts[:8].astype(jnp.float32), ((0, 24), (0, 5)))
    rng = np.random.default_rng(3)
    OUTp = 128
    dout = jnp.pad(jnp.asarray(rng.normal(size=(8, 1)).astype(np.float32)),
                   ((0, 24), (0, OUTp - 1)))
    dg8 = jnp.pad(jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32)),
                  ((0, 24), (0, 5)))
    dthird = jnp.pad(
        jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32)),
        ((0, 24), (0, 125)))
    res = FF._fine_fwd_block(meta, p8, rotT, off, cut, list(wps),
                             list(bps), list(cwps), list(cbps),
                             with_residuals=True)
    stash = FF._build_stash(meta, res)
    for (name, w, d), arr in zip(meta.stash_specs(), stash):
        assert arr.shape[1] == w, name
        assert arr.dtype == FF._stash_dtype(meta, d), name
    args = (meta, p8, rotT, off, cut, list(wps), list(bps), dout, dg8,
            dthird, list(cwps), list(cbps))
    r_ref = FF._fine_bwd_block(*args)
    r_st = FF._fine_bwd_block(*args, stash=stash)
    for a, b in zip(jax.tree.leaves(r_ref), jax.tree.leaves(r_st)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("layout", ["piece", "slot"])
@pytest.mark.parametrize("frozen", [False, True])
def test_stash_integrated_grads(layout, frozen):
    """End-to-end through the custom VJP: stash=True == recompute for
    params+pose grads ('full') / pose grads (frozen) up to compiler
    scheduling rounding — the two backward PROGRAMS are different
    kernels, so XLA may reassociate f32 chains differently (measured
    <=5e-7 relative); the exact-math identity is pinned block-level by
    test_stash_block_body_bit_exact."""
    from honerf_tpu.models.fields import hand_fine_color_apply

    sdf_cfg, color_cfg, params, bt_inv, t_pose, pts, wmix = \
        _stash_fixture()
    w1, w3, wc = wmix

    def loss(p, bt, stash):
        sdf, g, c = hand_fine_color_apply(
            p, sdf_cfg, color_cfg, pts, bt, t_pose, block=32,
            interpret=True, layout=layout, frozen=frozen, stash=stash)
        return (jnp.sum(sdf * w1) + jnp.sum(g * w3) + jnp.sum(c * wc))

    argnums = (1,) if frozen else (0, 1)
    l_r, g_r = jax.value_and_grad(
        lambda p, bt: loss(p, bt, False), argnums=argnums)(params, bt_inv)
    l_s, g_s = jax.value_and_grad(
        lambda p, bt: loss(p, bt, True), argnums=argnums)(params, bt_inv)
    np.testing.assert_allclose(float(l_s), float(l_r), rtol=1e-6)
    leaves_r = jax.tree.leaves(g_r)
    leaves_s = jax.tree.leaves(g_s)
    assert len(leaves_r) == len(leaves_s)
    for a, b in zip(leaves_r, leaves_s):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5,
                                   rtol=1e-5)


def test_stash_integrated_grads_bf16():
    """Same end-to-end check in the production bf16 trunk mode (piece
    layout): the stash adds NO bf16-level noise — the observed delta
    stays at f32 compiler-rounding scale (~1e-7), far below the op's
    own bf16 matmul noise (~2e-3)."""
    from honerf_tpu.models.fields import hand_fine_color_apply

    sdf_cfg, color_cfg, params, bt_inv, t_pose, pts, wmix = \
        _stash_fixture()
    sdf_cfg = sdf_cfg._replace(trunk_dtype="bf16")
    w1, w3, wc = wmix

    def loss(p, bt, stash):
        sdf, g, c = hand_fine_color_apply(
            p, sdf_cfg, color_cfg, pts, bt, t_pose, block=32,
            interpret=True, layout="piece", stash=stash)
        return (jnp.sum(sdf * w1) + jnp.sum(g * w3) + jnp.sum(c * wc))

    l_r, g_r = jax.value_and_grad(
        lambda p, bt: loss(p, bt, False), argnums=(0, 1))(params, bt_inv)
    l_s, g_s = jax.value_and_grad(
        lambda p, bt: loss(p, bt, True), argnums=(0, 1))(params, bt_inv)
    np.testing.assert_allclose(float(l_s), float(l_r), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_s)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5,
                                   rtol=1e-5)
