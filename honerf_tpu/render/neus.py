"""Single-volume NeuS renderer as one jittable pure function.

Replaces the reference `NeuSRenderer` (utils/renderer.py:39-284).  Design
(SURVEY.md §7 step 3): fixed shapes end-to-end (64 coarse + 4x16 importance
= 128 fine samples), one compiled XLA program containing the no-grad
up-sampling phase and the differentiable fine pass; SDF spatial gradients
come from a single vjp instead of autograd double-backprop.

Numeric parity quirks preserved (SURVEY.md §2.4):
  * transmittance cumprod seeded with prev_cdf[:, :1] — NOT ones — in the
    offline renderer (utils/renderer.py:163); `cumprod_seed='ones'` gives
    the standard NeuS behavior used by the dual fitting renderer.
  * alpha = clip((p + 1e-5)/(c + 1e-5), 0, 1) (utils/renderer.py:161).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp

from honerf_tpu.models.fields import (
    ColorConfig,
    SDFConfig,
    color_hand_apply,
    color_obj_apply,
    sdf_hand_apply,
    sdf_hand_value_feat_grad,
    sdf_hand_value_feat_grad_fused,
    sdf_obj_apply,
    sdf_obj_value_feat_grad,
    variance_apply,
)
from honerf_tpu.render.sampling import hierarchical_z_vals


class RenderConfig(NamedTuple):
    """Static renderer hyperparameters (`model.neus_renderer` conf section)."""

    n_samples: int = 64
    n_importance: int = 64
    n_outside: int = 0
    up_sample_steps: int = 4
    perturb: float = 1.0

    @classmethod
    def from_conf(cls, conf: Dict[str, Any]) -> "RenderConfig":
        return cls(
            n_samples=int(conf.get("n_samples", 64)),
            n_importance=int(conf.get("n_importance", 64)),
            n_outside=int(conf.get("n_outside", 0)),
            up_sample_steps=int(conf.get("up_sample_steps", 4)),
            perturb=float(conf.get("perturb", 1.0)),
        )


class Field(NamedTuple):
    """A renderable SDF field: closures over params + pose conditioning.

    sdf_fn:  (N, 3) -> (N,) signed distances.
    full_fn: (N, 3) pts, (N, 3) dirs -> (sdf (N,), grad (N, 3), color (N, 3)).
    inv_s:   scalar deviation (exp(10 * variance)).
    """

    sdf_fn: Callable
    full_fn: Callable
    inv_s: jnp.ndarray


def make_obj_field(
    params: Dict[str, Any], sdf_cfg: SDFConfig, color_cfg: ColorConfig
) -> Field:
    """Object field in its local frame (rays must be pre-transformed by
    `rays_to_object_frame`)."""

    def sdf_fn(pts):
        return sdf_obj_apply(params["sdf"], sdf_cfg, pts)[..., 0]

    def full_fn(pts, dirs):
        sdf, feat, grad = sdf_obj_value_feat_grad(params["sdf"], sdf_cfg, pts)
        color = color_obj_apply(params["color"], color_cfg, pts, dirs, feat, grad)
        return sdf[..., 0], grad, color

    return Field(sdf_fn, full_fn, variance_apply(params["variance"]))


def make_hand_field(
    params: Dict[str, Any],
    sdf_cfg: SDFConfig,
    color_cfg: ColorConfig,
    bt_inv: jnp.ndarray,
    t_pose_21: jnp.ndarray,
    fused_ladder: bool = False,
    fused_fine: bool = False,
    interpret: bool = False,
) -> Field:
    """Pose-conditioned hand field (bt_inv: (21,4,4) inverse bone
    transforms, t_pose_21: (21,3)).

    fused_ladder=True serves sdf_fn from the Pallas fused kernel
    (ops/fused_hand.py, ~3.9x the XLA path on TPU; bf16 weights) — valid
    because sdf_fn feeds only the non-differentiable up-sample ladder
    (sampling.hierarchical_z_vals ends in stop_gradient).  The contract
    is ENFORCED in code (VERDICT r2 #4): requesting it on an unsupported
    backend/mesh raises at build time (ops.fused_hand.
    assert_fused_ladder_ok) and placing it under vmap raises at trace
    time (the batched fit step must use the XLA ladder)."""

    if fused_ladder:
        from honerf_tpu.ops.fused_hand import (
            FusedHandSDF,
            assert_fused_ladder_ok,
        )

        assert_fused_ladder_ok(interpret)
        fused = FusedHandSDF(params["sdf"], sdf_cfg, interpret=interpret)

        def sdf_fn(pts):
            return fused(pts, bt_inv, t_pose_21)

    else:
        # Forward-only evals (up-sample ladder, grid extraction) run
        # fastest in XLA with the bone-major build — it fuses the whole
        # embedding into the first matmul's operand read.  The flat
        # channel-major build wins on the grad paths (full_fn / eikonal)
        # instead; measured on v5e: fwd 19.7 vs 32.7 ms, fwd+bwd 7.4 vs
        # 16.4 ms per 131k pts.
        fwd_cfg = sdf_cfg._replace(flat_embedding=False)

        def sdf_fn(pts):
            out, _, _, _ = sdf_hand_apply(
                params["sdf"], fwd_cfg, pts, bt_inv, t_pose_21
            )
            return out[..., 0]

    if fused_fine:
        # Differentiable decomposed fine pass.  fused_fine='xla' uses
        # the explicit-chain XLA lowering (fused_fine.py — no Pallas,
        # runs anywhere); 'pallas' the custom-VJP trunk kernel;
        # True/'full' the FULLY-fused op (fused_fine_full.py: embedding
        # + trunk + spatial grad in one kernel).  The Pallas variants
        # carry the same hardware gate as the ladder.
        impl = fused_fine if isinstance(fused_fine, str) else "full"
        if impl != "xla":
            from honerf_tpu.ops.fused_hand import assert_fused_ladder_ok

            assert_fused_ladder_ok(interpret)

        if impl in ("full", "full_frozen"):
            # color-fused: (sdf, grad, color) straight from the kernel.
            # 'full_frozen' (pose fitting, frozen nets) additionally
            # skips all weight-gradient work in the backward kernel —
            # net-param cotangents come back as ZEROS by contract, so it
            # must only be used where the nets are not differentiated.
            from honerf_tpu.models.fields import hand_fine_color_apply

            def full_fn(pts, dirs):
                return hand_fine_color_apply(
                    params, sdf_cfg, color_cfg, pts, bt_inv, t_pose_21,
                    interpret=interpret, frozen=(impl == "full_frozen"),
                )

        else:
            def full_fn(pts, dirs):
                if impl == "full_nocolor":
                    from honerf_tpu.models.fields import (
                        sdf_hand_value_feat_grad_full,
                    )

                    sdf, feat, xyz_feature, r, h, grad = (
                        sdf_hand_value_feat_grad_full(
                            params["sdf"], sdf_cfg, pts, bt_inv,
                            t_pose_21, interpret=interpret,
                        )
                    )
                else:
                    sdf, feat, xyz_feature, r, h, grad = (
                        sdf_hand_value_feat_grad_fused(
                            params["sdf"], sdf_cfg, pts, bt_inv,
                            t_pose_21, interpret=interpret, impl=impl,
                        )
                    )
                color = color_hand_apply(
                    params["color"], color_cfg, xyz_feature, feat, grad
                )
                return sdf[..., 0], grad, color

    else:
        def full_fn(pts, dirs):
            sdf, feat, xyz_feature, r, h, grad = sdf_hand_value_feat_grad(
                params["sdf"], sdf_cfg, pts, bt_inv, t_pose_21
            )
            color = color_hand_apply(
                params["color"], color_cfg, xyz_feature, feat, grad
            )
            return sdf[..., 0], grad, color

    return Field(sdf_fn, full_fn, variance_apply(params["variance"]))


def rays_to_object_frame(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, Ro: jnp.ndarray, To: jnp.ndarray
):
    """World rays -> object-local frame: o' = Ro^T (o - To), d' = Ro^T d
    (reference `convert_obj_to_local` is called with Ro.T,
    utils/renderer.py:180-188 + exp_runner.py:211)."""
    R = Ro.T
    o = (rays_o - To) @ R.T
    d = rays_d @ R.T
    return o, d


def coarse_z_vals(
    key, n_rays: int, rcfg: RenderConfig, near: float, far: float
) -> jnp.ndarray:
    """Stratified coarse samples with the reference's single per-ray jiggle
    (utils/renderer.py:204-212)."""
    sample_dist = (far - near) / rcfg.n_samples
    z = near + (far - near) * jnp.linspace(0.0, 1.0, rcfg.n_samples)
    z = jnp.broadcast_to(z[None, :], (n_rays, rcfg.n_samples))
    if rcfg.perturb > 0:
        t_rand = jax.random.uniform(key, (n_rays, 1)) - 0.5
        z = z + t_rand * sample_dist
    return z


def safe_norm(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """sqrt(sum(v^2) + eps): finite gradient at v == 0.  The hand SDF's
    cutoff gate saturates to exactly 0 far from every bone, making the
    spatial gradient exactly 0 there; jnp.linalg.norm would backprop NaN
    (torch defines the subgradient at 0 as 0, which is how the reference
    silently survives the same configuration)."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis) + eps)


def sdf_to_alpha(
    sdf: jnp.ndarray,
    grad: jnp.ndarray,
    dirs: jnp.ndarray,
    dists: jnp.ndarray,
    inv_s: jnp.ndarray,
):
    """NeuS sdf -> alpha conversion (utils/renderer.py:147-161).

    All inputs flat over (R*S,); returns (alpha, prev_cdf) with the same
    leading shape.
    """
    true_cos = jnp.sum(dirs * grad, axis=-1)
    # cos_anneal_ratio == 1 always in the reference
    iter_cos = -jax.nn.relu(-true_cos)
    est_next = sdf + iter_cos * dists * 0.5
    est_prev = sdf - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    p = prev_cdf - next_cdf
    alpha = jnp.clip((p + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)
    return alpha, prev_cdf


def render_single(
    field: Field,
    rcfg: RenderConfig,
    key,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    cumprod_seed: str = "prev_cdf",
) -> Dict[str, jnp.ndarray]:
    """Render a batch of rays through one SDF field.

    Equivalent of `NeuSRenderer.render` + `render_core`
    (utils/renderer.py:107-258) as a single pure function.

    Args:
        rays_o, rays_d: (R, 3) — already in the field's frame.
        cumprod_seed: 'prev_cdf' preserves the offline renderer's
            transmittance seed quirk; 'ones' is standard NeuS.

    Returns:
        dict with color_fine (R,3), s_val (R,1), cdf_fine (R,S),
        weight_sum (R,1), weight_max (R,1), gradient_error (scalar).
    """
    n_rays = rays_o.shape[0]
    sample_dist = (far - near) / rcfg.n_samples
    z_vals = coarse_z_vals(key, n_rays, rcfg, near, far)
    if rcfg.n_importance > 0:
        z_vals = hierarchical_z_vals(
            field.sdf_fn,
            jax.lax.stop_gradient(rays_o),
            jax.lax.stop_gradient(rays_d),
            z_vals,
            rcfg.n_importance,
            rcfg.up_sample_steps,
        )
    n_samples = z_vals.shape[-1]

    dists = jnp.diff(z_vals, axis=-1)
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], sample_dist)], axis=-1
    )
    mid_z = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    pts_flat = pts.reshape(-1, 3)
    dirs_flat = dirs.reshape(-1, 3)

    sdf, grad, color = field.full_fn(pts_flat, dirs_flat)
    alpha, prev_cdf = sdf_to_alpha(
        sdf, grad, dirs_flat, dists.reshape(-1), field.inv_s
    )
    alpha = alpha.reshape(n_rays, n_samples)
    c = prev_cdf.reshape(n_rays, n_samples)

    seed = c[:, :1] if cumprod_seed == "prev_cdf" else jnp.ones((n_rays, 1))
    trans = jnp.cumprod(
        jnp.concatenate([seed, 1.0 - alpha + 1e-7], axis=-1), axis=-1
    )[:, :-1]
    weights = alpha * trans
    color = color.reshape(n_rays, n_samples, 3)
    color_fine = jnp.sum(color * weights[..., None], axis=1)

    grad = grad.reshape(n_rays, n_samples, 3)
    gradient_error = jnp.mean((safe_norm(grad) - 1.0) ** 2)

    return {
        "color_fine": color_fine,
        "s_val": jnp.full((n_rays, 1), 1.0 / field.inv_s),
        "cdf_fine": c,
        "weight_sum": jnp.sum(weights, axis=-1, keepdims=True),
        "weight_max": jnp.max(weights, axis=-1, keepdims=True),
        "gradient_error": gradient_error,
        "weights": weights,
    }
