"""Single-volume renderer tests: compositing sanity on analytic fields,
mask/occupancy behaviour, differentiability, jit-ability (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from honerf_tpu.render import (
    Field,
    RenderConfig,
    make_obj_field,
    rays_to_object_frame,
    render_single,
    sdf_to_alpha,
)
from honerf_tpu.models import SDFConfig, ColorConfig, init_sdf_params, init_color_params, init_variance_params


def analytic_sphere_field(radius=0.5, color=(1.0, 0.2, 0.1), inv_s=200.0):
    col = jnp.asarray(color)

    def sdf_fn(pts):
        return jnp.linalg.norm(pts, axis=-1) - radius

    def full_fn(pts, dirs):
        sdf = sdf_fn(pts)
        grad = pts / jnp.maximum(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1e-9)
        c = jnp.broadcast_to(col, pts.shape)
        return sdf, grad, c

    return Field(sdf_fn, full_fn, jnp.asarray(inv_s))


def camera_rays(n_side=8, z0=-1.5, spread=0.3):
    xs = np.linspace(-spread, spread, n_side)
    grid = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2)
    o = np.concatenate([grid, np.full((len(grid), 1), z0)], -1).astype(np.float32)
    d = np.tile(np.asarray([[0.0, 0.0, 1.0]], dtype=np.float32), (len(grid), 1))
    return jnp.asarray(o), jnp.asarray(d)


def test_render_sphere_hit_and_miss():
    field = analytic_sphere_field()
    rcfg = RenderConfig(perturb=0.0)
    rays_o, rays_d = camera_rays(n_side=9, spread=0.8)
    out = render_single(
        field, rcfg, jax.random.PRNGKey(0), rays_o, rays_d, 0.4, 1.5,
        cumprod_seed="ones",
    )
    ws = np.asarray(out["weight_sum"])[:, 0]
    xy = np.asarray(rays_o[:, :2])
    r = np.linalg.norm(xy, axis=-1)
    # rays through the sphere should be ~opaque, far-miss rays ~transparent
    assert ws[r < 0.3].min() > 0.9
    assert ws[r > 0.7].max() < 0.1
    # hit color is the sphere color
    hit_colors = np.asarray(out["color_fine"])[r < 0.3]
    np.testing.assert_allclose(hit_colors, [[1.0, 0.2, 0.1]] * len(hit_colors), atol=0.05)


def test_render_prev_cdf_seed_quirk_differs_from_ones():
    # low inv_s so prev_cdf at the first sample is visibly < 1
    field = analytic_sphere_field(inv_s=2.0)
    rcfg = RenderConfig(perturb=0.0)
    rays_o, rays_d = camera_rays(n_side=3, spread=0.2)
    o1 = render_single(field, rcfg, jax.random.PRNGKey(0), rays_o, rays_d, 0.4, 1.5,
                       cumprod_seed="prev_cdf")
    o2 = render_single(field, rcfg, jax.random.PRNGKey(0), rays_o, rays_d, 0.4, 1.5,
                       cumprod_seed="ones")
    # the quirk scales transmittance by prev_cdf[0] < 1 at moderate inv_s
    assert not np.allclose(np.asarray(o1["weight_sum"]), np.asarray(o2["weight_sum"]))


def test_sdf_to_alpha_surface_crossing():
    # a sample that crosses from + to - sdf along the ray gets high alpha
    sdf = jnp.asarray([0.5, 0.005, -0.5])
    dirs = jnp.asarray([[0.0, 0, 1]] * 3)
    grad = jnp.asarray([[0.0, 0, -1]] * 3)  # surface normal against ray
    dists = jnp.full((3,), 0.02)
    alpha, _ = sdf_to_alpha(sdf, grad, dirs, dists, jnp.asarray(500.0))
    a = np.asarray(alpha)
    assert a[1] > 0.5  # near-surface sample
    assert a[0] < 0.05  # far outside


def test_render_gradients_flow_to_params():
    sdf_cfg = SDFConfig(kind="obj")
    color_cfg = ColorConfig(kind="obj")
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
    }
    rays_o, rays_d = camera_rays(n_side=2, spread=0.2)
    rcfg = RenderConfig(n_samples=16, n_importance=16, up_sample_steps=2, perturb=0.0)

    def loss_fn(p):
        field = make_obj_field(p, sdf_cfg, color_cfg)
        out = render_single(field, rcfg, jax.random.PRNGKey(0), rays_o, rays_d, 0.4, 1.5)
        return (
            jnp.mean(out["color_fine"]) + out["gradient_error"]
            + jnp.mean(out["weight_sum"])
        )

    grads = jax.grad(loss_fn)(params)
    # eikonal double-backprop must reach the sdf weights
    g0 = np.asarray(grads["sdf"]["layers"][0]["v"])
    assert np.isfinite(g0).all() and np.abs(g0).max() > 0
    gv = np.asarray(grads["variance"]["variance"])
    assert np.isfinite(gv).all()
    gc = np.asarray(grads["color"]["layers"][0]["v"])
    assert np.isfinite(gc).all() and np.abs(gc).max() > 0


def test_rays_to_object_frame_roundtrip(rng):
    from honerf_tpu.utils.transforms import rot6d_to_matrix

    Ro = rot6d_to_matrix(jnp.asarray(rng.normal(size=(6,)), dtype=jnp.float32))
    To = jnp.asarray(rng.normal(size=(3,)), dtype=jnp.float32)
    o = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    d = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    ol, dl = rays_to_object_frame(o, d, Ro, To)
    # a point at parameter t must map consistently: Ro @ local + To == world
    t = 0.7
    world_pts = o + t * d
    local_pts = ol + t * dl
    back = local_pts @ Ro.T + To
    np.testing.assert_allclose(np.asarray(back), np.asarray(world_pts), atol=1e-5)


def test_render_jit_compiles_once():
    field = analytic_sphere_field()
    rcfg = RenderConfig(perturb=1.0)
    rays_o, rays_d = camera_rays(n_side=4)

    calls = 0

    def render(key, o, d):
        nonlocal calls
        calls += 1
        return render_single(field, rcfg, key, o, d, 0.4, 1.5)

    jrender = jax.jit(render)
    out1 = jrender(jax.random.PRNGKey(0), rays_o, rays_d)
    out2 = jrender(jax.random.PRNGKey(1), rays_o, rays_d)
    assert calls == 1  # traced once
    # different keys -> different stratified jitter -> different per-sample
    # weights (the uniform-color sphere keeps color_fine identical)
    assert not np.allclose(np.asarray(out1["weights"]), np.asarray(out2["weights"]))


def test_eval_ray_chunk_backend_guard(monkeypatch):
    """Inference renders must lax.map the validated 882-ray body on
    non-CPU backends (the tunneled TPU silently corrupts single-dispatch
    forward renders >= ~1764 rays — BENCH_NOTES 'Known issues'); CPU
    stays unchunked; an explicit train.ray_chunk wins."""
    import jax

    from honerf_tpu.train.offline import (
        SAFE_FORWARD_RAY_CHUNK,
        TrainHyper,
        eval_ray_chunk,
    )

    assert SAFE_FORWARD_RAY_CHUNK == 882
    assert eval_ray_chunk(TrainHyper()) == 0  # CPU under conftest
    assert eval_ray_chunk(TrainHyper(ray_chunk=441)) == 441
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert eval_ray_chunk(TrainHyper()) == 882
    assert eval_ray_chunk(TrainHyper(ray_chunk=441)) == 441
