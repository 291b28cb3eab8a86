"""Gating of the tunneled-libtpu miscompile workarounds (VERDICT r2 #3):
one env switch (HONERF_BACKEND_WORKAROUNDS) flips the ray-chunk guard,
the eval lax.map body, and the K-per-dispatch default together."""

import warnings

import jax
import numpy as np
import pytest

from honerf_tpu.utils import backend_probe as bp


def test_auto_mode_tracks_backend(monkeypatch):
    monkeypatch.delenv(bp.ENV_VAR, raising=False)
    # conftest forces the CPU backend
    assert not bp.workarounds_enabled()
    assert bp.safe_ray_chunk() == 0
    assert bp.default_steps_per_dispatch() == 16
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert bp.workarounds_enabled()
    assert bp.safe_ray_chunk() == bp.SAFE_RAY_CHUNK == 882
    assert bp.default_steps_per_dispatch() == 8


def test_env_switch_overrides_backend(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv(bp.ENV_VAR, "off")
    assert not bp.workarounds_enabled()
    assert bp.safe_ray_chunk() == 0
    assert bp.default_steps_per_dispatch() == 16
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    monkeypatch.setenv(bp.ENV_VAR, "on")
    assert bp.workarounds_enabled()
    assert bp.safe_ray_chunk() == 882
    assert bp.default_steps_per_dispatch() == 8


def test_eval_ray_chunk_respects_switch(monkeypatch):
    from honerf_tpu.train.offline import TrainHyper, eval_ray_chunk

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv(bp.ENV_VAR, "off")
    assert eval_ray_chunk(TrainHyper()) == 0
    # an explicit conf pin still wins in either direction
    assert eval_ray_chunk(TrainHyper(ray_chunk=441)) == 441
    monkeypatch.setenv(bp.ENV_VAR, "on")
    assert eval_ray_chunk(TrainHyper()) == 882


def test_round_chunk_keeps_inner_invariant():
    # ADVICE r2 medium: 7056 on a 32-device mesh must stay a multiple of
    # 882 AND divide by 32 (lcm = 14112), not become 7072
    assert bp.round_chunk(7056, 882, 32) == 14112
    assert bp.round_chunk(7056, 882, 8) == 7056  # already fine
    assert bp.round_chunk(7056, 882) == 7056
    assert bp.round_chunk(1000, 882) == 1764
    assert bp.round_chunk(1000, 0, 8) == 1000  # zeros are ignored
    assert bp.round_chunk(1000, 0, 0) == 1000


def test_chunk_mismatch_warns_not_silent():
    """A ray_chunk that does not divide the batch must WARN about the
    unchunked fallback (ADVICE r2) — previously it fell through
    silently onto the path the backend miscompiles."""
    import jax.numpy as jnp

    from honerf_tpu.models import (
        ColorConfig, SDFConfig, init_color_params, init_sdf_params,
        init_variance_params,
    )
    from honerf_tpu.render import RenderConfig
    from honerf_tpu.render.neus import make_obj_field
    from honerf_tpu.train.offline import TrainHyper, _render_rays_chunked

    sdf_cfg = SDFConfig(kind="obj", n_layers=2, d_hidden=32, d_out=33,
                        skip_in=(), v_multires=2)
    color_cfg = ColorConfig(kind="obj", n_layers=2, d_hidden=32,
                            d_feature=32, v_multires=2, r_multires=2,
                            grad_multires=2)
    params = {
        "sdf": init_sdf_params(jax.random.PRNGKey(0), sdf_cfg),
        "color": init_color_params(jax.random.PRNGKey(1), color_cfg),
        "variance": init_variance_params(0.3),
    }
    field = make_obj_field(params, sdf_cfg, color_cfg)
    rcfg = RenderConfig(n_samples=8, n_importance=0, perturb=0.0)
    o = jnp.zeros((10, 3)).at[:, 2].set(-1.0)
    d = jnp.zeros((10, 3)).at[:, 2].set(1.0)
    with pytest.warns(UserWarning, match="does not divide"):
        out = _render_rays_chunked(
            field, rcfg, TrainHyper(ray_chunk=4), jax.random.PRNGKey(0), o, d
        )
    assert np.isfinite(np.asarray(out["color_fine"])).all()
