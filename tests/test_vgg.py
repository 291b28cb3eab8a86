"""VGG19 perceptual-loss tests: stage shapes match torchvision cut points,
loss behaviour, patch-quirk wrapper."""

import jax
import jax.numpy as jnp
import numpy as np

from honerf_tpu.models.vgg import (
    FEATURE_LAYERS,
    init_vgg19_params,
    make_patch_vgg_loss,
    vgg19_stage_features,
    vgg_perceptual_loss,
)


def test_stage_feature_shapes():
    params = init_vgg19_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 3, 32, 48))
    feats = vgg19_stage_features(params, x)
    assert len(feats) == len(FEATURE_LAYERS)
    # channels/resolutions at torchvision cut indices 2,7,12,21,30:
    # after relu1 (64ch, full res), relu6 (128ch, /2), relu11 (256ch, /4),
    # relu20 (512ch, /8), relu29 (512ch, /16)
    want = [(64, 32, 48), (128, 16, 24), (256, 8, 12), (512, 4, 6), (512, 2, 3)]
    for f, (c, h, w) in zip(feats, want):
        assert f.shape == (1, c, h, w), (f.shape, (c, h, w))


def test_perceptual_loss_zero_for_identical_and_positive_otherwise(rng):
    params = init_vgg19_params(jax.random.PRNGKey(1))
    a = jnp.asarray(rng.uniform(0, 1, (1, 3, 16, 16)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (1, 3, 16, 16)).astype(np.float32))
    assert float(vgg_perceptual_loss(params, a, a)) == 0.0
    assert float(vgg_perceptual_loss(params, a, b)) > 0.0


def test_patch_loss_gradient_only_through_source(rng):
    params = init_vgg19_params(jax.random.PRNGKey(2))
    loss_fn = make_patch_vgg_loss(params)
    pred = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
    g_pred = jax.grad(lambda p: loss_fn(p, gt))(pred)
    assert np.abs(np.asarray(g_pred)).max() > 0
    # the target branch is stop-gradded
    g_gt = jax.grad(lambda t: loss_fn(pred, t))(gt)
    np.testing.assert_allclose(np.asarray(g_gt), 0.0)
