"""Render-quality metrics: PSNR, SSIM, LPIPS
(reference: analys_results/analys_psnr_ssim_lpips.py).

PSNR/SSIM are numpy implementations with skimage-compatible semantics
(data_range=255, channel-wise SSIM with the default 7x7 uniform window and
sample covariance); LPIPS runs the `lpips.LPIPS(net='vgg')` VGG16 backbone
in JAX with loadable linear heads (the published LPIPS weights convert via
`load_lpips_weights`; with no weights the unit-weight VGG16 feature
distance is reported, flagged in the key name).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def psnr(img: np.ndarray, ref: np.ndarray, data_range: float = 255.0) -> float:
    """Peak signal-to-noise ratio (skimage peak_signal_noise_ratio
    semantics)."""
    mse = np.mean((img.astype(np.float64) - ref.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def _uniform_filter(x: np.ndarray, size: int) -> np.ndarray:
    from scipy.ndimage import uniform_filter

    return uniform_filter(x, size=size, mode="reflect")


def ssim(
    img: np.ndarray,
    ref: np.ndarray,
    data_range: float = 255.0,
    win_size: int = 7,
    K1: float = 0.01,
    K2: float = 0.03,
) -> float:
    """Mean structural similarity, channel-wise like skimage's
    structural_similarity(channel_axis=2) with default (non-gaussian)
    weights and sample covariance normalization."""
    img = img.astype(np.float64)
    ref = ref.astype(np.float64)
    if img.ndim == 2:
        img = img[..., None]
        ref = ref[..., None]
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size**2
    cov_norm = NP / (NP - 1)
    vals = []
    for c in range(img.shape[2]):
        x = img[..., c]
        y = ref[..., c]
        ux = _uniform_filter(x, win_size)
        uy = _uniform_filter(y, win_size)
        uxx = _uniform_filter(x * x, win_size)
        uyy = _uniform_filter(y * y, win_size)
        uxy = _uniform_filter(x * y, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        A1 = 2 * ux * uy + C1
        A2 = 2 * vxy + C2
        B1 = ux**2 + uy**2 + C1
        B2 = vx + vy + C2
        S = (A1 * A2) / (B1 * B2)
        pad = (win_size - 1) // 2
        vals.append(S[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


# ---------------------------------------------------------------------------
# LPIPS (VGG backbone)
# ---------------------------------------------------------------------------

# LPIPS input normalization constants (published lpips implementation)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], dtype=np.float32)

# VGG16 stage channel counts used by LPIPS(net='vgg')
LPIPS_VGG_CHANNELS = (64, 128, 256, 512, 512)


def load_lpips_weights(path: Optional[str] = None):
    """Convert published LPIPS linear-head weights (lins.N.model.1.weight)
    to numpy; returns None when unavailable."""
    import os

    if path is None or not os.path.exists(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    heads = []
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in sd:
            key = f"lins.{i}.model.1.weight"
        heads.append(np.asarray(sd[key]).reshape(-1))
    return heads


def lpips_vgg(
    vgg16_params,
    img: np.ndarray,
    ref: np.ndarray,
    heads: Optional[List[np.ndarray]] = None,
) -> float:
    """LPIPS perceptual distance with the VGG16 backbone in JAX —
    `lpips.LPIPS(net='vgg')` semantics
    (analys_results/analys_psnr_ssim_lpips.py:44): scaling layer, VGG16
    relu1_2/2_2/3_3/4_3/5_3 features, per-stage channel unit-normalization
    (x / (||x||_c + 1e-10), lpips.normalize_tensor), squared difference,
    1x1 linear head, spatial average, sum over stages.

    Args:
        vgg16_params: honerf_tpu.models.vgg VGG16 params (pretrained via
            load_torchvision_vgg16 for fidelity).
        img/ref: (H, W, 3) uint8 or float arrays in [0, 255].  The
            reference feeds (x / 128) - 1 (analys_psnr_ssim_lpips.py:28-31).
        heads: optional per-stage linear weights (published LPIPS v0.1);
            unit weights otherwise (the labeled `lpips_unit_weights`
            fallback).
    """
    import jax.numpy as jnp

    from honerf_tpu.models.vgg import vgg16_lpips_features

    def prep(x):
        x = (np.asarray(x, np.float32) / 128.0) - 1.0  # reference scaling
        x = (x - _SHIFT) / _SCALE  # lpips ScalingLayer
        return jnp.asarray(x.transpose(2, 0, 1)[None])

    fa = vgg16_lpips_features(vgg16_params, prep(img))
    fb = vgg16_lpips_features(vgg16_params, prep(ref))
    total = 0.0
    for i, (a, b) in enumerate(zip(fa, fb)):
        # lpips.normalize_tensor: eps OUTSIDE the sqrt.  Eval-only (no
        # gradient is ever taken through this metric), so the
        # safe-norm-gradient rule does not apply here.
        na = a / (jnp.sqrt(jnp.sum(a**2, axis=1, keepdims=True)) + 1e-10)
        nb = b / (jnp.sqrt(jnp.sum(b**2, axis=1, keepdims=True)) + 1e-10)
        diff = (na - nb) ** 2
        if heads is not None:
            w = jnp.asarray(heads[i]).reshape(1, -1, 1, 1)
            if w.shape[1] != diff.shape[1]:
                # A malformed/mismatched head file must not silently
                # degrade to unit weights while still reporting under the
                # 'lpips' key (ADVICE r4).
                raise ValueError(
                    f"LPIPS head {i} has {w.shape[1]} channels, stage "
                    f"features have {diff.shape[1]} — wrong/corrupt heads "
                    "file; pass heads=None for the labeled unit-weight "
                    "fallback")
            diff = diff * w
        total = total + float(jnp.mean(jnp.sum(diff, axis=1)))
    return float(total)


def image_metrics(
    img: np.ndarray, ref: np.ndarray, vgg_params=None, lpips_heads=None
) -> Dict[str, float]:
    """`vgg_params` is the VGG16 LPIPS backbone (load_torchvision_vgg16)."""
    out = {
        "psnr": psnr(img, ref, data_range=255.0),
        "ssim": ssim(img, ref, data_range=255.0),
    }
    if vgg_params is not None:
        key = "lpips" if lpips_heads is not None else "lpips_unit_weights"
        out[key] = lpips_vgg(vgg_params, img, ref, lpips_heads)
    return out
