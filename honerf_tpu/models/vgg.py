"""VGG feature extractors + perceptual loss in pure JAX.

Two reference roles, two different backbones:

* **VGG19** — the training-time `VGGLoss` (utils/fields.py:407-433): five
  feature stages cut at torchvision `vgg19().features` indices
  (2, 7, 12, 21, 30) under the reference's nn.Sequential(vgg[prev:N])
  slicing — i.e. the output AFTER the first N modules, which lands on the
  RELU outputs relu1_1/2_1/3_1/4_1/5_1 (same output-after-N-modules
  convention as the LPIPS cuts below) — L1 distance per stage with unit
  weights, and the reference's quirks preserved: NO ImageNet normalization
  of the inputs, and the target branch is stop_gradient'ed (torch.no_grad,
  utils/fields.py:429-430).
* **VGG16** — the eval-time LPIPS backbone: `lpips.LPIPS(net='vgg')`
  (analys_results/analys_psnr_ssim_lpips.py:44) runs torchvision VGG16
  features cut at the five RELU outputs relu1_2/2_2/3_3/4_3/5_3
  (torchvision `vgg16().features` indices 3, 8, 15, 22, 29) with trained
  1x1 linear heads on unit-normalized feature differences
  (honerf_tpu.eval.image_quality.lpips_vgg).

Weights: `load_torchvision_vgg19` / `load_torchvision_vgg16` convert a
torchvision .pth into the params pytree; `init_vgg19_params` /
`init_vgg16_params` give random-init fallbacks so the losses stay runnable
(shape/flow-wise) in environments without the pretrained files (this
container has no network egress).
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# VGG19 conv plan: channels per conv layer, 'M' = 2x2 max pool.
VGG19_PLAN = [
    64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
    512, 512, 512, 512, "M", 512, 512, 512, 512, "M",
]

# VGG16 conv plan (torchvision 'D' config) — the LPIPS backbone.
VGG16_PLAN = [
    64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
    512, 512, 512, "M", 512, 512, 512, "M",
]

# torchvision features-module prefix lengths at which the reference cuts
# stages (utils/fields.py:410).  Under the output-after-N-modules
# convention these land on the RELU outputs relu1_1/2_1/3_1/4_1/5_1
# (nn.Sequential(vgg[prev:N]) includes the ReLU at index N-1) — the same
# convention as the LPIPS cuts below.
FEATURE_LAYERS = (2, 7, 12, 21, 30)

# lpips.LPIPS(net='vgg') slices torchvision vgg16().features at the RELU
# outputs relu1_2/2_2/3_3/4_3/5_3: slice k runs features[prev:N) with these
# prefix lengths (lpips/pretrained_networks.py vgg16 slices 1-5), the same
# "output after N modules" convention FEATURE_LAYERS uses.
LPIPS_VGG16_LAYERS = (4, 9, 16, 23, 30)


def _plan_to_torch_indices(plan=VGG19_PLAN) -> List[int]:
    """torchvision index of each conv in `features` (conv,relu pairs with
    pools interleaved)."""
    idx, out = 0, []
    for item in plan:
        if item == "M":
            idx += 1
        else:
            out.append(idx)
            idx += 2
    return out


def _init_plan_params(key, plan, dtype=jnp.float32) -> List[Dict[str, jnp.ndarray]]:
    """He-init random conv stack (fallback when pretrained weights are
    unavailable)."""
    params = []
    c_in = 3
    for item in plan:
        if item == "M":
            continue
        key, sub = jax.random.split(key)
        fan_in = c_in * 9
        w = jax.random.normal(sub, (item, c_in, 3, 3), dtype) * math.sqrt(2.0 / fan_in)
        params.append({"w": w, "b": jnp.zeros((item,), dtype)})
        c_in = item
    return params


def init_vgg19_params(key, dtype=jnp.float32) -> List[Dict[str, jnp.ndarray]]:
    return _init_plan_params(key, VGG19_PLAN, dtype)


def init_vgg16_params(key, dtype=jnp.float32) -> List[Dict[str, jnp.ndarray]]:
    return _init_plan_params(key, VGG16_PLAN, dtype)


def _load_torchvision(path: Optional[str], plan, name_prefix: str):
    """Convert torchvision VGG weights (.pth state dict) to our pytree.
    Searches the default torch hub cache when `path` is None; returns None
    if nothing is found."""
    if path is None:
        hub = os.environ.get(
            "TORCH_HOME", os.path.expanduser("~/.cache/torch")
        )
        cand = os.path.join(hub, "hub", "checkpoints")
        if os.path.isdir(cand):
            for name in sorted(os.listdir(cand)):
                if name.startswith(name_prefix) and name.endswith(".pth"):
                    path = os.path.join(cand, name)
                    break
    if path is None or not os.path.exists(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = []
    for t_idx in _plan_to_torch_indices(plan):
        params.append(
            {
                "w": jnp.asarray(sd[f"features.{t_idx}.weight"].numpy()),
                "b": jnp.asarray(sd[f"features.{t_idx}.bias"].numpy()),
            }
        )
    return params


def load_torchvision_vgg19(path: Optional[str] = None):
    return _load_torchvision(path, VGG19_PLAN, "vgg19")


def load_torchvision_vgg16(path: Optional[str] = None):
    return _load_torchvision(path, VGG16_PLAN, "vgg16")


def _conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """NCHW conv, stride 1, SAME(1) padding — torchvision semantics."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


def _stage_features(
    params: List[Dict[str, jnp.ndarray]], x: jnp.ndarray,
    plan, feature_layers: Sequence[int],
) -> List[jnp.ndarray]:
    """Run a conv stack, returning activations at each stage boundary.

    `feature_layers` are torchvision `features`-module indices; a cut may
    fall on a conv output (VGGLoss) or a relu output (LPIPS).

    Args:
        x: (N, 3, H, W) images.
    """
    outs = []
    conv_i = 0
    torch_idx = 0
    targets = set(feature_layers)
    for item in plan:
        if item == "M":
            x = _maxpool2(x)
            torch_idx += 1
        else:
            x = _conv3x3(x, params[conv_i]["w"], params[conv_i]["b"])
            conv_i += 1
            torch_idx += 1
            if torch_idx in targets:
                outs.append(x)  # stage cut falls on the conv output
            x = jax.nn.relu(x)
            torch_idx += 1
            if torch_idx in targets:
                outs.append(x)
        if len(outs) == len(feature_layers):
            break
    return outs


def vgg19_stage_features(
    params: List[Dict[str, jnp.ndarray]], x: jnp.ndarray,
    feature_layers: Sequence[int] = FEATURE_LAYERS,
) -> List[jnp.ndarray]:
    """VGGLoss stage activations (conv-output cuts, utils/fields.py:410)."""
    return _stage_features(params, x, VGG19_PLAN, feature_layers)


def vgg16_lpips_features(
    params: List[Dict[str, jnp.ndarray]], x: jnp.ndarray,
    feature_layers: Sequence[int] = LPIPS_VGG16_LAYERS,
) -> List[jnp.ndarray]:
    """LPIPS backbone activations: VGG16 relu1_2/2_2/3_3/4_3/5_3 outputs
    (lpips.LPIPS(net='vgg'), analys_results/analys_psnr_ssim_lpips.py:44)."""
    return _stage_features(params, x, VGG16_PLAN, feature_layers)


def vgg_perceptual_loss(
    params: List[Dict[str, jnp.ndarray]],
    source: jnp.ndarray,
    target: jnp.ndarray,
    weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Sum of per-stage L1 feature distances; the target branch carries no
    gradient (utils/fields.py:425-433)."""
    fs = vgg19_stage_features(params, source)
    ft = vgg19_stage_features(params, jax.lax.stop_gradient(target))
    loss = 0.0
    for w, a, b in zip(weights, fs, ft):
        loss = loss + w * jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return loss


def make_patch_vgg_loss(params):
    """(H, W, 3) pred/gt patches -> scalar, with the reference's
    permute(2,1,0) HWC->CWH quirk (exp_runner.py:229-230)."""

    def loss_fn(pred_hwc: jnp.ndarray, gt_hwc: jnp.ndarray) -> jnp.ndarray:
        pred = jnp.transpose(pred_hwc, (2, 1, 0))[None]
        gt = jnp.transpose(gt_hwc, (2, 1, 0))[None]
        return vgg_perceptual_loss(params, pred, gt)

    return loss_fn
