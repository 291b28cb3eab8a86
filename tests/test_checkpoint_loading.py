"""Checkpoint-loading integration: the fitting stage loads both our .npz
checkpoints and reference-format .pth files (zoo converter path)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_load_model_params_pth_fallback(tmp_path):
    import torch

    from honerf_tpu.fit.runner import load_model_params
    from honerf_tpu.models import SDFConfig, sdf_obj_apply

    # build a reference-format checkpoint for a small obj net
    torch.manual_seed(0)

    def wn_linear(i, o):
        return torch.nn.utils.weight_norm(torch.nn.Linear(i, o))

    # dims for SDFConfig(kind obj, n_layers=3, d_hidden=64, d_out=65,
    # skip=(2,), v_multires=6): input 39, layers 39->64, 64->25, 25... no:
    # shrink style: l0 39->64, l1 64->(64-39)=25, l2 64->64, l3 64->65
    cfg = SDFConfig(kind="obj", n_layers=3, d_hidden=64, d_out=65,
                    skip_in=(2,), v_multires=6)
    lins = []
    dims = cfg.dims
    for l in range(len(dims) - 1):
        d_in = dims[l]
        d_out = dims[l + 1] - dims[0] if (l + 1) in cfg.skip_in else dims[l + 1]
        lins.append(wn_linear(d_in, d_out))
    sdf_sd = {}
    for i, lin in enumerate(lins):
        sdf_sd[f"lin{i}.weight_v"] = lin.weight_v.detach()
        sdf_sd[f"lin{i}.weight_g"] = lin.weight_g.detach()
        sdf_sd[f"lin{i}.bias"] = lin.bias.detach()
    ckpt = {
        "sdf_network_fine": sdf_sd,
        "color_network_fine": {
            "lin0.weight": torch.randn(3, 8), "lin0.bias": torch.randn(3),
        },
        "variance_network_fine": {"variance": torch.tensor(0.31)},
        "iter_step": 300000,
    }
    ckpt_dir = tmp_path / "model" / "checkpoints"
    os.makedirs(ckpt_dir)
    torch.save(ckpt, str(ckpt_dir / "ckpt_300000.pth"))

    params = load_model_params(str(tmp_path / "model"))
    assert float(params["variance"]["variance"]) == pytest.approx(0.31)
    # the converted net evaluates
    out = sdf_obj_apply(params["sdf"], cfg, jnp.zeros((4, 3)))
    assert out.shape == (4, 65)
    assert np.isfinite(np.asarray(out)).all()


def test_load_model_params_prefers_npz(tmp_path):
    from honerf_tpu.fit.runner import load_model_params
    from honerf_tpu.train.checkpoints import save_checkpoint

    tree = {
        "params": {
            "sdf": {"layers": [{"w": np.ones((2, 2)), "b": np.zeros(2)}]},
            "color": {"layers": [{"w": np.ones((2, 2)), "b": np.zeros(2)}]},
            "variance": {"variance": np.asarray(0.5)},
        }
    }
    save_checkpoint(str(tmp_path / "m" / "checkpoints" / "ckpt_000001.npz"), tree)
    params = load_model_params(str(tmp_path / "m"))
    assert float(params["variance"]["variance"]) == 0.5
