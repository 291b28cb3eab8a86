"""Functional MLP layers with explicit weight-norm parametrization.

Parameters are plain pytrees (dicts of jnp arrays) so that checkpointing,
sharding annotations and the .pth converter stay trivial.  Weight norm is
stored as (v, g, b) with w = g * v / ||v||_row — the explicit form of
torch.nn.utils.weight_norm(dim=0) (reference: utils/fields.py:120-121),
which keeps converted PyTorch checkpoints bit-compatible.

TPU notes: layer applies are single (B, D_in) x (D_in, D_out) matmuls that
XLA tiles onto the MXU; the weight-norm scaling folds into the weight before
the matmul so it costs one small elementwise pass per layer.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def init_linear(
    key,
    d_in: int,
    d_out: int,
    weight_norm: bool = True,
    w_init: Optional[jnp.ndarray] = None,
    b_init: Optional[jnp.ndarray] = None,
) -> Params:
    """Create a linear layer's parameters.

    w_init: (d_out, d_in) explicit initial weight (geometric init); defaults
    to the torch.nn.Linear uniform fan-in init.
    """
    if w_init is None:
        bound = 1.0 / math.sqrt(d_in)
        k_w, k_b = jax.random.split(key)
        w_init = jax.random.uniform(k_w, (d_out, d_in), minval=-bound, maxval=bound)
        if b_init is None:
            b_init = jax.random.uniform(k_b, (d_out,), minval=-bound, maxval=bound)
    if b_init is None:
        b_init = jnp.zeros((d_out,))
    if weight_norm:
        g = jnp.linalg.norm(w_init, axis=1)  # row norms, torch weight_norm dim=0
        return {"v": w_init, "g": g, "b": b_init}
    return {"w": w_init, "b": b_init}


def linear_weight(p: Params) -> jnp.ndarray:
    """Materialize the effective (d_out, d_in) weight."""
    if "v" in p:
        v = p["v"]
        norm = jnp.linalg.norm(v, axis=1, keepdims=True)
        return p["g"][:, None] * v / norm
    return p["w"]


def apply_linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    w = linear_weight(p)
    return x @ w.T + p["b"]


def softplus_beta(x: jnp.ndarray, beta: float = 100.0) -> jnp.ndarray:
    """torch.nn.Softplus(beta) == softplus(beta*x)/beta, with the linear
    regime for beta*x > threshold(=20) handled by logaddexp's stability."""
    return jnp.logaddexp(beta * x, 0.0) / beta


def geometric_init_weights(
    key,
    dims: Sequence[int],
    skip_in: Tuple[int, ...],
    bias: float,
    inside_outside: bool,
    skip_style: str,
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Geometric initialization (IDR/NeuS) for an SDF MLP.

    Mirrors the reference exactly, including its quirk of treating the first
    3 input channels as raw xyz even when the real input is an embedding
    (utils/fields.py:100-118 for the hand `skip_style='widen_input'`;
    utils/fields.py:287-305 for the object `skip_style='shrink_output'`).

    Returns a list of (w, b) per layer, with layer l mapping
    in_dim(l) -> out_dim(l):
      * widen_input:  in = dims[l] + dims[0] if l in skip_in else dims[l]
      * shrink_output: out = dims[l+1] - dims[0] if (l+1) in skip_in
    """
    n_layers = len(dims)
    out: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    keys = jax.random.split(key, n_layers - 1)
    for l in range(n_layers - 1):
        if skip_style == "widen_input":
            in_dim = dims[l] + dims[0] if l in skip_in else dims[l]
            out_dim = dims[l + 1]
        else:  # shrink_output
            in_dim = dims[l]
            out_dim = dims[l + 1] - dims[0] if (l + 1) in skip_in else dims[l + 1]
        if l == n_layers - 2:
            mean = math.sqrt(math.pi) / math.sqrt(in_dim)
            if inside_outside:
                mean = -mean
            w = mean + 0.0001 * jax.random.normal(keys[l], (out_dim, in_dim))
            b = jnp.full((out_dim,), bias if inside_outside else -bias)
        elif l == 0:
            w = jnp.zeros((out_dim, in_dim))
            std = math.sqrt(2.0) / math.sqrt(out_dim)
            w = w.at[:, :3].set(std * jax.random.normal(keys[l], (out_dim, 3)))
            b = jnp.zeros((out_dim,))
        elif l in skip_in:
            std = math.sqrt(2.0) / math.sqrt(out_dim)
            w = std * jax.random.normal(keys[l], (out_dim, in_dim))
            w = w.at[:, -(dims[0] - 3):].set(0.0)
            b = jnp.zeros((out_dim,))
        else:
            std = math.sqrt(2.0) / math.sqrt(out_dim)
            w = std * jax.random.normal(keys[l], (out_dim, in_dim))
            b = jnp.zeros((out_dim,))
        out.append((w, b))
    return out
