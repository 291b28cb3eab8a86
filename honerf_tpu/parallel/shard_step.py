"""Explicit-collective training step via `jax.shard_map`.

The default path (`honerf_tpu.train.offline` under jit-with-shardings)
lets GSPMD place the reductions; this module is the explicit SPMD variant:
each device renders its local ray shard, the masked-loss numerators /
denominators `psum` over the `data` axis so every device sees the GLOBAL
loss, and the parameter gradients `psum` before the (replicated) Adam
update.  Collectives ride ICI; nothing crosses hosts except the initial
batch shards.

Numerically equivalent to the GSPMD path (tested on the 8-device CPU mesh
at perturb=0); useful when collective placement must be guaranteed rather
than inferred — e.g. overlapping grad reduction with the tail of the
backward pass on real pods.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from honerf_tpu.models.fields import ColorConfig, SDFConfig
from honerf_tpu.parallel.mesh import DATA_AXIS
from honerf_tpu.render.neus import RenderConfig
from honerf_tpu.train.offline import (
    TrainHyper,
    make_optimizer,
    obj_render_from_batch,
)

# batch leaves sharded on the ray axis; everything else replicated
RAY_KEYS = ("rays_xy", "true_rgb", "true_mask")


def _batch_specs(batch: Dict[str, Any]):
    return {
        k: P(DATA_AXIS) if k in RAY_KEYS else P() for k in batch
    }


def make_obj_train_step_shardmap(
    sdf_cfg: SDFConfig,
    color_cfg: ColorConfig,
    rcfg: RenderConfig,
    tcfg: TrainHyper,
    mesh: Mesh,
    batch_template: Dict[str, Any],
):
    """Build the shard_map object train step for `mesh`.

    `batch_template` provides the batch keys (specs are static under
    shard_map).  Returns step(state, batch, key) -> (state, metrics); the
    batch's ray arrays must be device_put with the `data` sharding.
    """
    opt = make_optimizer(tcfg)
    specs = _batch_specs(batch_template)

    def local_loss(params, batch, key):
        out = obj_render_from_batch(params, sdf_cfg, color_cfg, rcfg, tcfg, batch, key)
        true_mask = (batch["true_mask"] > 0.5).astype(jnp.float32)
        n_local = jnp.asarray(batch["true_mask"].shape[0], jnp.float32)
        # global masked L1 (exp_runner.py:220-221): psum numerator and
        # denominator so the normalization matches the unsharded loss
        mask_sum = jax.lax.psum(jnp.sum(true_mask), DATA_AXIS) + 1e-5
        color_abs = jax.lax.psum(
            jnp.sum(jnp.abs((out["color_fine"] - batch["true_rgb"]) * true_mask)),
            DATA_AXIS,
        )
        color_loss = color_abs / mask_sum
        # global mask BCE mean (exp_runner.py:224)
        p = jnp.clip(out["weight_sum"], 1e-3, 1.0 - 1e-3)
        bce = -(true_mask * jnp.log(p) + (1 - true_mask) * jnp.log(1 - p))
        n_global = jax.lax.psum(n_local, DATA_AXIS)
        m_loss = jax.lax.psum(jnp.sum(bce), DATA_AXIS) / n_global
        # eikonal: equal shards -> global mean is the pmean of local means
        eik = jax.lax.pmean(out["gradient_error"], DATA_AXIS)
        loss = color_loss + m_loss * tcfg.mask_weight + eik * tcfg.igr_weight
        metrics = {
            "loss": loss,
            "color_loss": color_loss,
            "mask_loss": m_loss,
            "eikonal_loss": eik,
        }
        return loss, metrics

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), specs, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step_fn(state, batch, key):
        # decorrelate the per-shard stratified jitter (the GSPMD path draws
        # one global jitter array; here each device draws its own)
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        (loss, metrics), grads = jax.value_and_grad(local_loss, has_aux=True)(
            state["params"], batch, key
        )
        # each device holds only its shard's gradient contributions
        grads = jax.lax.psum(grads, DATA_AXIS)
        updates, opt_state = opt.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return (
            {"params": params, "opt_state": opt_state, "step": state["step"] + 1},
            metrics,
        )

    return jax.jit(step_fn)
