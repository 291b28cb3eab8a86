"""Offline-stage training: jitted train/eval steps for the object and hand
SDF models.

Functional equivalent of the reference `Runner.train` inner loop
(exp_runner.py:127-263): per-view pose refinement (se3_refine ->
rot6d/translation updates), ray-bundle construction, NeuS render, and the
masked-L1 + mask-BCE + eikonal (+ VGG) loss — all inside ONE compiled XLA
program per step.  The hand path additionally runs the HALO kinematic chain
in-graph (wired by the runner once `honerf_tpu.hand` provides it).

Sharding: the step is jitted with the ray axis sharded over the `data` mesh
axis and parameters replicated; gradients all-reduce over ICI automatically.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from honerf_tpu.camera import Camera, xy_to_ray_bundle
from honerf_tpu.models.fields import ColorConfig, SDFConfig
from honerf_tpu.render.losses import mask_bce, masked_l1_color, masked_psnr
from honerf_tpu.render.neus import (
    RenderConfig,
    make_hand_field,
    make_obj_field,
    rays_to_object_frame,
    render_single,
)
from honerf_tpu.train.schedule import make_lr_schedule
from honerf_tpu.utils.transforms import rot6d_to_matrix

import logging

_logger = logging.getLogger(__name__)
# fine-pass implementation selections already reported (ADVICE r3)
_LOGGED_FINE_SELECTIONS: set = set()

Params = Dict[str, Any]


class TrainHyper(NamedTuple):
    """Static training hyperparameters (`train` conf section)."""

    near: float = 0.4
    far: float = 1.5
    learning_rate: float = 1e-4
    learning_rate_alpha: float = 0.05
    end_iter: int = 300000
    warm_up_end: float = 5000.0
    igr_weight: float = 1.0
    mask_weight: float = 1.0
    vgg_weight: float = 1.0
    refine_pose: bool = True
    batch_size: int = 441
    # Fused Pallas hand ladder: None = auto (on when trunk_dtype == 'bf16'
    # on one TPU chip), True = force on, False = force off (debug /
    # quality comparison).  `train.fused_ladder` conf key.
    fused_ladder: Optional[bool] = None
    # Differentiable decomposed fine pass (ops/fused_fine.py): None =
    # auto (on when trunk_dtype == 'bf16'), True/'pallas' = custom-VJP
    # Pallas trunk (single TPU chip), 'xla' = explicit-chain XLA lowering
    # (safe everywhere), False = off.  `train.fused_fine` conf key.
    fused_fine: Any = None
    # Render the ray axis in lax.map chunks of this size when batch_size
    # exceeds it (0 = off).  Workaround for a tunneled-backend miscompile
    # at ray counts >~1.7k (see BENCH_NOTES.md "Known issues"): the
    # chunked program reuses the known-good small-batch shape.
    ray_chunk: int = 0
    # Global-norm gradient clip (`train.grad_clip` conf key).  None =
    # auto: DEFAULT_BF16_GRAD_CLIP when the SDF trunk runs bf16, off for
    # f32 (reference parity — the reference never clips).  0 = force off.
    # See resolve_grad_clip for why bf16 needs it.
    grad_clip: Optional[float] = None

    @classmethod
    def from_conf(cls, conf) -> "TrainHyper":
        return cls(
            near=float(conf["train.near"]),
            far=float(conf["train.far"]),
            learning_rate=float(conf["train.learning_rate"]),
            learning_rate_alpha=float(conf["train.learning_rate_alpha"]),
            end_iter=int(conf["train.end_iter"]),
            warm_up_end=float(conf.get("train.warm_up_end", 0.0)),
            igr_weight=float(conf["train.igr_weight"]),
            mask_weight=float(conf["train.mask_weight"]),
            vgg_weight=float(conf.get("train.vgg_weight", 0.0)),
            # per-view se3 pose refinement applies to REAL data only: the
            # reference gates on `data_type == 'real' and refine_pose`
            # (exp_runner.py:155, :163) — synthetic data has exact poses
            refine_pose=(
                bool(conf.get("train.refine_pose", True))
                and str(conf.get("general.data_type", "real")) == "real"
            ),
            batch_size=int(conf["train.batch_size"]),
            fused_ladder=(
                None if conf.get("train.fused_ladder", None) is None
                else bool(conf.get("train.fused_ladder"))
            ),
            fused_fine=(
                lambda v: None if v is None
                else (v if isinstance(v, str) else bool(v))
            )(conf.get("train.fused_fine", None)),
            ray_chunk=int(conf.get("train.ray_chunk", 0)),
            grad_clip=(
                None if conf.get("train.grad_clip", None) is None
                else float(conf.get("train.grad_clip"))
            ),
        )


def make_optimizer(tcfg: TrainHyper) -> optax.GradientTransformation:
    schedule = make_lr_schedule(
        tcfg.learning_rate, tcfg.warm_up_end, tcfg.end_iter, tcfg.learning_rate_alpha
    )
    return optax.adam(learning_rate=schedule)


#: Auto grad-clip threshold for bf16 trunks (resolve_grad_clip).
#: Calibrated on the full-size obj run (BENCH_NOTES round-5): healthy
#: grad norms median 5.9 / p99 33 / max 72, patch-switch spike batches
#: 276-847.  50 sits above the healthy p99 (<1% of normal steps touched)
#: and an order of magnitude below the spikes it exists to neuter.
DEFAULT_BF16_GRAD_CLIP = 50.0


def resolve_grad_clip(tcfg: TrainHyper, sdf_cfg) -> float:
    """Effective global-norm gradient clip (0 = off).

    The reference trains f32 and never clips (exp_runner.py:238-257 has
    a bare loss.backward()/step()), and our f32 path preserves that.
    bf16 trunks (the TPU fast path, no reference counterpart) need the
    update bounded: the round-5 30k soak showed single catastrophic
    patch batches right after the 0.3*end_iter patch-sampling switch
    (loss ~8, an entire patch rendering empty) collapse the bf16 field
    permanently — once the render is fully empty the mask BCE's
    weight_sum clip to [1e-3, 1-1e-3] (exp_runner.py:224) zeroes its
    gradient, so there is no recovery force.  The f32 run absorbed the
    SAME batches and converged (BENCH_NOTES "Round-5 measured: ...
    soak").  `train.grad_clip` overrides the auto rule (0 disables).
    """
    if tcfg.grad_clip is not None:
        return float(tcfg.grad_clip)
    return (DEFAULT_BF16_GRAD_CLIP
            if getattr(sdf_cfg, "trunk_dtype", "f32") == "bf16" else 0.0)


def _clipped_grads(grads, clip: float):
    """Return (grads, global_norm), scaling grads to `clip` when above.

    Implemented in-step (not optax.chain) so the opt_state tree — and
    therefore every existing checkpoint — keeps its exact structure.
    """
    gnorm = optax.global_norm(grads)
    if clip > 0:
        scale = jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)
    return grads, gnorm


def init_train_state(params: Params, tcfg: TrainHyper) -> Dict[str, Any]:
    opt = make_optimizer(tcfg)
    return {"params": params, "opt_state": opt.init(params), "step": jnp.asarray(0)}


def refined_obj_pose(
    params: Params, tcfg: TrainHyper, Ro: jnp.ndarray, To: jnp.ndarray, index
):
    """Apply the per-view learnable object pose correction
    (exp_runner.py:152-161): Ro' = rot6d(refine[:6]) @ Ro,
    To' = To + 0.1 * refine[6:9]."""
    if not tcfg.refine_pose:
        return Ro, To
    ref = params["se3_refine"][index]
    d_rot = rot6d_to_matrix(ref[:6])
    return d_rot @ Ro, To + ref[6:9] * 0.1


def _render_rays_chunked(field, rcfg, tcfg, key, o, d) -> Dict[str, jnp.ndarray]:
    """render_single over the ray axis, optionally in lax.map chunks of
    tcfg.ray_chunk rays.

    The chunked path exists as a WORKAROUND for a tunneled-TPU backend
    miscompile: the full composite render+grad program produces NaN/Inf at
    ray counts above ~1.7k on this container's libtpu (forward-only and
    every subprogram are finite in isolation at the same shapes, CPU is
    finite, and the failure is seed/key-independent — see BENCH_NOTES.md).
    Chunking makes the compiled body identical to the known-good
    small-batch program.  Scalar outputs (gradient_error) are averaged
    over equal-size chunks, which equals the unchunked mean."""
    n = o.shape[0]
    chunk = tcfg.ray_chunk
    if not chunk or n <= chunk or n % chunk != 0:
        if chunk and n > chunk and n % chunk != 0:
            from honerf_tpu.utils.backend_probe import workarounds_enabled

            # falling back to the single-dispatch program would hit the
            # exact miscompile the chunk exists to dodge (ADVICE r2); on
            # a backend where the workarounds are ENGAGED the fallback is
            # KNOWN to corrupt output (silently black / NaN at >= ~1764
            # rays), so refuse instead of warn (ADVICE r3) — a warning is
            # too easy to miss in a long training log.
            msg = (
                f"ray_chunk={chunk} does not divide the ray count {n}; "
                "the UNCHUNKED render body is miscompiled by the tunneled "
                "TPU backend at >= ~1764 rays (BENCH_NOTES 'Known "
                "issues').  Size host chunks as a multiple of ray_chunk."
            )
            if workarounds_enabled() and n >= 1764:
                raise ValueError(msg)
            import warnings

            warnings.warn(msg, stacklevel=2)
        return render_single(
            field, rcfg, key, o, d, tcfg.near, tcfg.far,
            cumprod_seed="prev_cdf",
        )
    k = n // chunk
    keys = jax.random.split(key, k)

    def body(args):
        kk, oo, dd = args
        return render_single(
            field, rcfg, kk, oo, dd, tcfg.near, tcfg.far,
            cumprod_seed="prev_cdf",
        )

    outs = jax.lax.map(
        body, (keys, o.reshape(k, chunk, 3), d.reshape(k, chunk, 3))
    )
    merged = {}
    for name, v in outs.items():
        if v.ndim >= 2 and v.shape[1] == chunk:
            merged[name] = v.reshape(n, *v.shape[2:])
        else:  # per-chunk scalars (gradient_error)
            merged[name] = jnp.mean(v, axis=0)
    return merged


def obj_render_from_batch(
    params: Params,
    sdf_cfg: SDFConfig,
    color_cfg: ColorConfig,
    rcfg: RenderConfig,
    tcfg: TrainHyper,
    batch: Dict[str, jnp.ndarray],
    key,
) -> Dict[str, jnp.ndarray]:
    """Camera -> rays -> object-frame -> NeuS render, all in-graph."""
    cam = Camera(
        R=batch["cam_R"], T=batch["cam_T"],
        focal=batch["focal"], principal=batch["principal"],
    )
    rb = xy_to_ray_bundle(cam, batch["rays_xy"])
    Ro, To = refined_obj_pose(params, tcfg, batch["Ro"], batch["To"], batch["index"])
    o, d = rays_to_object_frame(rb.origins, rb.directions, Ro, To)
    field = make_obj_field(params, sdf_cfg, color_cfg)
    return _render_rays_chunked(field, rcfg, tcfg, key, o, d)


def offline_losses(
    out: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray], tcfg: TrainHyper
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Masked L1 + mask BCE + eikonal (exp_runner.py:220-227)."""
    true_mask = (batch["true_mask"] > 0.5).astype(jnp.float32)
    color_loss = masked_l1_color(out["color_fine"], batch["true_rgb"], true_mask)
    m_loss = mask_bce(out["weight_sum"], true_mask)
    eik = out["gradient_error"]
    loss = color_loss + m_loss * tcfg.mask_weight + eik * tcfg.igr_weight
    psnr = masked_psnr(out["color_fine"], batch["true_rgb"], true_mask)
    mask_sum = jnp.sum(true_mask) + 1e-5
    metrics = {
        "loss": loss,
        "color_loss": color_loss,
        "mask_loss": m_loss,
        "eikonal_loss": eik,
        "psnr": psnr,
        "s_val": jnp.mean(out["s_val"]),
        # Statistics/{cdf, weight_max}: masked means of the first-sample
        # CDF and the max compositing weight (exp_runner.py:248-250)
        "cdf": jnp.sum(out["cdf_fine"][:, :1] * true_mask) / mask_sum,
        "weight_max": jnp.sum(out["weight_max"] * true_mask) / mask_sum,
    }
    return loss, metrics


def make_obj_train_step(
    sdf_cfg: SDFConfig,
    color_cfg: ColorConfig,
    rcfg: RenderConfig,
    tcfg: TrainHyper,
    vgg_loss_fn: Optional[Callable] = None,
):
    """Build the jittable object-model train step.

    vgg_loss_fn: optional (params-free) callable (pred_patch, gt_patch,
    ramp) -> scalar added when the batch carries `vgg_ramp` > 0 (patch
    batches; exp_runner.py:228-236).
    """
    opt = make_optimizer(tcfg)

    def loss_fn(params, batch, key):
        out = obj_render_from_batch(params, sdf_cfg, color_cfg, rcfg, tcfg, batch, key)
        loss, metrics = offline_losses(out, batch, tcfg)
        if vgg_loss_fn is not None and tcfg.vgg_weight > 0:
            side = int(round(float(tcfg.batch_size) ** 0.5))
            pred = out["color_fine"].reshape(side, side, 3)
            gt = batch["true_rgb"].reshape(side, side, 3)
            vgg = vgg_loss_fn(pred, gt)
            loss = loss + batch["vgg_ramp"] * tcfg.vgg_weight * vgg
            metrics = dict(metrics, vgg_loss=vgg, loss=loss)
        return loss, metrics

    clip = resolve_grad_clip(tcfg, sdf_cfg)

    def step_fn(state, batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(state["params"], batch, key)
        grads, gnorm = _clipped_grads(grads, clip)
        updates, opt_state = opt.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        return new_state, dict(metrics, grad_norm=gnorm)

    return step_fn


def refined_hand_pose(params: Params, tcfg: TrainHyper, batch):
    """Per-view learnable hand pose refinement (exp_runner.py:163-189):
    se3_refine row -> palm rot6d / 0.1-scaled translation / 20 joint angles
    / 0.1-scaled 7 palm angles, pushed through the inverse HALO path."""
    from honerf_tpu.hand import bone_transforms_from_mano_joints, refined_hand_joints

    joints = batch["joints"][None]  # (1, 21, 3)
    if tcfg.refine_pose:
        ref = params["se3_refine"][batch["index"]][None]  # (1, 36)
        joints = refined_hand_joints(
            joints,
            batch["bone_length"][None],
            joint_refine_angle=ref[:, 9:29],
            palm_refine_angle=ref[:, 29:36] * 0.1,
            palm_rot6d=ref[:, :6],
            palm_trans=ref[:, 6:9] * 0.1,
        )
    bt_inv = bone_transforms_from_mano_joints(joints)[0]
    return bt_inv


def hand_render_from_batch(
    params: Params,
    sdf_cfg: SDFConfig,
    color_cfg: ColorConfig,
    rcfg: RenderConfig,
    tcfg: TrainHyper,
    batch: Dict[str, jnp.ndarray],
    key,
    fused_ladder: Optional[bool] = None,
    fused_interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Camera -> rays -> HALO bone transforms -> NeuS render, in-graph.

    fused_ladder: serve the (non-differentiable) up-sample ladder from the
    fused Pallas kernel — 3.9x the XLA ladder on one TPU chip; bf16
    kernel weights shift sample placement slightly (quality-gated for
    training, BENCH_NOTES).  Tri-state: None = defer to tcfg.fused_ladder
    (itself None = auto-on when trunk_dtype == 'bf16'), True = force on
    (the inference-only eval render), False = force OFF even in bf16 mode
    (debug / quality comparison — ADVICE r2).  Always off on the CPU
    backend (no Mosaic) and multi-device meshes (the GSPMD partitioner is
    not exercised over the pallas_call here).

    fused_interpret=True is a VALIDATION-ONLY mode (the multichip dry
    run): it forces BOTH fused paths on in Pallas interpret mode,
    bypassing the single-chip gate, so the exact program the
    HONERF_FUSED_LADDER_MULTIDEV opt-in would build on real multi-chip
    hardware — pallas_call under GSPMD jit-with-shardings — is traced,
    partitioned, and executed on the virtual CPU mesh.  Never use it for
    training (interpret mode is orders of magnitude slower)."""
    cam = Camera(
        R=batch["cam_R"], T=batch["cam_T"],
        focal=batch["focal"], principal=batch["principal"],
    )
    rb = xy_to_ray_bundle(cam, batch["rays_xy"])
    bt_inv = refined_hand_pose(params, tcfg, batch)
    single_tpu = (
        jax.default_backend() != "cpu" and len(jax.devices()) == 1
    )
    want = fused_ladder if fused_ladder is not None else tcfg.fused_ladder
    use_fused = single_tpu and (
        want if want is not None else sdf_cfg.trunk_dtype == "bf16"
    )
    want_fine = tcfg.fused_fine
    if want_fine is None:  # auto in bf16 mode: fully-fused on one chip
        want_fine = (sdf_cfg.trunk_dtype == "bf16") and "full"
    if want_fine == "xla":
        use_fine = "xla"  # pure XLA — safe on any backend/mesh
    elif want_fine in (True, "full", "full_nocolor", "pallas"):
        use_fine = single_tpu and (
            want_fine if isinstance(want_fine, str) else "full"
        )
    else:
        use_fine = False
    if fused_interpret:  # validation-only: see docstring
        use_fused, use_fine = True, "full"
    # numerics-affecting selection (the auto mode switches bf16 training
    # onto the fused Pallas fine pass): record it once per process so
    # training logs show which implementation produced the checkpoint
    # (ADVICE r3).  Runs at trace time, not per step.
    sel = (use_fine or "xla-joint", bool(use_fused))
    if sel not in _LOGGED_FINE_SELECTIONS:
        _LOGGED_FINE_SELECTIONS.add(sel)
        _logger.info(
            "hand fine pass: %s (fused_ladder=%s, trunk_dtype=%s, "
            "conf train.fused_fine=%r)",
            sel[0], sel[1], sdf_cfg.trunk_dtype, tcfg.fused_fine,
        )
    field = make_hand_field(
        params, sdf_cfg, color_cfg, bt_inv, batch["t_pose_21"],
        fused_ladder=use_fused, fused_fine=use_fine,
        interpret=fused_interpret,
    )
    return _render_rays_chunked(
        field, rcfg, tcfg, key, rb.origins, rb.directions
    )


def make_hand_train_step(
    sdf_cfg: SDFConfig,
    color_cfg: ColorConfig,
    rcfg: RenderConfig,
    tcfg: TrainHyper,
    vgg_loss_fn: Optional[Callable] = None,
    fused_interpret: bool = False,
):
    """Jittable hand-model train step: the HALO kinematic chain runs inside
    the compiled program and se3_refine gradients flow through it.

    fused_interpret: validation-only passthrough to hand_render_from_batch
    (the multichip dry run's MULTIDEV leg — see its docstring)."""
    opt = make_optimizer(tcfg)

    def loss_fn(params, batch, key):
        out = hand_render_from_batch(
            params, sdf_cfg, color_cfg, rcfg, tcfg, batch, key,
            fused_interpret=fused_interpret,
        )
        loss, metrics = offline_losses(out, batch, tcfg)
        if vgg_loss_fn is not None and tcfg.vgg_weight > 0:
            side = int(round(float(tcfg.batch_size) ** 0.5))
            pred = out["color_fine"].reshape(side, side, 3)
            gt = batch["true_rgb"].reshape(side, side, 3)
            vgg = vgg_loss_fn(pred, gt)
            loss = loss + batch["vgg_ramp"] * tcfg.vgg_weight * vgg
            metrics = dict(metrics, vgg_loss=vgg, loss=loss)
        return loss, metrics

    clip = resolve_grad_clip(tcfg, sdf_cfg)

    def step_fn(state, batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(state["params"], batch, key)
        grads, gnorm = _clipped_grads(grads, clip)
        updates, opt_state = opt.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return (
            {"params": params, "opt_state": opt_state, "step": state["step"] + 1},
            dict(metrics, grad_norm=gnorm),
        )

    return step_fn


def make_multi_step(step_fn):
    """Wrap a (state, batch, key) -> (state, metrics) step into a
    K-steps-per-dispatch version via lax.scan.

    The tunneled TPU costs ~3.5 ms per dispatch plus one host->device
    transfer per batch array; uploading K stacked batches and scanning K
    optimizer steps inside one XLA program amortizes both (the end-to-end
    training loop went from 3.8 to near-step-rate throughput).

    Args:
        step_fn: the single-step function (obj or hand).
    Returns:
        multi(state, batches, keys) -> (state, metrics stacked over K).
        `batches` is the batch dict with a leading K axis on every leaf;
        `keys` is (K, 2) PRNG keys.
    """

    def multi(state, batches, keys):
        def body(s, xs):
            batch, key = xs
            return step_fn(s, batch, key)

        return jax.lax.scan(body, state, (batches, keys))

    return multi


from honerf_tpu.utils.backend_probe import (  # noqa: E402  (re-export)
    SAFE_RAY_CHUNK as SAFE_FORWARD_RAY_CHUNK,
    safe_ray_chunk,
)


def eval_ray_chunk(tcfg: TrainHyper) -> int:
    """Effective inner ray_chunk for inference renders.

    The tunneled TPU backend MISCOMPILES large single-dispatch forward
    renders: at the full reference render body, chunk >= 1764 silently
    renders black and chunk >= 4096 all-NaN, while <= 882 is validated
    correct (scripts measurements recorded in BENCH_NOTES.md "Known
    issues"; same backend fault as the batch-1764 train-grad NaN).  Eval
    renders therefore lax.map the known-good 882-ray body whenever the
    backend workarounds engage (utils.backend_probe — one env switch,
    HONERF_BACKEND_WORKAROUNDS, gates all of them; run
    scripts/canary_backend.py on a new backend first).  A conf-pinned
    train.ray_chunk wins.  Host-side chunks must be a multiple of this
    for the chunked path to engage (train/runner.py sizes them
    accordingly)."""
    if tcfg.ray_chunk:
        return tcfg.ray_chunk
    return safe_ray_chunk()


def make_obj_eval_render(
    sdf_cfg: SDFConfig, color_cfg: ColorConfig, rcfg: RenderConfig, tcfg: TrainHyper
):
    """Jittable chunked eval render (no grad, perturb off)."""
    rcfg_eval = rcfg._replace(perturb=0.0)
    tcfg = tcfg._replace(ray_chunk=eval_ray_chunk(tcfg))

    def render_chunk(params, batch, key):
        out = obj_render_from_batch(
            params, sdf_cfg, color_cfg, rcfg_eval, tcfg, batch, key
        )
        return out["color_fine"], out["weight_sum"]

    return render_chunk


def make_hand_eval_render(
    sdf_cfg: SDFConfig, color_cfg: ColorConfig, rcfg: RenderConfig, tcfg: TrainHyper
):
    """Jittable chunked eval render for the hand model (pose from batch
    joints, no refinement — matches validate/test recomputing bt_inv,
    exp_runner.py:318-331).  Inference-only, so the fused Pallas ladder
    engages on a single TPU chip regardless of the training trunk dtype
    (the bf16-weight sample-placement shift is an eval-time
    approximation, same as mesh extraction's); train.fused_ladder=false
    force-disables it here too."""
    rcfg_eval = rcfg._replace(perturb=0.0)
    tcfg_eval = tcfg._replace(
        refine_pose=False, ray_chunk=eval_ray_chunk(tcfg)
    )
    eval_fused = False if tcfg.fused_ladder is False else True

    def render_chunk(params, batch, key):
        out = hand_render_from_batch(
            params, sdf_cfg, color_cfg, rcfg_eval, tcfg_eval, batch, key,
            fused_ladder=eval_fused,
        )
        return out["color_fine"], out["weight_sum"]

    return render_chunk
