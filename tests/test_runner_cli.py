"""Config-driven Runner end-to-end test: synthetic data + small conf ->
train a few iters -> checkpoint -> resume -> test render -> mesh extract
(the exp_runner.py workflow parity, SURVEY.md §3.1-3.2)."""

import json
import os
import textwrap

import numpy as np
import pytest

from honerf_tpu.data.synthetic import generate_object_dataset

SMALL_CONF = """
general {{
    base_exp_dir = {exp_dir}
    model_type = obj
    data_type = real
}}
dataset {{
    traindata_dir = {data_dir}
    testdata_dir = {data_dir}
    image_size = [48, 56]
}}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = 12
    near = 0.4
    far = 1.5
    batch_size = 49
    warm_up_end = 2
    save_freq = 6
    val_freq = 1000000
    report_freq = 4
    igr_weight = 1.0
    mask_weight = 1.0
    vgg_weight = 0.0
    refine_pose = True
}}
model {{
    sdf_network {{
        d_out = 65
        d_in = 3
        d_hidden = 64
        n_layers = 3
        skip_in = [2]
        v_multires = 6
        r_multires = 4
        bias = 0.5
        scale = 1.0
        geometric_init = True
        weight_norm = True
    }}
    variance_network {{ init_val = 0.3 }}
    rendering_network {{
        d_feature = 64
        d_in = 3
        d_out = 3
        d_hidden = 64
        n_layers = 2
        weight_norm = True
        v_multires = 6
        r_multires = 4
        grad_multires = 4
        squeeze_out = True
        use_gradients = True
    }}
    neus_renderer {{
        n_samples = 12
        n_importance = 12
        n_outside = 0
        up_sample_steps = 2
        perturb = 1.0
    }}
}}
"""


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("runner_ws")
    data_dir = ws / "data"
    generate_object_dataset(str(data_dir), n_frames=1, n_views=4, H=48, W=56)
    conf_path = ws / "small.conf"
    conf_path.write_text(
        SMALL_CONF.format(exp_dir=str(ws / "exp"), data_dir=str(data_dir))
    )
    return ws, str(conf_path)


def test_runner_train_checkpoint_resume(workspace):
    from honerf_tpu.train.runner import OfflineRunner

    ws, conf_path = workspace
    runner = OfflineRunner(conf_path, mode="train", case="bean")
    runner.train()
    assert runner.iter_step == 12
    ckpt_dir = os.path.join(str(ws / "exp"), "checkpoints")
    ckpts = sorted(os.listdir(ckpt_dir))
    assert ckpts == ["ckpt_000006.npz", "ckpt_000012.npz"]
    # metrics stream written, with the full TB statistics subset
    # (exp_runner.py:244-251 incl. Statistics/{cdf, weight_max})
    metrics = os.path.join(str(ws / "exp"), "logs", "metrics.jsonl")
    lines = [json.loads(l) for l in open(metrics)]
    assert len(lines) >= 12
    for k in ["loss", "color_loss", "mask_loss", "eikonal_loss", "psnr",
              "s_val", "cdf", "weight_max"]:
        assert k in lines[0], k
        assert np.isfinite(lines[0][k])
    # source snapshot exists
    assert os.path.exists(os.path.join(str(ws / "exp"), "recording", "config.conf"))

    # resume picks up the latest checkpoint
    runner2 = OfflineRunner(conf_path, mode="test", case="bean", is_continue=True)
    assert runner2.iter_step == 12
    a = np.asarray(runner.state["params"]["sdf"]["layers"][0]["v"])
    b = np.asarray(runner2.state["params"]["sdf"]["layers"][0]["v"])
    np.testing.assert_allclose(a, b)
    # the optimizer state must survive the npz round trip structurally:
    # resuming and CONTINUING TRAINING must work (optax NamedTuples)
    import optax

    assert isinstance(runner2.state["opt_state"][0], optax.ScaleByAdamState)
    runner3 = OfflineRunner(conf_path, mode="train", case="bean", is_continue=True)
    runner3.tcfg = runner3.tcfg._replace(end_iter=16)
    runner3.train()
    assert runner3.iter_step == 16


def test_runner_test_render_and_mesh(workspace):
    from honerf_tpu.train.runner import OfflineRunner

    ws, conf_path = workspace
    runner = OfflineRunner(conf_path, mode="test", case="bean", is_continue=True)
    runner.test()
    renders = os.listdir(os.path.join(str(ws / "exp"), "test_render"))
    assert len(renders) == 4
    runner.validate_mesh(resolution=32)
    meshes = os.listdir(os.path.join(str(ws / "exp"), "meshes"))
    assert len(meshes) == 4
    from honerf_tpu.utils.ply import load_ply

    v, f = load_ply(os.path.join(str(ws / "exp"), "meshes", meshes[0]))
    assert len(v) > 0 and len(f) > 0


def test_runner_train_data_parallel_mesh(tmp_path):
    """With a divisible batch on the 8-device CPU mesh the runner engages
    ray-axis data parallelism (train.data_parallel default) and trains to
    finite losses; data_parallel=false opts out."""
    import jax

    from honerf_tpu.train.runner import OfflineRunner

    ws = str(tmp_path)
    data_dir = os.path.join(ws, "data")
    generate_object_dataset(data_dir, n_views=4, H=48, W=56)
    conf = os.path.join(ws, "dp.conf")
    with open(conf, "w") as f:
        f.write(
            SMALL_CONF.format(exp_dir=os.path.join(ws, "exp"),
                              data_dir=data_dir)
            .replace("batch_size = 49", "batch_size = 48")
            .replace("end_iter = 12", "end_iter = 8")
        )
    runner = OfflineRunner(conf, mode="train")
    assert runner._mesh is not None
    assert runner._mesh.devices.size == len(jax.devices())
    runner.train()
    recs = [json.loads(l) for l in open(
        os.path.join(ws, "exp", "logs", "metrics.jsonl"))]
    assert len(recs) == 8
    assert all(np.isfinite(r["loss"]) for r in recs)

    conf2 = os.path.join(ws, "dp_off.conf")
    with open(conf2, "w") as f:
        f.write(
            SMALL_CONF.format(exp_dir=os.path.join(ws, "exp2"),
                              data_dir=data_dir)
            .replace("batch_size = 49", "batch_size = 48")
            .replace("refine_pose = True",
                     "refine_pose = True\n    data_parallel = false")
        )
    assert OfflineRunner(conf2, mode="train")._mesh is None


def test_train_stop_at_pauses_without_schedule_shift(tmp_path):
    """train(stop_at=N) stops exactly at N (a save_freq boundary saves a
    checkpoint there) but keeps the LR schedule anchored to the conf's
    end_iter: resuming with --is_continue and training to the end yields
    the SAME per-step learning rates as one uninterrupted run — the
    split-process contract scripts/soak_resume.py relies on."""
    from honerf_tpu.train.runner import OfflineRunner
    from honerf_tpu.train.schedule import make_lr_schedule

    ws = str(tmp_path)
    data_dir = os.path.join(ws, "data")
    generate_object_dataset(data_dir, n_views=4, H=48, W=56)

    split = os.path.join(ws, "split.conf")
    with open(split, "w") as f:
        f.write(SMALL_CONF.format(exp_dir=os.path.join(ws, "split"),
                                  data_dir=data_dir))

    def lr_at(runner, s):
        t = runner.tcfg
        sched = make_lr_schedule(t.learning_rate, t.warm_up_end,
                                 t.end_iter, t.learning_rate_alpha)
        return float(sched(s))

    r = OfflineRunner(split, mode="train")
    lr_full_9 = lr_at(r, 9)
    r.train(stop_at=6)
    assert r.iter_step == 6
    assert os.path.exists(os.path.join(ws, "split", "checkpoints",
                                       "ckpt_000006.npz"))
    # crash-consistency: metric lines flushed PAST the resume checkpoint
    # (a process that died between a flush and its next save) must be
    # truncated on resume, or re-training those steps duplicates them
    metrics_path = os.path.join(ws, "split", "logs", "metrics.jsonl")
    with open(metrics_path, "a") as f:
        f.write(json.dumps({"step": 7, "loss": 123.0}) + "\n")
        # a step-LESS but valid-JSON record (e.g. a future summary
        # line) is NOT torn — truncate must keep it, not silently
        # delete history in the crash-recovery path
        f.write(json.dumps({"note": "config-stamp"}) + "\n")
        # a killed process can also leave a TORN partial line with no
        # trailing newline; resume must drop it, or the next append
        # concatenates onto it and corrupts the JSONL (ADVICE r4)
        f.write('{"step": 8, "lo')
    r2 = OfflineRunner(split, mode="train", is_continue=True)
    lines = open(metrics_path).read().splitlines()
    recs = [json.loads(l) for l in lines]  # every line parses again
    assert not any(rec.get("step", 0) > 6 for rec in recs)
    assert any("note" in rec for rec in recs)  # stepless line survives
    assert r2.iter_step == 6
    # schedule still anchored to end_iter=12, not the stop point
    assert lr_at(r2, 9) == lr_full_9
    r2.train()
    recs = [json.loads(l) for l in open(
        os.path.join(ws, "split", "logs", "metrics.jsonl"))]
    steps = [rec["step"] for rec in recs if "step" in rec]
    assert steps == list(range(1, 13))  # gapless, no duplicates
