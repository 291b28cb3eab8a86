"""bench.py driver contract: one JSON line with the flagship hand
throughput as the headline value and the object number alongside
(VERDICT r3 #2).  Runs the real full-size train steps with shrunken
iteration counts — throughput values are meaningless on CPU, the
contract (schema, finiteness, positivity) is what's pinned."""

import io
import json
import contextlib

import numpy as np


def test_bench_json_contract(monkeypatch):
    import bench

    monkeypatch.setenv("HONERF_BENCH_NO_WAIT", "1")
    monkeypatch.setattr(bench, "WARMUP", 1)
    monkeypatch.setattr(bench, "ITERS", 2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got {lines}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "offline_hand_train_rays_per_sec_per_chip"
    assert rec["unit"] == "rays/s"
    for key in ("value", "vs_baseline", "obj_rays_per_sec",
                "obj_vs_baseline"):
        assert np.isfinite(rec[key]) and rec[key] > 0, (key, rec)
    assert abs(rec["vs_baseline"]
               - rec["value"] / bench.BASELINE_RAYS_PER_SEC) < 1e-2
