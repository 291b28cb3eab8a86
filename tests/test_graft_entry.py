"""Driver-contract tests: __graft_entry__ dryrun_multichip on the virtual
CPU mesh (the driver runs the same check)."""

import os
import subprocess
import sys


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as g
    finally:
        sys.path.pop(0)
    g.dryrun_multichip(8)  # asserts finite loss internally


def test_dryrun_multichip_from_default_platform_env():
    """Simulate the driver: a fresh process where nothing forces the CPU
    platform (the axon sitecustomize pins the tunneled TPU).  The r01 run
    failed exactly here — dispatch hit the TPU before the fallback engaged
    (MULTICHIP_r01.json ok=false).  dryrun_multichip must never touch the
    default backend."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert res.returncode == 0 and "OK" in res.stdout, (
        res.stdout[-2000:] + res.stderr[-2000:]
    )
