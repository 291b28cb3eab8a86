"""One switch for the tunneled-libtpu miscompile workarounds.

This container's TPU backend (a tunneled libtpu with a client/runtime
version mismatch) MISCOMPILES two program families, both diagnosed in
round 2 (BENCH_NOTES.md "Known issues", scripts/diag_nan_1764*.py):

  * large single-dispatch renders: the full reference render body goes
    silently BLACK at >= ~1764 rays and all-NaN at >= 4096 (forward), and
    the composite render+grad program goes NaN at batch >= ~1756
    (every subprogram finite in isolation; CPU finite; seed-independent);
  * K=16 train scans: steps_per_dispatch=16 diverged at ~step 300 where
    K=8 does not (suspected same shape-sensitivity family).

The shipped workarounds — lax.map'ing the validated 882-ray body inside
big host chunks and the K=8 dispatch default — cost nothing on THIS
backend but would silently tax a healthy libtpu.  `workarounds_enabled`
is the single gate all three sites consult (train.offline.eval_ray_chunk,
fit.runner.render_dual_views, train.runner's steps_per_dispatch default):

  HONERF_BACKEND_WORKAROUNDS=on    force workarounds on
  HONERF_BACKEND_WORKAROUNDS=off   force workarounds off (healthy backend)
  unset / auto                     on for any non-CPU backend (the only
                                   non-CPU backend this container ever
                                   sees is the known-bad tunnel)

Run `python scripts/canary_backend.py` on a new backend to decide: it
compiles the exact failing programs (forward render at 1764/4096 rays,
render+grad at 1764) and prints a JSON verdict plus the recommended
setting.  Record the output in BENCH_NOTES.md per environment.
"""

from __future__ import annotations

import os

import jax

ENV_VAR = "HONERF_BACKEND_WORKAROUNDS"

#: Largest per-dispatch ray count validated correct at the full render
#: body on the tunneled backend (1764 = 2x is the smallest known-bad).
SAFE_RAY_CHUNK = 882


def workarounds_enabled() -> bool:
    """True when the miscompile workarounds should engage (see module
    docstring).  Not cached: tests flip the env var / backend."""
    mode = os.environ.get(ENV_VAR, "auto").strip().lower()
    if mode in ("on", "1", "true", "yes"):
        return True
    if mode in ("off", "0", "false", "no"):
        return False
    return jax.default_backend() != "cpu"


def safe_ray_chunk() -> int:
    """Inner lax.map body size for inference renders: SAFE_RAY_CHUNK under
    the workarounds, 0 (= unchunked single dispatch) otherwise."""
    return SAFE_RAY_CHUNK if workarounds_enabled() else 0


def default_steps_per_dispatch() -> int:
    """Default K optimizer steps per device dispatch for offline training:
    8 under the workarounds (K=16 diverged on the tunneled backend), 16
    on a healthy backend (amortizes dispatch further)."""
    return 8 if workarounds_enabled() else 16


def round_chunk(chunk: int, *multiples: int) -> int:
    """Round a host-side ray chunk UP to a common multiple of every
    nonzero value in `multiples` (the lax.map inner body and/or the device
    count), so the chunked render path engages instead of silently falling
    back to the single-dispatch program the backend miscompiles."""
    import math

    lcm = 1
    for m in multiples:
        if m:
            lcm = lcm * m // math.gcd(lcm, m)
    return -(-chunk // lcm) * lcm
