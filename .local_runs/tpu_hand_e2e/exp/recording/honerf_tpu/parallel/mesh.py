"""Device mesh + sharding helpers.

The reference has no distributed support at all (SURVEY.md §2.2); here
data parallelism over the RAY axis is first-class: batches are sharded over
a 1-D `data` mesh axis, parameters are replicated, and XLA inserts the
psum/all-reduce collectives over ICI automatically under jit-with-shardings
(the pjit/GSPMD model — no hand-written communication).

The same helpers drive the virtual 8-device CPU mesh in tests and the real
TPU mesh in production; views and video frames shard through the same ray
axis because batches are flattened to (rays, ...) before the step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    """Pad the leading axis so it divides the mesh size (padded rays carry
    zero mask weight so they do not perturb the losses)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return np.pad(arr, pad, mode="edge")


def shard_ray_batch(
    batch: Dict[str, Any], mesh: Mesh, ray_keys=("rays_xy", "true_rgb", "true_mask")
) -> Dict[str, Any]:
    """Device-put a host batch: ray-indexed arrays sharded over the mesh,
    everything else replicated."""
    data_s = data_sharding(mesh)
    repl_s = replicated_sharding(mesh)
    out = {}
    for k, v in batch.items():
        sharding = data_s if k in ray_keys else repl_s
        out[k] = jax.device_put(v, sharding)
    return out
