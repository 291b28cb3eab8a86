"""Ray-bundle construction from NDC pixel grids.

TPU-native replacement of the reference's two-plane unprojection through
pytorch3d (reference: utils/utils.py:31-115 `_xy_to_ray_bundle`): xy points
are unprojected at depths 1 and 2, the difference gives the (unit) ray
direction, and the origin is the depth-1 point minus one direction unit —
preserving that convention exactly, since the renderer's `near`/`far` are
calibrated against it.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from honerf_tpu.camera.cameras import Camera, unproject_points
from honerf_tpu.utils.transforms import normalize


class RayBundle(NamedTuple):
    origins: jnp.ndarray  # (..., 3)
    directions: jnp.ndarray  # (..., 3) unit length
    xys: jnp.ndarray  # (..., 2) NDC coordinates


def xy_to_ray_bundle(camera: Camera, xy_ndc: jnp.ndarray) -> RayBundle:
    """NDC xy grid -> world-space ray bundle.

    Args:
        camera: single Camera (vmap for batches of cameras).
        xy_ndc: (..., 2) NDC coordinates.

    Returns:
        RayBundle with origins/directions of shape (..., 3).
    """
    depth1 = jnp.ones(xy_ndc.shape[:-1] + (1,), dtype=xy_ndc.dtype)
    p1 = unproject_points(camera, jnp.concatenate([xy_ndc, depth1], axis=-1))
    p2 = unproject_points(camera, jnp.concatenate([xy_ndc, 2.0 * depth1], axis=-1))
    directions = normalize(p2 - p1)
    # Reference convention: origin sits one unit *behind* the depth-1 plane
    # (utils/utils.py:107-108), so `near`/`far` are measured from there.
    origins = p1 - directions
    return RayBundle(origins=origins, directions=directions, xys=xy_ndc)


def rays_to_points(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, z_vals: jnp.ndarray
) -> jnp.ndarray:
    """(R, 3), (R, 3), (R, S) -> (R, S, 3) sample points along rays."""
    return rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
