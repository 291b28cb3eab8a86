"""NDC perspective camera model in pure JAX.

Replaces the reference's pytorch3d ``PerspectiveCameras`` +
``unproject_points(from_ndc=True)`` native dependency (reference:
utils/utils.py:96, constructed at exp_runner.py:201) with the closed-form
math, fully jittable and differentiable.

Conventions (pytorch3d-compatible):
  * world -> view uses ROW-vector convention:  X_view = X_world @ R + T.
  * view -> NDC perspective projection:
        x_ndc = fx * x_v / z_v + px,   y_ndc = fy * y_v / z_v + py,
    with (fx, fy) the NDC focal lengths and (px, py) the NDC principal
    point; depth is the view-space z.
  * pixel -> NDC uses s = min(H, W) and a sign flip (reference:
    utils/dataset.py:44-47):  x_ndc = -(x_pix - W/2) / (H/2) for landscape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """A single perspective camera with NDC intrinsics.

    Fields broadcast: stack leading axes to represent camera batches and
    `jax.vmap` the functions below.
    """

    R: jnp.ndarray  # (3, 3) world->view rotation, row-vector convention
    T: jnp.ndarray  # (3,)   world->view translation
    focal: jnp.ndarray  # (2,) (fx_ndc, fy_ndc)
    principal: jnp.ndarray  # (2,) (px_ndc, py_ndc)


def world_to_view(camera: Camera, pts: jnp.ndarray) -> jnp.ndarray:
    """X_view = X_world @ R + T  (pytorch3d row-vector convention)."""
    return pts @ camera.R + camera.T


def view_to_world(camera: Camera, pts: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `world_to_view` (R is orthonormal)."""
    return (pts - camera.T) @ camera.R.T


def project_points(camera: Camera, pts_world: jnp.ndarray) -> jnp.ndarray:
    """World points -> (x_ndc, y_ndc, depth)."""
    v = world_to_view(camera, pts_world)
    z = v[..., 2:3]
    xy = camera.focal * v[..., :2] / z + camera.principal
    return jnp.concatenate([xy, z], axis=-1)


def unproject_points(camera: Camera, xy_depth: jnp.ndarray) -> jnp.ndarray:
    """(x_ndc, y_ndc, depth) -> world points.

    Closed-form inverse of the pytorch3d NDC perspective projection; the
    native `cameras.unproject_points(..., from_ndc=True)` equivalent.
    """
    xy = xy_depth[..., :2]
    depth = xy_depth[..., 2:3]
    v_xy = (xy - camera.principal) * depth / camera.focal
    pts_view = jnp.concatenate([v_xy, depth], axis=-1)
    return view_to_world(camera, pts_view)


def pixels_to_ndc(xy_pix: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Pixel coordinates (x, y) -> NDC with the reference's convention
    (utils/dataset.py:44-47): scale by H/2 (s = min dimension for landscape
    images) and flip sign."""
    x = (xy_pix[..., 0] - W / 2.0) / (H / 2.0)
    y = (xy_pix[..., 1] - H / 2.0) / (H / 2.0)
    return -jnp.stack([x, y], axis=-1)


def full_image_ndc_grid(H: int, W: int) -> jnp.ndarray:
    """The (H*W, 2) NDC grid used for full-image renders (reference:
    exp_runner.py:338-350): x from +range_x to -range_x across W columns,
    y from +range_y to -range_y down H rows."""
    if W >= H:
        range_x, range_y = W / H, 1.0
    else:
        range_x, range_y = 1.0, H / W
    xs = jnp.linspace(range_x, -range_x, W)
    ys = jnp.linspace(range_y, -range_y, H)
    grid_x = jnp.tile(xs[None, :], (H, 1)).reshape(-1, 1)
    grid_y = jnp.tile(ys[:, None], (1, W)).reshape(-1, 1)
    return jnp.concatenate([grid_x, grid_y], axis=-1)


def ndc_to_intrinsics(
    focal: jnp.ndarray, principal: jnp.ndarray, H: int, W: int
) -> jnp.ndarray:
    """Recover the pixel-space K matrix from NDC camera params (reference:
    utils/dataset.py:91-114 uses s-1/w-1/h-1 offsets; dataset.py:515-534 is
    the same with (s-1)).  Uses the (s-1) variant used in the fitting path."""
    s = min(H, W) - 1
    fx = -focal[0] * s / 2.0
    fy = -focal[1] * s / 2.0
    cx = -principal[0] * s / 2.0 + (W - 1) / 2.0
    cy = -principal[1] * s / 2.0 + (H - 1) / 2.0
    K = jnp.eye(3)
    K = K.at[0, 0].set(fx).at[1, 1].set(fy)
    K = K.at[0, 2].set(cx).at[1, 2].set(cy)
    return K
