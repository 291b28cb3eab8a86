from honerf_tpu.camera.cameras import (
    Camera,
    full_image_ndc_grid,
    ndc_to_intrinsics,
    pixels_to_ndc,
    project_points,
    unproject_points,
    view_to_world,
    world_to_view,
)
from honerf_tpu.camera.rays import RayBundle, rays_to_points, xy_to_ray_bundle

__all__ = [
    "Camera",
    "RayBundle",
    "full_image_ndc_grid",
    "ndc_to_intrinsics",
    "pixels_to_ndc",
    "project_points",
    "unproject_points",
    "view_to_world",
    "world_to_view",
    "rays_to_points",
    "xy_to_ray_bundle",
]
