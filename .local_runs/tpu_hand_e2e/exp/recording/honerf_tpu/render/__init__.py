from honerf_tpu.render.neus import (
    Field,
    RenderConfig,
    coarse_z_vals,
    make_hand_field,
    make_obj_field,
    rays_to_object_frame,
    render_single,
    sdf_to_alpha,
)
from honerf_tpu.render.sampling import (
    hierarchical_z_vals,
    merge_z_vals,
    neus_upsample_weights,
    sample_pdf_det,
)

__all__ = [
    "Field",
    "RenderConfig",
    "coarse_z_vals",
    "hierarchical_z_vals",
    "make_hand_field",
    "make_obj_field",
    "merge_z_vals",
    "neus_upsample_weights",
    "rays_to_object_frame",
    "render_single",
    "sample_pdf_det",
    "sdf_to_alpha",
]
