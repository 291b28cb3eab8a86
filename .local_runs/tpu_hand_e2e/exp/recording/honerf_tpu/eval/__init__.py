from honerf_tpu.eval.image_quality import image_metrics, lpips_vgg, psnr, ssim
from honerf_tpu.eval.interaction import (
    interaction_metrics,
    intersect_volume,
    penetration_depth,
)
from honerf_tpu.eval.pose import add, adi, evaluate_pose_set, mpjpe
from honerf_tpu.eval.temporal import acceleration_error, pci, penetration_iou

__all__ = [
    "acceleration_error",
    "add",
    "adi",
    "evaluate_pose_set",
    "image_metrics",
    "interaction_metrics",
    "intersect_volume",
    "lpips_vgg",
    "mpjpe",
    "pci",
    "penetration_depth",
    "penetration_iou",
    "psnr",
    "ssim",
]
