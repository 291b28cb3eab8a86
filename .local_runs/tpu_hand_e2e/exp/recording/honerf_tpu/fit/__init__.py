from honerf_tpu.fit.single import (
    SINGLE_FIT_LRS,
    FitHyper,
    current_pose,
    final_pose_numpy,
    init_pose_params,
    make_pose_optimizer,
    make_single_fit_step,
)
from honerf_tpu.fit.video import (
    VIDEO_FIT_LRS,
    init_video_tables,
    make_video_fit_step,
    window_pose,
)

__all__ = [
    "FitHyper",
    "SINGLE_FIT_LRS",
    "VIDEO_FIT_LRS",
    "current_pose",
    "final_pose_numpy",
    "init_pose_params",
    "init_video_tables",
    "make_pose_optimizer",
    "make_single_fit_step",
    "make_video_fit_step",
    "window_pose",
]
