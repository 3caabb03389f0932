from .depth import (
    EIGEN_CROP,
    compute_errors,
    batch_post_process_disparity,
    evaluate_depth_predictions,
    disp_to_eval_depth,
)
from .pose import dump_xyz, compute_ate, evaluate_pose_sequence
