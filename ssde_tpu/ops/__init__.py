from .geometry import (
    disp_to_depth,
    depth_to_disp,
    rot_from_axisangle,
    get_translation_matrix,
    transformation_from_parameters,
    backproject_depth,
    project_3d,
    reproject_coords,
)
from .image import (
    upsample2x_nearest,
    resize_bilinear,
    pixel_shuffle,
    reflect_pad_2d,
    avg_pool_3x3,
)
from .warp import grid_sample
from .losses import (
    ssim,
    reprojection_loss,
    smooth_loss,
    compute_depth_errors,
    photometric_loss,
)
