from .math import (
    bilinear_interp,
    embed_dim,
    exp_se3,
    exp_so3,
    exponential_decay_schedule,
    from_homogeneous,
    get_viewmat,
    num_sh_bases,
    positional_embed,
    quat_to_rotmat,
    quats_to_covar,
    random_quat,
    resize_image,
    rgb_to_sh,
    sh_to_rgb,
    skew,
    to_homogeneous,
)
from .projection import ProjectionResult, project_gaussians
from .rasterize import RasterizeInfo, rasterization
from .rasterize_ref import rasterize_pixels_reference
from .sh import eval_sh_colors, sh_basis
