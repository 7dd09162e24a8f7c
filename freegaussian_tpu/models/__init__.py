from .densify import DensifyConfig, DensifyState, refine, update_stats, zero_moment_rows
from .fields import ControlField, DeformField, apply_se3_deform
from .gaussians import GaussianParams, colors_from_features, init_gaussians, num_alive
from .splat_model import SplatConfig, background_color, forward, loss_fn, psnr
from .ssim import ssim
