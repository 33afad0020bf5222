"""Low-level TPU ops: SSIM family, pixel shuffle, and Pallas kernels."""

from .ssim import ssim, ssim_multiscale, psnr
from .array import depth_to_space, space_to_depth

__all__ = ['ssim', 'ssim_multiscale', 'psnr', 'depth_to_space',
           'space_to_depth']
