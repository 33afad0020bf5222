"""
DL4DS-TPU — TPU-native (JAX / XLA / Pallas / pjit) framework for empirical
downscaling (statistical super-resolution) of gridded Earth-science data.

A ground-up re-design of the capabilities of dl4ds (reference:
/root/reference/dl4ds/__init__.py:7-53) for TPU hardware: device-resident,
jit-compiled data synthesis, Flax model zoo, GSPMD/pjit data parallelism over
a `jax.sharding.Mesh`, and Pallas kernels for the hot fused ops.

Public vocabulary (name strings) is kept compatible with the reference so a
dl4ds user can switch configs without translation.
"""

__version__ = "0.1.0"

# Registries — same canonical vocabulary as the reference
# (reference: dl4ds/__init__.py:7-45)
BACKBONE_BLOCKS = [
    'convnet',          # plain convolutional blocks w/o skip connections
    'resnet',           # residual convolutional blocks
    'densenet',         # dense convolutional blocks
    'convnext',         # convnext-style residual blocks
    'unet']             # unet (encoder-decoder) backbone

UPSAMPLING_METHODS = [
    'spc',              # sub-pixel convolution (pixel shuffle), post-upsampling
    'rc',               # resize convolution, post-upsampling
    'dc',               # deconvolution (transposed convolution), post-upsampling
    'pin']              # pre-upsampling via interpolation
POSTUPSAMPLING_METHODS = ['spc', 'rc', 'dc']

INTERPOLATION_METHODS = [
    'inter_area',       # resampling using pixel-area relation
    'nearest',          # nearest-neighbour interpolation
    'bicubic',          # bicubic interpolation (a=-0.75, OpenCV convention)
    'bilinear',         # bilinear interpolation
    'lanczos']          # Lanczos interpolation over an 8x8 neighbourhood

LOSS_FUNCTIONS = [
    'mae',              # mean absolute error
    'mse',              # mean squared error
    'dssim',            # structural dissimilarity
    'dssim_mae',        # 0.8 * DSSIM + 0.2 * MAE
    'dssim_mse',        # 0.8 * DSSIM + 0.2 * MSE
    'dssim_mae_mse',    # 0.6 * DSSIM + 0.2 * MAE + 0.2 * MSE
    'msdssim',          # multiscale structural dissimilarity
    'msdssim_mae',      # 0.8 * MSDSSIM + 0.2 * MAE
    'msdssim_mae_mse']  # 0.6 * MSDSSIM + 0.2 * MAE + 0.2 * MSE

DROPOUT_VARIANTS = [
    'vanilla',          # vanilla dropout
    'gaussian',         # gaussian (multiplicative noise) dropout
    'spatial',          # spatial (whole-channel) dropout
    'mcdrop',           # monte-carlo vanilla dropout (active at inference)
    'mcgaussiandrop',   # monte-carlo gaussian dropout
    'mcspatialdrop']    # monte-carlo spatial dropout

from .interpolation import resize_array, resize_matrix
from .utils import (crop_array, checkarray_ndim, Timing,
                        spatial_to_spatiotemporal_samples,
                        spatiotemporal_to_spatial_samples,
                        check_compatibility_upsbackb, checkarg_upsampling,
                        checkarg_backbone, checkarg_dropout_variant,
                        checkarg_loss, checkarg_interpolation, list_devices,
                        plot_history)
from .viz import interactive_panel, plot_projected
from .preprocessing import MinMaxScaler, StandardScaler
from . import losses
from .dataloader import (create_pair_hr_lr, create_batch_hr_lr, DataGenerator,
                         BatchSynthesizer, _get_season_, _get_season_array_)
from .models import (net_postupsampling, net_pin, unet_pin,
                     recnet_postupsampling, recnet_pin,
                     residual_discriminator, build_model, save_model,
                     load_model)
from .training import Trainer, SupervisedTrainer, CGANTrainer, load_checkpoint
from .inference import Predictor, predict, predict_mc
from .metrics import (compute_rmse, compute_correlation, compute_metrics,
                      crps_ensemble, spread_skill, rank_histogram,
                      compute_prob_metrics)
from .export import (export_forward, save_serving_artifact,
                     load_serving_artifact)
from .quantization import quantize_forward
from . import compat
from .compat import import_keras_weights
