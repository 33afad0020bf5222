"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; the standard JAX answer is
XLA's host-platform device virtualization (SURVEY.md §4). The sandbox's
sitecustomize pins JAX_PLATFORMS=axon, so we also flip the config knob before
the first backend initialization.
"""

import os

os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8')
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')

import sys

import numpy as np
import pytest

# The real xarray is not installable in this image. Load the minimal
# in-repo stand-in (tests/_stubs/xarray.py) so the DataArray coercion,
# time_metadata='auto' and netCDF export paths actually execute; never
# shadow a real installation.
try:
    import xarray  # noqa: F401
except ImportError:
    sys.path.append(os.path.join(os.path.dirname(__file__), '_stubs'))


@pytest.fixture
def rng():
    return np.random.default_rng(42)
