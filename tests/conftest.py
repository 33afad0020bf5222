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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
