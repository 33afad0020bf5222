"""
Multi-host / multi-process initialization helpers.

The reference's process topology is Horovod's mpirun-launched world
(dl4ds/training/base.py:97-107); the JAX equivalent is single-controller
multi-process: every host runs the same program, `jax.distributed.initialize`
wires the hosts together, and `jax.devices()` then spans the whole slice.
Trainers already gate host-side IO on `jax.process_index() == 0` and shard
the batch over the global mesh, so after `initialize()` no further changes
are needed.
"""

import jax

__all__ = ['initialize', 'is_multi_host', 'process_index', 'process_count',
           'global_mesh']


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               **kwargs):
    """Initialize multi-host JAX.

    On Cloud TPU pods/slices all arguments are auto-detected from the
    environment; on other clusters pass them explicitly (or rely on SLURM /
    OpenMPI auto-detection in jax.distributed).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id, **kwargs)


def is_multi_host():
    return jax.process_count() > 1


def process_index():
    return jax.process_index()


def process_count():
    return jax.process_count()


def global_mesh(axis_name='data'):
    """A 1-D data-parallel mesh over every device in the (multi-host) slice.
    Pass the result as `mesh=` to any trainer."""
    from .training.base import make_mesh
    return make_mesh(axis_name=axis_name)
