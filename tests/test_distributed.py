"""Multi-host evidence: a REAL 2-process jax.distributed smoke on CPU.

Spawns two worker processes wired through a local coordinator
(`dl4ds_tpu.distributed.initialize`), builds the global mesh spanning both
processes, runs a sharded computation whose result requires cross-process
reduction, and checks process gating — the end-to-end analogue of the
reference's Horovod world (SURVEY.md §2.2).
"""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=2')
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, {repo!r})

pid, port = int(sys.argv[1]), sys.argv[2]
from dl4ds_tpu import distributed
distributed.initialize(coordinator_address=f'127.0.0.1:{{port}}',
                       num_processes=2, process_id=pid,
                       local_device_ids=[0, 1])
assert distributed.process_count() == 2
assert distributed.is_multi_host()
assert distributed.process_index() == pid

mesh = distributed.global_mesh()
assert mesh.size == 4, mesh.size  # 2 local CPU devices x 2 processes

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

# per-host shard -> global array over the 'data' axis; the jitted sum needs
# a cross-process all-reduce, proving the collective path works
local = np.full((2, 4), pid + 1, np.float32)   # host 0 -> 1s, host 1 -> 2s
arr = multihost_utils.host_local_array_to_global_array(local, mesh, P('data'))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
val = float(total)
assert val == 1.0 * 8 + 2.0 * 8, val   # both hosts' contributions

# worker-0 gating: exactly one process is the artifact writer
first = distributed.process_index() == 0
print(f'RESULT pid={{pid}} total={{val}} first_worker={{first}}', flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / 'worker.py'
    worker.write_text(_WORKER.format(repo=repo))
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
    assert 'RESULT pid=0 total=24.0 first_worker=True' in outs[0]
    assert 'RESULT pid=1 total=24.0 first_worker=False' in outs[1]


def test_dp_convergence_equivalence():
    """Same global batch + same seed: the 8-device sharded train step must
    produce the same loss trajectory as the single-device step (f32
    reduction-order tolerance). Isolates the numerics of the sharded step
    from the Goyal LR policy by holding the EFFECTIVE learning rate fixed
    (the policy scales lr by mesh size; batch_size here is per-replica)."""
    import jax
    import dl4ds_tpu as dds
    t = np.arange(40)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing='ij')
    data = np.stack([np.sin(0.3 * yy + 0.1 * k) * np.cos(0.4 * xx - 0.05 * k)
                     for k in t])[..., None].astype('float32')
    common = dict(backbone='convnet', upsampling='pin', data_train=data[:24],
                  data_val=data[24:32], data_test=data[32:], scale=4,
                  epochs=3, loss='mae', n_filters=4, n_blocks=1, save=False,
                  verbose=False, seed=0)
    tr1 = dds.SupervisedTrainer(batch_size=8, learning_rate=1e-3,
                                devices=jax.devices()[:1], **common)
    tr1.run()
    tr8 = dds.SupervisedTrainer(batch_size=1, learning_rate=1e-3 / 8,
                                **common)  # default mesh: all 8 devices
    tr8.run()
    assert tr1.global_batch_size == tr8.global_batch_size == 8
    l1 = np.asarray(tr1.fithist['loss'], 'float64')
    l8 = np.asarray(tr8.fithist['loss'], 'float64')
    assert l1.shape == l8.shape
    np.testing.assert_allclose(l1, l8, rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(tr1.test_loss, tr8.test_loss, rtol=5e-3)
