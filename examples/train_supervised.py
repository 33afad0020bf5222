#!/usr/bin/env python
"""Runnable end-to-end example: supervised 4x downscaling on a synthetic
temperature-like field, followed by inference and the metrics suite.

    python examples/train_supervised.py            # real TPU
    JAX_PLATFORMS=cpu python examples/train_supervised.py --cpu
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if '--cpu' in sys.argv:
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=8')
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')

import numpy as np
import dl4ds_tpu as dds


def synthetic_t2m(n=512, size=96, seed=0):
    """Smooth advecting field + topography-correlated fine structure."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing='ij')
    topo = np.sin(0.21 * yy) * np.cos(0.17 * xx) \
        + 0.5 * np.sin(0.53 * yy + 1.3) * np.cos(0.47 * xx)
    frames = [(np.sin(0.07 * yy + 0.05 * k) * np.cos(0.09 * xx - 0.04 * k)
               + 0.3 * topo + 0.05 * rng.standard_normal((size, size)))
              for k in range(n)]
    return (np.stack(frames)[..., None].astype('float32'),
            topo.astype('float32'))


def main():
    quick = '--cpu' in sys.argv  # smaller run for the CPU demo
    data, topo = synthetic_t2m(n=128 if quick else 512,
                               size=32 if quick else 96)
    scaler = dds.StandardScaler(axis=None)
    data = scaler.fit_transform(data)[..., None].astype('float32')
    n = data.shape[0]
    i1, i2 = int(n * 0.75), int(n * 0.875)

    trainer = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc',
        data_train=data[:i1], data_val=data[i1:i2], data_test=data[i2:],
        static_vars=[topo],
        scale=4, patch_size=16 if quick else 32,
        batch_size=4 if quick else 16, loss='mae',
        epochs=3 if quick else 10,
        n_filters=8, n_blocks=2 if quick else 6, attention=True,
        learning_rate=(1e-3, 1e-4), save=True,
        save_path='./dl4ds_results/', save_bestmodel=True, verbose=True)
    trainer.run()

    y_hat = dds.predict(trainer, data[i2:], scale=4, array_in_hr=True,
                        static_vars=[topo])
    dds.compute_metrics(data[i2:], y_hat, mask=None,
                        save_path='./dl4ds_results/')
    print('artifacts in ./dl4ds_results/')


if __name__ == '__main__':
    main()
