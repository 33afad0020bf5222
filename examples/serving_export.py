"""Train -> freeze -> serve: the frozen StableHLO serving workflow.

Trains a small model, exports the forward as a self-contained StableHLO
artifact (variables embedded, symbolic batch), then 'serves' it from a
process that needs no model-building code. See docs/SERVING.md.

Run: python examples/serving_export.py          # real TPU
     python examples/serving_export.py --cpu    # 8 virtual CPU devices
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if '--cpu' in sys.argv or os.environ.get('JAX_PLATFORMS') == 'cpu':
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=8')
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')

import numpy as np

import dl4ds_tpu as dds
from dl4ds_tpu.export import save_serving_artifact, load_serving_artifact


def main():
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing='ij')
    data = np.stack([np.sin(0.2 * yy + 0.1 * k) * np.cos(0.3 * xx)
                     for k in range(64)])[..., None].astype('float32')
    data += 0.02 * rng.standard_normal(data.shape).astype('float32')

    trainer = dds.SupervisedTrainer(
        backbone='resnet', upsampling='spc',
        data_train=data[:48], data_val=data[48:56], data_test=data[56:],
        scale=4, batch_size=4, epochs=3, loss='mae', n_filters=8,
        n_blocks=2, save=False, verbose=True)
    trainer.run()

    nbytes = save_serving_artifact(trainer.model, trainer.variables,
                                   './serving_artifact')
    print(f'frozen artifact: {nbytes / 1e3:.1f} kB '
          f'(one blob, any batch size)')

    # ---- serving process: no architecture code, no checkpoint loader ----
    call, meta = load_serving_artifact('./serving_artifact')
    lr = np.asarray(dds.resize_array(data[56:], (8, 8), 'inter_area'))
    if lr.ndim == 3:           # resize_array squeezes a single channel
        lr = lr[..., None]
    y = np.asarray(call(lr))
    print(f"served {meta['name']}: {lr.shape} -> {y.shape}")
    print('HTTP serving: python -m dl4ds_tpu.serve '
          '--artifact ./serving_artifact')


if __name__ == '__main__':
    main()
