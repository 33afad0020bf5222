"""End-to-end production pipeline: disk -> train -> freeze -> serve.

One script exercising the full deployment story on synthetic data:

  1. dataset on DISK, streamed via np.memmap (zero host-RAM copy)
  2. streaming-tier training with gradient accumulation and periodic
     full-state checkpoints
  3. resume from the checkpoint (preemption drill)
  4. frozen StableHLO serving artifact + int8-quantized forward
  5. halo-tiled full-grid inference + metrics

Run: python examples/production_pipeline.py         # real TPU
     python examples/production_pipeline.py --cpu   # CPU (~2 min)
"""

import os
import sys
import tempfile

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
from dl4ds_tpu.quantization import quantize_forward


def make_dataset(path, n=112, size=64):
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing='ij')
    frames = [np.sin(0.2 * yy + 0.1 * k) * np.cos(0.3 * xx - 0.05 * k)
              for k in range(n)]
    data = np.stack(frames)[..., None].astype('float32')
    data += 0.02 * np.random.default_rng(0).standard_normal(
        data.shape).astype('float32')
    np.save(path, data)
    return data


def main():
    workdir = tempfile.mkdtemp(prefix='dl4ds_pipeline_')
    ds_path = os.path.join(workdir, 'dataset.npy')
    data = make_dataset(ds_path)
    disk = np.load(ds_path, mmap_mode='r')     # never copied into RAM
    # val/test must cover one GLOBAL batch in the streaming tier
    # (batch_size x n_devices; the trainer validates this loudly)
    val, test = data[80:96], data[96:]

    # ---- 2. streaming training: disk tier + gradient accumulation ------
    common = dict(
        backbone='resnet', upsampling='spc', data_train=disk[:80],
        data_val=val, data_test=test, scale=4, patch_size=32,
        batch_size=2, loss='mae', n_filters=8, n_blocks=2,
        gradient_accumulation_steps=2, data_in_hbm=False,
        save=False, save_path=workdir + '/', verbose=False, seed=0)
    trainer = dds.SupervisedTrainer(epochs=4, checkpoints_frequency=2,
                                    **common)
    trainer.run()
    print(f'trained from disk: test MAE {trainer.test_loss:.4f}')

    # ---- 3. preemption drill: resume from the periodic checkpoint ------
    resumed = dds.SupervisedTrainer(
        epochs=6, resume_from_checkpoint=workdir + '/checkpoints/epoch-4',
        **common)
    resumed.run()
    print(f'resumed at epoch 4 -> 6: test MAE {resumed.test_loss:.4f}')

    # ---- 4. frozen serving artifact + int8 PTQ -------------------------
    art = os.path.join(workdir, 'artifact')
    # patch-trained (8x8 LR patches) -> FULL-GRID artifact via spatial_size
    nbytes = save_serving_artifact(resumed.model, resumed.variables, art,
                                   spatial_size=(16, 16))
    call, meta = load_serving_artifact(art)
    lr_test = np.asarray(dds.resize_array(test, (16, 16), 'inter_area'))
    if lr_test.ndim == 3:
        lr_test = lr_test[..., None]
    y_frozen = np.asarray(call(lr_test))
    qf = quantize_forward(resumed.model, resumed.variables, lr_test,
                          calibration_quantile=0.999)
    y_int8 = np.asarray(qf(lr_test))
    rel = (np.sqrt(np.mean((y_int8 - y_frozen) ** 2))
           / (np.std(y_frozen) + 1e-12))
    print(f'frozen artifact {nbytes / 1e3:.1f} kB; '
          f'int8 vs f32 rel err {rel:.4f} over {qf.n_sites} conv sites')

    # ---- 5. tiled full-grid inference + metrics ------------------------
    y_hat = dds.predict(resumed, lr_test, scale=4, array_in_hr=False,
                        tile=8, halo=24)
    print(f'tiled predict: {lr_test.shape} -> {y_hat.shape}')
    dds.compute_metrics(test, y_hat, save_path=None)


if __name__ == '__main__':
    main()
