#!/usr/bin/env python
"""
absl.FLAGS-based command-line app (reference: dl4ds/app.py).

Run:
    python -m dl4ds_tpu.app --flagfile=params.cfg

The `--data_module` flag points at a user Python file that is imported at
runtime and must expose: data_train, data_val, data_test (+ *_lr when
--paired_samples=explicit), predictors_train/val/test, static_vars,
inference_data, inference_scaler, inference_predictors, gt_holdout_dataset,
gt_mask — the same contract as the reference (dl4ds/app.py:111-116,
:177-186, :262-270, :294-297).
"""

import importlib.util
import os

import numpy as np
from absl import app, flags

import jax.numpy as jnp

import dl4ds_tpu as dds
from dl4ds_tpu import (BACKBONE_BLOCKS, UPSAMPLING_METHODS,
                       INTERPOLATION_METHODS, LOSS_FUNCTIONS,
                       DROPOUT_VARIANTS)

FLAGS = flags.FLAGS

# EXPERIMENT
flags.DEFINE_bool('train', True, 'Training a model')
flags.DEFINE_bool('test', True, 'Testing the trained model on holdout data')
flags.DEFINE_bool('metrics', True,
                  'Running verification metrics on the downscaled arrays')
flags.DEFINE_bool('debug', False,
                  'If True a debug training run (2 epochs with 6 steps) is '
                  'executed')

# DOWNSCALING PARAMS
flags.DEFINE_enum('trainer', 'SupervisedTrainer',
                  ['SupervisedTrainer', 'CGANTrainer'], 'Trainer')
flags.DEFINE_enum('paired_samples', 'implicit', ['implicit', 'explicit'],
                  'Type of learning: implicit (PerfectProg) or explicit (MOS)')
flags.DEFINE_string('data_module', None,
                    'Python module where the data pre-processing is done')

# MODEL
flags.DEFINE_enum('backbone', 'resnet', BACKBONE_BLOCKS, 'Backbone section')
flags.DEFINE_enum('upsampling', 'spc', UPSAMPLING_METHODS,
                  'Upsampling method')
flags.DEFINE_integer('time_window', None,
                     'Time window for training spatio-temporal models')
flags.DEFINE_integer('n_filters', 8,
                     'Number of convolutional filters for the first '
                     'convolutional block')
flags.DEFINE_integer('n_blocks', 6, 'Number of convolutional blocks')
flags.DEFINE_integer('n_disc_filters', 32,
                     'Number of convolutional filters per convolutional '
                     'block in the discriminator')
flags.DEFINE_integer('n_disc_blocks', 4,
                     'Number of residual blocks for discriminator network')
flags.DEFINE_enum('normalization', None, ['bn', 'ln'], 'Normalization')
flags.DEFINE_float('dropout_rate', 0.2, 'Dropout rate')
flags.DEFINE_enum('dropout_variant', 'vanilla', DROPOUT_VARIANTS,
                  'Dropout variants')
flags.DEFINE_bool('attention', False,
                  'Attention block in convolutional layers')
flags.DEFINE_enum('activation', 'relu',
                  ['elu', 'relu', 'gelu', 'crelu', 'leaky_relu', 'selu'],
                  'Activation used in intermediate convolutional blocks')
flags.DEFINE_enum('output_activation', None,
                  ['elu', 'relu', 'gelu', 'crelu', 'leaky_relu', 'selu'],
                  'Activation used in the last convolutional block')
flags.DEFINE_bool('localcon_layer', False,
                  'Locally connected convolutional layer')
flags.DEFINE_enum('decoder_upsampling', 'rc', UPSAMPLING_METHODS,
                  'Upsampling in decoder blocks (unet backbone)')
flags.DEFINE_enum('rc_interpolation', 'bilinear', INTERPOLATION_METHODS,
                  'Interpolation used in resize convolution upsampling')

# TRAINING PROCEDURE
flags.DEFINE_enum('device', 'TPU', ['TPU', 'GPU', 'CPU'],
                  'Device to be used')
flags.DEFINE_bool('save', True,
                  'Saving to disk the trained model, metrics, run info, etc')
flags.DEFINE_string('save_path', './dl4ds_results/',
                    'Path for saving results to disk')
flags.DEFINE_integer('scale', 2, 'Scaling factor, positive integer')
flags.DEFINE_integer('epochs', 100, 'Number of training epochs')
flags.DEFINE_enum('loss', 'mae', LOSS_FUNCTIONS, 'Loss function')
flags.DEFINE_enum('interpolation', 'inter_area', INTERPOLATION_METHODS,
                  'Interpolation method')
flags.DEFINE_integer('patch_size', None,
                     'Patch size in number of px/gridpoints')
flags.DEFINE_integer('batch_size', 32,
                     'Batch size (of samples) used during training')
flags.DEFINE_multi_float('learning_rate', 1e-3, 'Learning rate')
flags.DEFINE_bool('gpu_memory_growth', True,
                  'Kept for flag-file compatibility (no-op on TPU)')
flags.DEFINE_bool('use_multiprocessing', True,
                  'Kept for flag-file compatibility (data synthesis is '
                  'device-resident)')
flags.DEFINE_float('lr_decay_after', 1e5,
                   'Steps to tweak the learning rate using the '
                   'piecewise-constant scheduler')
flags.DEFINE_bool('early_stopping', False, 'Early stopping')
flags.DEFINE_integer('patience', 6,
                     'Patience in number of epochs w/o improvement for '
                     'early stopping')
flags.DEFINE_float('min_delta', 0.0,
                   'Minimum delta improvement for early stopping')
flags.DEFINE_bool('show_plot', False,
                  'Reference-compat no-op (plots render headlessly and are '
                  'saved to save_path)')
flags.DEFINE_bool('save_bestmodel', True,
                  'SupervisedTrainer - Whether to save the best model')
flags.DEFINE_bool('verbose', True, 'Verbosity')
flags.DEFINE_integer('checkpoints_frequency', 2,
                     'CGANTrainer - Frequency for saving checkpoints and '
                     'the generator')

# TPU-FIRST KNOBS (beyond the reference's vocabulary)
flags.DEFINE_enum('dtype', 'float32', ['float32', 'bfloat16'],
                  'Model compute dtype (params/loss stay float32)')
flags.DEFINE_bool('data_in_hbm', True,
                  'Keep the training dataset in device memory (False '
                  'streams from host RAM via the native gather/crop path)')
flags.DEFINE_integer('steps_per_execution', None,
                     'Training steps per host dispatch (None = whole epoch '
                     'in one lax.scan program)')
flags.DEFINE_integer('gradient_accumulation_steps', 1,
                     'Microbatches accumulated per optimizer update '
                     '(effective batch = k x batch_size at microbatch '
                     'memory cost)')
flags.DEFINE_enum('lr_schedule', None, ['cosine', 'warmup_cosine'],
                  'LR schedule over the full run (None keeps the reference '
                  'piecewise/constant behavior); CGAN applies it to both '
                  'the G and D optimizers')
flags.DEFINE_integer('warmup_steps', 0,
                     'Linear LR warmup steps for warmup_cosine '
                     '(0 = auto, 5% of the run)')
flags.DEFINE_float('ema_decay', 0.0,
                   'Parameter EMA decay, 0 disables. Supervised: eval/'
                   'best-checkpoint/serving use the averaged weights; '
                   'CGAN: the averaged generator is evaluated and served')
flags.DEFINE_string('mesh_shape', None,
                    "Device mesh as 'axis=N[,axis=M]' over the visible "
                    "devices, e.g. 'data=8' (data parallel, the default "
                    "over all devices), 'data=4,model=2' (tensor-parallel: "
                    "weights+optimizer channel-sharded over the model "
                    "axis), 'data=4,space=2' (spatial: activation heights "
                    'sharded). SupervisedTrainer only; axis sizes must '
                    'multiply to a divisor of the device count')

# INFERENCE/TEST
flags.DEFINE_bool('inference_array_in_hr', False,
                  'Whether the inference array is in high resolution')
flags.DEFINE_string('init_keras_npz', None,
                    'Initialize the model (CGAN: the generator) from a '
                    'reference-trained Keras checkpoint before training — '
                    'a .npz written by compat.save_weights_npz or a TF '
                    'SavedModel directory (compat.import_keras_weights). '
                    'The architecture flags must match the checkpoint. '
                    'Migration fine-tuning; beyond the reference app')
flags.DEFINE_string('trained_model_path', None,
                    'Run the test/metrics phases on a model saved by a '
                    'previous --train --save run (path to the '
                    '<save_path>/<backbone>_<upsampling>/ folder written '
                    'by save_results) — no retraining needed. Beyond the '
                    'reference app, which can only evaluate the model '
                    'trained in the same invocation')
flags.DEFINE_integer('inference_mc_members', 0,
                     'When > 0 and the model uses an mc* dropout variant, '
                     'the test phase also runs an MC-dropout ensemble of '
                     'this many members (saves mean/std maps) and the '
                     'metrics phase adds the probabilistic suite (CRPS, '
                     'spread-skill, rank histogram)')
flags.DEFINE_string('inference_save_fname', None,
                    'Filename for saving the inference array')
flags.DEFINE_string('export_artifact', None,
                    'After training (or on --trained_model_path), freeze '
                    'the forward to a StableHLO serving-artifact directory '
                    '(export.save_serving_artifact, symbolic batch); serve '
                    'it with `python -m dl4ds_tpu.serve --artifact DIR`. '
                    'Beyond the reference app (its SavedModel export '
                    'needs TF-Serving downstream)')
flags.DEFINE_enum('export_quantize', None, ['int8', 'weight-only'],
                  'Freeze the CALIBRATED int8 (or weight-only) replay '
                  'instead of the float forward in --export_artifact. '
                  'Calibration inputs are assembled from the data '
                  "module's inference_data (first --export_batch "
                  'samples, same preparation as the test phase); the '
                  'artifact batch is pinned to that shape (the server '
                  'pads/chunks requests). int8 convs run ~2x on the MXU '
                  'at production widths (INT8.json)')
flags.DEFINE_integer('export_batch', 8,
                     'Serving batch for --export_quantize artifacts '
                     '(= the calibration batch; the int8 replay is '
                     'shape-pinned)')


def _parse_mesh_shape(spec):
    """'data=4,model=2' -> jax.sharding.Mesh over the first prod(sizes)
    visible devices (None -> None, trainer default 1-D data mesh)."""
    if not spec:
        return None
    import math as _math
    import numpy as _np
    import jax as _jax
    from jax.sharding import Mesh as _Mesh
    names, sizes = [], []
    for part in spec.split(','):
        try:
            name, size = part.split('=')
            names.append(name.strip())
            sizes.append(int(size))
        except ValueError:
            raise ValueError(
                f"--mesh_shape must look like 'data=4,model=2'; got "
                f'{spec!r}') from None
    n = _math.prod(sizes)
    devs = _jax.devices()
    if n > len(devs):
        raise ValueError(f'--mesh_shape={spec} needs {n} devices; '
                         f'{len(devs)} visible')
    return _Mesh(_np.array(devs[:n]).reshape(sizes), tuple(names))


def dl4ds(argv):
    """DL4DS-TPU command-line entry point (reference: dl4ds/app.py:94-299).
    """
    running_on_first_worker = True
    try:
        import jax
        if FLAGS.device == 'CPU':
            # BOTH are needed before first backend use: a sitecustomize
            # can pin JAX_PLATFORMS to an accelerator plugin
            os.environ['JAX_PLATFORMS'] = 'cpu'
            jax.config.update('jax_platforms', 'cpu')
        running_on_first_worker = jax.process_index() == 0
    except Exception:  # noqa: BLE001
        pass

    if running_on_first_worker:
        print('<' * 37, 'DL4DS-TPU', '>' * 36, '\n')

    if FLAGS.debug:
        epochs = 2
        steps_per_epoch = test_steps = validation_steps = 6
    else:
        epochs = FLAGS.epochs
        steps_per_epoch = test_steps = validation_steps = None

    if running_on_first_worker:
        print('<' * 33, 'Loading data', '>' * 33, '\n')
    if FLAGS.data_module is None:
        raise ValueError('`data_module` flag must be provided (path to the '
                         'data preprocessing module)')
    spec = importlib.util.spec_from_file_location('module.name',
                                                  FLAGS.data_module)
    DATA = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(DATA)

    # Architecture parameters (reference: app.py:119-168)
    architecture_params = dict(
        n_filters=FLAGS.n_filters,
        normalization=FLAGS.normalization,
        dropout_rate=FLAGS.dropout_rate,
        dropout_variant=FLAGS.dropout_variant,
        attention=FLAGS.attention,
        activation=FLAGS.activation,
        output_activation=FLAGS.output_activation,
        localcon_layer=FLAGS.localcon_layer)
    # every model family takes n_blocks (the spatio-temporal factories
    # default to 4; an explicit flag value applies everywhere)
    architecture_params['n_blocks'] = FLAGS.n_blocks
    if FLAGS.upsampling != 'pin':
        architecture_params['rc_interpolation'] = FLAGS.rc_interpolation
    if FLAGS.backbone == 'unet' and FLAGS.upsampling == 'pin':
        architecture_params['decoder_upsampling'] = FLAGS.decoder_upsampling
        architecture_params['rc_interpolation'] = FLAGS.rc_interpolation

    explicit = FLAGS.paired_samples == 'explicit'
    trainer = None
    if FLAGS.train:
        if running_on_first_worker:
            print('\n' + '<' * 29, 'DL4DS Training phase', '>' * 29 + '\n')
        if FLAGS.trainer == 'SupervisedTrainer':
            trainer = dds.SupervisedTrainer(
                backbone=FLAGS.backbone,
                upsampling=FLAGS.upsampling,
                data_train=DATA.data_train,
                data_val=DATA.data_val,
                data_test=DATA.data_test,
                data_train_lr=DATA.data_train_lr if explicit else None,
                data_val_lr=DATA.data_val_lr if explicit else None,
                data_test_lr=DATA.data_test_lr if explicit else None,
                predictors_train=DATA.predictors_train,
                predictors_val=DATA.predictors_val,
                predictors_test=DATA.predictors_test,
                static_vars=DATA.static_vars,
                scale=FLAGS.scale,
                interpolation=FLAGS.interpolation,
                patch_size=FLAGS.patch_size,
                time_window=FLAGS.time_window,
                batch_size=FLAGS.batch_size,
                loss=FLAGS.loss,
                epochs=epochs,
                steps_per_epoch=steps_per_epoch,
                validation_steps=validation_steps,
                test_steps=test_steps,
                device=FLAGS.device,
                learning_rate=tuple(FLAGS.learning_rate),
                lr_decay_after=FLAGS.lr_decay_after,
                early_stopping=FLAGS.early_stopping,
                patience=FLAGS.patience,
                min_delta=FLAGS.min_delta,
                show_plot=FLAGS.show_plot,
                save=FLAGS.save,
                save_path=FLAGS.save_path,
                save_bestmodel=FLAGS.save_bestmodel,
                verbose=FLAGS.verbose,
                data_in_hbm=FLAGS.data_in_hbm,
                steps_per_execution=FLAGS.steps_per_execution,
                gradient_accumulation_steps=(
                    FLAGS.gradient_accumulation_steps),
                lr_schedule=FLAGS.lr_schedule,
                warmup_steps=FLAGS.warmup_steps,
                ema_decay=FLAGS.ema_decay,
                init_weights=FLAGS.init_keras_npz,
                mesh=_parse_mesh_shape(FLAGS.mesh_shape),
                dtype=(jnp.bfloat16 if FLAGS.dtype == 'bfloat16'
                       else jnp.float32),
                **architecture_params)
        else:
            discriminator_params = dict(
                n_filters=FLAGS.n_disc_filters,
                n_res_blocks=FLAGS.n_disc_blocks,
                normalization=FLAGS.normalization,
                activation=FLAGS.activation,
                attention=FLAGS.attention)
            trainer = dds.CGANTrainer(
                backbone=FLAGS.backbone,
                upsampling=FLAGS.upsampling,
                data_train=DATA.data_train,
                data_test=DATA.data_test,
                data_train_lr=DATA.data_train_lr if explicit else None,
                data_test_lr=DATA.data_test_lr if explicit else None,
                predictors_train=DATA.predictors_train,
                predictors_test=DATA.predictors_test,
                scale=FLAGS.scale,
                patch_size=FLAGS.patch_size,
                time_window=FLAGS.time_window,
                loss=FLAGS.loss,
                epochs=epochs,
                batch_size=FLAGS.batch_size,
                learning_rates=tuple(FLAGS.learning_rate),
                device=FLAGS.device,
                steps_per_epoch=steps_per_epoch,
                interpolation=FLAGS.interpolation,
                static_vars=DATA.static_vars,
                checkpoints_frequency=FLAGS.checkpoints_frequency,
                save=FLAGS.save,
                save_path=FLAGS.save_path,
                save_logs=False,
                save_loss_history=FLAGS.save,
                verbose=FLAGS.verbose,
                generator_params=architecture_params,
                discriminator_params=discriminator_params,
                gradient_accumulation_steps=(
                    FLAGS.gradient_accumulation_steps),
                lr_schedule=FLAGS.lr_schedule,
                warmup_steps=FLAGS.warmup_steps,
                ema_decay=FLAGS.ema_decay,
                init_weights=FLAGS.init_keras_npz,
                mesh=_parse_mesh_shape(FLAGS.mesh_shape))
        trainer.run()

    y_hat = None
    mc_members = None
    if (FLAGS.test or FLAGS.metrics or FLAGS.export_artifact) \
            and trainer is None and FLAGS.trained_model_path:
        # evaluate a previously-saved model without retraining: load_model
        # returns a (model, variables) pair, which Predictor/predict_mc
        # accept wherever a trainer is expected
        trainer = dds.load_model(FLAGS.trained_model_path)
        if running_on_first_worker:
            print(f'Loaded trained model from {FLAGS.trained_model_path} '
                  f'({trainer[0].name})')
    if (FLAGS.test or FLAGS.metrics) and trainer is None \
            and running_on_first_worker:
        print('NOTE: --test/--metrics skipped — they run on the model '
              'trained in this invocation (pass --train, or point '
              '--trained_model_path at a saved model folder)')
    if FLAGS.export_artifact and trainer is not None \
            and running_on_first_worker:
        model, variables = (trainer if isinstance(trainer, tuple)
                            else (trainer.model, trainer.variables))
        export_kwargs = {}
        if FLAGS.export_quantize:
            # calibrate on the same model-ready tensors the test phase
            # feeds the network (predict's own default calibration source)
            from .inference import _assemble_inputs
            cx, caux, n_cal = _assemble_inputs(
                model, DATA.inference_data, FLAGS.scale,
                FLAGS.inference_array_in_hr, DATA.static_vars,
                DATA.inference_predictors, FLAGS.time_window,
                FLAGS.interpolation)
            b = min(FLAGS.export_batch, n_cal)
            export_kwargs = dict(
                quantize=FLAGS.export_quantize, batch=b,
                calibration=cx[:b],
                calibration_aux=None if caux is None else caux[:b])
        nbytes = dds.save_serving_artifact(model, variables,
                                           FLAGS.export_artifact,
                                           **export_kwargs)
        print(f'Serving artifact written to {FLAGS.export_artifact} '
              f'({nbytes:,} bytes'
              + (f', {FLAGS.export_quantize}, batch={export_kwargs["batch"]}'
                 if FLAGS.export_quantize else '')
              + f'); serve it with: python -m '
              f'dl4ds_tpu.serve --artifact {FLAGS.export_artifact}')
    if FLAGS.test and trainer is not None and running_on_first_worker:
        print('\n' + '<' * 29, 'DL4DS Test phase', '>' * 29 + '\n')
        predictor = dds.Predictor(
            trainer=trainer,
            array=DATA.inference_data,
            array_in_hr=FLAGS.inference_array_in_hr,
            scale=FLAGS.scale,
            interpolation=FLAGS.interpolation,
            predictors=DATA.inference_predictors,
            static_vars=DATA.static_vars,
            time_window=FLAGS.time_window,
            batch_size=FLAGS.batch_size,
            scaler=DATA.inference_scaler,
            save_path=FLAGS.save_path,
            save_fname=FLAGS.inference_save_fname,
            device=FLAGS.device)
        y_hat = predictor.run()

        if FLAGS.inference_mc_members > 0:
            if not str(FLAGS.dropout_variant or '').startswith('mc'):
                print('NOTE: --inference_mc_members ignored — the model was '
                      'not built with an mc* dropout variant (dropout is '
                      'inactive at inference, so all members would be '
                      'identical)')
            else:
                mc_mean, mc_std, mc_members = dds.predict_mc(
                    trainer, DATA.inference_data, scale=FLAGS.scale,
                    n_members=FLAGS.inference_mc_members,
                    return_members=True,
                    array_in_hr=FLAGS.inference_array_in_hr,
                    interpolation=FLAGS.interpolation,
                    predictors=DATA.inference_predictors,
                    static_vars=DATA.static_vars,
                    time_window=FLAGS.time_window,
                    batch_size=FLAGS.batch_size,
                    scaler=DATA.inference_scaler,
                    device=FLAGS.device)
                if FLAGS.save_path is not None:
                    os.makedirs(FLAGS.save_path, exist_ok=True)
                    np.save(os.path.join(FLAGS.save_path,
                                         'y_hat_mc_mean.npy'), mc_mean)
                    np.save(os.path.join(FLAGS.save_path,
                                         'y_hat_mc_std.npy'), mc_std)

        # netCDF export when xarray is available (reference: app.py:280-287)
        if FLAGS.save and FLAGS.save_path is not None:
            os.makedirs(FLAGS.save_path, exist_ok=True)
            try:
                import xarray as xr
                gt = DATA.gt_holdout_dataset
                y = np.squeeze(np.asarray(y_hat))
                # spatio-temporal predict windows the input: y has
                # N - (time_window - 1) samples — align to the LAST
                # timestamps (each window predicts its final step)
                time = np.asarray(gt.time)[-y.shape[0]:]
                y_hat_da = xr.DataArray(
                    data=y, dims=('time', 'lat', 'lon'),
                    coords={'time': time, 'lon': gt.lon, 'lat': gt.lat})
                y_hat_da.to_netcdf(
                    os.path.join(FLAGS.save_path, 'y_hat.nc'))
            except (ImportError, AttributeError):
                np.save(os.path.join(FLAGS.save_path, 'y_hat_export.npy'),
                        np.squeeze(np.asarray(y_hat)).astype('float32'))

    if FLAGS.metrics and y_hat is not None and running_on_first_worker:
        print('\n' + '<' * 25, 'DL4DS Metrics computation phase',
              '>' * 25 + '\n')
        gt = DATA.gt_holdout_dataset
        # georeference the metric maps when the holdout carries coords
        lats = getattr(getattr(gt, 'lat', None), 'values', None)
        lons = getattr(getattr(gt, 'lon', None), 'values', None)
        dds.compute_metrics(
            y_test=gt,
            y_test_hat=y_hat,
            dpi=300, plot_size_px=1200,
            mask=DATA.gt_mask,
            save_path=FLAGS.save_path,
            n_jobs=-1, lats=lats, lons=lons)
        if mc_members is not None:
            # probabilistic verification of the MC-dropout ensemble
            # (CRPS / spread maps, rank histogram, spread-skill ratio);
            # spatio-temporal predict windows the input — align the ground
            # truth to the LAST n predicted samples (as the netCDF export
            # does above)
            gt_aligned = gt[-mc_members.shape[1]:]
            dds.compute_prob_metrics(
                gt_aligned, mc_members, dpi=300,
                save_path=FLAGS.save_path, lats=lats, lons=lons)


def main():
    app.run(dl4ds)


if __name__ == '__main__':
    main()
