"""
Base training class.

TPU-native counterpart of the reference Trainer ABC
(dl4ds/training/base.py:24-188). Horovod process topology is replaced by a
single-controller `jax.sharding.Mesh` over the visible devices: the batch
axis is sharded over the mesh ('data' axis), XLA emits the gradient
all-reduce over ICI, and the reference's hvd.rank()==0 gating maps to
jax.process_index() == 0.
"""

import os
from abc import ABC, abstractmethod

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils import (check_compatibility_upsbackb, checkarg_loss,
                     plot_history)


def make_mesh(devices=None, axis_name='data'):
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def ema_update(ema_params, params, decay, opt_state):
    """One parameter-EMA step, gated on the optimizer COMMIT under gradient
    accumulation. With `optax.MultiSteps(k)` the params change only every
    k-th microbatch; updating the EMA every microbatch would decay it toward
    UNCHANGED params k-1 extra times (effective decay = decay**k). Gating on
    `mini_step == 0` (MultiSteps wraps it back to 0 on commit) keeps the
    `ema_decay` a user sets meaning the same averaging horizon at every k.
    Without accumulation (plain opt state) this is the unconditional EMA."""
    import optax
    import jax.numpy as jnp
    new = jax.tree.map(lambda e, p: decay * e + (1 - decay) * p,
                       ema_params, params)
    if isinstance(opt_state, optax.MultiStepsState):
        committed = opt_state.mini_step == 0
        new = jax.tree.map(lambda n, e: jnp.where(committed, n, e),
                           new, ema_params)
    return new


class Trainer(ABC):
    """Common training scaffolding: input validation, mesh setup, loss
    resolution, scale checks, artifact saving.

    `show_plot` is accepted for reference API compatibility but is a
    no-op: plots render headlessly (Agg) and are saved to disk by
    `save_results`."""

    def __init__(self, backbone, upsampling, data_train, data_train_lr=None,
                 time_window=None, loss='mae', batch_size=64, patch_size=None,
                 scale=4, device='TPU', use_multiprocessing=False,
                 verbose=True, model_list=None, save=True, save_path=None,
                 show_plot=False, mesh=None, devices=None,
                 gpu_memory_growth=None):
        self.data_train = self._as_array(data_train, 'data_train')
        if not self.data_train.ndim > 3:
            raise ValueError(
                '`data_train` must be at least 4D [samples, lat, lon, variables]')
        self.data_train_lr = (self._as_array(data_train_lr, 'data_train_lr')
                              if data_train_lr is not None else None)
        if self.data_train_lr is not None:
            if self.data_train_lr.shape[0] != self.data_train.shape[0]:
                raise ValueError(
                    '`data_train_lr` and `data_train` must contain the same '
                    'number of samples (equal 1st dim length)')
            if not self.data_train_lr.ndim > 3:
                raise ValueError(
                    '`data_train_lr` must be at least 4D '
                    '[samples, lat, lon, variables]')

        self.backbone, self.upsampling = check_compatibility_upsbackb(
            backbone, upsampling, time_window)
        self.time_window = time_window
        self.model_is_spatiotemporal = (time_window is not None
                                        and time_window > 1)
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.loss = loss
        self.scale = scale
        self.device = device
        self.use_multiprocessing = use_multiprocessing
        self.verbose = verbose
        self.model_list = model_list
        self.save = save
        self.save_path = save_path or './'
        if not self.save_path.endswith('/'):
            self.save_path += '/'
        self.savecheckpoint_path = self.save_path
        self.show_plot = show_plot

        # --- device mesh (replaces hvd.init + GPU pinning,
        #     reference base.py:97-107) ---
        # Accepted meshes: the default 1-D ('data',) data-parallel mesh, or
        # a 2-D mesh adding a 'model' axis (tensor parallelism: weights +
        # optimizer moments channel-sharded, parallel.tensor_param_shardings)
        # or a 'space' axis (spatial sharding: activation height sharded,
        # GSPMD halo exchange). The trainers run the SAME jitted step either
        # way — 2-D meshes only change how XLA partitions it — so schedules/
        # EMA/early-stopping/checkpointing compose with TP and SP.
        self.mesh = mesh if mesh is not None else make_mesh(devices)
        axis_names = tuple(self.mesh.axis_names)
        unknown = [a for a in axis_names if a not in ('data', 'model',
                                                      'space')]
        if unknown:
            raise ValueError(
                f'trainer meshes support axes (data[, model|space]); got '
                f'{axis_names}. For ensemble training use '
                f'parallel.make_ensemble_step directly')
        if 'model' in axis_names and 'space' in axis_names:
            raise ValueError("pass a mesh with ONE of 'model'/'space' "
                             'besides data (3-D TPxSPxDP is untested)')
        self.tp_axis = 'model' if 'model' in axis_names else None
        self.sp_axis = 'space' if 'space' in axis_names else None
        self.n_devices = self.mesh.size
        # batch/LR scaling follow the DATA-parallel degree only: a TP or SP
        # axis divides the model/grid, not the batch
        self.n_data_shards = (self.mesh.shape['data']
                              if 'data' in axis_names else 1)
        self.batch_sharding = NamedSharding(
            self.mesh, P('data' if 'data' in axis_names else None))
        self.replicated_sharding = NamedSharding(self.mesh, P())

        batch_size_per_replica = self.batch_size
        self.global_batch_size = batch_size_per_replica * self.n_data_shards
        if self.verbose in (1, 2, True):
            print(f'Number of devices: {self.n_devices}')
            if self.tp_axis or self.sp_axis:
                kind = ('tensor' if self.tp_axis else 'spatial')
                other = self.tp_axis or self.sp_axis
                print(f'Mesh: {dict(self.mesh.shape)} '
                      f'({kind}-parallel over {other!r}, data-parallel '
                      f'over {self.n_data_shards} shards)')
            if self.n_data_shards > 1:
                print(f'Global batch size: {self.global_batch_size}, '
                      f'per replica: {batch_size_per_replica}')
            else:
                print(f'Global batch size: {self.global_batch_size}')

        # first-worker gating (reference base.py:124-133)
        self.running_on_first_worker = jax.process_index() == 0

        # scale-vs-grid checks (reference base.py:135-149)
        from .. import POSTUPSAMPLING_METHODS as _POSTUPS
        if self.patch_size is not None:
            sizes = (self.patch_size,)
        elif self.upsampling in _POSTUPS:
            # post-ups emits lr*scale outputs: BOTH grid axes must divide
            # exactly or the outputs cannot match the HR targets (the
            # reference checks only the width, base.py:135-140, and then
            # fails deep inside the graph on non-square grids)
            sizes = tuple(self.data_train.shape[-3:-1])   # (lat, lon)
        else:
            sizes = (self.data_train.shape[-2],)          # reference check
        if self.scale is not None:
            if any(sz % self.scale for sz in sizes):
                raise ValueError(
                    f'The image size {sizes} must be divisible by `scale` '
                    f'(remainder must be zero). Crop the images or set '
                    f'`patch_size` accordingly')
            if self.data_train_lr is not None:
                hr_yx = self.data_train.shape[-3:-1]
                lr_yx = self.data_train_lr.shape[-3:-1]
                from .. import POSTUPSAMPLING_METHODS
                if self.upsampling in POSTUPSAMPLING_METHODS:
                    # post-ups models upsample LR by exactly `scale`; a
                    # loose ratio would emit outputs that cannot match the
                    # HR targets (fails later inside jit with a shape error)
                    if any(h != l * self.scale
                           for h, l in zip(hr_yx, lr_yx)):
                        raise ValueError(
                            f'Wrong `scale` value: HR grid {tuple(hr_yx)} '
                            f'is not exactly {self.scale}x the LR grid '
                            f'{tuple(lr_yx)}')
                elif int(hr_yx[0] / lr_yx[0]) != int(self.scale):
                    # pin re-interpolates LR onto the HR grid, so any LR
                    # size works — keep the reference's loose check
                    # (reference base.py:141-149)
                    raise ValueError(
                        'Wrong `scale` value, check `data_train` and '
                        '`data_train_lr` grid sizes')

        self.lossf = checkarg_loss(self.loss)

    @staticmethod
    def _as_array(x, name):
        try:
            import xarray as xr
            if isinstance(x, xr.DataArray):
                return x.values
        except ImportError:
            pass
        if not isinstance(x, np.ndarray):
            raise TypeError(
                f'`{name}` object must be of np.ndarray or xr.DataArray type')
        return x

    # ------------------------------------------------------------------
    # Observability (reference analogues: Timing at utils.py:206-248,
    # TensorBoard scalars at cgan.py:619-624 — here a device-agnostic
    # JSONL scalar log plus optional jax.profiler traces)
    # ------------------------------------------------------------------
    def start_profiler(self, logdir=None):
        """Begin a jax.profiler trace (view in TensorBoard/XProf)."""
        import jax.profiler
        logdir = logdir or (self.save_path + 'profile')
        jax.profiler.start_trace(logdir)
        self._profiling = True

    def stop_profiler(self):
        import jax.profiler
        if getattr(self, '_profiling', False):
            jax.profiler.stop_trace()
            self._profiling = False

    def log_scalars(self, step, **scalars):
        """Append one JSONL record of named scalars (worker 0 only)."""
        if not self.running_on_first_worker:
            return
        import json
        if not hasattr(self, '_log_fh'):
            os.makedirs(self.save_path, exist_ok=True)
            self._log_fh = open(self.save_path + 'scalars.jsonl', 'a')
        self._log_fh.write(json.dumps({'step': step, **scalars}) + '\n')
        self._log_fh.flush()

    def channel_counts(self, predictors_train, static_vars,
                       season_ids=None):
        """Model input / aux channel bookkeeping shared by the trainers
        (reference: supervised.py:245-260 and cgan.py:177-193): spatial
        samples concatenate statics (and season) into the LR input AND the
        HR aux branch; spatio-temporal samples keep statics aux-only."""
        n_channels = self.data_train.shape[-1]
        n_aux_channels = 0
        if self.model_is_spatiotemporal:
            if predictors_train is not None:
                n_channels += len(predictors_train)
            if static_vars is not None:
                n_aux_channels += len(static_vars)
            if season_ids is not None:
                # season one-hot rides the HR aux branch only for
                # spatio-temporal samples (BatchSynthesizer._make_batch
                # appends it to aux, not to the 5-D LR input)
                n_aux_channels += 4
        else:
            if static_vars is not None:
                n_channels += len(static_vars)
                n_aux_channels = len(static_vars)
            if predictors_train is not None:
                n_channels += len(predictors_train)
            if season_ids is not None:
                n_channels += 4
                n_aux_channels += 4
        return n_channels, n_aux_channels

    def grid_sizes(self):
        """(hr_size, lr_size) from patch or full grid
        (reference: supervised.py:262-269)."""
        if self.patch_size is None:
            hr_h = int(self.data_train.shape[1])
            hr_w = int(self.data_train.shape[2])
            return (hr_h, hr_w), (int(hr_h / self.scale),
                                  int(hr_w / self.scale))
        hr = int(self.patch_size)
        lr = int(self.patch_size / self.scale)
        return (hr, hr), (lr, lr)

    @staticmethod
    def _checkpoint_save(path, payload):
        """Save a checkpoint payload via orbax; on failure warn LOUDLY and
        fall back to a pickle next to the intended path (a silent no-op here
        would mean save_bestmodel quietly saved nothing)."""
        try:
            import orbax.checkpoint as ocp
            ocp.PyTreeCheckpointer().save(path, payload, force=True)
        except Exception as exc:  # noqa: BLE001 — orbax optional/failable
            import pickle
            import warnings
            fallback = path.rstrip('/') + '.pkl'
            warnings.warn(
                f'orbax checkpoint save failed at {path!r} ({exc!r}); '
                f'falling back to pickle at {fallback!r}', RuntimeWarning)
            os.makedirs(os.path.dirname(fallback), exist_ok=True)
            with open(fallback, 'wb') as fh:
                pickle.dump(payload, fh)

    @abstractmethod
    def run(self):
        ...

    @abstractmethod
    def setup_model(self):
        ...

    def save_results(self, params_to_save=None, folder_prefix=None,
                     model=None):
        """Persist the trained model (orbax), wall-clock time, test loss and
        the learning-curve plot (reference: base.py:162-187)."""
        if not self.save:
            return
        prefix = folder_prefix or ''
        self.model_save_path = (self.save_path + prefix + self.backbone
                                + '_' + self.upsampling + '/')
        if self.running_on_first_worker:
            os.makedirs(self.model_save_path, exist_ok=True)
            if model is None:
                model = getattr(self, 'model', None)
            if params_to_save is not None and model is not None \
                    and hasattr(model, 'module'):
                from ..models import save_model
                save_model(model, params_to_save, self.model_save_path)
            elif params_to_save is not None:
                try:
                    import orbax.checkpoint as ocp
                    ocp.PyTreeCheckpointer().save(
                        os.path.abspath(
                            os.path.join(self.model_save_path, 'checkpoint')),
                        jax.tree_util.tree_map(np.asarray, params_to_save),
                        force=True)
                except Exception:  # noqa: BLE001 — orbax optional
                    import pickle
                    with open(os.path.join(self.model_save_path,
                                           'checkpoint.pkl'), 'wb') as fh:
                        pickle.dump(jax.tree_util.tree_map(
                            np.asarray, params_to_save), fh)
            if getattr(self, 'timing', None) is not None and \
                    self.timing.running_time is not None:
                np.savetxt(self.save_path + 'running_time.txt',
                           [self.timing.running_time], fmt='%s')
            if getattr(self, 'test_loss', None) is not None:
                np.savetxt(self.save_path + 'test_loss.txt',
                           [float(self.test_loss)], fmt='%0.6f')
        if getattr(self, 'fithist', None) and self.running_on_first_worker:
            plot_history(self.fithist,
                         path=self.save_path + 'learning_curve.png')
