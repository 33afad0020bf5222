"""
Supervised training procedure.

TPU-native counterpart of the reference SupervisedTrainer
(dl4ds/training/supervised.py:28-416). Differences by design:

  * The data pipeline is the device-resident `BatchSynthesizer`; batch
    synthesis is *fused into the jitted train step* — one XLA program per
    step does gather + crop + resize + forward + backward + update. The
    reference's host-side per-sample loop (its bottleneck) disappears.
  * Horovod data parallelism -> `jax.sharding`: the per-step sample indices
    are sharded over the mesh's 'data' axis; XLA partitions the whole step
    and inserts the gradient all-reduce over ICI.
  * Keras fit/callbacks -> an explicit loop with early stopping, best-model
    checkpointing (worker 0) and the same artifact outputs.
  * Adam + piecewise-constant LR decay with the Goyal et al. linear LR
    scaling by mesh size (reference: supervised.py:336-353).
"""


from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


from ..utils import Timing
from ..dataloader import BatchSynthesizer
from ..models import build_model
from .base import Trainer


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    # exponential moving average of `params` (maintained inside the jitted
    # train step when the trainer's ema_decay > 0; None otherwise).
    # Initialized AT the initial params, so no zero-debiasing is needed.
    ema_params: Any = None


class SupervisedTrainer(Trainer):
    """Supervised (pixel-loss) trainer over MOS or PerfectProg pairs.

    Signature-compatibility notes: `use_multiprocessing`, `model_list` and
    `gpu_memory_growth` are accepted for reference API compatibility
    (dl4ds/training/supervised.py:55-58) but are no-ops here — the data
    pipeline is device-resident (no worker processes), models are built by
    the `build_model` dispatcher, and memory growth is a GPU/TF concept.
    `device`/`devices`/`mesh` select the JAX placement instead."""

    def __init__(self, backbone, upsampling, data_train, data_val, data_test,
                 data_train_lr=None, data_val_lr=None, data_test_lr=None,
                 predictors_train=None, predictors_val=None,
                 predictors_test=None, static_vars=None, scale=5,
                 interpolation='inter_area', patch_size=None,
                 time_window=None, batch_size=64, loss='mae', epochs=60,
                 steps_per_epoch=None, test_steps=None, validation_steps=None,
                 device='TPU', use_multiprocessing=False, model_list=None,
                 learning_rate=(1e-3, 1e-4), lr_decay_after=1e5,
                 early_stopping=False, patience=6, min_delta=0,
                 show_plot=False, save=False, save_path=None,
                 save_bestmodel=False, trained_model=None, trained_epochs=0,
                 init_weights=None,
                 verbose=True, seed=42, mesh=None, devices=None,
                 gpu_memory_growth=None, save_logs=False, profile=False,
                 data_in_hbm=True, steps_per_execution=None,
                 checkpoints_frequency=0, resume_from_checkpoint=None,
                 season_ids=None, time_metadata=None, terminate_on_nan=True,
                 gradient_accumulation_steps=1, lr_schedule=None,
                 warmup_steps=0, ema_decay=0.0, **architecture_params):
        super().__init__(
            backbone=backbone, upsampling=upsampling, data_train=data_train,
            data_train_lr=data_train_lr, time_window=time_window, loss=loss,
            batch_size=batch_size, patch_size=patch_size, scale=scale,
            device=device, use_multiprocessing=use_multiprocessing,
            verbose=verbose, model_list=model_list, save=save,
            save_path=save_path, show_plot=show_plot, mesh=mesh,
            devices=devices)
        if self.time_window is not None and not self.model_is_spatiotemporal:
            # time_window=1 builds a SPATIAL model (models/__init__.py
            # dispatches on tw > 1) — normalize so the synthesizers emit
            # matching 4-D batches instead of [B, 1, H, W, C]
            self.time_window = None
        self.data_val = self._as_array(data_val, 'data_val')
        self.data_test = self._as_array(data_test, 'data_test')
        self.data_val_lr = (self._as_array(data_val_lr, 'data_val_lr')
                            if data_val_lr is not None else None)
        self.data_test_lr = (self._as_array(data_test_lr, 'data_test_lr')
                             if data_test_lr is not None else None)
        for name, preds in (('predictors_train', predictors_train),
                            ('predictors_val', predictors_val),
                            ('predictors_test', predictors_test)):
            if preds is not None and not isinstance(preds, list):
                raise TypeError(f'`{name}` must be a list of ndarrays')
        self.predictors_train = predictors_train
        self.predictors_val = predictors_val
        self.predictors_test = predictors_test
        self.static_vars = static_vars
        self.interpolation = interpolation
        self.epochs = epochs
        for nm, v in (('steps_per_epoch', steps_per_epoch),
                      ('validation_steps', validation_steps),
                      ('test_steps', test_steps)):
            if v is not None and v < 1:
                raise ValueError(f'`{nm}` must be >= 1 or None (0 steps '
                                 f'would evaluate to NaN)')
        self.steps_per_epoch = steps_per_epoch
        self.validation_steps = validation_steps
        self.test_steps = test_steps
        self.learning_rate = learning_rate
        self.lr_decay_after = lr_decay_after
        # LR schedule (beyond the reference's piecewise-constant decay):
        # None keeps the reference behavior (constant, or piecewise when
        # `learning_rate` is a 2-tuple); 'cosine' decays lr[0] -> lr[1]
        # (or to 0 for a scalar lr) over the full run; 'warmup_cosine'
        # adds a linear warmup over `warmup_steps` optimizer steps (0 =
        # auto, 5% of the run). A callable is used verbatim as an optax
        # schedule (step -> lr; DP LR scaling is then the caller's call).
        if lr_schedule not in (None, 'cosine', 'warmup_cosine') \
                and not callable(lr_schedule):
            raise ValueError(
                f"`lr_schedule` must be None, 'cosine', 'warmup_cosine' or "
                f"a callable schedule, got {lr_schedule!r}")
        if warmup_steps < 0:
            raise ValueError('`warmup_steps` must be >= 0')
        self.lr_schedule = lr_schedule
        self.warmup_steps = warmup_steps
        # parameter EMA (beyond the reference): ema_decay > 0 maintains an
        # exponential moving average of the parameters inside the jitted
        # step; validation/test/early-stopping, the best-model checkpoint
        # and the final `self.variables` then use the EMA weights (the
        # weights one serves), while `self.state.params` keeps the raw ones.
        # The EMA ticks once per OPTIMIZER update: with
        # gradient_accumulation_steps=k it advances only on the MultiSteps
        # commit, so `ema_decay` keeps the same averaging horizon at any k.
        if not 0.0 <= ema_decay < 1.0:
            raise ValueError('`ema_decay` must be in [0, 1)')
        self.ema_decay = float(ema_decay)
        self.early_stopping = early_stopping
        self.patience = patience
        self.min_delta = min_delta
        self.architecture_params = architecture_params
        self.trained_model = trained_model
        self.trained_epochs = trained_epochs
        # migration fine-tuning (beyond the reference): initialize the
        # freshly-built model's parameters from a reference-trained Keras
        # checkpoint (compat.import_keras_weights source: a live keras
        # model, a SavedModel dir, or a save_weights_npz .npz) and train
        # from there. `trained_model` already carries its own variables,
        # so the two are mutually exclusive.
        if init_weights is not None and trained_model is not None:
            raise ValueError('`init_weights` initializes a freshly-built '
                             'model; it cannot be combined with '
                             '`trained_model` (which carries its own '
                             'variables)')
        self.init_weights = init_weights
        self.save_bestmodel = save_bestmodel
        self.seed = seed
        self.save_logs = save_logs
        self.profile = profile
        # data_in_hbm=False streams ALL THREE splits (train, val, test)
        # from host RAM (or read-only np.memmaps) through the native
        # gather/crop kernels — it bounds TOTAL memory, not just the train
        # split; full feature matrix (explicit/implicit pairs, predictors,
        # statics, season).
        self.data_in_hbm = data_in_hbm
        # steps executed per host dispatch (lax.scan chunk); None = whole
        # epoch in one XLA program (TPU-idiomatic: no per-step host latency)
        self.steps_per_execution = steps_per_execution
        # preemption resilience: periodic full-state checkpoints (params +
        # optimizer state + epoch) every k epochs; resume with
        # resume_from_checkpoint=<path> (beyond the reference, which only
        # checkpoints the CGAN, SURVEY.md §5)
        self.checkpoints_frequency = checkpoints_frequency
        self.resume_from_checkpoint = resume_from_checkpoint
        # failure detection (SURVEY §5 — beyond the reference): stop the run
        # when the loss diverges to NaN/inf instead of burning the remaining
        # epochs (keras TerminateOnNaN analogue, on by default)
        self.terminate_on_nan = terminate_on_nan
        # gradient accumulation (beyond the reference): every data step
        # synthesizes and backprops one `batch_size` microbatch; parameters
        # update once per `gradient_accumulation_steps` microbatches with the
        # mean of the accumulated gradients (optax.MultiSteps) — an effective
        # batch of k x global_batch_size at microbatch memory cost. Works in
        # every dispatch mode (scan chunks, per-step, streaming tier).
        if (not isinstance(gradient_accumulation_steps, int)
                or gradient_accumulation_steps < 1):
            raise ValueError('`gradient_accumulation_steps` must be an '
                             'integer >= 1')
        self.gradient_accumulation_steps = gradient_accumulation_steps
        # per-sample season indices 0..3, one array per split
        # ((train, val, test) tuple); one-hot channels appended on device —
        # replaces the reference's per-sample xarray time lookups
        # (dataloader.py:508-542)
        if season_ids is not None and (not isinstance(season_ids, (tuple, list))
                                       or len(season_ids) != 3):
            raise ValueError('`season_ids` must be a (train, val, test) '
                             'tuple of int arrays')
        # season_ids may instead be derived from per-split time metadata:
        # a (train, val, test) tuple of datetime-like arrays, or the string
        # 'auto' to read each split's xr time coordinate — the reference's
        # xarray-time season path (dl4ds/dataloader.py:508-542). Opt-in
        # only: season channels widen the model input by 4.
        if season_ids is not None and time_metadata is not None:
            raise ValueError('pass either `season_ids` or `time_metadata`, '
                             'not both (time_metadata would be silently '
                             'shadowed by the explicit season_ids)')
        if season_ids is None and time_metadata is not None:
            from ..dataloader import _time_coord, season_ids_from_time
            if isinstance(time_metadata, str):
                if time_metadata != 'auto':
                    raise ValueError(
                        f'unknown time_metadata={time_metadata!r}; pass a '
                        f"(train, val, test) tuple of datetimes or 'auto'")
                time_metadata = tuple(
                    _time_coord(a) for a in (data_train, data_val, data_test))
                if any(t is None for t in time_metadata):
                    raise ValueError(
                        "time_metadata='auto' requires all three splits to "
                        "be xr.DataArrays with time coordinates")
            elif (not isinstance(time_metadata, (tuple, list))
                    or len(time_metadata) != 3):
                raise ValueError('`time_metadata` must be a (train, val, '
                                 "test) tuple of datetime-like arrays or "
                                 "'auto'")
            season_ids = tuple(
                season_ids_from_time(t, time_window) for t in time_metadata)
        self.season_ids = season_ids
        self.model = None
        self.variables = None

    # ------------------------------------------------------------------
    def setup_datagen(self):
        """Device-resident batch synthesizers for the three splits
        (reference analogue: supervised.py:220-240, three DataGenerators)."""
        common = dict(upsampling=self.upsampling, scale=self.scale,
                      batch_size=self.global_batch_size,
                      patch_size=self.patch_size,
                      time_window=self.time_window,
                      static_vars=self.static_vars,
                      interpolation=self.interpolation)
        season = self.season_ids or (None, None, None)
        if self.data_in_hbm:
            self.ds_train = BatchSynthesizer(
                self.data_train, self.data_train_lr,
                predictors=self.predictors_train,
                season_ids=season[0], **common)
        else:
            from ..dataloader import HostStreamer
            self.ds_train = HostStreamer(
                self.data_train, upsampling=self.upsampling,
                scale=self.scale, batch_size=self.global_batch_size,
                patch_size=self.patch_size, time_window=self.time_window,
                interpolation=self.interpolation, seed=self.seed,
                array_lr=self.data_train_lr, static_vars=self.static_vars,
                predictors=self.predictors_train, season_ids=season[0])
            # one transfer per batch: emit straight onto the batch sharding
            # (the loop's device_put then matches and is a no-op)
            self.ds_train.sharding = self.batch_sharding
        if self.data_in_hbm:
            self.ds_val = BatchSynthesizer(
                self.data_val, self.data_val_lr,
                predictors=self.predictors_val, season_ids=season[1],
                **common)
            self.ds_test = BatchSynthesizer(
                self.data_test, self.data_test_lr,
                predictors=self.predictors_test, season_ids=season[2],
                **common)
        else:
            # data_in_hbm=False bounds TOTAL device/host memory: val/test
            # stream through the same host tier as training (so e.g. a
            # memmapped eval split never loads into RAM either), one jitted
            # eval step per host batch.
            from ..dataloader import HostStreamer
            stream_common = dict(
                upsampling=self.upsampling, scale=self.scale,
                batch_size=self.global_batch_size,
                patch_size=self.patch_size, time_window=self.time_window,
                interpolation=self.interpolation, seed=self.seed,
                static_vars=self.static_vars)
            self.ds_val = HostStreamer(
                self.data_val, array_lr=self.data_val_lr,
                predictors=self.predictors_val, season_ids=season[1],
                **stream_common)
            self.ds_val.sharding = self.batch_sharding
            self.ds_test = HostStreamer(
                self.data_test, array_lr=self.data_test_lr,
                predictors=self.predictors_test, season_ids=season[2],
                **stream_common)
            self.ds_test.sharding = self.batch_sharding

    def setup_model(self):
        """Channel bookkeeping + model construction
        (reference: supervised.py:242-325)."""
        n_channels, n_aux_channels = self.channel_counts(
            self.predictors_train, self.static_vars, self.season_ids)
        (hr_height, hr_width), (lr_height, lr_width) = self.grid_sizes()

        if self.trained_model is None:
            self.model = build_model(
                backbone=self.backbone, upsampling=self.upsampling,
                scale=self.scale, n_channels=n_channels,
                n_aux_channels=n_aux_channels,
                lr_size=(lr_height, lr_width), hr_size=(hr_height, hr_width),
                time_window=self.time_window, **self.architecture_params)
            self.variables = self.model.init(
                jax.random.PRNGKey(self.seed),
                batch_size=self.global_batch_size)
            if self.init_weights is not None:
                from ..compat import import_keras_weights
                self.variables = import_keras_weights(
                    self.model, self.variables, self.init_weights)
                if self.verbose and self.running_on_first_worker:
                    src = (self.init_weights
                           if isinstance(self.init_weights, str)
                           else type(self.init_weights).__name__)
                    print(f'Initialized parameters from reference '
                          f'checkpoint: {src}')
            if self.verbose == 1 and self.running_on_first_worker:
                print(self.model.summary(self.variables))
        else:
            self.model, self.variables = self.trained_model
            if self.verbose:
                print('Loading pre-trained model')

    # ------------------------------------------------------------------
    def _build_optimizer(self):
        lr = self.learning_rate
        # Goyal et al. linear LR scaling by the DATA-parallel degree (a
        # 'model'/'space' mesh axis does not grow the global batch)
        scale_by = self.n_data_shards
        if callable(self.lr_schedule):
            # user-supplied optax schedule, used verbatim (documented: the
            # caller owns DP LR scaling in this case)
            self._lr = self.lr_schedule
        elif self.lr_schedule is not None:
            lr0, lr1 = ((lr[0], lr[1]) if isinstance(lr, (tuple, list))
                        and len(lr) > 1 else (float(np.ravel([lr])[0]), 0.0))
            steps = (self.steps_per_epoch if self.steps_per_epoch is not None
                     else max(self.ds_train.n // self.global_batch_size, 1))
            total = max(steps * self.epochs, 1)
            if self.lr_schedule == 'cosine':
                self._lr = optax.cosine_decay_schedule(
                    init_value=lr0 * scale_by, decay_steps=total,
                    alpha=lr1 / lr0)
            else:  # 'warmup_cosine'
                warmup = self.warmup_steps or max(total // 20, 1)
                self._lr = optax.warmup_cosine_decay_schedule(
                    init_value=0.0, peak_value=lr0 * scale_by,
                    warmup_steps=warmup, decay_steps=total,
                    end_value=lr1 * scale_by)
        elif isinstance(lr, (tuple, list)) and len(lr) > 1:
            schedule = optax.piecewise_constant_schedule(
                init_value=lr[0] * scale_by,
                boundaries_and_scales={int(self.lr_decay_after):
                                       lr[1] / lr[0]})
            self._lr = schedule
        else:
            if isinstance(lr, (tuple, list)):
                lr = lr[0]
            self._lr = lr * scale_by
        # optax.flatten: run the Adam update on ONE concatenated parameter
        # vector instead of one fused op per leaf. Per-op attribution on
        # the real chip (tools/trace_ops.py) showed per-leaf updates cost
        # 20-50 us EACH (launch floor, even for [3,3,8,8] kernels) —
        # ~0.3 ms/step of the headline config. The flattened update is a
        # few elementwise kernels over [n_params] regardless of leaf
        # count, and is element-for-element the same math.
        # eps=1e-7: the Keras Adam default the reference trains with
        # (tf.keras.optimizers.Adam, ref supervised.py:353); optax's default
        # is 1e-8 — a real training-dynamics difference at small gradients.
        # Tensor parallelism needs the PER-LEAF update (optax.flatten would
        # concatenate leaves and destroy the per-channel sharding of the
        # Adam moments); the flattened and per-leaf updates are
        # element-for-element the same math, so the 1-D and TP trainers
        # produce the same trajectory.
        adam = optax.adam(self._lr, eps=1e-7)
        tx = adam if self.tp_axis else optax.flatten(adam)
        if self.gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(
                tx, every_k_schedule=self.gradient_accumulation_steps)
        return tx

    def _make_state_shardings(self, state):
        """Placement tree for the TrainState: fully replicated on 1-D
        ('data',) and spatial ('space') meshes; on a tensor-parallel mesh
        ('model' axis) params, Adam moments, MultiSteps accumulators and
        the EMA copy are channel-sharded (parallel.tensor_param_shardings
        mirrored over the optax state), counters/batch_stats replicated.
        Stashed on `self._state_shardings` so `_make_steps` can pin the
        jitted steps' out_shardings (state comes back exactly as placed —
        donation-friendly, no GSPMD resharding surprises)."""
        rep = self.replicated_sharding
        if not self.tp_axis:
            self._state_shardings = rep
            return rep
        if state.batch_stats is not None:
            raise ValueError(
                'tensor-parallel training supports parameter-only models '
                '(batch-norm statistics are per-shard mutable state); '
                'build the model without batch norm')
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel import tensor_param_shardings, mirror_param_shardings
        spec_tree = tensor_param_shardings(state.params, self.mesh,
                                           self.tp_axis)
        p_sh = jax.tree.map(lambda s: NamedSharding(self.mesh, s),
                            spec_tree, is_leaf=lambda s: isinstance(s, P))
        self._state_shardings = state.replace(
            step=rep, params=p_sh,
            opt_state=mirror_param_shardings(state.opt_state, state.params,
                                             p_sh, rep),
            batch_stats=None,
            ema_params=(p_sh if state.ema_params is not None else None))
        return self._state_shardings

    def _make_steps(self):
        model, lossf = self.model, self.lossf
        synth_train, synth_val = self.ds_train, self.ds_val
        has_bn = self.variables is not None and 'batch_stats' in self.variables
        ema_decay = self.ema_decay  # static: baked into the jitted programs

        # Spatial sharding ('space' mesh axis): one sharding constraint on
        # the synthesized batch's height axis (H is dim -3 for both 4-D and
        # 5-D samples) seeds GSPMD, which spatially partitions every conv
        # (inserting its own halo exchanges on ICI) and the pixel loss —
        # the same program the 1-D mesh runs, so results match to float
        # tolerance. The hand-rolled ppermute variant with an explicit halo
        # budget stays available as parallel.make_spatial_sharded_step.
        sp_axis, mesh = self.sp_axis, self.mesh
        batch_axis = 'data' if 'data' in mesh.axis_names else None

        def sp_constrain(batch):
            if sp_axis is None:
                return batch
            from jax.sharding import NamedSharding, PartitionSpec as P

            def c(a):
                if a is None:
                    return None
                spec = [None] * a.ndim
                spec[0] = batch_axis
                spec[a.ndim - 3] = sp_axis
                return jax.lax.with_sharding_constraint(
                    a, NamedSharding(mesh, P(*spec)))

            return {k: c(v) for k, v in batch.items()}

        def forward(params, batch_stats, batch, key, training):
            variables = {'params': params}
            if has_bn:
                variables['batch_stats'] = batch_stats
            kwargs = dict(training=training, rngs={'dropout': key})
            if training and has_bn:
                out, updates = model.apply(variables, batch['lr'],
                                           batch['aux'],
                                           mutable=['batch_stats'], **kwargs)
                return out.astype(jnp.float32), updates['batch_stats']
            out = model.apply(variables, batch['lr'], batch['aux'], **kwargs)
            # loss in f32 regardless of the model's compute dtype (bf16 path)
            return out.astype(jnp.float32), batch_stats

        def train_step_batch(state, batch, key):
            batch = sp_constrain(batch)

            def loss_fn(params):
                out, new_bs = forward(params, state.batch_stats, batch, key,
                                      True)
                return lossf(batch['hr'], out), new_bs

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads, batch_stats=new_bs)
            if ema_decay > 0:
                # gated on the MultiSteps commit under grad accumulation —
                # see training.base.ema_update
                from .base import ema_update
                state = state.replace(ema_params=ema_update(
                    state.ema_params, state.params, ema_decay,
                    state.opt_state))
            return state, loss

        def train_step(state, indices, key):
            skey, dkey = jax.random.split(key)
            batch = synth_train._make_batch(indices, skey)
            return train_step_batch(state, batch, dkey)

        def train_many(state, idx_mat, key):
            """Run idx_mat.shape[0] steps in ONE XLA program (lax.scan over
            the fused step) — a single host->device dispatch per chunk
            instead of per step, hiding dispatch latency entirely."""
            keys = jax.random.split(key, idx_mat.shape[0])

            def body(state, xs):
                indices, k = xs
                state, loss = train_step(state, indices, k)
                return state, loss

            state, losses = jax.lax.scan(body, state, (idx_mat, keys))
            return state, losses

        def eval_many(state, idx_mat, key, synth_consts):
            keys = jax.random.split(key, idx_mat.shape[0])

            def body(carry, xs):
                indices, k = xs
                return carry, eval_step(state, indices, k, synth_consts)

            _, losses = jax.lax.scan(body, None, (idx_mat, keys))
            return losses

        def eval_batch(state, batch, key):
            # with EMA on, validation/test (and hence early stopping and
            # the best-model checkpoint) score the averaged weights — the
            # weights that will be served
            batch = sp_constrain(batch)
            params = state.ema_params if ema_decay > 0 else state.params
            out, _ = forward(params, state.batch_stats, batch, key, False)
            return lossf(batch['hr'], out)

        def eval_step(state, indices, key, synth_consts):
            skey, dkey = jax.random.split(key)
            batch = synth_consts._make_batch(indices, skey)
            return eval_batch(state, batch, dkey)

        # On a TP mesh, pin the updated state to come back EXACTLY as
        # placed (channel-sharded params/moments) — donation-friendly and
        # no GSPMD output-resharding surprises. loss scalars replicate.
        st_kwargs = {}
        if self.tp_axis:
            st_kwargs = dict(out_shardings=(self._state_shardings,
                                            self.replicated_sharding))
        self._train_step_batch = jax.jit(train_step_batch, donate_argnums=0,
                                         **st_kwargs)
        if self.data_in_hbm:
            self._train_step = jax.jit(train_step, donate_argnums=0,
                                       **st_kwargs)
            self._train_many = jax.jit(train_many, donate_argnums=0,
                                       **st_kwargs)
            self._eval_step_val = jax.jit(
                lambda s, i, k: eval_step(s, i, k, synth_val))
            self._eval_step_test = jax.jit(
                lambda s, i, k: eval_step(s, i, k, self.ds_test))
            self._eval_many_val = jax.jit(
                lambda s, m, k: eval_many(s, m, k, synth_val))
            self._eval_many_test = jax.jit(
                lambda s, m, k: eval_many(s, m, k, self.ds_test))
        else:
            self._eval_step_streaming = jax.jit(eval_batch)

    # ------------------------------------------------------------------
    def run(self):
        """Train, evaluate and persist (reference: supervised.py:328-416)."""
        self.timing = Timing(self.verbose)
        self.setup_datagen()
        self.setup_model()

        tx = self._build_optimizer()
        state = TrainState.create(
            apply_fn=self.model.module.apply, params=self.variables['params'],
            tx=tx, batch_stats=self.variables.get('batch_stats'),
            ema_params=(jax.tree.map(jnp.array, self.variables['params'])
                        if self.ema_decay > 0 else None))
        if self.resume_from_checkpoint is not None:
            state, self.trained_epochs = self._restore_checkpoint(
                state, self.resume_from_checkpoint)
            if self.verbose:
                print(f'Resumed from checkpoint at epoch '
                      f'{self.trained_epochs}')
        state = jax.device_put(state, self._make_state_shardings(state))
        self._make_steps()

        key = jax.random.PRNGKey(self.seed)
        if self.trained_epochs:
            # a resumed run must not replay the first epochs' shuffles/
            # crops/dropout streams
            key = jax.random.fold_in(key, self.trained_epochs)
        n_batches = self.ds_train.n // self.global_batch_size
        steps = (self.steps_per_epoch if self.steps_per_epoch is not None
                 else n_batches)
        if steps < 1:
            raise ValueError(
                f'data_train yields no full global batch '
                f'(n={self.ds_train.n}, global_batch_size='
                f'{self.global_batch_size}); reduce batch_size, use fewer '
                f'devices, or set steps_per_epoch')
        val_batches = self.ds_val.n // self.global_batch_size
        val_steps = (self.validation_steps if self.validation_steps is not None
                     else max(val_batches, 1))
        if not self.data_in_hbm:
            # the streaming tier draws WHOLE batches from the host
            # producer (HostStreamer emits n // batch_size of them): an
            # eval split smaller than one global batch would yield an
            # EMPTY eval epoch and a silent NaN mean. The in-HBM tier is
            # unaffected (index synthesis wraps the permutation).
            for nm, ds in (('data_val', self.ds_val),
                           ('data_test', self.ds_test)):
                if ds.n < self.global_batch_size:
                    raise ValueError(
                        f'{nm} yields no full global batch in the '
                        f'streaming tier (n={ds.n}, global_batch_size='
                        f'{self.global_batch_size}); reduce batch_size, '
                        f'use fewer devices, or set data_in_hbm=True')

        history = {'loss': [], 'val_loss': []}
        best_val = np.inf
        patience_left = self.patience
        stop = False

        if self.profile:
            self.start_profiler()
        from jax.sharding import NamedSharding, PartitionSpec as P
        bax = 'data' if 'data' in self.mesh.axis_names else None
        idx_mat_sharding = NamedSharding(self.mesh, P(None, bax))
        idx_row_sharding = NamedSharding(self.mesh, P(bax))
        # XLA:CPU runs scan-of-steps ~25-60x slower than the identical
        # per-step program EVEN AT TRIP COUNT 1 (measured: 23 s vs 0.4 s
        # per step on the tutorial workload) — so on CPU bypass the scan
        # wrappers entirely and dispatch the jitted single-step programs;
        # TPU keeps the one-XLA-program-per-epoch scan dispatch.
        # (an explicit steps_per_execution overrides the bypass)
        per_step_dispatch = (jax.default_backend() == 'cpu'
                             and self.steps_per_execution is None)
        spe = self.steps_per_execution or steps
        # Round the epoch up to whole `spe` chunks so every `train_many`
        # dispatch has the same [spe, batch] shape — a ragged tail chunk
        # would trigger a second full XLA compile. `epoch_indices` wraps the
        # permutation, so the extra steps just resample the epoch.
        steps_exec = -(-steps // spe) * spe
        if not self.data_in_hbm:
            if self.steps_per_execution:
                import warnings
                warnings.warn(
                    'steps_per_execution only applies to the in-HBM tier '
                    '(data_in_hbm=True); the streaming tier dispatches one '
                    'jitted step per host batch and will ignore it',
                    RuntimeWarning)
        elif steps_exec != steps:
            import warnings
            warnings.warn(
                f'steps_per_execution={spe} does not divide '
                f'steps_per_epoch={steps}; each epoch runs {steps_exec} '
                f'optimizer steps (padded up to whole chunks to avoid a '
                f'second XLA compile)', RuntimeWarning)

        for epoch in range(self.trained_epochs, self.epochs):
            key, ekey = jax.random.split(key)
            epoch_losses = []
            if self.data_in_hbm:
                idx_epoch = np.asarray(
                    self.ds_train.epoch_indices(ekey, steps=steps_exec))
                if per_step_dispatch:
                    for c in range(steps_exec):
                        key, skey = jax.random.split(key)
                        row = jax.device_put(
                            jnp.asarray(idx_epoch[c], jnp.int32),
                            idx_row_sharding)
                        state, loss = self._train_step(state, row, skey)
                        epoch_losses.append(loss)
                else:
                    for c in range(0, steps_exec, spe):
                        key, skey = jax.random.split(key)
                        chunk = jax.device_put(
                            jnp.asarray(idx_epoch[c:c + spe], jnp.int32),
                            idx_mat_sharding)
                        state, losses = self._train_many(state, chunk, skey)
                        epoch_losses.append(losses)
                train_loss = float(np.mean(np.concatenate(
                    [np.atleast_1d(jax.device_get(l))
                     for l in epoch_losses])))
            else:
                for batch in self.ds_train.epochs(n_epochs=1, steps=steps):
                    key, skey = jax.random.split(key)
                    batch = {k: (jax.device_put(v, self.batch_sharding)
                                 if v is not None else None)
                             for k, v in batch.items()}
                    state, loss = self._train_step_batch(state, batch, skey)
                    epoch_losses.append(loss)
                train_loss = float(np.mean(jax.device_get(epoch_losses)))

            # validation — one dispatch (per-step on CPU, see above)
            key, vkey, skey = jax.random.split(key, 3)
            if self.data_in_hbm:
                vidx_np = np.asarray(
                    self.ds_val.epoch_indices(vkey, steps=val_steps))
                val_loss, key = self._eval_epoch(
                    state, vidx_np, key, skey, per_step_dispatch,
                    self._eval_step_val, self._eval_many_val,
                    idx_row_sharding, idx_mat_sharding)
            else:
                val_loss, key = self._eval_epoch_streaming(
                    state, self.ds_val, val_steps, key)

            history['loss'].append(train_loss)
            history['val_loss'].append(val_loss)
            if self.terminate_on_nan and not (np.isfinite(train_loss)
                                              and np.isfinite(val_loss)):
                import warnings
                warnings.warn(
                    f'Non-finite loss at epoch {epoch + 1} '
                    f'(loss={train_loss}, val_loss={val_loss}); terminating '
                    f'training', RuntimeWarning)
                self.stop_profiler()   # idempotent; finalize any open trace
                break
            if self.profile and epoch == self.trained_epochs:
                self.stop_profiler()
            if self.save_logs:
                self.log_scalars(epoch, loss=train_loss, val_loss=val_loss)
            if self.verbose and self.running_on_first_worker:
                print(f'Epoch {epoch + 1}/{self.epochs}  '
                      f'loss: {train_loss:.6f}  val_loss: {val_loss:.6f}')

            if (self.checkpoints_frequency > 0
                    and self.running_on_first_worker
                    and (epoch + 1) % self.checkpoints_frequency == 0):
                self._save_full_checkpoint(state, epoch + 1)

            improved = val_loss < best_val - self.min_delta
            if improved:
                best_val = val_loss
                patience_left = self.patience
                if self.save_bestmodel and self.running_on_first_worker:
                    self._save_checkpoint(state, 'best_model')
            elif self.early_stopping:
                patience_left -= 1
                if patience_left <= 0:
                    if self.verbose:
                        print(f'Early stopping at epoch {epoch + 1}')
                    stop = True
            if stop:
                break
        self.stop_profiler()   # safety net for any loop exit (idempotent)

        self.fithist = history
        self.state = state
        # with EMA on, the trainer's public weights are the averaged ones
        # (what predict()/save_results serve); raw params stay on the state
        self.variables = {'params': (state.ema_params if self.ema_decay > 0
                                     else state.params)}
        if state.batch_stats is not None:
            self.variables['batch_stats'] = state.batch_stats

        # test evaluation — the computation runs on ALL processes (the
        # sharded eval contains collectives; gating it on worker 0 would
        # deadlock a multi-host mesh), only the reporting is rank-gated
        # (reference: supervised.py:408-414 evaluates on worker 0, but its
        # per-process Horovod model is replicated, not SPMD)
        test_batches = self.ds_test.n // self.global_batch_size
        test_steps = (self.test_steps if self.test_steps is not None
                      else max(test_batches, 1))
        key, tkey, skey = jax.random.split(key, 3)
        if self.data_in_hbm:
            tidx_np = np.asarray(
                self.ds_test.epoch_indices(tkey, steps=test_steps))
            self.test_loss, key = self._eval_epoch(
                state, tidx_np, key, skey, per_step_dispatch,
                self._eval_step_test, self._eval_many_test,
                idx_row_sharding, idx_mat_sharding)
        else:
            self.test_loss, key = self._eval_epoch_streaming(
                state, self.ds_test, test_steps, key)
        if self.running_on_first_worker:
            if self.verbose:
                print(f'\nScore on the test set: {self.test_loss}')
            self.timing.runtime()

        self.save_results(self.variables)
        return self

    # ------------------------------------------------------------------
    def _eval_epoch(self, state, idx_np, key, skey, per_step_dispatch,
                    eval_step, eval_many, idx_row_sharding,
                    idx_mat_sharding):
        """Mean eval loss over an index matrix — one scan dispatch on TPU,
        per-step on XLA:CPU (see the dispatch note in run())."""
        if per_step_dispatch:
            ls = []
            for r in range(idx_np.shape[0]):
                key, skey = jax.random.split(key)
                ls.append(eval_step(state, jax.device_put(
                    jnp.asarray(idx_np[r], jnp.int32), idx_row_sharding),
                    skey))
            return float(np.mean(jax.device_get(ls))), key
        idx = jax.device_put(jnp.asarray(idx_np, jnp.int32),
                             idx_mat_sharding)
        return float(np.mean(jax.device_get(
            eval_many(state, idx, skey)))), key

    def _eval_epoch_streaming(self, state, streamer, steps, key):
        """Mean eval loss over `steps` host-streamed batches (the
        data_in_hbm=False tier): one jitted eval step per batch, batches
        gathered/cropped by the native host pipeline — so a memmapped eval
        split never materializes beyond `steps * batch` patches."""
        ls = []
        for batch in streamer.epochs(n_epochs=1, steps=steps):
            key, dkey = jax.random.split(key)
            batch = {k: (jax.device_put(v, self.batch_sharding)
                         if v is not None else None)
                     for k, v in batch.items()}
            ls.append(self._eval_step_streaming(state, batch, dkey))
        return float(np.mean(jax.device_get(ls))), key

    def _save_checkpoint(self, state, name):
        import os
        path = os.path.abspath(os.path.join(self.savecheckpoint_path, name))
        # the best-model checkpoint stores the weights that were scored
        # (EMA when enabled) — it is what load_model/predict will serve
        params = state.ema_params if self.ema_decay > 0 else state.params
        payload = {'params': jax.device_get(params)}
        if state.batch_stats is not None:
            payload['batch_stats'] = jax.device_get(state.batch_stats)
        self._checkpoint_save(path, payload)

    def _save_full_checkpoint(self, state, epoch):
        """Full train state (params + opt state + epoch) for resume.
        Routed through the warn-and-pickle-fallback helper so a transient
        FS/orbax failure cannot abort the training run it exists to
        protect."""
        import os
        path = os.path.abspath(os.path.join(
            self.savecheckpoint_path, 'checkpoints', f'epoch-{epoch}'))
        payload = {'params': jax.device_get(state.params),
                   'opt_state': jax.device_get(state.opt_state),
                   'step': int(state.step), 'epoch': epoch}
        if state.batch_stats is not None:
            payload['batch_stats'] = jax.device_get(state.batch_stats)
        if state.ema_params is not None:
            payload['ema_params'] = jax.device_get(state.ema_params)
        self._checkpoint_save(path, payload)

    def _restore_checkpoint(self, state, path):
        import os
        import orbax.checkpoint as ocp
        template = {'params': state.params, 'opt_state': state.opt_state,
                    'step': 0, 'epoch': 0}
        if state.batch_stats is not None:
            template['batch_stats'] = state.batch_stats
        if state.ema_params is not None:
            template['ema_params'] = state.ema_params
        payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(path),
                                                   item=template)
        state = state.replace(
            params=payload['params'], opt_state=payload['opt_state'],
            step=payload['step'],
            batch_stats=payload.get('batch_stats', state.batch_stats),
            ema_params=payload.get('ema_params', state.ema_params))
        return state, int(payload['epoch'])
