"""
Conditional GAN training (pix2pix-style, Isola et al. 2016).

TPU-native counterpart of the reference CGANTrainer
(dl4ds/training/cgan.py:30-444). The reference runs an *eager* per-step
train_step with two GradientTapes (cgan.py:575-639); here generator and
discriminator updates — and the batch synthesis — live in ONE jitted step,
sharded over the mesh's data axis (gradient all-reduce by XLA, replacing
hvd.DistributedGradientTape).

Losses (reference: cgan.py:525-572):
  G: BCE(ones, D(fake)) + 100 * pixel_loss(fake, target)
  D: BCE(ones, D(real)) + BCE(zeros, D(fake))
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..utils import Timing
from ..dataloader import BatchSynthesizer
from ..models import build_model, residual_discriminator
from .base import Trainer

_EPS = 1e-7


class GenTrainState(train_state.TrainState):
    # exponential moving average of the GENERATOR params (standard GAN
    # serving practice — the EMA generator is smoother than any single
    # late-training iterate); maintained inside the jitted step when the
    # trainer's ema_decay > 0, None otherwise. Initialized AT the initial
    # params, so no zero-debiasing is needed.
    ema_params: object = None


def _bce(labels, probs):
    """Binary cross-entropy on probabilities (from_logits=False), matching
    tf.keras.losses.BinaryCrossentropy used by the reference."""
    probs = jnp.clip(probs, _EPS, 1.0 - _EPS)
    return -jnp.mean(labels * jnp.log(probs)
                     + (1.0 - labels) * jnp.log(1.0 - probs))


def generator_loss(disc_generated_output, gen_output, target,
                   gen_pxloss_function, lambda_scaling_factor=100):
    """Total G loss = GAN BCE vs ones + LAMBDA * pixel loss
    (reference: cgan.py:525-553)."""
    gan_loss = _bce(jnp.ones_like(disc_generated_output),
                    disc_generated_output)
    px_loss = gen_pxloss_function(target, gen_output)
    return gan_loss + lambda_scaling_factor * px_loss, gan_loss, px_loss


def discriminator_loss(disc_real_output, disc_generated_output):
    """D loss = BCE(ones, real) + BCE(zeros, fake)
    (reference: cgan.py:556-572)."""
    real_loss = _bce(jnp.ones_like(disc_real_output), disc_real_output)
    gen_loss = _bce(jnp.zeros_like(disc_generated_output),
                    disc_generated_output)
    return real_loss + gen_loss


def train_step(gen_state, disc_state, batch, key, generator, discriminator,
               gen_pxloss_function, lambda_scaling_factor=100,
               ema_decay=0.0):
    """One fused G+D update on a (lr, hr[, aux]) batch — the pure, jittable
    counterpart of the reference's eager two-GradientTape `train_step`
    (cgan.py:575-639; the Horovod allreduce becomes XLA's all-reduce when the
    batch is sharded over a mesh). Returns (gen_state, disc_state,
    (g_total, g_gan, g_px, d_loss))."""
    gkey, dkey, rkey = jax.random.split(key, 3)
    lr, hr, aux = batch['lr'], batch['hr'], batch['aux']

    def g_loss_fn(g_params):
        fake = generator.module.apply({'params': g_params}, lr, aux,
                                      training=True, rngs={'dropout': gkey})
        d_fake = discriminator.module.apply(
            {'params': disc_state.params}, lr, fake, training=True,
            rngs={'dropout': dkey})
        total, gan_l, px_l = generator_loss(
            d_fake, fake, hr, gen_pxloss_function, lambda_scaling_factor)
        return total, (gan_l, px_l, fake)

    (g_total, (g_gan, g_px, fake)), g_grads = jax.value_and_grad(
        g_loss_fn, has_aux=True)(gen_state.params)

    def d_loss_fn(d_params):
        # d_real gets its OWN dropout mask (the reference's D(real) is a
        # separate call); d_fake keeps gkey's pairing via dkey — the
        # reference computes ONE disc_generated_output shared by both
        # losses (cgan.py:595-600), which reusing dkey reproduces exactly
        d_real = discriminator.module.apply({'params': d_params}, lr, hr,
                                            training=True,
                                            rngs={'dropout': rkey})
        d_fake = discriminator.module.apply(
            {'params': d_params}, lr, jax.lax.stop_gradient(fake),
            training=True, rngs={'dropout': dkey})
        return discriminator_loss(d_real, d_fake)

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(disc_state.params)

    gen_state = gen_state.apply_gradients(grads=g_grads)
    disc_state = disc_state.apply_gradients(grads=d_grads)
    if ema_decay > 0:
        # requires a GenTrainState (the trainer creates one when its
        # ema_decay > 0); plain TrainStates keep the default path.
        # EMA advances only on the MultiSteps COMMIT under gradient
        # accumulation — see training.base.ema_update
        from .base import ema_update
        gen_state = gen_state.replace(ema_params=ema_update(
            gen_state.ema_params, gen_state.params, ema_decay,
            gen_state.opt_state))
    return gen_state, disc_state, (g_total, g_gan, g_px, d_loss)


class CGANTrainer(Trainer):
    """Adversarial trainer: generator from the model zoo + two-branch
    conditional discriminator.

    Signature-compatibility notes: `model_list` and `gpu_memory_growth`
    are accepted for reference API compatibility (dl4ds/training/cgan.py)
    but are no-ops here; `device`/`devices`/`mesh` select the JAX
    placement instead."""

    def __init__(self, backbone, upsampling, data_train, data_test,
                 data_train_lr=None, data_test_lr=None, predictors_train=None,
                 predictors_test=None, scale=5, patch_size=None,
                 time_window=None, loss='mae', epochs=60, batch_size=16,
                 learning_rates=(2e-4, 2e-4), device='TPU', model_list=None,
                 steps_per_epoch=None, interpolation='inter_area',
                 static_vars=None, checkpoints_frequency=0, save=False,
                 save_path=None, save_logs=False, save_loss_history=True,
                 generator_params=None, discriminator_params=None,
                 verbose=True, seed=42, mesh=None, devices=None,
                 gpu_memory_growth=None, resume_from_checkpoint=None,
                 data_in_hbm=True, terminate_on_nan=True,
                 gradient_accumulation_steps=1, ema_decay=0.0,
                 lr_schedule=None, warmup_steps=0, init_weights=None):
        super().__init__(
            backbone=backbone, upsampling=upsampling, data_train=data_train,
            data_train_lr=data_train_lr, time_window=time_window, loss=loss,
            batch_size=batch_size, patch_size=patch_size, scale=scale,
            device=device, verbose=verbose, model_list=model_list, save=save,
            save_path=save_path, show_plot=False, mesh=mesh, devices=devices)
        if self.tp_axis or self.sp_axis:
            raise NotImplementedError(
                "2-D ('model'/'space') meshes are routed through "
                'SupervisedTrainer; the CGAN trainer supports the 1-D '
                "('data',) mesh")
        self.data_test = self._as_array(data_test, 'data_test')
        self.data_test_lr = (self._as_array(data_test_lr, 'data_test_lr')
                             if data_test_lr is not None else None)
        for name, preds in (('predictors_train', predictors_train),
                            ('predictors_test', predictors_test)):
            if preds is not None and not isinstance(preds, list):
                raise TypeError(f'`{name}` must be a list of ndarrays')
        self.predictors_train = predictors_train
        self.predictors_test = predictors_test
        self.epochs = epochs
        self.learning_rates = learning_rates
        self.steps_per_epoch = steps_per_epoch
        self.interpolation = interpolation
        self.static_vars = static_vars
        self.checkpoints_frequency = checkpoints_frequency
        self.save_loss_history = save_loss_history
        self.save_logs = save_logs
        self.generator_params = generator_params or {}
        self.discriminator_params = discriminator_params or {}
        # initialize the GENERATOR from a reference-trained Keras
        # checkpoint (compat.import_keras_weights source) — the standard
        # "pretrain supervised, then adversarially fine-tune" migration;
        # the discriminator always starts fresh (as in the reference).
        self.init_weights = init_weights
        self.seed = seed
        # data_in_hbm=False streams the training split from host RAM through
        # the native gather/crop kernels (datasets larger than HBM), same as
        # SupervisedTrainer's streaming tier
        self.data_in_hbm = data_in_hbm
        # stop when G or D loss diverges to NaN/inf (failure detection)
        self.terminate_on_nan = terminate_on_nan
        # G and D both accumulate over k microbatches and update together
        # every k-th (optax.MultiSteps) — same semantics as the supervised
        # trainer's gradient_accumulation_steps
        if (not isinstance(gradient_accumulation_steps, int)
                or gradient_accumulation_steps < 1):
            raise ValueError('`gradient_accumulation_steps` must be an '
                             'integer >= 1')
        self.gradient_accumulation_steps = gradient_accumulation_steps
        # generator parameter EMA (beyond the reference; standard GAN
        # practice): ema_decay > 0 maintains averaged G weights inside the
        # jitted step — the test eval, `self.variables` (what predict()
        # serves) and save_results then use the EMA generator; the raw
        # iterate stays on `self.gen_state.params`
        if not 0.0 <= ema_decay < 1.0:
            raise ValueError('`ema_decay` must be in [0, 1)')
        self.ema_decay = float(ema_decay)
        # LR schedules for BOTH optimizers (knob parity with
        # SupervisedTrainer — beyond the reference's fixed Adam,
        # cgan.py:277-278): None = constant; 'cosine' decays each LR -> 0
        # over the run; 'warmup_cosine' adds a linear warmup over
        # `warmup_steps` G/D steps (0 = auto, 5% of the run); a callable
        # is used verbatim as an optax schedule for both G and D.
        if lr_schedule not in (None, 'cosine', 'warmup_cosine') \
                and not callable(lr_schedule):
            raise ValueError(
                f"`lr_schedule` must be None, 'cosine', 'warmup_cosine' or "
                f"a callable schedule, got {lr_schedule!r}")
        if warmup_steps < 0:
            raise ValueError('`warmup_steps` must be >= 0')
        self.lr_schedule = lr_schedule
        self.warmup_steps = warmup_steps
        # resume G/D params + optimizer states from a periodic checkpoint
        # saved by checkpoints_frequency (path to .../checkpoints/<name>)
        self.resume_from_checkpoint = resume_from_checkpoint
        self.gentotal, self.gengan, self.gen_pxloss, self.disc = [], [], [], []

        self.time_window = time_window
        if self.time_window is not None and not self.model_is_spatiotemporal:
            # time_window <= 1 builds spatial models (base.py defines
            # spatio-temporality FROM time_window, so no inconsistency
            # is possible here)
            self.time_window = None

    # ------------------------------------------------------------------
    def setup_model(self):
        """Build G and D (reference: cgan.py:174-262)."""
        n_channels, n_aux_channels = self.channel_counts(
            self.predictors_train, self.static_vars)
        (hr_h, hr_w), (lr_h, lr_w) = self.grid_sizes()

        self.generator = build_model(
            backbone=self.backbone, upsampling=self.upsampling,
            scale=self.scale, n_channels=n_channels,
            n_aux_channels=n_aux_channels, lr_size=(lr_h, lr_w),
            hr_size=(hr_h, hr_w), time_window=self.time_window,
            **self.generator_params)
        self.discriminator = residual_discriminator(
            n_channels=n_channels, scale=self.scale,
            upsampling=self.upsampling,
            is_spatiotemporal=self.model_is_spatiotemporal,
            lr_size=(lr_h, lr_w), time_window=self.time_window,
            **self.discriminator_params)

        key = jax.random.PRNGKey(self.seed)
        kg, kd = jax.random.split(key)
        self.gen_vars = self.generator.init(kg, batch_size=2)
        if self.init_weights is not None:
            from ..compat import import_keras_weights
            self.gen_vars = import_keras_weights(
                self.generator, self.gen_vars, self.init_weights)
            if self.verbose and self.running_on_first_worker:
                src = (self.init_weights
                       if isinstance(self.init_weights, str)
                       else type(self.init_weights).__name__)
                print(f'Initialized generator from reference '
                      f'checkpoint: {src}')
        self.disc_vars = self.discriminator.init(kd, batch_size=2)
        if ('batch_stats' in self.gen_vars
                or 'batch_stats' in self.disc_vars):
            raise NotImplementedError(
                "normalization='bn' is not supported in the CGAN trainer "
                '(the fused G+D step does not thread batch statistics '
                'through the three discriminator passes); use '
                "normalization='ln' or None — the supervised trainer "
                'supports bn')
        if self.verbose == 1 and self.running_on_first_worker:
            print(self.generator.summary(self.gen_vars))
            print(self.discriminator.summary(self.disc_vars))

    # ------------------------------------------------------------------
    def _make_step(self):
        gen, disc, lossf = self.generator, self.discriminator, self.lossf
        synth = self.ds_train

        ema_decay = self.ema_decay  # static: baked into the jitted programs

        def train_step_batch(gen_state, disc_state, batch, key):
            return train_step(gen_state, disc_state, batch, key, gen, disc,
                              lossf, ema_decay=ema_decay)

        def train_step_indices(gen_state, disc_state, indices, key):
            skey, bkey = jax.random.split(key)
            batch = synth._make_batch(indices, skey)
            return train_step_batch(gen_state, disc_state, batch, bkey)

        def train_many(gen_state, disc_state, idx_mat, key):
            """One XLA program per epoch chunk: lax.scan over the fused
            G+D step (single host dispatch, no per-step latency)."""
            keys = jax.random.split(key, idx_mat.shape[0])

            def body(carry, xs):
                gs, ds = carry
                indices, k = xs
                gs, ds, losses = train_step_indices(gs, ds, indices, k)
                return (gs, ds), jnp.stack(losses)

            (gen_state, disc_state), losses = jax.lax.scan(
                body, (gen_state, disc_state), (idx_mat, keys))
            return gen_state, disc_state, losses

        self._train_step = jax.jit(train_step_indices,
                                   donate_argnums=(0, 1))
        self._train_step_batch = jax.jit(train_step_batch,
                                         donate_argnums=(0, 1))
        self._train_many = jax.jit(train_many, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def run(self):
        """Adversarial training loop (reference: cgan.py:264-444)."""
        self.timing = Timing(self.verbose)

        if self.data_in_hbm:
            self.ds_train = BatchSynthesizer(
                self.data_train, self.data_train_lr,
                upsampling=self.upsampling, scale=self.scale,
                batch_size=self.global_batch_size,
                patch_size=self.patch_size, time_window=self.time_window,
                static_vars=self.static_vars,
                predictors=self.predictors_train,
                interpolation=self.interpolation)
        else:
            from ..dataloader import HostStreamer
            self.ds_train = HostStreamer(
                self.data_train, upsampling=self.upsampling,
                scale=self.scale, batch_size=self.global_batch_size,
                patch_size=self.patch_size, time_window=self.time_window,
                interpolation=self.interpolation, seed=self.seed,
                array_lr=self.data_train_lr, static_vars=self.static_vars,
                predictors=self.predictors_train)
        self.setup_model()

        n = self.ds_train.n
        steps = (self.steps_per_epoch if self.steps_per_epoch is not None
                 else int(n / self.global_batch_size))
        if steps < 1:
            raise ValueError(
                f'data_train yields no full global batch (n={n}, '
                f'global_batch_size={self.global_batch_size}); reduce '
                f'batch_size, use fewer devices, or set steps_per_epoch')

        lrs = self.learning_rates
        if isinstance(lrs, (tuple, list)) and len(lrs) > 1:
            genlr, dislr = lrs[0], lrs[1]
        else:
            genlr = dislr = lrs[0] if isinstance(lrs, (tuple, list)) else lrs

        def _sched(lr0):
            """Constant LR, or the trainer's schedule peaked at lr0 (same
            horizon bookkeeping as SupervisedTrainer._build_optimizer: the
            schedule is indexed by OPTIMIZER step, so under gradient
            accumulation it stretches over k x more microbatches)."""
            if callable(self.lr_schedule):
                return self.lr_schedule
            if self.lr_schedule is None:
                return lr0
            total = max(steps * self.epochs, 1)
            if self.lr_schedule == 'cosine':
                return optax.cosine_decay_schedule(
                    init_value=lr0, decay_steps=total, alpha=0.0)
            warmup = self.warmup_steps or max(total // 20, 1)
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=lr0, warmup_steps=warmup,
                decay_steps=total, end_value=0.0)

        # kept for introspection/tests (what each optimizer actually uses)
        self._gen_lr = _sched(genlr)
        self._disc_lr = _sched(dislr)

        def _tx(lr_or_sched):
            # flatten: one fused update over the concatenated params
            # instead of a 20-50 us op per leaf (see supervised.py)
            # b1=0.5 like the reference (cgan.py:277-278); eps=1e-7 is the
            # Keras Adam default (optax defaults to 1e-8).
            tx = optax.flatten(optax.adam(lr_or_sched, b1=0.5, eps=1e-7))
            if self.gradient_accumulation_steps > 1:
                tx = optax.MultiSteps(
                    tx, every_k_schedule=self.gradient_accumulation_steps)
            return tx

        gen_state = GenTrainState.create(
            apply_fn=self.generator.module.apply,
            params=self.gen_vars['params'], tx=_tx(self._gen_lr),
            ema_params=(jax.tree.map(jnp.array, self.gen_vars['params'])
                        if self.ema_decay > 0 else None))
        disc_state = train_state.TrainState.create(
            apply_fn=self.discriminator.module.apply,
            params=self.disc_vars['params'], tx=_tx(self._disc_lr))
        if self.resume_from_checkpoint is not None:
            gen_state, disc_state = self._restore_gan_checkpoint(
                gen_state, disc_state, self.resume_from_checkpoint)
            if self.verbose:
                print(f'Resumed G/D from {self.resume_from_checkpoint}')
        gen_state = jax.device_put(gen_state, self.replicated_sharding)
        disc_state = jax.device_put(disc_state, self.replicated_sharding)
        self._make_step()

        key = jax.random.PRNGKey(self.seed)

        from jax.sharding import NamedSharding, PartitionSpec as P
        idx_mat_sharding = NamedSharding(self.mesh, P(None, 'data'))
        for epoch in range(self.epochs):
            if self.verbose and self.running_on_first_worker:
                print(f'\nEpoch {epoch + 1}/{self.epochs}')
            key, ekey, skey = jax.random.split(key, 3)
            if self.data_in_hbm:
                idx_epoch = jax.device_put(
                    jnp.asarray(np.asarray(self.ds_train.epoch_indices(
                        ekey, steps=steps)), jnp.int32), idx_mat_sharding)
                if jax.default_backend() == 'cpu':
                    # XLA:CPU lowers scan-of-steps far slower than the
                    # per-step program (see CLAUDE.md) — dispatch per step
                    for i in range(steps):
                        key, sk = jax.random.split(key)
                        gen_state, disc_state, last = self._train_step(
                            gen_state, disc_state, idx_epoch[i], sk)
                    last = jax.device_get(jnp.stack(last))
                else:
                    gen_state, disc_state, losses = self._train_many(
                        gen_state, disc_state, idx_epoch, skey)
                    last = jax.device_get(losses[-1])
            else:
                for batch in self.ds_train.epochs(n_epochs=1, steps=steps):
                    key, bkey = jax.random.split(key)
                    batch = {k: (jax.device_put(v, self.batch_sharding)
                                 if v is not None else None)
                             for k, v in batch.items()}
                    gen_state, disc_state, last = self._train_step_batch(
                        gen_state, disc_state, batch, bkey)
                last = [float(v) for v in jax.device_get(last)]
            # last step's losses, matching the reference's per-epoch record
            # (cgan.py:365-368 records the final step of the epoch)
            g_total, g_gan, g_px, d_loss = [float(v) for v in last]
            self.gentotal.append(g_total)
            self.gengan.append(g_gan)
            self.gen_pxloss.append(g_px)
            self.disc.append(d_loss)
            if self.terminate_on_nan and not (np.isfinite(g_total)
                                              and np.isfinite(d_loss)):
                import warnings
                warnings.warn(
                    f'Non-finite G/D loss at epoch {epoch + 1} '
                    f'(gen={g_total}, disc={d_loss}); terminating training',
                    RuntimeWarning)
                break
            if self.save_logs:
                self.log_scalars(epoch, gen_total_loss=g_total,
                                 gen_gan_loss=g_gan, gen_px_loss=g_px,
                                 disc_loss=d_loss)
            if self.verbose and self.running_on_first_worker:
                print(f'  gen_total_loss: {g_total:.5f}  gen_crosentr_loss: '
                      f'{g_gan:.5f}  gen_px_loss: {g_px:.5f}  disc_loss: '
                      f'{d_loss:.5f}')

            if (self.checkpoints_frequency > 0
                    and self.running_on_first_worker
                    and (epoch + 1) % self.checkpoints_frequency == 0):
                self._save_gan_checkpoint(gen_state, disc_state,
                                          f'epoch-{epoch + 1}')

        if self.checkpoints_frequency > 0 and self.running_on_first_worker:
            self._save_gan_checkpoint(gen_state, disc_state, 'final')

        if self.save_loss_history and self.running_on_first_worker:
            os.makedirs(self.save_path, exist_ok=True)
            np.save(self.save_path + 'losses.npy',
                    np.array((self.gentotal, self.gengan, self.gen_pxloss,
                              self.disc)))

        self.timing.checktime()

        self.gen_state = gen_state
        self.disc_state = disc_state
        # with EMA on, the served generator is the averaged one
        self.variables = {'params': (gen_state.ema_params
                                     if self.ema_decay > 0
                                     else gen_state.params)}
        self.model = self.generator  # so Predictor can resolve it

        # test loss with the final generator (reference: cgan.py:390-440)
        if self.running_on_first_worker:
            ds_test = BatchSynthesizer(
                self.data_test, self.data_test_lr, upsampling=self.upsampling,
                scale=self.scale, batch_size=1, patch_size=self.patch_size,
                time_window=self.time_window, static_vars=self.static_vars,
                predictors=self.predictors_test,
                interpolation=self.interpolation)
            n_test = ds_test.n
            if n_test < 1:
                raise ValueError(
                    f'data_test yields no evaluable sample (n_test='
                    f'{n_test}; len(data_test)={len(self.data_test)}, '
                    f'time_window={self.time_window})')
            # The reference materializes the WHOLE test set as one batch
            # (cgan.py:419, batch_size=n_test) — OOM-by-design for large
            # test splits. Evaluate in fixed-size chunks instead: constant
            # memory, and bit-identical to the single-batch result for
            # full-grid eval (patch_size=None synthesis is deterministic).
            eval_bs = min(self.batch_size, n_test)
            apply = jax.jit(lambda v, xb, ab: self.generator.module.apply(
                v, xb, ab, training=False))
            key0 = jax.random.PRNGKey(0)
            loss_sum = 0.0
            for i in range(0, n_test, eval_bs):
                idx = jnp.arange(i, min(i + eval_bs, n_test),
                                 dtype=jnp.int32)
                batch = ds_test(idx, jax.random.fold_in(key0, i))
                y_pred = apply(self.variables, batch['lr'],
                               batch['aux'])
                loss_sum += float(self.lossf(batch['hr'], y_pred)) * len(idx)
            self.test_loss = loss_sum / n_test
            if self.verbose:
                print(f'\n{self.loss} on the test set: {self.test_loss}')

        self.timing.runtime()
        self.save_results(self.variables, folder_prefix='cgan_')
        return self

    # ------------------------------------------------------------------
    def _save_gan_checkpoint(self, gen_state, disc_state, name):
        path = os.path.abspath(
            os.path.join(self.savecheckpoint_path, 'checkpoints', name))
        payload = {
            'generator': jax.device_get(gen_state.params),
            'discriminator': jax.device_get(disc_state.params),
            'generator_opt': jax.device_get(gen_state.opt_state),
            'discriminator_opt': jax.device_get(disc_state.opt_state),
            'step': int(gen_state.step),
        }
        if getattr(gen_state, 'ema_params', None) is not None:
            payload['generator_ema'] = jax.device_get(gen_state.ema_params)
        self._checkpoint_save(path, payload)


    def _restore_gan_checkpoint(self, gen_state, disc_state, path):
        import orbax.checkpoint as ocp
        template = {'generator': gen_state.params,
                    'discriminator': disc_state.params,
                    'generator_opt': gen_state.opt_state,
                    'discriminator_opt': disc_state.opt_state,
                    'step': 0}
        has_ema = getattr(gen_state, 'ema_params', None) is not None
        if has_ema:
            template['generator_ema'] = gen_state.ema_params
        payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(path),
                                                   item=template)
        gen_state = gen_state.replace(params=payload['generator'],
                                      opt_state=payload['generator_opt'],
                                      step=payload['step'])
        if has_ema:
            gen_state = gen_state.replace(
                ema_params=payload['generator_ema'])
        disc_state = disc_state.replace(
            params=payload['discriminator'],
            opt_state=payload['discriminator_opt'], step=payload['step'])
        return gen_state, disc_state


def load_checkpoint(checkpoint_dir, checkpoint_number, backbone, upsampling,
                    scale, input_height_width, n_static_vars=0,
                    n_predictors=0, time_window=None, n_blocks=(20, 4),
                    n_filters=(8, 32), attention=False, localcon_layer=False):
    """Rebuild G + D architectures from hyperparameters and restore a saved
    CGAN checkpoint (reference: cgan.py:447-522). `checkpoint_number` selects
    'epoch-N' (or 'final' when None/-1)."""
    spatiotemporal = time_window is not None and time_window > 1
    # mirror base.channel_counts: spatial samples concatenate statics into
    # the LR input AND the aux branch; spatio-temporal keep statics
    # aux-only
    n_channels = 1 + n_predictors + (0 if spatiotemporal else n_static_vars)
    n_aux_channels = n_static_vars

    h, w = input_height_width
    generator = build_model(
        backbone=backbone, upsampling=upsampling, scale=scale,
        n_channels=n_channels, n_aux_channels=n_aux_channels,
        lr_size=(h, w), hr_size=(h, w),
        time_window=time_window if spatiotemporal else None,
        n_filters=n_filters[0], n_blocks=n_blocks[0], n_channels_out=1,
        attention=attention, localcon_layer=localcon_layer)
    discriminator = residual_discriminator(
        n_channels=n_channels, upsampling=upsampling,
        is_spatiotemporal=spatiotemporal, scale=scale, lr_size=(h, w),
        n_filters=n_filters[1], n_res_blocks=n_blocks[1],
        attention=attention, time_window=time_window)

    name = ('final' if checkpoint_number in (None, -1)
            else f'epoch-{checkpoint_number}')
    path = os.path.abspath(os.path.join(checkpoint_dir, 'checkpoints', name))
    import orbax.checkpoint as ocp
    payload = ocp.PyTreeCheckpointer().restore(path)
    return (generator, payload['generator'], discriminator,
            payload['discriminator'])
