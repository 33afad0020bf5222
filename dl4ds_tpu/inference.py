"""
Inference on unseen HR or LR data.

Counterpart of the reference Predictor/predict (dl4ds/inference.py:12-255):
resolves the trained model, infers the upsampling mode from the model-name
suffix, builds one whole-dataset batch with the host tier, and runs batched
jitted forward passes on device. Fully-convolutional models accept arbitrary
grid sizes (JAX compiles per shape; the compiled executable is cached).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from .utils import Timing, checkarray_ndim, spatiotemporal_to_spatial_samples
from .interpolation import resize_array
from .dataloader import BatchSynthesizer, _values

__all__ = ['Predictor', 'predict', 'predict_mc']


class Predictor:
    """Downscale unseen data with a trained network (see `predict`).

    Reference-parity quirk kept on purpose: `Predictor` defaults
    `array_in_hr=False` while `predict` defaults `array_in_hr=True` —
    exactly like the reference (dl4ds/inference.py:23 vs :113). Pass it
    explicitly when switching between the two entry points."""

    def __init__(self, trainer, array, scale, array_in_hr=False,
                 static_vars=None, predictors=None, time_window=None,
                 time_metadata=None, interpolation='inter_area',
                 batch_size=64, scaler=None, save_path=None,
                 save_fname='y_hat.npy', return_lr=False, device='TPU',
                 mesh=None, pad_to_multiple=None, tile=None, halo=32,
                 spatial_mesh=None, quantize=None, calibration_quantile=None,
                 calibration=None, calibration_aux=None):
        self.trainer = trainer
        self.array = array
        self.scale = scale
        self.array_in_hr = array_in_hr
        self.static_vars = static_vars
        self.predictors = predictors
        self.time_window = time_window
        self.time_metadata = time_metadata
        self.interpolation = interpolation
        self.batch_size = batch_size
        self.scaler = scaler
        self.save_path = save_path
        self.save_fname = save_fname
        self.return_lr = return_lr
        self.device = device
        self.mesh = mesh
        self.pad_to_multiple = pad_to_multiple
        self.tile = tile
        self.halo = halo
        self.spatial_mesh = spatial_mesh
        self.quantize = quantize
        self.calibration_quantile = calibration_quantile
        self.calibration = calibration
        self.calibration_aux = calibration_aux

    def run(self):
        return predict(
            trainer=self.trainer, array=self.array, scale=self.scale,
            array_in_hr=self.array_in_hr, static_vars=self.static_vars,
            predictors=self.predictors, time_window=self.time_window,
            time_metadata=self.time_metadata,
            interpolation=self.interpolation, batch_size=self.batch_size,
            scaler=self.scaler, save_path=self.save_path,
            save_fname=self.save_fname, return_lr=self.return_lr,
            device=self.device, mesh=self.mesh,
            pad_to_multiple=self.pad_to_multiple, tile=self.tile,
            halo=self.halo, spatial_mesh=self.spatial_mesh,
            quantize=self.quantize,
            calibration_quantile=self.calibration_quantile,
            calibration=self.calibration,
            calibration_aux=self.calibration_aux)


def _resolve_model(trainer):
    """Model + variables from a trainer, a (model, variables) pair, or a
    DSModel carrying .variables (reference: inference.py:165-170)."""
    if isinstance(trainer, (tuple, list)) and len(trainer) == 2:
        return trainer[0], trainer[1]
    if hasattr(trainer, 'generator') and hasattr(trainer, 'gen_state'):
        return trainer.generator, {'params': trainer.gen_state.params}
    if hasattr(trainer, 'model') and hasattr(trainer, 'variables'):
        return trainer.model, trainer.variables
    if hasattr(trainer, 'module') and hasattr(trainer, 'variables'):
        return trainer, trainer.variables
    raise TypeError('Cannot resolve a model from `trainer`')



def _assemble_inputs(model, array, scale, array_in_hr, static_vars,
                     predictors, time_window, interpolation,
                     time_metadata=None):
    """Whole-dataset (lr, aux) device batch for inference — shared by
    `predict` and `predict_mc`. With `time_metadata` (datetime-like [N], or
    the string 'auto' to read the xr.DataArray time coord), per-sample
    one-hot season channels are appended exactly as during training
    (reference: dl4ds/inference.py:218 -> dataloader.py:327-343). Only do
    this for season-conditioned models — it widens the input by 4 channels.
    """
    from .dataloader import _time_coord, season_ids_from_time
    if isinstance(time_metadata, str):
        if time_metadata != 'auto':
            raise ValueError(f'unknown time_metadata={time_metadata!r}; '
                             f"pass datetimes or 'auto'")
        time_metadata = _time_coord(array)
        if time_metadata is None:
            raise ValueError("time_metadata='auto' requires `array` to be "
                             "an xr.DataArray with a time coordinate")
    array = np.asarray(_values(array), 'float32')
    if static_vars is not None:
        static_vars = [np.asarray(_values(s)) for s in static_vars]
    n_samples = array.shape[0]
    if time_window is not None:
        n_samples -= time_window - 1
    if n_samples <= 0:
        raise ValueError(
            f'`array` yields no samples (shape {array.shape}, '
            f'time_window={time_window})')
    if predictors is not None:
        predictors = np.concatenate(
            [np.asarray(_values(p)) for p in predictors], axis=-1)
    if array_in_hr:
        array_hr, array_lr = array, None
    else:
        array = checkarray_ndim(array, 4, -1)
        hr_xy = (array.shape[2] * scale, array.shape[1] * scale)
        array_hr = resize_array(array, hr_xy, interpolation, squeezed=False)
        array_lr = array
    # whole-dataset batch via the device tier (one jitted synthesis instead
    # of the reference's per-sample host loop, inference.py:205-218); the
    # device and host tiers are equivalence-tested in tests/test_dataloader.
    season_ids = None
    if time_metadata is not None:
        season_ids = season_ids_from_time(time_metadata, time_window)
        if season_ids.shape[0] < n_samples:
            raise ValueError(
                f'`time_metadata` yields {season_ids.shape[0]} samples, '
                f'need {n_samples}')
        season_ids = season_ids[:n_samples]
    upsampling = model.name.split('_')[-1]
    synth = BatchSynthesizer(
        checkarray_ndim(np.asarray(array_hr, 'float32'), 4, -1), array_lr,
        upsampling=upsampling, scale=scale, batch_size=n_samples,
        patch_size=None, time_window=time_window, static_vars=static_vars,
        predictors=[predictors] if predictors is not None else None,
        interpolation=interpolation, season_ids=season_ids)
    batch = synth(jnp.arange(n_samples, dtype=jnp.int32),
                  jax.random.PRNGKey(0))
    return batch['lr'], batch['aux'], n_samples


def _pad_spatial_to_multiple(x, aux, multiple):
    """Edge-pad the input's spatial dims up to the next `multiple` so grids
    of many sizes share one compiled bucket shape. Returns (x, aux, out_hw):
    crop the model output back to `out_hw` (times the model's upsampling
    factor) afterwards."""
    h, w = x.shape[-3], x.shape[-2]
    out_h, out_w = h, w
    ph, pw = (-h) % multiple, (-w) % multiple
    if ph or pw:
        pad = [(0, 0)] * x.ndim
        pad[-3], pad[-2] = (0, ph), (0, pw)
        x = jnp.pad(x, pad, mode='edge')
        if aux is not None:
            # aux lives on the HR grid: pad by the upsampling factor
            fa_h = aux.shape[-3] // h
            fa_w = aux.shape[-2] // w
            pada = [(0, 0)] * aux.ndim
            pada[-3], pada[-2] = (0, ph * fa_h), (0, pw * fa_w)
            aux = jnp.pad(aux, pada, mode='edge')
    return x, aux, (out_h, out_w)


def predict(trainer, array, scale, array_in_hr=True, static_vars=None,
            predictors=None, time_window=None, time_metadata=None,
            interpolation='inter_area', batch_size=64, scaler=None,
            save_path=None, save_fname='y_hat.npy', return_lr=False,
            device='TPU', mesh=None, pad_to_multiple=None, tile=None,
            halo=32, spatial_mesh=None, quantize=None,
            calibration_quantile=None, calibration=None,
            calibration_aux=None):
    """Super-resolve/downscale `array` with a trained model
    (reference: dl4ds/inference.py:109-255). With `mesh`, samples are
    processed in global batches of `batch_size * mesh.size` sharded over the
    mesh's 'data' axis (multi-chip inference).

    Compile-cache note: JAX compiles one executable per input shape; the
    executable is cached, so repeated calls on the same grid size are fast,
    but every NEW grid size pays a compile. For workloads mixing many grid
    sizes, set `pad_to_multiple` (e.g. 32): inputs are edge-padded up to the
    next multiple and the output is cropped back, so all sizes in the same
    bucket share one compiled program. Caveats: fully-convolutional models
    only (not `localcon_layer`); values within a receptive field of the
    padded (right/bottom) border differ slightly from an unpadded run; and
    the DEFAULT output head has GLOBAL channel attention, whose pooled gate
    sees the padded pixels — build with `output_attention=False` if you need
    interior-exact bucketed inference (or use `parallel.predict_tiled`).

    Large grids: `tile=T` routes through `parallel.predict_tiled` —
    inference in halo-overlapped TxT windows (`halo` rows/cols of context,
    >= the network's receptive-field radius for exactness; windows are
    sharded over `mesh` when given). `spatial_mesh=Mesh` instead shards a
    SINGLE grid's height axis across devices with `lax.ppermute` halo
    exchange (`parallel.predict_spatial_sharded`) — for grids whose
    activations exceed one chip's HBM. Both are bit-exact vs untiled
    inference for attention-free models (`attention=False,
    output_attention=False`); spatial models only.

    Int8 serving: `quantize='int8'` (or 'weight-only') runs the forward
    through `quantization.quantize_forward` — every conv executes
    s8 x s8 -> s32 on the MXU. Works on the plain batched path and on
    the TILED path (`tile=`, with or without `mesh=`) — tiling
    dispatches fixed-shape windows, exactly what the shape-pinned
    replay wants; there the calibration is derived from the first
    dispatch batch of real windows (explicit `calibration=` is
    rejected — it cannot be window-shaped by the caller). Not
    combinable with `spatial_mesh` or plain `mesh=` batch sharding.
    On the plain path, activation ranges are calibrated on
    `calibration` when given — a MODEL-READY input batch (the tensor the
    model consumes: scaled LR values with any static/predictor/season
    channels already stacked, e.g. assembled training inputs or the `x`
    of a prior full-precision predict), with `calibration_aux` for
    models taking an HR-aux branch. Default (calibration=None) falls
    back to the first `batch_size` samples of THIS input — fine for
    representative inputs, mis-scaled if the first batch is skewed.
    Only the first `batch_size` calibration samples are used (the
    quantized program is pinned to the serving batch shape); fewer are
    cycled up to `batch_size`. `calibration_quantile` selects
    quantile-clipped instead of absmax ranges either way."""
    timing = Timing()
    if quantize is not None and spatial_mesh is not None:
        raise ValueError('quantize= does not combine with spatial_mesh '
                         '(one grid sharded over its height); use tile= '
                         'for quantized large-grid inference')
    if quantize is not None and mesh is not None and tile is None:
        raise ValueError('quantize= on the plain batched path does not '
                         'combine with mesh=; pass tile= as well '
                         '(quantized window dispatches shard over the '
                         'mesh) or drop mesh=')
    if quantize is not None and tile is not None and (
            calibration is not None or calibration_aux is not None):
        raise ValueError('tiled quantized inference calibrates on the '
                         'first dispatch batch of real windows; explicit '
                         '`calibration` is not supported with tile=')
    if quantize is None and (calibration is not None
                             or calibration_aux is not None):
        raise ValueError('`calibration`/`calibration_aux` only apply to '
                         'quantized inference; pass quantize= as well')
    if spatial_mesh is not None and mesh is not None:
        raise ValueError('pass either spatial_mesh (one grid sharded over '
                         'its height) or mesh (samples sharded over the '
                         'batch), not both')

    model, variables = _resolve_model(trainer)
    is_spatiotemporal = len(model.input_shape) == 4
    if is_spatiotemporal and time_window is None:
        raise ValueError(
            '`time_window` must be provided for spatiotemporal model')

    x, aux, n_samples = _assemble_inputs(
        model, array, scale, array_in_hr, static_vars, predictors,
        time_window, interpolation, time_metadata)
    batch_lr = x

    if tile is not None or spatial_mesh is not None:
        if x.ndim == 5 and spatial_mesh is not None:
            raise ValueError('spatially-sharded inference supports spatial '
                             'models only (4-D inputs); use tile= for '
                             'spatio-temporal grids')
        if pad_to_multiple is not None:
            raise ValueError('`pad_to_multiple` is redundant with tiled/'
                             'sharded inference (one window shape already '
                             'means one compiled program)')
        from . import parallel
        if tile is not None:
            out = parallel.predict_tiled(
                model, variables, x, aux=aux, tile=tile, halo=halo,
                batch_size=batch_size, mesh=mesh, quantize=quantize,
                calibration_quantile=calibration_quantile)
        else:
            if aux is not None:
                raise ValueError('spatial_mesh does not support aux inputs '
                                 'yet; use tile= for tiled inference')
            out = parallel.predict_spatial_sharded(model, variables, x,
                                                   spatial_mesh, halo=halo)
        return _finalize_predict(out, batch_lr, time_window, scaler,
                                 save_path, save_fname, return_lr, timing)

    out_hw = None
    if pad_to_multiple is not None:
        x, aux, out_hw = _pad_spatial_to_multiple(x, aux, pad_to_multiple)

    if quantize is not None:
        from .quantization import quantize_forward
        n = x.shape[0]
        bs = min(batch_size, n)

        def _pin_batch(c, like, nm):
            """First `bs` samples (cycled if fewer) — the quantized
            program replays at the serving batch shape."""
            c = jnp.asarray(c, jnp.float32)
            if c.ndim != like.ndim or c.shape[1:] != like.shape[1:]:
                raise ValueError(
                    f'`{nm}` must be a model-ready batch matching the '
                    f'assembled input layout {("N",) + like.shape[1:]}; '
                    f'got {c.shape}')
            return c[jnp.arange(bs) % c.shape[0]]

        if calibration is not None:
            calib = _pin_batch(calibration, x, 'calibration')
            if aux is not None:
                if calibration_aux is None:
                    raise ValueError('this model takes an HR-aux input; '
                                     'pass `calibration_aux` alongside '
                                     '`calibration`')
                caux = _pin_batch(calibration_aux, aux, 'calibration_aux')
            else:
                caux = None
        else:
            calib = x[:bs]      # bs = min(batch_size, n) <= n by design
            caux = aux[:bs] if aux is not None else None
        qf = quantize_forward(
            model, variables, calib, calibration_aux=caux,
            mode=quantize, calibration_quantile=calibration_quantile)
        # the trained weights are jaxpr constants inside qf — jit only
        # (xb, ab) so dispatches skip flattening the variables pytree
        apply_q = jax.jit(lambda xb, ab: qf(xb, ab)
                          if ab is not None else qf(xb))
        out = _batched_apply(lambda v, xb, ab: apply_q(xb, ab),
                             variables, x, aux, bs)
        out = _crop_padded(out, x, out_hw)
        return _finalize_predict(out, batch_lr, time_window, scaler,
                                 save_path, save_fname, return_lr, timing)

    if device is not None and str(device).upper() == 'CPU' \
            and jax.default_backend() != 'cpu':
        # reference parity: predict under the CPU device
        # (dl4ds/inference.py:237 tf.device('cpu:0'))
        cpu = jax.devices('cpu')[0]
        with jax.default_device(cpu):
            apply = jax.jit(lambda v, xb, ab: model.module.apply(
                v, xb, ab, training=False))
            out = _batched_apply(apply, jax.device_put(variables, cpu),
                                 x, aux, batch_size)
        out = _crop_padded(out, x, out_hw)
        return _finalize_predict(out, batch_lr, time_window, scaler,
                                 save_path, save_fname, return_lr, timing)

    apply = _cached_jit_apply(model)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P('data'))
        n = x.shape[0]
        gbs = min(batch_size * mesh.size, -(-n // mesh.size) * mesh.size)

        def apply_sharded(v, xb, ab):
            xb = jax.device_put(xb, sharding)
            if ab is not None:
                ab = jax.device_put(ab, sharding)
            return apply(v, xb, ab)

        out = _batched_apply(apply_sharded, variables, x, aux, gbs,
                             pad_multiple=mesh.size)
    else:
        out = _batched_apply(apply, variables, x, aux, batch_size)

    out = _crop_padded(out, x, out_hw)
    return _finalize_predict(out, batch_lr, time_window, scaler, save_path,
                             save_fname, return_lr, timing)


def _finalize_predict(out, batch_lr, time_window, scaler, save_path,
                      save_fname, return_lr, timing):
    """Shared predict() tail: 5D->4D collapse, inverse scaling, .npy save
    (reference: dl4ds/inference.py:241-255)."""
    if out.ndim == 5 and time_window is not None:
        out = spatiotemporal_to_spatial_samples(out, time_window)
    if scaler is not None:
        out = scaler.inverse_transform(out)
    if save_path is not None and save_fname is not None:
        np.save(os.path.join(save_path, save_fname), out.astype('float32'))

    timing.runtime()
    if return_lr:
        return out, np.asarray(batch_lr)
    return out


def _memoized_jit(model, attr, make_fn):
    """A jitted forward memoized ON the model wrapper under `attr` — repeat
    calls reuse the same jit object, so XLA's executable cache hits across
    calls (and `pad_to_multiple` buckets make distinct grid sizes hit the
    same cached shape). Frozen wrappers skip memoization gracefully."""
    fn = getattr(model, attr, None)
    if fn is None:
        fn = jax.jit(make_fn())
        try:
            setattr(model, attr, fn)
        except Exception:  # noqa: BLE001 — frozen wrappers: skip memoization
            pass
    return fn


def _crop_padded(out, x, out_hw):
    """Undo `_pad_spatial_to_multiple`: crop the output back to the
    unpadded grid, scaled by the model's output/input spatial ratio."""
    if out_hw is None:
        return out
    f_h = out.shape[-3] // x.shape[-3]
    f_w = out.shape[-2] // x.shape[-2]
    return out[..., :out_hw[0] * f_h, :out_hw[1] * f_w, :]


def _cached_jit_apply(model):
    return _memoized_jit(
        model, '_cached_jit_apply',
        lambda: lambda v, xb, ab: model.module.apply(v, xb, ab,
                                                     training=False))


def _batched_apply(apply, variables, x, aux, batch_size, *extra,
                   pad_multiple=1):
    """Run `apply` over fixed-size batches, padding the ragged tail by
    repeating its last sample (trimmed after) so every dispatch has the same
    shape — ONE XLA compile regardless of n_samples % batch_size. The batch
    shape is kept a multiple of `pad_multiple` (mesh.size for sharded
    inference, so every dispatch divides evenly over the 'data' axis)."""
    n = x.shape[0]
    bs = min(batch_size, -(-n // pad_multiple) * pad_multiple)
    outs = []
    for i in range(0, n, bs):
        xb = x[i:i + bs]
        ab = aux[i:i + bs] if aux is not None else None
        nb = xb.shape[0]
        if nb < bs:
            xb = jnp.concatenate([xb, jnp.repeat(xb[-1:], bs - nb, 0)], 0)
            if ab is not None:
                ab = jnp.concatenate([ab, jnp.repeat(ab[-1:], bs - nb, 0)], 0)
        outs.append(np.asarray(apply(variables, xb, ab, *extra))[:nb])
    return np.concatenate(outs, axis=0)


def predict_mc(trainer, array, scale, n_members=20, seed=0,
               return_members=False, **kwargs):
    """Monte-Carlo-dropout ensemble inference: run `predict` n_members times
    with different dropout streams and return (mean, std) over members
    (plus the raw member stack ``[M, N, H, W, C]`` as a third element with
    ``return_members=True`` — input to `metrics.compute_prob_metrics`).

    Only meaningful for models built with an 'mc*' dropout variant
    (mcdrop / mcgaussiandrop / mcspatialdrop — active at inference, matching
    the reference's MC layers, dl4ds/models/blocks.py:659-676); for other
    variants all members are identical.
    """
    model, variables = _resolve_model(trainer)
    key = jax.random.PRNGKey(seed)
    kw = dict(kwargs)
    kw.pop('return_lr', None)
    unknown = set(kw) - {'array_in_hr', 'static_vars', 'predictors',
                         'time_window', 'time_metadata', 'interpolation',
                         'batch_size', 'scaler', 'pad_to_multiple', 'device'}
    if unknown:
        raise TypeError(
            f'predict_mc got unsupported predict option(s): '
            f'{sorted(unknown)} (save_path/mesh/return_lr are predict-only)')
    # assemble ONCE: the inputs are deterministic given the arguments; only
    # the dropout stream varies per member (was: n_members whole-dataset
    # resizes + synthesizer constructions + pads)
    x, aux, _ = _assemble_inputs(
        model, array, scale, kw.get('array_in_hr', True),
        kw.get('static_vars'), kw.get('predictors'), kw.get('time_window'),
        kw.get('interpolation', 'inter_area'), kw.get('time_metadata'))
    out_hw = None
    if kw.get('pad_to_multiple') is not None:
        x, aux, out_hw = _pad_spatial_to_multiple(x, aux,
                                                  kw['pad_to_multiple'])
    # memoized so the n_members loop (and repeated predict_mc calls)
    # compiles each input shape exactly once
    apply = _memoized_jit(
        model, '_cached_jit_apply_rng',
        lambda: lambda v, xb, ab, k: model.module.apply(
            v, xb, ab, training=False, rngs={'dropout': k}))
    members = []
    time_window = kw.get('time_window')
    scaler = kw.get('scaler')
    for _ in range(n_members):
        key, sub = jax.random.split(key)
        out = _batched_apply(apply, variables, x, aux,
                             kw.get('batch_size', 64), sub)
        out = _crop_padded(out, x, out_hw)
        if out.ndim == 5 and time_window is not None:
            out = spatiotemporal_to_spatial_samples(out, time_window)
        if scaler is not None:
            out = scaler.inverse_transform(out)
        members.append(out)
    stack = np.stack(members, axis=0)
    if return_members:
        return stack.mean(axis=0), stack.std(axis=0), stack
    return stack.mean(axis=0), stack.std(axis=0)
