"""
Training-pair synthesis and batch generation.

Two tiers:

1. **Host compat tier** — `create_pair_hr_lr`, `create_batch_hr_lr`,
   `DataGenerator`: behavioural equivalents of the reference's numpy/OpenCV
   pipeline (dl4ds/dataloader.py:11-294 pair factory, :297-360 batch factory,
   :363-505 keras Sequence), built on this framework's OpenCV-parity resize.
   Used for inference batches, parity tests and debugging.

2. **Device tier** — `BatchSynthesizer`: the TPU-native hot path. The whole
   dataset lives in HBM; a batch is synthesized *inside jit* with a gather,
   per-sample `lax.dynamic_slice` random crops (static patch size, traced
   offsets) and matmul-based resizes, vmapped over the batch. It can be fused
   directly into a jitted train step, eliminating the reference's
   host-per-sample bottleneck (SURVEY.md §3.1 "CPU/Python hot path").

Channel layout (parity with the reference):
  lr  = [data_lr | predictors | static_lr... | season_lr]   (spatial samples)
  lr  = [data_lr | predictors]                              (spatio-temporal)
  aux = [static_hr... | season_hr]                          (when present)
"""

import numpy as np
import jax
import jax.numpy as jnp

from . import POSTUPSAMPLING_METHODS
from .interpolation import resize_array, resize2d
from .utils import crop_array, checkarray_ndim, dynamic_crop

__all__ = ['create_pair_hr_lr', 'create_batch_hr_lr', 'DataGenerator',
           'BatchSynthesizer', '_get_season_', '_get_season_array_',
           'season_ids_from_time']


# =============================================================================
# Season encoding (reference: dl4ds/dataloader.py:508-542)
# =============================================================================

_SEASONS = ['winter', 'spring', 'summer', 'autumn']


def _get_season_(time_metadata, time_window=None):
    """Season label from time metadata (pandas/np datetime or xr time)."""
    import pandas as pd
    if time_window is None:
        month_int = int(pd.Timestamp(np.asarray(time_metadata).item()).month)
    else:
        months = pd.DatetimeIndex(np.asarray(time_metadata)).month
        vals, counts = np.unique(np.asarray(months), return_counts=True)
        month_int = int(vals[np.argmax(counts)])
    if month_int in (12, 1, 2):
        return 'winter'
    if month_int in (3, 4, 5):
        return 'spring'
    if month_int in (6, 7, 8):
        return 'summer'
    return 'autumn'


def season_ids_from_time(time_metadata, time_window=None):
    """Precompute [N] int32 season ids (0=winter .. 3=autumn) from time
    metadata (datetime-like array / xr time coord) — the device-tier
    replacement for the reference's per-sample xarray lookups
    (dl4ds/dataloader.py:508-525). With `time_window`, entry i is the modal
    season of window [i, i + time_window) (scipy.stats.mode semantics:
    smallest most-common month), matching `_get_season_`."""
    import pandas as pd
    months = np.asarray(
        pd.DatetimeIndex(np.asarray(_values(time_metadata))).month)
    month_to_sid = np.empty(13, np.int32)
    for sid, mm in enumerate(((12, 1, 2), (3, 4, 5), (6, 7, 8), (9, 10, 11))):
        for m in mm:
            month_to_sid[m] = sid
    if time_window is None:
        return month_to_sid[months]
    n = max(months.shape[0] - time_window + 1, 0)
    out = np.empty(n, np.int32)
    for i in range(n):
        vals, counts = np.unique(months[i:i + time_window],
                                 return_counts=True)
        out[i] = month_to_sid[int(vals[np.argmax(counts)])]
    return out


def _get_season_array_(season, sizey, sizex):
    """One-hot 4-channel [y, x, 4] spatial season encoding."""
    if season not in _SEASONS:
        raise ValueError('``season`` not recognized')
    out = np.zeros((sizey, sizex, 4), dtype='float32')
    out[:, :, _SEASONS.index(season)] = 1.0
    return out


# =============================================================================
# Host compat tier
# =============================================================================

def create_pair_hr_lr(array, array_lr, upsampling, scale, patch_size,
                      static_vars=None, predictors=None, season=None,
                      debug=False, interpolation='inter_area'):
    """Create one (HR, LR[, aux]) sample with the reference's semantics
    (dl4ds/dataloader.py:11-294): random patch crop, HR->LR coarsening (or a
    given LR), pre-upsampling re-interpolation for 'pin', and channel
    stacking of predictors / static vars / season."""
    hr_array = np.asarray(array)
    lr_is_given = array_lr is not None
    lr_array = np.asarray(array_lr) if lr_is_given else None

    is_spatiotemp = hr_array.ndim == 4
    hr_y, hr_x = (hr_array.shape[1:3] if is_spatiotemp
                  else hr_array.shape[0:2])

    # Reference-broken configurations (host-compat tier mirrors the
    # reference byte-for-byte, so it cannot support these): the reference
    # squeezes the [T, H, W, 1] window to rank-3 before cropping, so
    # crop_array crops the (time, y) axes — a crash when T < patch_size
    # and silent time-axis cropping otherwise (dl4ds/dataloader.py:110,
    # :183, :204). The device tiers handle these correctly.
    if is_spatiotemp and patch_size is not None and (
            upsampling == 'pin' or lr_is_given or predictors is not None):
        raise ValueError(
            'spatio-temporal patch cropping with pin / explicit LR / '
            'predictors is a reference-broken configuration in the '
            'host-compat tier (the reference crops the squeezed [t, y, x] '
            'stack as [y, x, c]); use BatchSynthesizer or HostStreamer')

    crop_y = crop_x = None
    patch_size_lr = None
    lr_array_predictors = None

    if upsampling == 'pin':
        if lr_is_given:
            lr_y, lr_x = (lr_array.shape[1:3] if is_spatiotemp
                          else lr_array.shape[0:2])
            if is_spatiotemp:
                lr_array = checkarray_ndim(lr_array, 4, -1)
            lr_resized = resize_array(lr_array, (hr_x, hr_y), interpolation,
                                      squeezed=False)
        else:
            lr_x, lr_y = int(hr_x / scale), int(hr_y / scale)
            lr_resized = resize_array(hr_array, (lr_x, lr_y), interpolation,
                                      squeezed=False)
            lr_resized = resize_array(lr_resized, (hr_x, hr_y), interpolation,
                                      squeezed=False)
        if patch_size is not None:
            hr_array, crop_y, crop_x = crop_array(
                np.squeeze(hr_array), patch_size, yx=None, position=True)
            lr_array = crop_array(np.squeeze(lr_resized), patch_size,
                                  yx=(crop_y, crop_x))
        else:
            lr_array = lr_resized
        hr_array = checkarray_ndim(hr_array, 4 if is_spatiotemp else 3, -1)
        lr_array = checkarray_ndim(lr_array, 4 if is_spatiotemp else 3, -1)

        if predictors is not None:
            predictors = np.asarray(predictors)
            pred_hw = (predictors.shape[1:3] if predictors.ndim == 4
                       else predictors.shape[0:2])
            if pred_hw != (lr_y, lr_x):
                predictors = resize_array(predictors, (lr_x, lr_y),
                                          interpolation)
            predictors = resize_array(predictors, (hr_x, hr_y), interpolation)
            predictors = checkarray_ndim(
                predictors, 4 if is_spatiotemp else 3, -1)
            if patch_size is not None:
                lr_array_predictors, crop_y, crop_x = crop_array(
                    predictors, patch_size, yx=(crop_y, crop_x), position=True)
            else:
                lr_array_predictors = predictors
            lr_array_predictors = checkarray_ndim(
                lr_array_predictors, 4 if is_spatiotemp else 3, -1)
            lr_array = np.concatenate([lr_array, lr_array_predictors], axis=-1)

    elif upsampling in POSTUPSAMPLING_METHODS:
        if patch_size is not None:
            patch_size_lr = int(patch_size / scale)
        if lr_is_given:
            lr_y, lr_x = (lr_array.shape[1:3] if is_spatiotemp
                          else lr_array.shape[0:2])
        else:
            lr_x, lr_y = int(hr_x / scale), int(hr_y / scale)

        if predictors is not None:
            predictors = np.asarray(predictors)
            pred_hw = (predictors.shape[1:3] if predictors.ndim == 4
                       else predictors.shape[0:2])
            if pred_hw != (lr_y, lr_x):
                lr_array_predictors = resize_array(predictors, (lr_x, lr_y),
                                                   interpolation)
            else:
                lr_array_predictors = predictors
            lr_array_predictors = checkarray_ndim(
                lr_array_predictors, 4 if is_spatiotemp else 3, -1)
            if patch_size is not None:
                lr_array_predictors, crop_y, crop_x = crop_array(
                    lr_array_predictors, patch_size_lr, yx=None, position=True)
                crop_y_hr, crop_x_hr = crop_y * scale, crop_x * scale
                hr_array = crop_array(np.squeeze(hr_array), patch_size,
                                      yx=(crop_y_hr, crop_x_hr))
                if lr_is_given:
                    lr_array = crop_array(lr_array, patch_size_lr,
                                          yx=(crop_y, crop_x))
            if not lr_is_given:
                new_xy = ((patch_size_lr, patch_size_lr) if patch_size
                          is not None else (lr_x, lr_y))
                lr_array = resize_array(hr_array, new_xy, interpolation,
                                        squeezed=False)
            hr_array = checkarray_ndim(hr_array, 4 if is_spatiotemp else 3, -1)
            lr_array = checkarray_ndim(lr_array, 4 if is_spatiotemp else 3, -1)
            lr_array_predictors = checkarray_ndim(
                lr_array_predictors, 4 if is_spatiotemp else 3, -1)
            lr_array = np.concatenate([lr_array, lr_array_predictors], axis=-1)
        else:
            if patch_size is not None:
                if lr_is_given:
                    lr_array, crop_y, crop_x = crop_array(
                        lr_array, patch_size_lr, yx=None, position=True)
                    crop_y_hr, crop_x_hr = crop_y * scale, crop_x * scale
                    hr_array = crop_array(np.squeeze(hr_array), patch_size,
                                          yx=(crop_y_hr, crop_x_hr))
                else:
                    hr_array, crop_y, crop_x = crop_array(
                        hr_array, patch_size, yx=None, position=True)
                    lr_array = resize_array(
                        hr_array, (patch_size_lr, patch_size_lr),
                        interpolation)
            else:
                if not lr_is_given:
                    lr_array = resize_array(hr_array, (lr_x, lr_y),
                                            interpolation)
            hr_array = checkarray_ndim(hr_array, 4 if is_spatiotemp else 3, -1)
            lr_array = checkarray_ndim(lr_array, 4 if is_spatiotemp else 3, -1)
    else:
        raise ValueError(f'`upsampling` not recognized: {upsampling}')

    # --- static variables and season channels --------------------------------
    is_postups = upsampling in POSTUPSAMPLING_METHODS
    static_array_hr = []
    if static_vars is not None:
        if (is_postups and patch_size is not None
                and (lr_is_given or predictors is not None)):
            # reference-parity BUG kept for golden equivalence: in these
            # branches crop_y/crop_x are LR-grid origins, but the reference
            # crops the HR statics with them (dl4ds/dataloader.py:54 uses
            # crop_y from the LR crop while crop_y_hr exists) — the static
            # channels are spatially misaligned with the HR patch. The
            # device tiers (BatchSynthesizer/HostStreamer) align correctly.
            import warnings
            warnings.warn(
                'host-compat tier: static_vars patches are cropped at '
                'LR-coordinate origins on the HR grid in this configuration '
                '(reference-parity bug, dl4ds/dataloader.py:54); use '
                'BatchSynthesizer or HostStreamer for aligned statics',
                RuntimeWarning, stacklevel=2)
        for var in static_vars:
            var = np.asarray(var)
            if patch_size is not None:
                var_hr = crop_array(np.squeeze(var), patch_size,
                                    yx=(crop_y, crop_x))
                var_hr = checkarray_ndim(var_hr, 3, -1)
                var_lr = (resize_array(var_hr,
                                       (patch_size_lr, patch_size_lr),
                                       interpolation)
                          if is_postups else var_hr)
            else:
                var_hr = checkarray_ndim(var, 3, -1)
                var_lr = (resize_array(var, (lr_x, lr_y), interpolation)
                          if is_postups else var_hr)
            var_lr = checkarray_ndim(var_lr, 3, -1)
            static_array_hr.append(var_hr)
            if not is_spatiotemp:
                lr_array = np.concatenate([lr_array, var_lr], axis=-1)
        static_array_hr = np.concatenate(static_array_hr, axis=-1)

    season_array_lr = None
    if season is not None:
        if patch_size is not None:
            hr_sz = (patch_size, patch_size)
            lr_sz = ((patch_size_lr, patch_size_lr) if is_postups
                     else (patch_size, patch_size))
        else:
            hr_sz = (hr_y, hr_x)
            lr_sz = (lr_y, lr_x) if is_postups else (hr_y, hr_x)
        season_array_hr = _get_season_array_(season, *hr_sz)
        season_array_lr = _get_season_array_(season, *lr_sz)
        static_array_hr = (np.concatenate([static_array_hr, season_array_hr],
                                          axis=-1)
                           if static_vars is not None else season_array_hr)
        if not is_spatiotemp:
            lr_array = np.concatenate([lr_array, season_array_lr], axis=-1)

    hr_array = np.asarray(hr_array, 'float32')
    lr_array = np.asarray(lr_array, 'float32')
    if static_vars is not None or season is not None:
        static_array_hr = np.asarray(static_array_hr, 'float32')

    if debug:
        # shape/crop diagnostics + matplotlib panels
        # (reference: dl4ds/dataloader.py:254-289, ecubevis-based)
        if static_vars is not None or season is not None:
            print(f'HR array: {hr_array.shape}, LR array: {lr_array.shape}, '
                  f'Auxiliary array: {static_array_hr.shape}')
        else:
            print(f'HR array: {hr_array.shape}, LR array: {lr_array.shape}')
        if patch_size is not None:
            print(f'Crop X,Y: {crop_x}, {crop_y}')
        try:
            from .utils import plot_ndarray
            panels = [('HR array', np.squeeze(hr_array))]
            lr2d = np.squeeze(lr_array)
            if lr2d.ndim == 3:
                for ci in range(lr2d.shape[-1]):
                    panels.append((f'LR array, variable {ci + 1}',
                                   lr2d[..., ci]))
            else:
                panels.append(('LR array', lr2d))
            imgs = []
            for _, img in panels:
                while img.ndim > 2:
                    img = img[0]
                imgs.append(img)
            plot_ndarray(tuple(imgs), subplot_titles=[t for t, _ in panels],
                         save_fname='dl4ds_pair_debug.png')
        except Exception:  # noqa: BLE001 — plotting is best-effort
            pass

    if static_vars is not None or season is not None:
        return hr_array, lr_array, static_array_hr
    return hr_array, lr_array


def create_batch_hr_lr(all_indices, index, array, array_lr, upsampling,
                       scale=4, batch_size=32, patch_size=None,
                       time_window=None, static_vars=None, predictors=None,
                       interpolation='inter_area', time_metadata=None):
    """Create a batch of HR/LR samples by looping the pair factory over a
    slice of indices (reference: dl4ds/dataloader.py:297-360)."""
    batch_idx = all_indices[index * batch_size:(index + 1) * batch_size]
    batch_hr, batch_lr, batch_aux = [], [], []
    season_i = None
    for i in batch_idx:
        if time_window is None:
            data_i = array[i]
            data_lr_i = None if array_lr is None else array_lr[i]
            pred_i = None if predictors is None else predictors[i]
            season_i = (_get_season_(time_metadata[i], time_window)
                        if time_metadata is not None else None)
        else:
            data_i = array[i:i + time_window]
            data_lr_i = None if array_lr is None else array_lr[i:i + time_window]
            pred_i = None if predictors is None else predictors[i:i + time_window]
            season_i = (_get_season_(time_metadata[i:i + time_window],
                                     time_window)
                        if time_metadata is not None else None)
        res = create_pair_hr_lr(
            array=data_i, array_lr=data_lr_i, upsampling=upsampling,
            scale=scale, patch_size=patch_size, static_vars=static_vars,
            season=season_i, interpolation=interpolation, predictors=pred_i)
        if static_vars is not None or season_i is not None:
            hr_i, lr_i, aux_i = res
            batch_aux.append(aux_i)
        else:
            hr_i, lr_i = res
        batch_hr.append(hr_i)
        batch_lr.append(lr_i)
    batch_lr = np.asarray(batch_lr)
    batch_hr = np.asarray(batch_hr)
    if static_vars is not None or season_i is not None:
        return [batch_lr, np.asarray(batch_aux)], [batch_hr]
    return [batch_lr], [batch_hr]


class DataGenerator:
    """Shuffled epoch iterator over synthesized batches (host tier).

    Same contract as the reference's keras Sequence (dl4ds/dataloader.py:
    363-505): `__len__` = n_samples // batch_size (times `repeat`), and
    `__getitem__(index)` returns ([lr(, aux)], [hr]).
    """

    def __init__(self, array, array_lr, backbone, upsampling, scale,
                 batch_size=32, patch_size=None, time_window=None,
                 static_vars=None, predictors=None,
                 interpolation='inter_area', repeat=None, seed=None,
                 time_metadata=None):
        # season conditioning: explicit `time_metadata` (datetime-like [N]),
        # or the string 'auto' to read `array`'s xr time coordinate (the
        # reference's API promise, dl4ds/dataloader.py:327-343). Opt-in only:
        # season channels widen the model input by 4.
        if isinstance(time_metadata, str):
            if time_metadata != 'auto':
                raise ValueError(f'unknown time_metadata={time_metadata!r}; '
                                 f"pass datetimes or 'auto'")
            time_metadata = _time_coord(array)
            if time_metadata is None:
                raise ValueError("time_metadata='auto' requires `array` to "
                                 "be an xr.DataArray with a time coordinate")
        self.time_metadata = (np.asarray(_values(time_metadata))
                              if time_metadata is not None else None)
        self.array = _values(array)
        self.array_lr = _values(array_lr)
        self.batch_size = batch_size
        self.scale = scale
        self.upsampling = upsampling
        self.backbone = backbone
        self.patch_size = patch_size
        self.time_window = time_window
        self.static_vars = ([_values(s) for s in static_vars]
                            if static_vars is not None else None)
        self.predictors = predictors
        if self.predictors is not None:
            self.predictors = np.concatenate(
                [_values(p) for p in self.predictors], axis=-1)
        self.interpolation = interpolation
        if repeat is not None and not isinstance(repeat, int):
            raise TypeError('`repeat` must be an int (or None)')
        self.repeat = repeat

        if self.time_window is not None:
            self.n = self.array.shape[0] - self.time_window
        else:
            self.n = self.array.shape[0]
        rng = np.random.default_rng(seed)
        self.indices = rng.permutation(np.arange(self.n))
        if self.repeat is not None and isinstance(self.repeat, int):
            self.indices = np.hstack([self.indices] * self.repeat)

        if patch_size is not None and self.upsampling in POSTUPSAMPLING_METHODS:
            if self.patch_size % self.scale != 0:
                raise ValueError('`patch_size` must be divisible by `scale`')

    def __len__(self):
        n_batches = self.n // self.batch_size
        return n_batches * self.repeat if self.repeat else n_batches

    def __getitem__(self, index):
        return create_batch_hr_lr(
            self.indices, index, self.array, self.array_lr,
            upsampling=self.upsampling, scale=self.scale,
            batch_size=self.batch_size, patch_size=self.patch_size,
            time_window=self.time_window, static_vars=self.static_vars,
            predictors=self.predictors, interpolation=self.interpolation,
            time_metadata=self.time_metadata)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def _values(x):
    """Coerce xr.DataArray -> np.ndarray (xarray optional)."""
    if x is None:
        return None
    try:
        import xarray as xr
        if isinstance(x, xr.DataArray):
            return x.values
    except ImportError:
        pass
    return np.asarray(x)


def _time_coord(x):
    """The 'time' coordinate values of an xr.DataArray, else None."""
    try:
        import xarray as xr
        if isinstance(x, xr.DataArray) and 'time' in x.coords:
            return x.time.values
    except ImportError:
        pass
    return None


# =============================================================================
# Device tier — TPU-native batch synthesis
# =============================================================================

class BatchSynthesizer:
    """Device-resident, jit-compiled batch synthesis.

    The full HR dataset (and optional LR / predictors / statics) is placed in
    device memory once. Each call builds a complete training batch on device:

        gather(indices) -> [vmap] random crop (lax.dynamic_slice)
                        -> coarsen / pre-upsample (matmul resize)
                        -> channel stacking

    Randomness comes from a `jax.random` key, so the whole synthesis is a
    pure function that can be *inlined into a jitted train step* and sharded
    over a mesh (batch axis). This replaces the reference's per-sample
    host loop (dl4ds/dataloader.py:321-353 + cv2 resizes) — the documented
    throughput bottleneck.

    Parameters mirror the host tier. `season_ids` is an optional [N] int array
    of season indices (0..3) per time step, replacing the reference's
    xarray-time lookups with a precomputed table.
    """

    def __init__(self, array, array_lr, upsampling, scale, batch_size,
                 patch_size=None, time_window=None, static_vars=None,
                 predictors=None, interpolation='inter_area',
                 season_ids=None, device_put=True):
        array = np.asarray(_values(array), 'float32')
        if array.ndim != 4:
            raise ValueError('`array` must be [n, y, x, c]')
        self.upsampling = upsampling
        self.is_postups = upsampling in POSTUPSAMPLING_METHODS
        self.scale = int(scale)
        self.batch_size = int(batch_size)
        self.patch_size = patch_size
        self.time_window = time_window
        self.interpolation = interpolation
        self.n_total, self.hr_y, self.hr_x, self.n_ch = array.shape
        self.n = (self.n_total - time_window if time_window is not None
                  else self.n_total)

        lr_given = array_lr is not None
        self.lr_given = lr_given
        if lr_given:
            array_lr = np.asarray(_values(array_lr), 'float32')
            self.lr_y, self.lr_x = array_lr.shape[1:3]
        else:
            self.lr_y = int(self.hr_y / scale)
            self.lr_x = int(self.hr_x / scale)

        if patch_size is not None:
            if self.is_postups and patch_size % scale != 0:
                raise ValueError('`patch_size` must be divisible by `scale`')
            if patch_size > min(self.hr_y, self.hr_x):
                raise ValueError(
                    f'patch_size={patch_size} exceeds the HR grid '
                    f'({self.hr_y}x{self.hr_x}) — crops would be silently '
                    f'zero-padded')
            self.patch_lr = int(patch_size / scale)
            if self.patch_lr > min(self.lr_y, self.lr_x):
                raise ValueError(
                    f'LR patch {self.patch_lr} exceeds the LR grid '
                    f'({self.lr_y}x{self.lr_x})')

        # ---- precompute per-dataset device arrays ---------------------------
        # pin: the interpolated-to-HR LR field is crop-independent, so it is
        # computed once for the whole dataset (the reference recomputes it for
        # every sample every epoch, dl4ds/dataloader.py:100-106).
        put = jax.device_put if device_put else (lambda x: jnp.asarray(x))
        self.hr = put(jnp.asarray(array))
        if upsampling == 'pin':
            if lr_given:
                base = jnp.asarray(array_lr)
            else:
                base = resize2d(jnp.asarray(array), (self.lr_y, self.lr_x),
                                interpolation)
            self.lr_pre = put(resize2d(base, (self.hr_y, self.hr_x),
                                       interpolation))
            self.lr = None
        else:
            self.lr = put(jnp.asarray(array_lr)) if lr_given else None
            self.lr_pre = None

        # predictors (concat -> LR grid, then HR for 'pin') + statics
        # ([y, x, S]) via the tier-shared prep; resizes run on device here.
        pred, self.n_pred, statics, self.n_static = _prep_aux_inputs(
            upsampling, (self.lr_y, self.lr_x), (self.hr_y, self.hr_x),
            lambda a, hw: np.asarray(
                resize2d(jnp.asarray(a, jnp.float32), hw, interpolation)),
            predictors, static_vars)
        self.pred = put(jnp.asarray(pred)) if pred is not None else None
        self.static_hr = None
        self.static_lr = None
        if statics is not None:
            s_hr = jnp.asarray(statics)
            self.static_hr = put(s_hr)
            if patch_size is not None:
                # patch path recomputes LR statics from each crop; the
                # full-grid LR resize would be dead weight in HBM
                self.static_lr = None
            elif self.is_postups:
                self.static_lr = put(
                    resize2d(s_hr, (self.lr_y, self.lr_x), interpolation))
            else:
                self.static_lr = self.static_hr

        if season_ids is not None and len(season_ids) < self.n:
            # jnp.take clamps out-of-range indices under jit — a short
            # table would silently reuse the last season
            raise ValueError(
                f'season_ids has {len(season_ids)} entries but the sampler '
                f'draws indices up to {self.n - 1}')
        self.season_ids = (put(jnp.asarray(season_ids, jnp.int32))
                           if season_ids is not None else None)
        self.has_aux = self.n_static > 0 or season_ids is not None
        self._jitted = jax.jit(self._make_batch)

    # ---- shapes ------------------------------------------------------------
    @property
    def hr_sample_hw(self):
        p = self.patch_size
        return (p, p) if p is not None else (self.hr_y, self.hr_x)

    @property
    def lr_sample_hw(self):
        if self.upsampling == 'pin':
            return self.hr_sample_hw
        p = self.patch_size
        return (self.patch_lr, self.patch_lr) if p is not None \
            else (self.lr_y, self.lr_x)

    @property
    def n_channels_lr(self):
        """Total channels of the LR model input."""
        n = self.n_ch + self.n_pred
        if self.time_window is None:
            n += self.n_static + (4 if self.season_ids is not None else 0)
        return n

    @property
    def n_channels_aux(self):
        return self.n_static + (4 if self.season_ids is not None else 0) \
            if self.has_aux else 0

    # ---- synthesis ---------------------------------------------------------
    def __call__(self, indices, key):
        """Synthesize a batch on device. `indices` [B] int32, `key` PRNG key.
        Returns dict(lr=[B, ...], hr=[B, ...], aux=[B, H, W, A] or None)."""
        return self._jitted(indices, key)

    def _gather(self, data, indices):
        """Sample gather; for spatio-temporal samples gathers [tw] windows."""
        if self.time_window is None:
            return jnp.take(data, indices, axis=0)
        win = indices[:, None] + jnp.arange(self.time_window)[None, :]
        return jnp.take(data, win.reshape(-1), axis=0).reshape(
            indices.shape[0], self.time_window, *data.shape[1:])

    # above this many bytes of gathered full-grid images the crop falls
    # back to the slice path rather than materializing [B(,tw),H,W,C]
    _CROP_MATMUL_MAX_BYTES = 256 * 1024 * 1024

    @staticmethod
    def _sel(starts, size, full, dtype):
        """[B, size, full] one-hot row/col selection matrices: row i of
        sample b selects source index starts[b]+i."""
        ar = jnp.arange(size)
        rr = jnp.arange(full)
        return (starts[:, None, None] + ar[None, :, None]
                == rr[None, None, :]).astype(dtype)

    def _gather_crop(self, data, indices, ys, xs, size):
        """Fused gather + crop of [B(,tw), size, size, C] patches.

        Fast path: per-sample one-hot selection matrices contracted on the
        MXU (two einsums). vmap-of-dynamic_slice lowers to a SERIAL XLA
        while loop on TPU — measured 241 us vs 59 us for the einsum form
        at the headline workload (tools/gather_probe.py), which is also
        bit-exact: each output element receives exactly one input under
        Precision.HIGHEST, so selection never rounds. Falls back to the
        slice loop when materializing the gathered full grids would
        exceed _CROP_MATMUL_MAX_BYTES (the einsum path gathers whole
        images first; the loop path never does)."""
        tw = self.time_window or 1
        b = indices.shape[0]
        n, h, w, c = data.shape
        gathered_bytes = b * tw * h * w * c * data.dtype.itemsize
        if gathered_bytes <= self._CROP_MATMUL_MAX_BYTES:
            imgs = self._gather(data, indices)        # [B(,tw),H,W,C]
            if self.time_window is None:
                imgs = imgs[:, None]                  # [B,1,H,W,C]
            hi = jax.lax.Precision.HIGHEST
            ysel = self._sel(ys, size, h, data.dtype)
            xsel = self._sel(xs, size, w, data.dtype)
            rows = jnp.einsum('bph,bthwc->btpwc', ysel, imgs, precision=hi)
            out = jnp.einsum('bqw,btpwc->btpqc', xsel, rows, precision=hi)
        else:
            def one(i, y, x):
                return jax.lax.dynamic_slice(data, (i, y, x, 0),
                                             (tw, size, size, c))

            out = jax.vmap(one)(indices, ys, xs)      # [B, tw, p, p, C]
        return out if self.time_window is not None else out[:, 0]

    def _make_batch(self, indices, key):
        tw = self.time_window
        b = indices.shape[0]

        if self.patch_size is not None:
            p, plr, s = self.patch_size, None, self.scale
            key_y, key_x = jax.random.split(key)
            if self.is_postups:
                plr = self.patch_lr
                max_y, max_x = self.lr_y - plr, self.lr_x - plr
            else:
                max_y, max_x = self.hr_y - p, self.hr_x - p
            # randint high is exclusive; mirrors np.random.randint in the
            # reference (dl4ds/utils.py:303-308)
            ys = jax.random.randint(key_y, (b,), 0, max(max_y, 1))
            xs = jax.random.randint(key_x, (b,), 0, max(max_x, 1))
            if self.is_postups:
                ys_hr, xs_hr = ys * s, xs * s
                ys_lr, xs_lr = ys, xs
            else:
                ys_hr, xs_hr = ys, xs
                ys_lr, xs_lr = ys, xs  # pin: same HR-coord crop

            hr = self._gather_crop(self.hr, indices, ys_hr, xs_hr, p)
            pred = None
            if self.upsampling == 'pin':
                lr = self._gather_crop(self.lr_pre, indices, ys_hr, xs_hr, p)
                if self.pred is not None:
                    pred = self._gather_crop(self.pred, indices, ys_hr,
                                             xs_hr, p)
            else:
                if self.lr is not None:
                    lr = self._gather_crop(self.lr, indices, ys_lr, xs_lr,
                                           plr)
                else:
                    lr = resize2d(hr, (plr, plr), self.interpolation)
                if self.pred is not None:
                    pred = self._gather_crop(self.pred, indices, ys_lr,
                                             xs_lr, plr)
            if self.static_hr is not None:
                # one-hot selection einsums, not vmapped dynamic_crop:
                # the vmap lowers to a serial while loop on TPU (see
                # _gather_crop); bit-exact under Precision.HIGHEST
                hi = jax.lax.Precision.HIGHEST
                sh, sw = self.static_hr.shape[:2]
                ysel = self._sel(ys_hr, p, sh, self.static_hr.dtype)
                xsel = self._sel(xs_hr, p, sw, self.static_hr.dtype)
                static_hr = jnp.einsum('bph,hwc,bqw->bpqc', ysel,
                                       self.static_hr, xsel, precision=hi)
            else:
                static_hr = None
            if static_hr is not None:
                if self.is_postups:
                    static_lr = resize2d(static_hr, (plr, plr),
                                         self.interpolation)
                else:
                    static_lr = static_hr
            else:
                static_lr = None
        else:
            hr = self._gather(self.hr, indices)      # [B(,T),H,W,C]
            pred = (self._gather(self.pred, indices)
                    if self.pred is not None else None)
            if self.upsampling == 'pin':
                lr = self._gather(self.lr_pre, indices)
            else:
                lr = (self._gather(self.lr, indices) if self.lr is not None
                      else resize2d(hr, (self.lr_y, self.lr_x),
                                    self.interpolation))
            static_hr = (jnp.broadcast_to(
                self.static_hr, (b, *self.static_hr.shape))
                if self.static_hr is not None else None)
            static_lr = (jnp.broadcast_to(
                self.static_lr, (b, *self.static_lr.shape))
                if self.static_lr is not None else None)

        # ---- channel stacking ----------------------------------------------
        parts_lr = [lr]
        if pred is not None:
            parts_lr.append(pred)
        aux_parts = []
        if static_hr is not None:
            aux_parts.append(static_hr)
            if tw is None:
                parts_lr.append(static_lr)
        if self.season_ids is not None:
            sid = jnp.take(self.season_ids, indices, axis=0)      # [B]
            onehot = jax.nn.one_hot(sid, 4, dtype=hr.dtype)       # [B,4]
            h_hr, w_hr = (static_hr.shape[1:3] if static_hr is not None
                          else hr.shape[-3:-1])
            h_lr, w_lr = lr.shape[-3:-1]
            season_hr = jnp.broadcast_to(onehot[:, None, None, :],
                                         (b, h_hr, w_hr, 4))
            aux_parts.append(season_hr)
            if tw is None:
                season_lr = jnp.broadcast_to(onehot[:, None, None, :],
                                             (b, h_lr, w_lr, 4))
                parts_lr.append(season_lr)
        lr = jnp.concatenate(parts_lr, axis=-1) if len(parts_lr) > 1 else lr
        aux = (jnp.concatenate(aux_parts, axis=-1) if len(aux_parts) > 1
               else (aux_parts[0] if aux_parts else None))
        return {'lr': lr, 'hr': hr, 'aux': aux}

    def epoch_indices(self, key, steps=None):
        """Shuffled epoch index matrix [steps, batch_size] on host."""
        n_batches = self.n // self.batch_size
        steps = n_batches if steps is None else steps
        perm = jax.random.permutation(key, self.n)
        reps = -(-(steps * self.batch_size) // self.n)
        if reps > 1:
            perm = jnp.concatenate([perm] * reps)
        return perm[:steps * self.batch_size].reshape(steps, self.batch_size)


def _prep_aux_inputs(upsampling, lr_hw, hr_hw, resize, predictors=None,
                     static_vars=None):
    """Shared per-dataset channel prep for BOTH data tiers (device
    `BatchSynthesizer` and host `HostStreamer`): concat predictors and move
    them to the LR grid (then to HR for 'pin'), stack static vars to
    [y, x, S]. `resize(arr, hw)` supplies the tier's resize implementation.
    Returns (pred, n_pred, statics, n_static) as numpy arrays/None."""
    pred, n_pred = None, 0
    if predictors is not None:
        pred = np.concatenate([_values(p) for p in predictors], axis=-1) \
            if isinstance(predictors, (list, tuple)) else \
            np.asarray(_values(predictors), 'float32')
        n_pred = pred.shape[-1]
        if (pred.shape[1], pred.shape[2]) != tuple(lr_hw):
            pred = resize(pred, lr_hw)
        if upsampling == 'pin':
            pred = resize(pred, hr_hw)
        pred = np.ascontiguousarray(pred, 'float32')
    statics, n_static = None, 0
    if static_vars is not None:
        statics = np.stack([np.squeeze(np.asarray(_values(s), 'float32'))
                            for s in static_vars], axis=-1)
        n_static = statics.shape[-1]
    return pred, n_pred, statics, n_static


def _resize_chunked(arr, hw, interpolation, chunk=64):
    """Full-dataset resize computed in device-sized chunks, result on host
    (one-time preprocessing for the streaming tier)."""
    outs = []
    for i in range(0, arr.shape[0], chunk):
        outs.append(np.asarray(resize2d(jnp.asarray(arr[i:i + chunk]), hw,
                                        interpolation)))
    return np.ascontiguousarray(np.concatenate(outs, axis=0))


# sentinel: full-grid statics (identical across a batch) are shipped to the
# device once and broadcast there, not materialized B times on host
_FULL_GRID_STATICS = object()


class HostStreamer:
    """Host->device batch pipeline for datasets larger than device memory.

    The dataset stays in host RAM; each batch's window gather + random patch
    crop runs in the native C++/OpenMP kernels (dl4ds_tpu.native, numpy
    fallback), a background thread keeps `prefetch` batches in flight, and
    the LR coarsening (implicit post-upsampling pairs) happens on device
    after the transfer — so only patches cross PCIe.

    Covers the full feature matrix of `BatchSynthesizer`: implicit or
    explicit pairs, spatial or spatio-temporal samples, 'pin' and
    post-upsampling modes, predictors, static vars and season channels
    (same channel layout; equivalence-tested in tests/test_native.py).
    For 'pin' the pre-upsampled LR field is precomputed once per dataset on
    host (costs one extra dataset-sized host allocation; crop-exact parity
    with the device tier). For datasets that fit in HBM prefer
    `BatchSynthesizer` (no host round-trip at all).

    Disk tier: `array` may be a read-only `np.memmap`
    (`np.load(path, mmap_mode='r')`) — a contiguous-float32 mapping is
    kept as a VIEW (no RAM copy), the native gather reads through the
    mapping's pages, and only patches ever materialize: datasets larger
    than host RAM stream straight from disk (implicit post-ups pairs;
    'pin' needs the dataset-sized `lr_pre` precompute).
    """

    def __init__(self, array, upsampling, scale, batch_size, patch_size=None,
                 time_window=None, interpolation='inter_area', prefetch=2,
                 seed=0, array_lr=None, static_vars=None, predictors=None,
                 season_ids=None):
        self.array = np.ascontiguousarray(_values(array), 'float32')
        if self.array.ndim != 4:
            raise ValueError('`array` must be [n, y, x, c]')
        self.array_lr = (np.ascontiguousarray(_values(array_lr), 'float32')
                         if array_lr is not None else None)
        self.upsampling = upsampling
        self.is_postups = upsampling in POSTUPSAMPLING_METHODS
        self.scale = int(scale)
        self.batch_size = int(batch_size)
        self.patch_size = patch_size
        self.time_window = time_window
        self.interpolation = interpolation
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        n_total, self.hr_y, self.hr_x, _ = self.array.shape
        self.n = n_total - time_window if time_window is not None else n_total
        if patch_size is not None and self.is_postups \
                and patch_size % scale != 0:
            raise ValueError('`patch_size` must be divisible by `scale`')
        if patch_size is not None and patch_size > min(self.hr_y, self.hr_x):
            raise ValueError(
                f'patch_size={patch_size} exceeds the HR grid '
                f'({self.hr_y}x{self.hr_x}) — the native gather would read '
                f'out of bounds')
        if self.array_lr is not None:
            self.lr_y, self.lr_x = self.array_lr.shape[1:3]
        else:
            self.lr_y = self.hr_y // self.scale
            self.lr_x = self.hr_x // self.scale

        # --- one-time host-side preprocessing (mirrors BatchSynthesizer) ---
        # pin: precompute the pre-upsampled LR field for the WHOLE dataset so
        # patches crop from the full-grid interpolation exactly like the
        # device tier (coarsening a crop != cropping a coarsened field).
        self.lr_pre = None
        if upsampling == 'pin':
            base = (self.array_lr if self.array_lr is not None
                    else _resize_chunked(self.array, (self.lr_y, self.lr_x),
                                         interpolation))
            self.lr_pre = _resize_chunked(base, (self.hr_y, self.hr_x),
                                          interpolation)

        self.pred, self.n_pred, self.static_hr, self.n_static = \
            _prep_aux_inputs(
                upsampling, (self.lr_y, self.lr_x), (self.hr_y, self.hr_x),
                lambda a, hw: _resize_chunked(a, hw, interpolation),
                predictors, static_vars)

        self.season_ids = (np.asarray(season_ids, np.int32)
                           if season_ids is not None else None)
        if self.season_ids is not None and len(self.season_ids) < self.n:
            raise ValueError(
                f'season_ids has {len(self.season_ids)} entries but the '
                f'sampler draws indices up to {self.n - 1}')
        self.has_aux = self.n_static > 0 or self.season_ids is not None
        self._static_hr_dev = None  # device copy for full-grid batches
        self._static_lr_dev = None  # its LR resize, computed once
        # optional NamedSharding for the emitted batches: the trainer sets
        # this so each host batch transfers ONCE with the right placement
        # instead of default-device put + a second resharding copy
        self.sharding = None

    def _host_batch(self, idx):
        from . import native
        p = self.patch_size
        tw = self.time_window or 1
        b = idx.shape[0]
        lr = pred = None
        if p is not None:
            plr = p // self.scale
            if self.is_postups:
                # draw crops in LR coords (device-tier semantics)
                ys = self.rng.integers(0, max(self.lr_y - plr, 1), size=b)
                xs = self.rng.integers(0, max(self.lr_x - plr, 1), size=b)
                hr = native.gather_crop(self.array, idx, ys * self.scale,
                                        xs * self.scale, p, time_window=tw)
                if self.array_lr is not None:
                    lr = native.gather_crop(self.array_lr, idx, ys, xs, plr,
                                            time_window=tw)
                if self.pred is not None:
                    pred = native.gather_crop(self.pred, idx, ys, xs, plr,
                                              time_window=tw)
                ys_hr, xs_hr = ys * self.scale, xs * self.scale
            else:
                ys_hr = self.rng.integers(0, max(self.hr_y - p, 1), size=b)
                xs_hr = self.rng.integers(0, max(self.hr_x - p, 1), size=b)
                hr = native.gather_crop(self.array, idx, ys_hr, xs_hr, p,
                                        time_window=tw)
                lr = native.gather_crop(self.lr_pre, idx, ys_hr, xs_hr, p,
                                        time_window=tw)
                if self.pred is not None:
                    pred = native.gather_crop(self.pred, idx, ys_hr, xs_hr,
                                              p, time_window=tw)
            static_hr = (self._crop_statics(ys_hr, xs_hr, p)
                         if self.static_hr is not None else None)
        else:
            hr = native.gather_windows(self.array, idx, time_window=tw)
            src_lr = self.lr_pre if self.upsampling == 'pin' else self.array_lr
            if src_lr is not None:
                lr = native.gather_windows(src_lr, idx, time_window=tw)
            if self.pred is not None:
                pred = native.gather_windows(self.pred, idx, time_window=tw)
            # full-grid statics are identical across the batch: ship the
            # grid ONCE (sentinel -> device-side broadcast in _to_device)
            # instead of materializing/transferring B copies over PCIe
            static_hr = (_FULL_GRID_STATICS if self.static_hr is not None
                         else None)
        sid = (self.season_ids[idx] if self.season_ids is not None else None)
        return hr, lr, pred, static_hr, sid

    def _crop_statics(self, ys, xs, p):
        out = np.empty((ys.shape[0], p, p, self.n_static), 'float32')
        for i in range(ys.shape[0]):
            out[i] = self.static_hr[ys[i]:ys[i] + p, xs[i]:xs[i] + p, :]
        return out

    def _to_device(self, item):
        hr_np, lr_np, pred_np, static_np, sid_np = item

        def put(a):   # batch-major arrays go straight to the target layout
            return (jax.device_put(jnp.asarray(a), self.sharding)
                    if self.sharding is not None
                    else jax.device_put(jnp.asarray(a)))

        tw = self.time_window
        hr = put(hr_np)
        h, w = hr.shape[-3], hr.shape[-2]
        if lr_np is not None:
            lr = put(lr_np)
        else:  # implicit post-upsampling pairs: coarsen on device
            lr = resize2d(hr, (h // self.scale, w // self.scale),
                          self.interpolation)
        b = hr.shape[0]
        h_lr, w_lr = lr.shape[-3], lr.shape[-2]
        parts_lr = [lr]
        if pred_np is not None:
            parts_lr.append(put(pred_np))
        aux_parts = []
        if static_np is not None:
            full_grid = static_np is _FULL_GRID_STATICS
            if full_grid:
                if self._static_hr_dev is None:
                    self._static_hr_dev = jax.device_put(
                        jnp.asarray(self.static_hr))
                static_hr = jnp.broadcast_to(
                    self._static_hr_dev, (b,) + self._static_hr_dev.shape)
            else:
                static_hr = jax.device_put(jnp.asarray(static_np))
            aux_parts.append(static_hr)
            if tw is None:
                if not self.is_postups:
                    static_lr = static_hr
                elif full_grid:
                    # resize the (batch-invariant) grid once, not B copies
                    # of it per batch
                    if self._static_lr_dev is None:
                        self._static_lr_dev = resize2d(
                            self._static_hr_dev[None], (h_lr, w_lr),
                            self.interpolation)[0]
                    static_lr = jnp.broadcast_to(
                        self._static_lr_dev,
                        (b,) + self._static_lr_dev.shape)
                else:
                    static_lr = resize2d(static_hr, (h_lr, w_lr),
                                         self.interpolation)
                parts_lr.append(static_lr)
        if sid_np is not None:
            onehot = jax.nn.one_hot(jnp.asarray(sid_np), 4, dtype=hr.dtype)
            aux_parts.append(jnp.broadcast_to(onehot[:, None, None, :],
                                              (b, h, w, 4)))
            if tw is None:
                parts_lr.append(jnp.broadcast_to(
                    onehot[:, None, None, :], (b, h_lr, w_lr, 4)))
        lr = jnp.concatenate(parts_lr, axis=-1) if len(parts_lr) > 1 else lr
        aux = (jnp.concatenate(aux_parts, axis=-1) if len(aux_parts) > 1
               else (aux_parts[0] if aux_parts else None))
        return {'lr': lr, 'hr': hr, 'aux': aux}

    def epochs(self, n_epochs=1, steps=None):
        """Iterate batches with background prefetch: yields dicts like
        `BatchSynthesizer` (lr/hr/aux device arrays)."""
        import queue
        import threading

        n_batches = self.n // self.batch_size
        steps = n_batches if steps is None else steps
        q = queue.Queue(maxsize=self.prefetch)
        stop = object()
        cancel = threading.Event()

        def bounded_put(item):
            """Put that aborts when the consumer is gone — a plain q.put
            would block forever if the consumer breaks out of the loop,
            leaking the thread and its pinned batch memory."""
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for _ in range(n_epochs):
                    perm = self.rng.permutation(self.n)
                    for i in range(steps):
                        if cancel.is_set():
                            return
                        # wrap AROUND the permutation (like the device
                        # tier's epoch_indices) — tiling only the tail
                        # would yield batches of a few repeated samples
                        pos = np.arange(i * self.batch_size,
                                        (i + 1) * self.batch_size) % self.n
                        idx = np.take(perm, pos).astype(np.int64)
                        if not bounded_put(self._host_batch(idx)):
                            return
                bounded_put(stop)
            except BaseException as exc:  # noqa: BLE001 — surfaced below
                # without this the consumer would block on q.get() forever
                bounded_put(('__producer_error__', exc))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if (isinstance(item, tuple) and len(item) == 2
                        and item[0] == '__producer_error__'):
                    raise item[1]
                yield self._to_device(item)
        finally:
            # consumer done or bailed early: release the producer
            cancel.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
