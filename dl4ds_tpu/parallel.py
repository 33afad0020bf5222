"""
Spatial tiling / sharding utilities.

`predict_tiled` runs full-grid inference in halo-overlapped tiles — the
spatial analogue of context parallelism for grids that exceed one chip's
HBM (SURVEY.md §5: "our analogue of context parallelism for this domain" —
not a reference feature).

Geometry: fixed-size windows of `tile + 2*halo` are anchored INSIDE the
grid (clipped flush at the true borders), so border windows reproduce the
exact zero-padding context the full-grid convolutions see — tiled output is
bit-comparable to untiled inference wherever `halo` >= the network's
receptive-field radius, including at the borders. One window shape means
one compiled executable; the window batch is sharded over the mesh's data
axis when a mesh is given.

Exactness caveat: models with *global* channel attention (the zoo's output
head default, reference sp_postups.py:208) aggregate statistics over the
whole grid; with tiling the gate is computed per window, making the result
an approximation. Build models with `output_attention=False` (and
`attention=False`) for exact tiling.
"""

import collections

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ['predict_tiled', 'predict_spatial_sharded',
           'make_spatial_sharded_step', 'receptive_field_radius',
           'init_ensemble', 'make_ensemble_step', 'predict_ensemble',
           'tensor_param_shardings', 'make_tensor_sharded_step',
           'make_pipeline_step']


def _output_scale(model):
    """Output/input spatial ratio from the model's name-suffix contract
    (models/__init__.py: names end _spc/_rc/_dc/_pin)."""
    upsampling = model.name.split('_')[-1]
    return (int(model.module.scale) if upsampling in ('spc', 'rc', 'dc')
            else 1)


def _cached_jit(model, key, make_fn):
    """Per-model jit cache: repeated predict_* calls reuse the compiled
    executable instead of paying a retrace+compile per call (minutes
    through the remote TPU tunnel). Falls back gracefully on frozen
    wrappers."""
    cache = getattr(model, '_parallel_jit_cache', None)
    if cache is None:
        cache = {}
        try:
            model._parallel_jit_cache = cache
        except Exception:  # noqa: BLE001 — frozen wrapper: no caching
            pass
    fn = cache.get(key)
    if fn is None:
        fn = jax.jit(make_fn())
        cache[key] = fn
    return fn


def receptive_field_radius(n_blocks, ks=3, convs_per_block=2, extra=6,
                           time_window=None):
    """Conservative receptive-field radius estimate for the zoo's backbones:
    each KxK conv adds (K-1)/2 px per side.

    Spatio-temporal models: pass `time_window` — each ConvLSTM layer's
    recurrence convolves the hidden state once per timestep, so the
    spatial radius grows by (K-1)/2 * (T-1) per recurrent layer on top
    of the input convs (the backbone has 2 ConvLSTM layers per block,
    stem included: 2*(n_blocks+1) recurrent layers)."""
    per_conv = (ks - 1) // 2
    r = per_conv * (n_blocks * convs_per_block + extra)
    if time_window is not None and time_window > 1:
        r += per_conv * (time_window - 1) * 2 * (n_blocks + 1)
    return r


def predict_tiled(model, variables, x, aux=None, tile=128, halo=32,
                  batch_size=8, mesh=None, quantize=None,
                  calibration_quantile=None):
    """Tiled inference over [B, h, w, C] or spatio-temporal
    [B, T, h, w, C] input (LR for post-upsampling models; HR-sized for
    'pin').

    `quantize='int8'` (or 'weight-only') runs every window dispatch
    through the calibrated int8 replay (`quantization.quantize_forward`)
    — a natural fit: tiling dispatches FIXED-shape windows, exactly what
    the shape-pinned replay wants. Calibration uses the first dispatch
    batch of real windows (the tiled analogue of the plain path's
    default); `calibration_quantile` selects quantile clipping. The last
    dispatch is wrap-padded to the pinned batch when needed.

    Returns [B(,T), h*s, w*s, C_out] where s is the model's output scale
    (1 for 'pin').
    """
    x = jnp.asarray(x, jnp.float32)
    b = x.shape[0]
    h, w = x.shape[-3], x.shape[-2]
    scale = _output_scale(model)

    t_in_y = min(h, tile + 2 * halo)
    t_in_x = min(w, tile + 2 * halo)
    n_ty = -(-h // tile)
    n_tx = -(-w // tile)

    # aux lives on the HR(-output) grid; scale its window geometry
    s_aux = None
    if aux is not None:
        aux = jnp.asarray(aux, jnp.float32)
        s_aux = aux.shape[-3] // h

    windows, aux_windows, placements = [], [], []
    for ty in range(n_ty):
        for tx in range(n_tx):
            y0, x0 = ty * tile, tx * tile
            y1, x1 = min(y0 + tile, h), min(x0 + tile, w)
            wy0 = min(max(y0 - halo, 0), h - t_in_y)
            wx0 = min(max(x0 - halo, 0), w - t_in_x)
            windows.append(x[..., wy0:wy0 + t_in_y, wx0:wx0 + t_in_x, :])
            if aux is not None:
                windows_aux = aux[..., wy0 * s_aux:(wy0 + t_in_y) * s_aux,
                                  wx0 * s_aux:(wx0 + t_in_x) * s_aux, :]
                aux_windows.append(windows_aux)
            # where the tile region sits inside the window, and in the output
            placements.append((y0, x0, y1 - y0, x1 - x0, y0 - wy0, x0 - wx0))

    tiles = jnp.concatenate(windows, axis=0)       # [B*nt, t_in_y, t_in_x, C]
    aux_tiles = (jnp.concatenate(aux_windows, axis=0) if aux is not None
                 else None)

    apply = _cached_jit(
        model, 'apply',
        lambda: lambda v, xb, ab: model.module.apply(v, xb, ab,
                                                     training=False))
    n_win = tiles.shape[0]

    def _make_run(dispatch_bs):
        """Per-dispatch forward: float apply, or the quantized replay
        pinned to [dispatch_bs, *window] and calibrated on the first
        dispatch batch of real windows."""
        if quantize is None:
            return lambda tb, ab: apply(variables, tb, ab)
        from .quantization import quantize_forward
        sel = jnp.arange(dispatch_bs) % n_win   # cycle if fewer windows
        calib = jnp.take(tiles, sel, axis=0)
        calib_aux = (jnp.take(aux_tiles, sel, axis=0)
                     if aux_tiles is not None else None)
        qf = quantize_forward(model, variables, calib,
                              calibration_aux=calib_aux, mode=quantize,
                              calibration_quantile=calibration_quantile)
        if aux_tiles is not None:
            fwd = jax.jit(lambda xb, ab: qf(xb, ab))
            return lambda tb, ab: fwd(tb, ab)
        fwd = jax.jit(lambda xb: qf(xb))
        return lambda tb, ab: fwd(tb)

    if mesh is not None:
        # per-dispatch size: bounded by batch_size windows PER DEVICE (the
        # whole point of tiling is bounded activation memory), padded by
        # wrapping indices so it always divides over the 'data' axis
        sharding = NamedSharding(mesh, P('data'))
        gbs = min(batch_size * mesh.size,
                  -(-n_win // mesh.size) * mesh.size)
        pad_to = -(-n_win // gbs) * gbs
        if pad_to != n_win:
            sel = jnp.arange(pad_to) % n_win
            tiles = jnp.take(tiles, sel, axis=0)
            if aux_tiles is not None:
                aux_tiles = jnp.take(aux_tiles, sel, axis=0)
        run = _make_run(gbs)
        outs = []
        for i in range(0, pad_to, gbs):
            tb = jax.device_put(tiles[i:i + gbs], sharding)
            ab = (jax.device_put(aux_tiles[i:i + gbs], sharding)
                  if aux_tiles is not None else None)
            outs.append(np.asarray(run(tb, ab)))
        out_tiles = np.concatenate(outs, axis=0)[:n_win]
    else:
        bs_eff = min(batch_size, n_win)
        n_run = n_win
        if quantize is not None and n_win % bs_eff:
            # the quantized replay is shape-pinned: wrap-pad so every
            # dispatch is exactly bs_eff windows
            n_run = -(-n_win // bs_eff) * bs_eff
            sel = jnp.arange(n_run) % n_win
            tiles = jnp.take(tiles, sel, axis=0)
            if aux_tiles is not None:
                aux_tiles = jnp.take(aux_tiles, sel, axis=0)
        run = _make_run(bs_eff)
        outs = []
        for i in range(0, n_run, bs_eff):
            ab = (aux_tiles[i:i + bs_eff] if aux_tiles is not None
                  else None)
            outs.append(np.asarray(run(tiles[i:i + bs_eff], ab)))
        out_tiles = np.concatenate(outs, axis=0)[:n_win]

    c_out = out_tiles.shape[-1]
    full = np.zeros((b, *out_tiles.shape[1:-3], h * scale, w * scale,
                     c_out), np.float32)
    for k, (y0, x0, ty_len, tx_len, oy, ox) in enumerate(placements):
        blk = out_tiles[k * b:(k + 1) * b]
        full[..., y0 * scale:(y0 + ty_len) * scale,
             x0 * scale:(x0 + tx_len) * scale, :] = \
            blk[..., oy * scale:(oy + ty_len) * scale,
                ox * scale:(ox + tx_len) * scale, :]
    return full


def _shard_map(fn, **specs):
    """shard_map across jax versions (check_vma vs check_rep kwarg)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    try:
        return shard_map(fn, check_vma=False, **specs)
    except TypeError:
        return shard_map(fn, check_rep=False, **specs)


def _halo_window(x_band, axis_name, n, bh, halo):
    """Exchange `2*halo` boundary rows with both neighbours over `axis_name`
    and return (window of bh + 2*halo rows anchored flush INSIDE the grid,
    row offset of this device's own band inside the window).

    Flush anchoring means the first/last devices see the true grid border
    (and hence the exact zero-padding context an unsharded run sees) instead
    of a zero-filled halo. Requires n >= 2 and bh >= 2*halo.
    """
    d = jax.lax.axis_index(axis_name)
    up_perm = [(i, i - 1) for i in range(1, n)]     # receive from below
    down_perm = [(i, i + 1) for i in range(n - 1)]  # receive from above
    m = min(2 * halo, bh)
    from_below = jax.lax.ppermute(x_band[:, :m], axis_name, up_perm)
    from_above = jax.lax.ppermute(x_band[:, -m:], axis_name, down_perm)
    # ext covers grid rows [d*bh - m, (d+1)*bh + m) (zeros out of range)
    ext = jnp.concatenate([from_above, x_band, from_below], axis=1)
    # window offset in ext: m at d==0 (flush at the true top border),
    # m - 2*halo at d==n-1 (flush at the bottom), m - halo otherwise
    off = jnp.where(d == 0, m,
                    jnp.where(d == n - 1, m - 2 * halo, m - halo))
    off = jnp.clip(off, 0, ext.shape[1] - (bh + 2 * halo))
    win = jax.lax.dynamic_slice_in_dim(ext, off, bh + 2 * halo, axis=1)
    return win, m - off


SpatialShardedStep = collections.namedtuple(
    'SpatialShardedStep', ['step', 'loss_and_grads', 'scale'])


def make_spatial_sharded_step(model, mesh, tx=None, halo=32, loss='mae',
                              space_axis='space', data_axis='data'):
    """Build a TRAIN step whose spatial height axis is sharded across the
    mesh — full-grid training for grids whose activations exceed one
    chip's HBM (the training-side counterpart of `predict_spatial_sharded`;
    no reference feature, SURVEY.md §5 "long-context analogue").

    Each device holds a horizontal band of every sample. The halo exchange
    (`lax.ppermute` over ICI) happens in the INPUT path, which is not
    differentiated — so the per-band gradient is an ordinary local
    backward pass, and one explicit `lax.psum` of the per-band (loss, grad)
    contributions makes the result exactly the gradient of the global mean
    loss: sum-decomposable pixel losses ('mae', 'mse') split exactly over
    bands, and flush-anchored windows (see `_halo_window`) reproduce the
    unsharded zero-padding context at the true borders. Gradients match an
    unsharded step to float tolerance when `halo` >= the network's
    receptive-field radius (`receptive_field_radius`) and the model is
    attention- and norm-free (global channel attention pools per window;
    batch-norm statistics would be per-band). Tested:
    tests/test_parallel.py::test_spatial_sharded_step_matches_unsharded.

    Dropout note: with dropout active, overlapping halo rows are computed
    under different masks on neighbouring devices — still a valid
    stochastic-gradient estimator, but not bit-identical to an unsharded
    dropout realization; exactness claims apply to deterministic models.

    Args:
      model: a DSModel (factory output); upsampling inferred from its name.
      mesh: `Mesh` with a `space_axis` axis; a `data_axis` axis, if present,
        additionally shards the batch (2-D DPxSP).
      tx: optax transform for `step` (default `optax.adam(1e-4)`).
      halo: rows exchanged per side; >= the receptive-field radius for
        exact gradients.
      loss: 'mae' or 'mse' (sum-decomposable pixel losses only — windowed
        SSIM losses do not split exactly across bands).

    Returns a `SpatialShardedStep` namedtuple:
      step(params, opt_state, x, y, key) -> (params, opt_state, loss)
      loss_and_grads(params, x, y, key) -> (loss, grads)   [both jitted]
    with x: [B, H, W, C] (LR grid for post-upsampling models, HR-sized for
    'pin'), y: [B, H*s, W*s, C_out], H divisible by the space-axis size n,
    H/n >= 2*halo, and B divisible by the data-axis size.
    """
    import optax

    if loss not in ('mae', 'mse'):
        raise ValueError(
            f"loss must be 'mae' or 'mse' (sum-decomposable), got {loss!r}")
    if model.aux_shape is not None:
        raise ValueError(
            'make_spatial_sharded_step does not support aux-input models '
            f'(aux_shape={model.aux_shape}): the step applies aux=None, so '
            'the aux branch would never train; build the model with '
            'n_aux_channels=0')
    scale = _output_scale(model)
    axis_names = mesh.axis_names
    if space_axis not in axis_names:
        raise ValueError(f'mesh has no {space_axis!r} axis: {axis_names}')
    has_data = data_axis in axis_names
    n_sp = mesh.shape[space_axis]
    psum_axes = (space_axis,) + ((data_axis,) if has_data else ())
    tx = tx if tx is not None else optax.adam(1e-4)

    def band_fn(params, x_band, y_band, key):
        bh = x_band.shape[1]
        k = jax.random.fold_in(key, jax.lax.axis_index(space_axis))
        if has_data:
            k = jax.random.fold_in(k, jax.lax.axis_index(data_axis))
        denom = y_band.size * n_sp * (mesh.shape[data_axis] if has_data
                                      else 1)

        def band_loss(p):
            if n_sp > 1:
                win, crop = _halo_window(x_band, space_axis, n_sp, bh, halo)
            else:
                win, crop = x_band, 0
            out = model.module.apply({'params': p}, win, None, training=True,
                                     rngs={'dropout': k})
            out = jax.lax.dynamic_slice_in_dim(out, crop * scale,
                                               bh * scale, axis=1)
            err = out.astype(jnp.float32) - y_band
            s = jnp.sum(jnp.abs(err)) if loss == 'mae' else jnp.sum(err * err)
            return s / denom

        l, g = jax.value_and_grad(band_loss)(params)
        return (jax.lax.psum(l, psum_axes),
                jax.lax.psum(g, psum_axes))

    xy_spec = P(data_axis if has_data else None, space_axis, None, None)
    sharded = _shard_map(band_fn, mesh=mesh,
                         in_specs=(P(), xy_spec, xy_spec, P()),
                         out_specs=(P(), P()))

    def _validate(x, y):
        if np.ndim(x) != 4 or np.ndim(y) != 4:
            raise ValueError(
                'spatial sharding takes [B, H, W, C] grids (4-D); a 5-D '
                'spatio-temporal input would shard the TIME axis — use '
                'patch training or predict_tiled for those models')
        b, h = x.shape[0], x.shape[1]
        if h % n_sp:
            raise ValueError(f'H={h} must be divisible by the {space_axis} '
                             f'axis size {n_sp}')
        if n_sp > 1 and h // n_sp < 2 * halo:
            raise ValueError(f'band height H/n={h // n_sp} must be >= '
                             f'2*halo={2 * halo}')
        if has_data and b % mesh.shape[data_axis]:
            raise ValueError(f'batch {b} not divisible by the {data_axis} '
                             f'axis size {mesh.shape[data_axis]}')
        if y.shape[1] != h * scale:
            raise ValueError(f'target rows {y.shape[1]} != H*s = '
                             f'{h * scale}')

    @jax.jit
    def loss_and_grads(params, x, y, key):
        return sharded(params, jnp.asarray(x, jnp.float32),
                       jnp.asarray(y, jnp.float32), key)

    @jax.jit
    def step(params, opt_state, x, y, key):
        l, g = sharded(params, jnp.asarray(x, jnp.float32),
                       jnp.asarray(y, jnp.float32), key)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    def checked_loss_and_grads(params, x, y, key):
        _validate(x, y)
        return loss_and_grads(params, x, y, key)

    def checked_step(params, opt_state, x, y, key):
        _validate(x, y)
        return step(params, opt_state, x, y, key)

    return SpatialShardedStep(checked_step, checked_loss_and_grads, scale)


def predict_spatial_sharded(model, variables, x, mesh, halo=32, aux=None,
                            axis=None):
    """Single-grid inference with the HEIGHT axis sharded across the mesh —
    for grids whose activations exceed one chip's HBM. Each device holds
    one horizontal band; `halo` rows are exchanged with neighbours via
    `lax.ppermute` over ICI before the (attention-free) model runs on a
    fixed-size window, and the window margin is cropped from the output.
    One collective XLA program via shard_map.

    Exactness: windows of `H/n + 2*halo` rows are anchored flush INSIDE the
    grid (same geometry as `predict_tiled`), so the top and bottom devices
    see the exact zero-padding context of an unsharded run at the true
    borders. The result is bit-comparable to unsharded inference everywhere
    — including edge rows — when `halo` >= the network's receptive-field
    radius (see receptive_field_radius) and the model is attention-free
    (global channel attention pools per band -> approximate).

    x: [B, H, W, C] with H divisible by the sharding axis size and
    H/n >= 2*halo. `axis` names the mesh axis to shard over (default: the
    only axis of a 1-D mesh). Returns [B, H*s, W*s, C'].
    """
    if aux is not None:
        raise NotImplementedError(
            'predict_spatial_sharded does not support aux inputs; use '
            'predict_tiled (which shards aux windows alongside the input)')
    if axis is None:
        if len(mesh.axis_names) != 1:
            raise ValueError(
                f'mesh has axes {mesh.axis_names}; pass axis= to choose '
                f'which one shards the grid height')
        axis = mesh.axis_names[0]
    elif axis not in mesh.axis_names:
        raise ValueError(f'mesh has no {axis!r} axis: {mesh.axis_names}')
    n = mesh.shape[axis]
    x = jnp.asarray(x, jnp.float32)
    if x.ndim != 4:
        raise ValueError('predict_spatial_sharded takes [B, H, W, C] grids '
                         '(4-D); use predict_tiled for spatio-temporal '
                         'models')
    b, h, w, c = x.shape
    if h % n != 0:
        raise ValueError(f'H={h} must be divisible by the {axis!r} axis '
                         f'size {n}')
    bh = h // n
    if n > 1 and bh < 2 * halo:
        raise ValueError(
            f'band height H/n={bh} must be >= 2*halo={2 * halo} so edge '
            f'windows can anchor inside the grid with rows exchanged only '
            f'between neighbouring devices')
    scale = _output_scale(model)
    if n == 1:  # degenerate mesh: no sharding, run the model directly
        apply = _cached_jit(
            model, 'apply',
            lambda: lambda v, xb, ab: model.module.apply(v, xb, ab,
                                                         training=False))
        return np.asarray(apply(variables, x, None))

    def make_sharded():
        def band_fn(v, x_band):
            # x_band: [B, H/n, W, C] on each device
            win, crop = _halo_window(x_band, axis, n, bh, halo)
            y = model.module.apply(v, win, None, training=False)
            # this device's own band sits `crop` rows below the window top
            return jax.lax.dynamic_slice_in_dim(y, crop * scale, bh * scale,
                                                axis=1)

        return _shard_map(band_fn, mesh=mesh,
                          in_specs=(P(), P(None, axis, None, None)),
                          out_specs=P(None, axis, None, None))

    sharded = _cached_jit(model, ('spatial_sharded', id(mesh), axis, halo,
                                  bh), make_sharded)
    x_sh = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
    return np.asarray(sharded(variables, x_sh))


# ---------------------------------------------------------------------------
# Ensemble parallelism ('ep'): N members trained simultaneously, one vmapped
# program with the member axis sharded over the mesh.
# ---------------------------------------------------------------------------

EnsembleStep = collections.namedtuple(
    'EnsembleStep', ['step', 'init_opt', 'axis_size'])


def _member_sharding(mesh, member_axis):
    return NamedSharding(mesh, P(member_axis))


def init_ensemble(model, n_members, seed=0, mesh=None,
                  member_axis='ensemble'):
    """Initialize `n_members` independent parameter sets as ONE stacked
    pytree (leading member axis on every leaf) — the deep-ensembles
    counterpart of the reference's MC-dropout uncertainty
    (reference: dl4ds/inference.py:63-71 runs the net n_members times with
    dropout on; deep ensembles with independent inits are the stronger
    estimator and the member axis maps directly onto a mesh axis).

    With `mesh` given, the stack is placed sharded over its `member_axis`
    so each device (group) holds only its members.
    """
    if mesh is not None and n_members % mesh.shape[member_axis]:
        raise ValueError(
            f'{n_members} members not divisible by the {member_axis!r} '
            f'axis size {mesh.shape[member_axis]}')
    keys = jax.random.split(jax.random.PRNGKey(seed), n_members)
    stacked = jax.vmap(lambda k: model.init(k))(keys)
    if 'batch_stats' in stacked:
        raise ValueError('ensemble training supports parameter-only models '
                         '(batch-norm statistics are per-member mutable '
                         'state); build the model without batch norm')
    if mesh is not None:
        stacked = jax.device_put(stacked, _member_sharding(mesh, member_axis))
    return stacked


def make_ensemble_step(model, mesh, tx=None, loss='mae',
                       member_axis='ensemble', data_axis='data',
                       bootstrap=True):
    """Build a TRAIN step that advances a whole deep ensemble at once:
    `shard_map` over the mesh's `member_axis` with each device (group)
    running its local members as an ordinary `vmap` — embarrassingly
    parallel, no collectives between members. If the mesh also has a
    `data_axis`, the shared batch is sharded over it (EP x DP) and each
    member's (loss, grad) is `lax.pmean`-reduced over the data axis —
    exact for the library's losses (all uniform means over samples).

    shard_map (explicit SPMD) rather than jit+GSPMD is deliberate: asking
    GSPMD to partition the member-vmapped (grouped) convolutions over the
    member axis was measured to CHANGE the numerics on XLA:CPU (losses off
    by ~1% vs the unsharded program); with shard_map each member's conv is
    an ordinary local conv and results match the unsharded step to float
    tolerance (tests/test_ensemble.py).

    Each member sees the same input batch but trains independently:
    its own init (see `init_ensemble`), its own dropout stream, and — with
    `bootstrap=True` — its own bootstrap resample of the batch (bagging;
    under EP x DP the resample is per local shard, a stratified bootstrap),
    so members decorrelate even for deterministic models.

    Returns an `EnsembleStep` namedtuple:
      init_opt(variables)                        -> stacked optimizer state
      step(variables, opt_state, x, y, key[, aux]) -> (variables, opt_state,
                                                       losses[M])
      axis_size: the mesh's member-axis size (members per step = M, the
        stack's leading axis — any multiple of axis_size)
    with x: [B, ...model.input_shape], y the matching HR target batch,
    aux REQUIRED iff the model has an aux branch (`model.aux_shape`), and
    `variables` the stacked pytree from `init_ensemble`; the member count M
    must be divisible by `axis_size`, and B by the `data_axis` size.
    """
    import optax

    from .utils import checkarg_loss

    lossf = checkarg_loss(loss)
    if member_axis not in mesh.axis_names:
        raise ValueError(f'mesh has no {member_axis!r} axis: '
                         f'{mesh.axis_names}')
    has_data = data_axis in mesh.axis_names
    tx = tx if tx is not None else optax.adam(1e-4)
    m_sh = _member_sharding(mesh, member_axis)
    n_mesh = mesh.shape[member_axis]
    x_spec = P(data_axis) if has_data else P()
    needs_aux = model.aux_shape is not None

    def member_step(variables, opt_state, x, y, aux, key):
        kboot, kdrop = jax.random.split(key)
        if has_data:
            # decorrelate the per-shard dropout/bootstrap streams
            d = jax.lax.axis_index(data_axis)
            kboot = jax.random.fold_in(kboot, d)
            kdrop = jax.random.fold_in(kdrop, d)
        if bootstrap:
            b = x.shape[0]
            idx = jax.random.randint(kboot, (b,), 0, b)
            x, y = x[idx], y[idx]
            if needs_aux:
                aux = aux[idx]

        def member_loss(v):
            out = model.module.apply(v, x, aux if needs_aux else None,
                                     training=True, rngs={'dropout': kdrop})
            return lossf(y, out.astype(jnp.float32))

        l, g = jax.value_and_grad(member_loss)(variables)
        if has_data:
            l = jax.lax.pmean(l, data_axis)
            g = jax.lax.pmean(g, data_axis)
        updates, opt_state = tx.update(g, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, l

    # local member chunk on each device: plain vmap (x, y, aux shared via
    # in_axes=None; keys per member)
    vstep = jax.vmap(member_step, in_axes=(0, 0, None, None, None, 0))
    mspec = P(member_axis)
    local = _shard_map(vstep, mesh=mesh,
                       in_specs=(mspec, mspec, x_spec, x_spec, x_spec,
                                 mspec),
                       out_specs=(mspec, mspec, mspec))

    @jax.jit
    def step(variables, opt_state, x, y, aux, key):
        n_members = jax.tree_util.tree_leaves(variables)[0].shape[0]
        keys = jax.random.split(key, n_members)
        return local(variables, opt_state,
                     jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                     jnp.asarray(aux, jnp.float32), keys)

    def checked_step(variables, opt_state, x, y, key, aux=None):
        m = jax.tree_util.tree_leaves(variables)[0].shape[0]
        if m % n_mesh:
            raise ValueError(f'{m} members not divisible by the '
                             f'{member_axis} axis size {n_mesh}')
        if has_data and np.shape(x)[0] % mesh.shape[data_axis]:
            raise ValueError(f'batch {np.shape(x)[0]} not divisible by the '
                             f'{data_axis} axis size {mesh.shape[data_axis]}')
        if needs_aux and aux is None:
            raise ValueError(f'model {model.name!r} has an aux branch '
                             f'(aux_shape={model.aux_shape}); pass aux= to '
                             f'step() or its params never train')
        if aux is None:
            # zero-width placeholder keeps one local() signature
            aux = np.zeros((np.shape(x)[0], 0), 'float32')
        return step(variables, opt_state, x, y, aux, key)

    def init_opt(variables):
        return jax.device_put(jax.vmap(tx.init)(variables), m_sh)

    return EnsembleStep(checked_step, init_opt, n_mesh)


def predict_ensemble(model, stacked_variables, x, aux=None, mesh=None,
                     member_axis='ensemble', return_members=False):
    """Ensemble inference: run every member on `x` in one vmapped program
    (members sharded over `mesh`'s `member_axis` when given — shard_map,
    for the same exactness reason as `make_ensemble_step`) and return
    `(mean, std)` over members — the downscaled field and its epistemic
    uncertainty map. Counterpart of `predict_mc` for stacked ensembles.

    With ``return_members=True`` the raw member stack ``[M, N, H, W, C]``
    is returned as a third element — the input to the probabilistic
    verification suite (`metrics.crps_ensemble` /
    `metrics.compute_prob_metrics`)."""
    x = jnp.asarray(x, jnp.float32)
    # aux folded to zeros-shaped placeholder when absent so the shard_map'd
    # function takes no traced closures
    aux_j = (jnp.zeros((x.shape[0], 0), jnp.float32) if aux is None
             else jnp.asarray(aux, jnp.float32))
    has_aux = aux is not None

    def make_vapply():
        def vapply(vs, xx, aa):
            return jax.vmap(lambda v: model.module.apply(
                v, xx, aa if has_aux else None, training=False))(vs)
        return vapply

    if mesh is None:
        outs = _cached_jit(model, ('ens_predict', None, has_aux),
                           make_vapply)(stacked_variables, x, aux_j)
    else:
        m = jax.tree.leaves(stacked_variables)[0].shape[0]
        if m % mesh.shape[member_axis]:
            raise ValueError(
                f'{m} members not divisible by the {member_axis!r} axis '
                f'size {mesh.shape[member_axis]}')
        stacked_variables = jax.device_put(
            stacked_variables, _member_sharding(mesh, member_axis))

        def make_fn():
            return _shard_map(make_vapply(), mesh=mesh,
                              in_specs=(P(member_axis), P(), P()),
                              out_specs=P(member_axis))

        outs = _cached_jit(model, ('ens_predict', id(mesh), member_axis,
                                   has_aux), make_fn)(
            stacked_variables, x, aux_j)
    outs = outs.astype(jnp.float32)
    mean = np.asarray(jnp.mean(outs, axis=0))
    std = np.asarray(jnp.std(outs, axis=0))
    if return_members:
        return mean, std, np.asarray(outs)
    return mean, std


# --------------------------------------------------------------------------
# Tensor (channel) parallelism — weights sharded over a 'model' mesh axis
# --------------------------------------------------------------------------

TensorShardedStep = collections.namedtuple(
    'TensorShardedStep', 'step loss_and_grads init_opt param_shardings')


def tensor_param_shardings(params, mesh, model_axis='model',
                           min_channels=None):
    """PartitionSpec tree for Megatron-style channel sharding of a conv
    model: every rank>=2 kernel whose OUTPUT-channel (minor) dim is
    divisible by the `model_axis` size and at least `min_channels` wide is
    sharded over that dim; everything else (biases, narrow kernels,
    attention vectors) is replicated. Covers Conv HWIO kernels and the
    attention/localized dense kernels alike — the sharded dim is always
    the output-feature dim.

    `min_channels` (default `2 * axis_size`) keeps sub-lane-width shards
    from fragmenting tiny kernels; the zoo's reference-width (8..48)
    layers shard at n=2..4 while the [3,3,C,1] output conv stays
    replicated.
    """
    n = mesh.shape[model_axis]
    min_c = (2 * n) if min_channels is None else min_channels

    def spec(leaf):
        if (hasattr(leaf, 'ndim') and leaf.ndim >= 2
                and leaf.shape[-1] % n == 0 and leaf.shape[-1] >= min_c):
            return P(*((None,) * (leaf.ndim - 1) + (model_axis,)))
        return P()

    return jax.tree.map(spec, params)


def mirror_param_shardings(state, params, p_sh, rep):
    """Mirror a params-shaped sharding tree `p_sh` onto every params-shaped
    subtree of an (optax/flax) state pytree — Adam mu/nu, MultiSteps
    acc_grads, EMA copies — replicating everything else (counters,
    scalars). `state` may be concrete or `jax.eval_shape` output; `params`
    fixes the subtree structure being matched."""
    treedef = jax.tree.structure(params)

    def _same_tree(obj):
        try:
            return jax.tree.structure(obj) == treedef
        except Exception:
            return False

    def rec(obj):
        if _same_tree(obj):
            return p_sh
        if isinstance(obj, tuple) and type(obj) is not tuple:
            # NamedTuple optax states: rebuild field-wise
            return type(obj)(*(rec(c) for c in obj))
        if isinstance(obj, tuple):
            return tuple(rec(c) for c in obj)
        if isinstance(obj, list):
            return [rec(c) for c in obj]
        if isinstance(obj, dict):
            return {k: rec(v) for k, v in obj.items()}
        return jax.tree.map(lambda _: rep, obj)

    return rec(state)


def make_tensor_sharded_step(model, mesh, tx=None, loss='mae',
                             model_axis='model', data_axis='data',
                             min_channels=None):
    """Build a TRAIN step whose WEIGHTS (and optimizer moments) are
    sharded channel-wise over the mesh's `model_axis` — tensor
    parallelism for production-width models whose parameters + Adam state
    + activation working set exceed one chip's HBM (no reference feature;
    the reference is single-GPU Keras).

    TPU-idiomatic formulation: rather than hand-writing the Megatron
    column/row conv pair with explicit psums, the step ANNOTATES the
    shardings — conv kernels sharded on their output-feature dim
    (`tensor_param_shardings`), batch sharded over `data_axis` when the
    mesh has one — and jits the whole step with them, letting XLA's SPMD
    partitioner place the collectives on ICI (all-gathers of channel
    shards where a full activation is consumed, reduce-scatters in the
    backward). The numerics are the unsharded step's: GSPMD partitions
    the SAME program, asserted by
    tests/test_parallel.py::test_tensor_sharded_step_matches_unsharded.

    2-D TP x DP: a mesh with both axes shards weights over `model_axis`
    and the batch over `data_axis`; the data-axis gradient all-reduce is
    likewise inserted by XLA.

    Args:
      model: a DSModel (factory output); parameter-only models (no
        batch-norm statistics), like the other parallel helpers.
      mesh: `Mesh` with a `model_axis` axis (optionally + `data_axis`).
      tx: optax transform (default `optax.adam(1e-4)`). Use a PER-LEAF
        transform (plain adam) — `optax.flatten` would concatenate
        leaves and destroy the per-channel sharding.
      loss: any registry loss name or callable (no decomposability
        constraint — GSPMD sees the full logical activations).
      min_channels: see `tensor_param_shardings`.

    Returns a `TensorShardedStep` namedtuple:
      init_opt(params) -> sharded optimizer state
      step(params, opt_state, x, y, key[, aux]) -> (params, opt_state,
                                                    loss)
      loss_and_grads(params, x, y, key[, aux]) -> (loss, grads)
      param_shardings: NamedSharding tree — place params with
        `jax.device_put(params, param_shardings)`.
    """
    import optax

    from .utils import checkarg_loss

    lossf = checkarg_loss(loss)
    if model_axis not in mesh.axis_names:
        raise ValueError(f'mesh has no {model_axis!r} axis: '
                         f'{mesh.axis_names}')
    has_data = data_axis in mesh.axis_names
    tx = tx if tx is not None else optax.adam(1e-4)
    needs_aux = model.aux_shape is not None

    variables0 = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    if 'batch_stats' in variables0:
        raise ValueError('tensor-sharded training supports parameter-only '
                         'models (batch-norm statistics are mutable '
                         'state); build the model without batch norm')
    params0 = variables0['params']
    spec_tree = tensor_param_shardings(params0, mesh, model_axis,
                                       min_channels)
    p_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree,
                        is_leaf=lambda s: isinstance(s, P))
    x_sh = NamedSharding(mesh, P(data_axis) if has_data else P())
    rep = NamedSharding(mesh, P())
    st_sh = mirror_param_shardings(jax.eval_shape(tx.init, params0),
                                   params0, p_sh, rep)

    def _loss_fn(params, x, y, aux, key):
        out = model.module.apply({'params': params}, x,
                                 aux if needs_aux else None,
                                 training=True, rngs={'dropout': key})
        return lossf(y, out.astype(jnp.float32))

    def _step(params, opt_state, x, y, key, aux):
        l, g = jax.value_and_grad(_loss_fn)(params, x, y, aux, key)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    def _lag(params, x, y, key, aux):
        return jax.value_and_grad(_loss_fn)(params, x, y, aux, key)

    aux_sh = x_sh if needs_aux else rep
    step_j = jax.jit(_step,
                     in_shardings=(p_sh, st_sh, x_sh, x_sh, rep, aux_sh),
                     out_shardings=(p_sh, st_sh, rep))
    lag_j = jax.jit(_lag,
                    in_shardings=(p_sh, x_sh, x_sh, rep, aux_sh),
                    out_shardings=(rep, p_sh))

    def _aux_arg(aux):
        if needs_aux:
            if aux is None:
                raise ValueError('model takes an aux input; pass aux=')
            return jnp.asarray(aux, jnp.float32)
        # fixed zero placeholder keeps ONE jitted signature either way
        return jnp.zeros((), jnp.float32)

    def step(params, opt_state, x, y, key, aux=None):
        return step_j(params, opt_state, x, y, key, _aux_arg(aux))

    def loss_and_grads(params, x, y, key, aux=None):
        return lag_j(params, x, y, key, _aux_arg(aux))

    def init_opt(params):
        return jax.device_put(jax.jit(tx.init)(params), st_sh)

    return TensorShardedStep(step, loss_and_grads, init_opt, p_sh)


PipelineStep = collections.namedtuple(
    'PipelineStep', ['step', 'loss_and_grads', 'init_opt', 'split_params',
                     'merge_params', 'param_shardings', 'n_stages',
                     'n_micro'])


def make_pipeline_step(model, mesh, tx=None, loss='mae', n_micro=None,
                       pipe_axis='pipe', data_axis='data'):
    """Build a TRAIN step whose ConvLSTM trunk is PIPELINE-parallel over
    the mesh's `pipe_axis` — GPipe-style microbatch rotation for deep
    spatio-temporal models whose trunk weights + Adam moments exceed one
    chip's HBM (no reference feature; the reference is single-GPU Keras).

    The recurrent nets' trunk (reference dl4ds/models/spt_postups.py:
    105-123) is HOMOGENEOUS — blocks 2..n_blocks+1 are identical-width
    RecurrentConvBlocks — which is exactly what the canonical TPU pipeline
    formulation wants: per-block param trees stack into one leading
    [n_blocks, ...] axis sharded over `pipe_axis`, every device runs the
    SAME per-stage program on its `n_blocks/S` blocks, and activations
    rotate device-to-device over ICI with `lax.ppermute` inside a
    `lax.scan` over `n_micro + S - 1` ticks. The scan/ppermute program is
    differentiated as-is: the transpose of a ppermute is the reverse
    ppermute, so jax.grad derives the reverse-order backward pipeline
    automatically (no hand-written 1F1B schedule).

    Stem (RecurrentConvBlock1) and the per-timestep head stay REPLICATED:
    they are O(1/n_blocks) of the compute, and replicating them keeps the
    loss/grad math identical to the unsharded step (asserted by
    tests/test_parallel.py::test_pipeline_step_matches_unsharded). The
    pipeline is numerically EXACT — bubbles waste compute, never change
    valid microbatch outputs.

    2-D PP x DP: a mesh with both axes rotates the trunk over `pipe_axis`
    within each data shard and shards the batch over `data_axis`; grad
    psums over 'data' are placed by the shard_map transpose / GSPMD.

    Args:
      model: a DSModel from `recnet_postupsampling` / `recnet_pin`
        (homogeneous ConvLSTM trunk), parameter-only (no batch norm), no
        aux branch, with n_blocks divisible by the pipe-axis size.
      mesh: `Mesh` with a `pipe_axis` axis (optionally + `data_axis`).
      tx: optax transform (default `optax.adam(1e-4)`); per-leaf, like
        `make_tensor_sharded_step`.
      loss: any registry loss name or callable — the head assembles the
        full output, so there is no decomposability constraint.
      n_micro: microbatches per step (default = number of stages; the
        bubble fraction is (S-1)/(n_micro+S-1)). The per-data-shard batch
        must be divisible by it.

    Returns a `PipelineStep` namedtuple:
      split_params(params) -> (rest, stacked): pull the trunk blocks out
        of a full param tree and stack them on a leading axis; place with
        `jax.device_put((rest, stacked), param_shardings)`.
      merge_params(rest, stacked) -> full param tree (checkpoint/eval).
      init_opt(parts) -> sharded optimizer state
      step(parts, opt_state, x, y, key) -> (parts, opt_state, loss)
      loss_and_grads(parts, x, y, key) -> (loss, grads)   [both jitted]
    """
    import optax

    from .utils import checkarg_loss
    from .models.blocks import RecurrentConvBlock

    m = model.module
    if not model.name.startswith('rec'):
        raise ValueError(
            'pipeline parallelism needs the homogeneous ConvLSTM trunk of '
            'the recurrent nets (recnet_postupsampling / recnet_pin); got '
            f'{model.name!r} — the spatial backbones grow filters per '
            'block, so their stages are not shape-uniform')
    if model.aux_shape is not None:
        raise ValueError(
            'make_pipeline_step does not support aux-input models '
            f'(aux_shape={model.aux_shape}); build with n_aux_channels=0')
    if pipe_axis not in mesh.axis_names:
        raise ValueError(f'mesh has no {pipe_axis!r} axis: '
                         f'{mesh.axis_names}')
    n_stages = mesh.shape[pipe_axis]
    if n_stages < 2:
        raise ValueError(f'{pipe_axis!r} axis size must be >= 2, got '
                         f'{n_stages}')
    n_blocks = m.n_blocks
    if n_blocks % n_stages:
        raise ValueError(f'n_blocks={n_blocks} not divisible by the '
                         f'{pipe_axis} axis size {n_stages}')
    bps = n_blocks // n_stages
    n_micro = n_stages if n_micro is None else int(n_micro)
    if n_micro < 1:
        raise ValueError(f'n_micro must be >= 1, got {n_micro}')
    has_data = data_axis in mesh.axis_names
    n_data = mesh.shape[data_axis] if has_data else 1
    lossf = checkarg_loss(loss)
    tx = tx if tx is not None else optax.adam(1e-4)

    variables0 = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    if 'batch_stats' in variables0:
        raise ValueError('pipeline training supports parameter-only models '
                         '(batch-norm statistics are mutable per-microbatch '
                         "state); use normalization=None or 'ln'")
    params0 = jax.tree.map(lambda s: s, variables0['params'])
    bb_key = next(k for k in params0 if k.startswith('_RecBackbone'))
    block_names = [f'RecurrentConvBlock{i + 2}' for i in range(n_blocks)]

    block_mod = RecurrentConvBlock(
        m.n_filters, activation=m.activation, normalization=m.normalization,
        dropout_rate=m.dropout_rate, dropout_variant=m.dropout_variant,
        dtype=m.dtype)

    def _stack(*ls):
        if isinstance(ls[0], jax.ShapeDtypeStruct):  # eval_shape scaffolding
            return jax.ShapeDtypeStruct((len(ls),) + tuple(ls[0].shape),
                                        ls[0].dtype)
        return jnp.stack(ls)

    def split_params(params):
        bb = dict(params[bb_key])
        blocks = [bb.pop(name) for name in block_names]
        stacked = jax.tree.map(_stack, *blocks)
        rest = dict(params)
        rest[bb_key] = bb
        return rest, stacked

    def merge_params(rest, stacked):
        bb = dict(rest[bb_key])
        for i, name in enumerate(block_names):
            bb[name] = jax.tree.map(lambda a, i=i: a[i], stacked)
        full = dict(rest)
        full[bb_key] = bb
        return full

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def trunk_device_fn(stacked_loc, x0_loc, key):
        # stacked_loc: this device's [bps, ...] trunk blocks;
        # x0_loc: the full (per-data-shard) stem output [B, T, h, w, F]
        d = jax.lax.axis_index(pipe_axis)
        b_loc = x0_loc.shape[0]
        mb = b_loc // n_micro
        x0_mb = x0_loc.reshape(n_micro, mb, *x0_loc.shape[1:])
        slot0 = jnp.zeros(x0_mb.shape[1:], x0_loc.dtype)
        acc0 = jnp.zeros_like(x0_mb)

        def tick(carry, t):
            slot, acc = carry
            inj = jax.lax.dynamic_index_in_dim(x0_mb, t % n_micro, 0,
                                               keepdims=False)
            # stage 0 injects microbatch t; everyone else continues on
            # what the previous stage handed over at the last tick
            slot = jnp.where(d == 0, inj, slot)
            for j in range(bps):
                blk = jax.tree.map(lambda a, j=j: a[j], stacked_loc)
                k = jax.random.fold_in(jax.random.fold_in(
                    jax.random.fold_in(key, d), t), j)
                slot = block_mod.apply({'params': blk}, slot, True,
                                       rngs={'dropout': k})
            # the last stage finished microbatch t-(S-1) (bubble if < 0)
            m_idx = t - (n_stages - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                acc, slot, jnp.clip(m_idx, 0, n_micro - 1), 0)
            acc = jnp.where(m_idx >= 0, upd, acc)
            slot = jax.lax.ppermute(slot, pipe_axis, perm)
            return (slot, acc), None

        (_, acc), _ = jax.lax.scan(tick, (slot0, acc0),
                                   jnp.arange(n_micro + n_stages - 1))
        out = acc.reshape(b_loc, *x0_loc.shape[1:])
        # only the last stage holds real trunk outputs; broadcast so the
        # replicated head sees them everywhere
        return jax.lax.psum(
            jnp.where(d == n_stages - 1, out, jnp.zeros_like(out)),
            pipe_axis)

    x0_spec = P(data_axis if has_data else None)
    trunk_sharded = _shard_map(trunk_device_fn, mesh=mesh,
                               in_specs=(P(pipe_axis), x0_spec, P()),
                               out_specs=x0_spec)

    def _loss_fn(parts, x, y, key):
        rest, stacked = parts
        k_head, k_trunk = jax.random.split(key)
        out = model.module.apply(
            {'params': rest}, x, None, training=True,
            rngs={'dropout': k_head},
            trunk_fn=lambda x0: trunk_sharded(stacked, x0, k_trunk))
        return lossf(y, out.astype(jnp.float32))

    def _step(parts, opt_state, x, y, key):
        l, g = jax.value_and_grad(_loss_fn)(parts, x, y, key)
        updates, opt_state = tx.update(g, opt_state, parts)
        return optax.apply_updates(parts, updates), opt_state, l

    rest0, stacked0 = split_params(params0)
    rep = NamedSharding(mesh, P())
    rest_sh = jax.tree.map(lambda _: rep, rest0)
    stk_sh = jax.tree.map(lambda _: NamedSharding(mesh, P(pipe_axis)),
                          stacked0)
    parts_sh = (rest_sh, stk_sh)
    x_sh = NamedSharding(mesh, P(data_axis) if has_data else P())
    st_sh = mirror_param_shardings(
        jax.eval_shape(tx.init, (rest0, stacked0)), (rest0, stacked0),
        parts_sh, rep)

    # no donation, like the other standalone step factories: callers may
    # inspect the old parts after a step (merge_params for eval etc.)
    step_j = jax.jit(_step, in_shardings=(parts_sh, st_sh, x_sh, x_sh, rep),
                     out_shardings=(parts_sh, st_sh, rep))
    lag_j = jax.jit(jax.value_and_grad(_loss_fn),
                    in_shardings=(parts_sh, x_sh, x_sh, rep),
                    out_shardings=(rep, parts_sh))

    def _validate(x, y):
        if np.ndim(x) != 5:
            raise ValueError('pipeline training takes spatio-temporal '
                             '[B, T, h, w, C] inputs (5-D), got '
                             f'{np.shape(x)}')
        b = x.shape[0]
        if b % n_data:
            raise ValueError(f'batch {b} not divisible by the {data_axis} '
                             f'axis size {n_data}')
        if (b // n_data) % n_micro:
            raise ValueError(f'per-data-shard batch {b // n_data} not '
                             f'divisible by n_micro={n_micro}')
        if np.shape(y)[0] != b:
            raise ValueError(f'target batch {np.shape(y)[0]} != {b}')

    def step(parts, opt_state, x, y, key):
        _validate(x, y)
        return step_j(parts, opt_state, jnp.asarray(x, jnp.float32),
                      jnp.asarray(y, jnp.float32), key)

    def loss_and_grads(parts, x, y, key):
        _validate(x, y)
        return lag_j(parts, jnp.asarray(x, jnp.float32),
                     jnp.asarray(y, jnp.float32), key)

    def init_opt(parts):
        return jax.device_put(jax.jit(tx.init)(parts), st_sh)

    return PipelineStep(step, loss_and_grads, init_opt, split_params,
                        merge_params, parts_sh, n_stages, n_micro)
