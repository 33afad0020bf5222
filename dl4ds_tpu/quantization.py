"""Int8 post-training quantization for serving.

TPU MXUs run int8 x int8 -> int32 at twice the bf16 FLOP rate (v5e:
~394 TOPS vs ~197 TFLOPS), so a quantized forward can nearly double
serving throughput on MXU-bound (production-width) models. The reference
has no quantization story (it serves f32 SavedModels,
dl4ds/training/base.py:162-187); this is a TPU-native extra.

The transform is jaxpr-level, so it works on EVERY model family without
touching the model code:

  1. `jax.make_jaxpr` traces the trained forward (variables embedded).
  2. A calibration interpreter replays the jaxpr on representative
     inputs and records, per convolution site, the max |activation|.
  3. The quantized forward replays the same jaxpr but executes each
     convolution as s8 x s8 -> s32: activations quantized per-tensor with
     the calibrated scale, weights per-output-channel; the s32 result is
     rescaled back to the float dtype. Everything else (bias adds, norms,
     attention gates, pixel shuffles) runs unchanged in float.

Weight-only mode (`mode='weight-only'`) dequantizes the int8 weights
back to float at each site — no activation clipping anywhere, float
conv math — for when the ~2x matmul rate matters less than exactness.

Scope: convolutions (incl. separable, depthwise, transposed — they are
all `conv_general_dilated`, and convs inside remat/pjit bodies are
reached) are quantized; `dot_general`s (the per-pixel LCB einsum,
attention squeeze) stay float — they are a rounding error of these
models' FLOPs. Convs inside loop/kernel primitives (`lax.scan` bodies —
the ConvLSTM recurrence at time_window > 16 — and Pallas calls) also
stay float: their inner jaxprs take carries/refs, not the eqn inputs,
so they are replayed as-is (see _CALL_LIKE).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.extend import core as jcore


def _safe_map(f, *xs):
    lengths = {len(x) for x in xs}
    assert len(lengths) == 1, f'length mismatch: {lengths}'
    return list(map(f, *xs))

__all__ = ['quantize_forward', 'QuantizedForward']

_CONV = 'conv_general_dilated'

# Below this conv width (min(Cin, Cout) of the widest conv site), the s8
# MXU path measures SLOWER than bf16 on v5e — see INT8.json (1.7x at 64)
# and INFER.json (0.759x at the tutorial width-8 regime).
_INT8_MIN_WIDTH = 64

# call-like primitives whose body executes ONCE with the eqn's own invals
# — safe to replay inline. Loop/kernel primitives (scan, while, pallas_call)
# do NOT qualify: their inner jaxprs take per-iteration carries/refs, not
# the eqn inputs, so they are default-bound and any convs inside them stay
# float (the scan-path ConvLSTM recurrence is conv-over-carry; the fused
# Pallas kernel has no conv eqns at all).
_CALL_LIKE = ('pjit', 'remat2', 'checkpoint', 'closed_call', 'core_call',
              'custom_jvp_call', 'custom_vjp_call', 'custom_vjp_call_jaxpr')


def _subjaxprs(eqn):
    """Inner jaxprs of call-like eqns (pjit, remat2, custom_jvp, ...) in
    a uniform (jaxpr, consts) form."""
    if eqn.primitive.name not in _CALL_LIKE:
        return None, None
    for name in ('jaxpr', 'call_jaxpr'):
        sub = eqn.params.get(name)
        if sub is None:
            continue
        if isinstance(sub, jcore.ClosedJaxpr):
            return sub.jaxpr, sub.consts
        return sub, []
    return None, None


def _walk(jaxpr, consts, args, on_conv):
    """Replay `jaxpr` eagerly/traceably, dispatching conv eqns to
    `on_conv(site_index, eqn, invals)`. Recurses into call-like eqns so
    convs inside remat/pjit bodies are found too; site numbering is the
    traversal order, shared between calibration and quantized replay."""
    env = {}
    # last-use index per var: eager replay would otherwise keep EVERY
    # intermediate activation alive for the whole walk (OOMs on large
    # serving batches); vars are SSA so a var read for the last time at
    # eqn i can be dropped right after it executes
    last_use = {}
    for i, eqn in enumerate(jaxpr.eqns):
        for v in eqn.invars:
            if not isinstance(v, jcore.Literal):
                last_use[v] = i
    for v in jaxpr.outvars:
        if not isinstance(v, jcore.Literal):
            last_use[v] = len(jaxpr.eqns)

    def read(v):
        return v.val if isinstance(v, jcore.Literal) else env[v]

    def write(v, val):
        env[v] = val

    _safe_map(write, jaxpr.constvars, consts)
    _safe_map(write, jaxpr.invars, args)
    for v in list(env):
        if v not in last_use:
            del env[v]
    for i, eqn in enumerate(jaxpr.eqns):
        invals = _safe_map(read, eqn.invars)
        sub, sub_consts = _subjaxprs(eqn)
        if eqn.primitive.name == _CONV:
            outvals = [on_conv(eqn, invals)]
        elif sub is not None:
            outvals = _walk(sub, sub_consts, invals, on_conv)
        else:
            subfuns, bind_params = eqn.primitive.get_bind_params(eqn.params)
            outvals = eqn.primitive.bind(*subfuns, *invals, **bind_params)
            if not eqn.primitive.multiple_results:
                outvals = [outvals]
        _safe_map(write, eqn.outvars, outvals)
        for v in eqn.invars:
            if not isinstance(v, jcore.Literal) and last_use.get(v) == i:
                env.pop(v, None)
        for v in eqn.outvars:
            if v not in last_use:
                env.pop(v, None)
    return _safe_map(read, jaxpr.outvars)


def _quantize_weights(w, dn_rhs_spec):
    """Per-output-channel symmetric int8 quantization of a conv kernel.
    Returns (w_int8, scale) with scale shaped to broadcast over the
    conv output's feature dim."""
    co_dim = dn_rhs_spec[0]     # rhs out-feature dimension index
    reduce_dims = tuple(d for d in range(w.ndim) if d != co_dim)
    absmax = jnp.max(jnp.abs(w), axis=reduce_dims, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def _requant_scale(x_scale, w_scale, eqn):
    """Broadcastable output rescale factor s_x * s_w[co] for the conv's
    output layout."""
    dn = eqn.params['dimension_numbers']
    co_dim_rhs = dn.rhs_spec[0]
    out_feature_dim = dn.out_spec[1]
    w_s = jnp.squeeze(w_scale)          # [co]
    shape = [1] * len(dn.out_spec)
    shape[out_feature_dim] = w_s.shape[0] if w_s.ndim else 1
    return x_scale * w_s.reshape(shape)


def quantize_forward(model, variables, calibration, calibration_aux=None,
                     mode='int8', calibration_quantile=None):
    """Build a quantized serving forward for any `DSModel`.

    Args:
      model: a model factory output (`DSModel`).
      variables: trained variables (embedded as constants).
      calibration: representative input batch `[B, ...model.input_shape]`
        (e.g. a few training/validation batches) used to record per-site
        activation ranges.
      calibration_aux: HR-aux calibration batch when the model takes one.
      mode: 'int8' (s8 x s8 -> s32 convs, activation + weight
        quantization) or 'weight-only' (int8 weights dequantized to
        float at each site; float conv math, no activation clipping).
      calibration_quantile: None -> absmax calibration. A value like
        0.999 clips each site's range at that quantile of |activation|
        instead — robust to outliers (the few clipped values saturate at
        +-127 while the other 8-bit codes resolve the bulk finer).

    Returns a `QuantizedForward`; call it like the model
    (`qf(x[, aux])`), jit-compatible. The replayed program is fixed to
    the calibration batch's shapes (reshape sites pin the batch size) —
    calibrate with the batch shape you will serve.
    """
    if mode not in ('int8', 'weight-only'):
        raise ValueError(f"mode must be 'int8' or 'weight-only', got "
                         f'{mode!r}')
    if calibration_quantile is not None and not (
            0.5 < calibration_quantile <= 1.0):
        raise ValueError('calibration_quantile must be in (0.5, 1.0]')
    calibration = jnp.asarray(calibration, jnp.float32)
    has_aux = model.aux_shape is not None
    if has_aux and calibration_aux is None:
        raise ValueError('model takes an aux input; pass calibration_aux')
    # the models are fully convolutional: any spatial size works (a
    # patch-trained model quantizes for full-grid serving by calibrating
    # on full grids); rank, channel count (and T for 5-D) must match
    mshape = tuple(model.input_shape)
    cshape = calibration.shape[1:]
    if (len(cshape) != len(mshape) or cshape[-1] != mshape[-1]
            or cshape[:-3] != mshape[:-3]):
        raise ValueError(
            f'calibration shape {cshape} incompatible with model input '
            f'shape {mshape} (rank, channels and time dims must match; '
            f'spatial dims are free)')
    if has_aux:
        ashape = np.shape(calibration_aux)[1:]
        if (len(ashape) != len(model.aux_shape)
                or ashape[-1] != model.aux_shape[-1]):
            raise ValueError(
                f'calibration_aux shape {ashape} incompatible with model '
                f'aux shape {tuple(model.aux_shape)}')

    def fwd(x, aux):
        return model.module.apply(variables, x, aux, training=False)

    aux_arg = (jnp.asarray(calibration_aux, jnp.float32)
               if has_aux else None)
    closed = jax.make_jaxpr(fwd)(calibration, aux_arg)
    jaxpr, consts = closed.jaxpr, closed.consts

    # --- calibration pass: record per-site activation absmax -----------
    # absmax values stay on device (eager dispatch is async); ONE stacked
    # readback at the end instead of a per-site device sync — on the
    # tunneled TPU every scalar fetch is a remote RPC
    act_absmax = []
    site_widths = []

    def record(eqn, invals):
        x, w = invals
        a = jnp.abs(x.astype(jnp.float32))
        stat = (jnp.max(a) if calibration_quantile is None
                else jnp.quantile(a.ravel(), calibration_quantile))
        act_absmax.append(stat)
        dn = eqn.params['dimension_numbers']
        site_widths.append(min(w.shape[dn.rhs_spec[0]],
                               w.shape[dn.rhs_spec[1]]))
        subfuns, bind_params = eqn.primitive.get_bind_params(eqn.params)
        return eqn.primitive.bind(*subfuns, x, w, **bind_params)

    args = [calibration] + ([aux_arg] if has_aux else [])
    _walk(jaxpr, consts, args, record)
    if not act_absmax:
        raise ValueError('no convolutions found in the forward — nothing '
                         'to quantize')
    # Regime check, derived from this repo's own chip measurements
    # (INT8.json / INFER.json): int8 convs only beat bf16 once the MXU
    # contraction is wide enough — width-64 models measure 1.7x, but the
    # tutorial width (n_filters=8) measures 0.759x, i.e. SLOWER. Width
    # proxy: the widest conv's min(Cin, Cout) — n_filters for every zoo
    # family (head/tail convs have one narrow side and never dominate).
    width = max(site_widths)
    if mode == 'int8' and width < _INT8_MIN_WIDTH:
        import warnings
        warnings.warn(
            f'int8 quantization of a width-{width} model: on TPU v5e the '
            f'int8 conv path only pays off at width >= {_INT8_MIN_WIDTH} '
            f'(measured: 1.7x at width 64, 0.76x — SLOWER than bf16 — at '
            f'width 8; INT8.json/INFER.json). Expect a slowdown; use '
            f"mode='weight-only' (float math, int8 storage) or serve "
            f'bf16 instead.', RuntimeWarning, stacklevel=2)
    act_scales = [max(float(a), 1e-12) / 127.0
                  for a in np.asarray(jnp.stack(act_absmax))]

    # --- quantized replay ----------------------------------------------
    def run(x, aux=None):
        site = [0]

        def on_conv(eqn, invals):
            i = site[0]
            site[0] += 1
            xv, w = invals
            out_dtype = xv.dtype
            dn = eqn.params['dimension_numbers']
            w_q, w_scale = _quantize_weights(w, dn.rhs_spec)
            params = dict(eqn.params)
            subfuns, bind_params = eqn.primitive.get_bind_params(params)
            if mode == 'weight-only':
                w_dq = (w_q.astype(out_dtype) * w_scale.astype(out_dtype))
                return eqn.primitive.bind(*subfuns, xv, w_dq, **bind_params)
            s_x = jnp.asarray(act_scales[i], jnp.float32)
            x_q = jnp.clip(jnp.round(xv.astype(jnp.float32) / s_x),
                           -127, 127).astype(jnp.int8)
            bind_params['preferred_element_type'] = jnp.int32
            y = eqn.primitive.bind(*subfuns, x_q, w_q, **bind_params)
            scale = _requant_scale(s_x, w_scale.astype(jnp.float32), eqn)
            return (y.astype(jnp.float32) * scale).astype(out_dtype)

        args = [jnp.asarray(x, jnp.float32)]
        if has_aux:
            if aux is None:
                raise ValueError('model takes an aux input; pass aux')
            args.append(jnp.asarray(aux, jnp.float32))
        outs = _walk(jaxpr, consts, args, on_conv)
        return outs[0] if len(outs) == 1 else tuple(outs)

    return QuantizedForward(run, n_sites=len(act_absmax),
                            act_scales=act_scales, mode=mode)


class QuantizedForward:
    """Callable quantized forward. `n_sites` = number of quantized convs;
    `act_scales` = the calibrated per-site activation scales."""

    def __init__(self, fn, n_sites, act_scales, mode):
        self._fn = fn
        self.n_sites = n_sites
        self.act_scales = act_scales
        self.mode = mode

    def __call__(self, x, aux=None):
        return self._fn(x, aux) if aux is not None else self._fn(x)
