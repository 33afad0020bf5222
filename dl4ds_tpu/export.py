"""Portable serving artifacts via `jax.export` (StableHLO).

The reference ships trained models as TF SavedModels for serving
(reference: dl4ds/training/base.py:162-187 `save_results` → Keras
`model.save`). The TPU-native serving equivalent is an ahead-of-time
`jax.export` artifact: the jitted forward pass — with the trained
variables embedded as constants — is lowered to StableHLO (by default
with a SYMBOLIC batch dimension, so one artifact serves any batch size)
and serialized to a single binary blob. A serving process deserializes
and calls it without the model-building code; the StableHLO payload is
also consumable by non-JAX runtimes (IFRT/PJRT).

This complements `models.save_model` (architecture JSON + orbax
variables — the re-trainable representation); the export artifact is
the frozen inference representation.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['export_forward', 'save_serving_artifact',
           'load_serving_artifact']


def export_forward(model, variables, batch='poly', platforms=None,
                   spatial_size=None, quantize=None, calibration=None,
                   calibration_aux=None, calibration_quantile=None):
    """Export the model's inference forward as a `jax.export.Exported`.

    Args:
      model: a `DSModel` (any factory output).
      variables: its trained variables; embedded in the artifact as
        constants (a serving artifact is self-contained).
      batch: 'poly' for a symbolic batch dimension (one artifact, any
        batch size), or an int for a static batch.
      platforms: optional list of lowering platforms (e.g.
        ['tpu', 'cpu']). Default: the current default platform. Note the
        fused-ConvLSTM Pallas path is chosen at TRACE time from the
        default backend, so cross-platform exports of spatio-temporal
        models should be made from the platform they will serve on; with
        batch='poly' the symbolic batch dim cannot be kernel-tiled, so
        spatio-temporal exports always embed the XLA recurrence (pass a
        static `batch` to serve the fused kernel).
      spatial_size: optional (h, w) overriding the model's trace-time
        spatial dims — the models are fully convolutional, so a
        PATCH-trained model exports a FULL-GRID serving artifact by
        passing the serving grid size here (the aux input is scaled to
        match). Models with a LocalizedConvBlock are shape-bound and
        reject the override at trace time.
      quantize: None (default, float forward), 'int8' or 'weight-only' —
        freeze the `quantization.quantize_forward` replay instead of the
        float forward. At production widths int8 convs run ~2x on the
        MXU (INT8.json: ~1.7x model-level at width 64). Requires
        `calibration`; the exported program is SHAPE-PINNED to the
        calibration batch (batch='poly' is rejected — the int8 replay's
        reshape sites pin the batch size), so calibrate with the exact
        serving shape. `spatial_size` is likewise rejected: the
        calibration array IS the shape spec.
      calibration: representative input batch for `quantize` (defines
        the pinned export shapes).
      calibration_aux: HR-aux calibration batch when the model takes one.
      calibration_quantile: optional quantile-clipping calibration
        (see `quantization.quantize_forward`).

    Returns the `Exported`; call it with `exp.call(x[, aux])`, serialize
    with `exp.serialize()`.
    """
    from jax import export as jexport

    if quantize is not None:
        return _export_quantized(model, variables, batch=batch,
                                 platforms=platforms,
                                 spatial_size=spatial_size, mode=quantize,
                                 calibration=calibration,
                                 calibration_aux=calibration_aux,
                                 calibration_quantile=calibration_quantile)

    dtype = jnp.float32
    if batch == 'poly':
        (b,) = jexport.symbolic_shape('b')
    else:
        b = int(batch)
    in_shape = tuple(model.input_shape)
    aux_shape = (tuple(model.aux_shape)
                 if model.aux_shape is not None else None)
    if spatial_size is not None:
        h, w = map(int, spatial_size)
        in_shape = (*in_shape[:-3], h, w, in_shape[-1])
        if aux_shape is not None:
            # aux lives on the HR(-output) grid; keep its scale factor
            s = model.aux_shape[-3] // model.input_shape[-3]
            aux_shape = (h * s, w * s, aux_shape[-1])
    x_spec = jax.ShapeDtypeStruct((b, *in_shape), dtype)
    aux_spec = (jax.ShapeDtypeStruct((b, *aux_shape), dtype)
                if aux_shape is not None else None)

    kwargs = {} if platforms is None else {'platforms': list(platforms)}
    if aux_spec is not None:
        def fn(x, aux):
            return model.module.apply(variables, x, aux, training=False)
        return jexport.export(jax.jit(fn), **kwargs)(x_spec, aux_spec)

    def fn(x):
        return model.module.apply(variables, x, None, training=False)
    return jexport.export(jax.jit(fn), **kwargs)(x_spec)


def _export_quantized(model, variables, batch, platforms, spatial_size,
                      mode, calibration, calibration_aux,
                      calibration_quantile):
    """Freeze the int8/weight-only replay (see `export_forward`)."""
    from jax import export as jexport
    from .quantization import quantize_forward

    if calibration is None:
        raise ValueError(f"quantize={mode!r} needs a calibration batch "
                         "(it defines the pinned export shapes)")
    if spatial_size is not None:
        raise ValueError('spatial_size cannot combine with quantize=; the '
                         'calibration array defines the export shapes '
                         '(calibrate on full grids to export a full-grid '
                         'artifact)')
    calibration = jnp.asarray(calibration, jnp.float32)
    if batch == 'poly':
        raise ValueError(
            "the int8 replay is shape-pinned (reshape sites pin the batch "
            "size): pass batch=calibration.shape[0] "
            f"(= {calibration.shape[0]}) and serve at that batch "
            "(dl4ds_tpu.serve pads/chunks requests to a pinned batch)")
    if int(batch) != calibration.shape[0]:
        raise ValueError(f'batch={batch} != calibration batch '
                         f'{calibration.shape[0]}; the quantized replay '
                         'serves exactly the calibration shape')
    qf = quantize_forward(model, variables, calibration,
                          calibration_aux=calibration_aux, mode=mode,
                          calibration_quantile=calibration_quantile)
    x_spec = jax.ShapeDtypeStruct(calibration.shape, jnp.float32)
    kwargs = {} if platforms is None else {'platforms': list(platforms)}
    if calibration_aux is not None:
        aux_spec = jax.ShapeDtypeStruct(jnp.shape(calibration_aux),
                                        jnp.float32)

        def fn(x, aux):
            return qf(x, aux)
        return jexport.export(jax.jit(fn), **kwargs)(x_spec, aux_spec)

    def fn(x):
        return qf(x)
    return jexport.export(jax.jit(fn), **kwargs)(x_spec)


def save_serving_artifact(model, variables, path, batch='poly',
                          platforms=None, spatial_size=None, quantize=None,
                          calibration=None, calibration_aux=None,
                          calibration_quantile=None):
    """Export + serialize to `path/` (forward.jaxexport + meta JSON).

    `spatial_size=(h, w)` exports a full-grid artifact from a
    patch-trained model; `quantize='int8'` freezes the calibrated int8
    replay instead of the float forward (see `export_forward` for both).
    Returns the on-disk size of the artifact in bytes.
    """
    exp = export_forward(model, variables, batch=batch, platforms=platforms,
                         spatial_size=spatial_size, quantize=quantize,
                         calibration=calibration,
                         calibration_aux=calibration_aux,
                         calibration_quantile=calibration_quantile)
    blob = exp.serialize()
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, 'forward.jaxexport'), 'wb') as fh:
        fh.write(blob)
    in_shape = list(model.input_shape)
    aux_shape = (list(model.aux_shape)
                 if model.aux_shape is not None else None)
    if quantize is not None:
        # the calibration array IS the exported signature (spatial dims
        # are free in quantize_forward; batch is checked == `batch`)
        in_shape = list(np.shape(calibration)[1:])
        if calibration_aux is not None:
            aux_shape = list(np.shape(calibration_aux)[1:])
    if spatial_size is not None:
        h, w = int(spatial_size[0]), int(spatial_size[1])
        in_shape = in_shape[:-3] + [h, w] + in_shape[-1:]
        if aux_shape is not None:
            # keep the meta consistent with the exported aux signature
            sf = model.aux_shape[-3] // model.input_shape[-3]
            aux_shape = [h * sf, w * sf, aux_shape[-1]]
    meta = {
        'name': model.name,
        'input_shape': in_shape,
        'aux_shape': aux_shape,
        'batch': batch,
        'platforms': list(exp.platforms),
        'jax_version': jax.__version__,
        'quantize': quantize,
    }
    with open(os.path.join(path, 'serving_meta.json'), 'w') as fh:
        json.dump(meta, fh, indent=2)
    return len(blob)


def load_serving_artifact(path):
    """Deserialize a `save_serving_artifact` directory.

    Returns (call, meta): `call(x[, aux])` runs the frozen forward
    (jit-compiled on first use); `meta` is the saved JSON dict.
    """
    from jax import export as jexport

    with open(os.path.join(path, 'forward.jaxexport'), 'rb') as fh:
        exp = jexport.deserialize(fh.read())
    with open(os.path.join(path, 'serving_meta.json')) as fh:
        meta = json.load(fh)

    def call(x, aux=None):
        x = jnp.asarray(x, jnp.float32)
        if aux is not None:
            return exp.call(x, jnp.asarray(aux, jnp.float32))
        return exp.call(x)

    return call, meta
