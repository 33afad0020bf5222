"""Analytic model-FLOPs counting by walking a function's jaxpr.

XLA's post-compile ``cost_analysis()['flops']`` on TPU reports the
*hardware* cost model — it includes the lanes wasted on padding small
channel counts up to the MXU's native tiling (a 64-channel conv pads both
contracting and output features to 128), so for narrow CNNs it can exceed
the model's mathematical FLOPs by an order of magnitude. For an honest MFU
("model FLOPs utilization", as used by the scaling literature) the numerator
must be the mathematical FLOPs. This module counts them from the jaxpr:
2·M·N·K per ``dot_general`` and 2·|out|·K_spatial·C_in/groups per
``conv_general_dilated``, recursing into pjit/scan/cond/while/custom-vjp
sub-jaxprs (scan body multiplied by its trip count).

Counting the *train step's* jaxpr directly includes the backward-pass convs
(they appear as first-class conv/dot equations after AD), so no fwd×3
heuristic is needed.
"""

import math

import jax

__all__ = ['count_flops', 'jaxpr_flops']


def _conv_flops(eqn):
    out = eqn.outvars[0].aval.shape
    dn = eqn.params['dimension_numbers']
    rhs = eqn.invars[1].aval.shape
    # kernel spatial dims; rhs input-feature dim is already per-group for
    # grouped/depthwise convs, so no division by feature_group_count needed
    k_spatial = math.prod(rhs[d] for d in dn.rhs_spec[2:])
    c_in = rhs[dn.rhs_spec[1]]
    # lhs-dilated (transposed) convs insert structural zeros between the
    # real samples: on average only k/prod(lhs_dilation) taps touch data,
    # so counting the full kernel would inflate mathematical FLOPs by the
    # stride product (verified 4x on a stride-2 conv_transpose)
    lhs_dil = math.prod(eqn.params.get('lhs_dilation') or (1,))
    return 2.0 * math.prod(out) * k_spatial * c_in / lhs_dil


def _dot_flops(eqn):
    ((lhs_c, _), (lhs_b, _)) = eqn.params['dimension_numbers']
    lhs = eqn.invars[0].aval.shape
    out = eqn.outvars[0].aval.shape
    k = math.prod(lhs[d] for d in lhs_c)
    return 2.0 * math.prod(out) * k


def jaxpr_flops(jaxpr):
    """Total mathematical FLOPs of all dot/conv equations in a (sub)jaxpr."""
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == 'conv_general_dilated':
            total += _conv_flops(eqn)
        elif prim == 'dot_general':
            total += _dot_flops(eqn)
        elif prim == 'scan':
            body = eqn.params['jaxpr'].jaxpr
            total += eqn.params['length'] * jaxpr_flops(body)
        elif prim == 'while':
            # trip count is data-dependent: count one body iteration
            total += jaxpr_flops(eqn.params['body_jaxpr'].jaxpr)
        elif prim == 'cond':
            total += max((jaxpr_flops(b.jaxpr)
                          for b in eqn.params['branches']), default=0.0)
        elif prim == 'pallas_call':
            # opaque kernel: use the analytic cost the author attached
            # (e.g. ops/pallas_convlstm attaches the LOGICAL conv FLOPs —
            # walking the kernel jaxpr would miscount: its time loop hides
            # the trip count and its band matmuls carry structural zeros)
            ce = eqn.params.get('cost_estimate')
            flops = getattr(ce, 'flops', None) if ce is not None else None
            if flops:
                total += float(flops)
            else:
                import warnings
                warnings.warn(
                    'pallas_call without a cost_estimate contributes 0 '
                    'FLOPs to the count — attach one for honest MFU',
                    RuntimeWarning, stacklevel=2)
        else:
            # generic recursion: pjit, closed_call, custom_jvp/vjp, remat...
            for v in eqn.params.values():
                if isinstance(v, jax.extend.core.ClosedJaxpr):
                    total += jaxpr_flops(v.jaxpr)
                elif hasattr(v, 'eqns'):  # raw Jaxpr
                    total += jaxpr_flops(v)
    return total


def count_flops(fn, *args, **kwargs):
    """Mathematical matmul/conv FLOPs of one call of `fn(*args, **kwargs)`.

    Works on any traceable function — including a full jitted train step,
    where the backward convs are counted exactly (AD has already inserted
    them as conv/dot equations). Elementwise/reduction FLOPs are ignored
    (they are not what an MXU roofline is about).
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return jaxpr_flops(closed.jaxpr)
