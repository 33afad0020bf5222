"""Fully-fused Pallas TPU kernel for ConvLSTM layers.

Motivation (docs/ROOFLINE.md "rank-5 conv cliff" section): after flattening
all per-timestep work onto [B*T], the remaining cost of the spatio-temporal
configs is the recurrence itself — XLA emits ~6 small kernels per timestep
(recurrent conv, gate splits, two tanh/hard-sigmoid chains, state updates),
each with fixed launch/fusion-boundary overhead and an HBM round-trip for
h/c. At dl4ds state sizes ([128, 16, 16, 8]) that overhead dominates:
~45 us/step against a ~5 us roofline.

Design. One program per batch tile runs the WHOLE layer — input convolution,
recurrence, gates — keeping h and c in VMEM for the entire window. Three
ideas make this fast on the TPU's (8, 128) tiling:

1. LANE PACKING. Narrow channel counts (F=8) would waste 16x of every VMEM
   tile if kept in the minor dim, so a row of any state is the lane vector
   [W*F] (x-major, channel-minor) — a PURE RESHAPE of the NHWC array, so
   nothing on the XLA side ever transposes (transposes with a tiny minor
   dim hit the same lowering cliff the convs do; measured ~0.4 ms/layer
   when gate-packing was attempted outside the kernel).
2. BANDED MATMULS. The SAME convolutions (input and recurrent) become kh
   matmuls over rows — z[y] += src_pad[y+dy] @ BW[dy], where the
   [W*Cin, 4*W*F] band matrix BW[dy] carries the kw taps and the
   x-boundary zeros (the separable-matmul trick interpolation.py uses for
   resizing) — so the MXU contracts a full 128-wide K dim instead of K=8.
   The band matrices are built from the conv params by a tiny einsum whose
   cost measures as noise.
3. GATE-MAJOR CONV OUTPUT. The band matrices' column order is chosen
   (gate, x, channel), so each gate of the pre-activation z is a contiguous
   128-aligned lane slice — no shuffles, no strided extracts. Because the
   input conv is folded into the kernel, no input tensor ever needs that
   gate-major order materialized in HBM.

Both passes split into a sequential half and a T-parallel half. Forward:
the input conv (no sequential dependency) runs for the whole window as kh
T-batched matmuls before the loop; only the recurrent conv + gates iterate.
Backward: the BPTT loop carries just the dh/dc chain — gate derivatives
(pure VPU math on the SAVED pre-activations zs; nothing is recomputed) plus
the kh recurrent-band matmuls — while dx, the band-matrix gradients and the
bias gradient are emitted after the loop as kh T-batched contractions each
(f32 accumulation); the per-tap kernel gradients are folded out of the
bands afterwards in XLA.

Gate semantics match models/blocks.py:_ConvLSTMCell exactly (Keras
ConvLSTM2D defaults; reference layer: dl4ds/models/blocks.py:350-355):
    z = conv_same(x_t, wx) + bx + conv_same(h_{t-1}, wh)   # wh has no bias
    i, f, g-input, o split order; hard_sigmoid(x) = clip(0.2x + 0.5, 0, 1)
    c_t = f * c_{t-1} + i * tanh(z_c)
    h_t = o * tanh(c_t)
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

__all__ = ['fused_convlstm', 'convlstm_reference', 'dispatch_info']

# Per-program VMEM working-set budget (blocks + band matrices + scratch +
# single-step temporaries), with headroom for Mosaic's double buffering.
_VMEM_LIMIT_BYTES = 10 * 1024 * 1024


def _hard_sigmoid(x):
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def _d_hard_sigmoid(x):
    # compare-free formulation (Mosaic rejects several i1-vector layouts):
    # g(1-g) is zero exactly on the clipped regions and >= ~eps inside, so
    # saturating it to 1 recovers the 0/0.2 step without boolean vectors
    g = _hard_sigmoid(x).astype(jnp.float32)
    t = g * (1.0 - g)
    return (0.2 * jnp.minimum(t * 1e30, 1.0)).astype(x.dtype)


def convlstm_reference(x, wx, bx, wh):
    """Plain-XLA whole layer (also the numerical reference for tests).

    x: [B, T, H, W, Cin]; wx: [kh, kw, Cin, 4F] input-conv kernel;
    bx: [4F] input-conv bias; wh: [kh, kw, F, 4F] recurrent kernel.
    Returns (ys, cs): [B, T, H, W, F].
    """
    b, t, h, w, cin = x.shape
    f = wh.shape[2]
    dnx = jax.lax.conv_dimension_numbers((b, h, w, cin), wx.shape,
                                         ('NHWC', 'HWIO', 'NHWC'))
    dnh = jax.lax.conv_dimension_numbers((b, h, w, f), wh.shape,
                                         ('NHWC', 'HWIO', 'NHWC'))
    xm = x.reshape(b * t, h, w, cin)
    zx = jax.lax.conv_general_dilated(
        xm, wx.astype(x.dtype), (1, 1), 'SAME',
        dimension_numbers=dnx) + bx.astype(x.dtype)
    zx = zx.reshape(b, t, h, w, 4 * f)
    hh = jnp.zeros((b, h, w, f), x.dtype)
    cc = jnp.zeros((b, h, w, f), x.dtype)
    ys, cs = [], []
    for i in range(t):
        z = zx[:, i] + jax.lax.conv_general_dilated(
            hh, wh.astype(hh.dtype), (1, 1), 'SAME', dimension_numbers=dnh)
        zi, zf, zc, zo = jnp.split(z, 4, axis=-1)
        cc = (_hard_sigmoid(zf) * cc
              + _hard_sigmoid(zi) * jnp.tanh(zc)).astype(x.dtype)
        hh = (_hard_sigmoid(zo) * jnp.tanh(cc)).astype(x.dtype)
        ys.append(hh)
        cs.append(cc)
    return jnp.stack(ys, axis=1), jnp.stack(cs, axis=1)


# --------------------------------------------------------------------------
# Band-matrix construction (runs in XLA, outside the kernel; measured cost
# is noise — the arrays are a few hundred KB)
# --------------------------------------------------------------------------

def _x_selector(kw, w, w_valid=None):
    """S[dx, xi, xo] = 1 where input column xi feeds output column xo
    through tap dx of a SAME conv (xi = xo + dx - (kw-1)//2). With
    w_valid < w (lane-alignment padding), entries whose xi or xo lie in
    the padded tail are zeroed — this alone keeps the padded tail of the
    recurrent state (and of every BPTT gradient) EXACTLY zero: tail gate
    pre-activations are 0, so c,h start and stay 0 there, and zero band
    rows/cols mean nothing flows between tail and interior, which also
    reproduces the true SAME zero boundary at x = w_valid - 1."""
    pw = (kw - 1) // 2
    xo = jnp.arange(w)
    xi = xo[None, :] + jnp.arange(kw)[:, None] - pw        # [kw, w]
    sel = (xi[:, None, :] == jnp.arange(w)[None, :, None])  # [kw, xi, xo]
    sel = sel.astype(jnp.float32)
    if w_valid is not None and w_valid < w:
        valid = (jnp.arange(w) < w_valid).astype(jnp.float32)
        sel = sel * valid[None, :, None] * valid[None, None, :]
    return sel


def _band(wk, w, w_valid=None):
    """Conv kernel [kh, kw, Cin, 4F] -> band matrices BW [kh, W*Cin, 4*W*F]
    with rows (xi, cin) and cols (gate, xo, f): z_rows = sum_dy
    src_pad[y+dy] @ BW[dy] is the SAME conv with gate-major output lanes."""
    kh, kw, cin, f4 = wk.shape
    f = f4 // 4
    wk6 = wk.reshape(kh, kw, cin, 4, f).astype(jnp.float32)  # d x c g e
    s = _x_selector(kw, w, w_valid)                          # x i o
    big = jnp.einsum('xio,dxcge->dicgoe', s, wk6)
    return big.reshape(kh, w * cin, 4 * w * f)


def _unband(dbw, kh, kw, cin, f, w, w_valid=None):
    """Fold the band-matrix gradient [kh, W*Cin, 4*W*F] back to the per-tap
    conv-kernel gradient [kh, kw, Cin, 4F].

    precision=HIGHEST is load-bearing, not a tweak: measured on TPU
    (tools/unband_probe.py), the default-precision einsum is lowered as a
    convolution that (a) silently demotes to bf16 (maxdiff 2.8e-2 vs f64
    on f32 inputs — weight gradients deserve the f32 the backward
    accumulated) and (b) gets pattern-matched INTO the preceding
    weight-grad GEMM as a rank-6 small-minor fusion running 6x slower
    than the two ops separately (176 us vs ~29+29 at cin=F=16). Pinning
    HIGHEST keeps it f32 (maxdiff ~9e-7) AND faster (29.4/16.6 us per
    fold at F=16/F=8) — it also beat the jnp.diagonal and eye-mask
    reformulations the probe tried."""
    dbig = dbw.reshape(kh, w, cin, 4, w, f)                  # d i c g o e
    s = _x_selector(kw, w, w_valid)                          # x i o
    dwk6 = jnp.einsum('xio,dicgoe->dxcge', s, dbig,
                      precision=jax.lax.Precision.HIGHEST)
    return dwk6.reshape(kh, kw, cin, 4 * f)


def _band_bias(bx, w, w_valid=None):
    """bias [4F] -> packed gate-major lane bias [4*W*F] (zero on the
    lane-alignment tail so padded gate pre-activations stay exactly 0)."""
    f4 = bx.shape[0]
    f = f4 // 4
    bb = jnp.broadcast_to(bx.reshape(4, 1, f), (4, w, f))
    if w_valid is not None and w_valid < w:
        bb = bb * (jnp.arange(w) < w_valid).astype(bb.dtype)[None, :, None]
    return bb.reshape(4 * w * f)


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------

def _band_conv(src_ref, bw_ref, kh, h):
    """z[y] = sum_dy src[y+dy] @ BW[dy]; src_ref is the H-padded packed
    input [Bt, H+kh-1, W*C], bw_ref is [kh, W*C, N]. Operands stay in the
    model dtype (bf16 hits the MXU's fast path), accumulation is f32.
    Returns [Bt*H, N] f32."""
    bt = src_ref.shape[0]
    acc = None
    for dy in range(kh):
        sl = src_ref[:, dy:dy + h, :]
        part = jnp.dot(sl.reshape(bt * h, -1), bw_ref[dy],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _band_conv_bt(xp_ref, bw_ref, kh, h):
    """Batched-over-T band conv: xp_ref is [Bt, T, H+kh-1, W*C] (per-timestep
    H padding), bw_ref is [kh, W*C, N]. The whole window contracts as kh
    matmuls with M = Bt*T*H rows — T-fold larger MXU ops than the per-step
    version, possible exactly because the input conv has no sequential
    dependency. Returns [Bt*T*H, N] f32."""
    bt, t, _, _ = xp_ref.shape
    acc = None
    for dy in range(kh):
        sl = xp_ref[:, :, dy:dy + h, :]
        part = jnp.dot(sl.reshape(bt * t * h, -1), bw_ref[dy],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _fwd_kernel(t_steps, kh, x_ref, bwx_ref, bwh_ref, bb_ref,
                ys_ref, cs_ref=None, zs_ref=None, xp_ref=None, hp_ref=None,
                zx_ref=None):
    """Forward = one T-batched input conv + a sequential recurrence.

    Phase 1 computes zx = conv(x, wx) + bx for ALL timesteps as kh matmuls
    with M = Bt*T*H (the input conv has no sequential dependency — hoisting
    it out of the loop cuts the per-step matmul count from 2*kh to kh and
    makes the hoisted ones T-fold larger). The result lands in zs_ref (the
    backward residual, when training) or the zx_ref scratch (inference).
    Phase 2 runs only the inherently sequential work per step: the
    recurrent band conv + gate algebra.
    """
    bt, _, h, _ = x_ref.shape
    wf = ys_ref.shape[-1]
    ph = (kh - 1) // 2
    dt = x_ref.dtype
    xp_ref[:] = jnp.zeros_like(xp_ref)
    hp_ref[:] = jnp.zeros_like(hp_ref)
    zbuf = zs_ref if zs_ref is not None else zx_ref

    xp_ref[:, :, ph:ph + h, :] = x_ref[:]
    zx = _band_conv_bt(xp_ref, bwx_ref, kh, h)          # [Bt*T*H, 4WF] f32
    # bias folded in here (matches convlstm_reference, which also forms
    # zx = conv + bias before the recurrence)
    zbuf[:] = (zx.astype(dt) + bb_ref[0]).reshape(zbuf.shape)

    def step(i, cc):
        # gate algebra in the model dtype — matches the XLA recurrence
        # (which also runs bf16 for bf16 models) and doubles VPU throughput
        z = zbuf[:, pl.ds(i, 1)][:, 0] \
            + _band_conv(hp_ref, bwh_ref, kh, h).astype(dt) \
            .reshape(bt, h, 4 * wf)
        if zs_ref is not None:
            zs_ref[:, pl.ds(i, 1)] = z[:, None]
        zi = z[..., :wf]
        zf = z[..., wf:2 * wf]
        zc = z[..., 2 * wf:3 * wf]
        zo = z[..., 3 * wf:]
        cc = _hard_sigmoid(zf) * cc + _hard_sigmoid(zi) * jnp.tanh(zc)
        hh = _hard_sigmoid(zo) * jnp.tanh(cc)
        hp_ref[:, ph:ph + h, :] = hh
        ys_ref[:, pl.ds(i, 1)] = hh[:, None]
        if cs_ref is not None:
            cs_ref[:, pl.ds(i, 1)] = cc[:, None]
        return cc

    jax.lax.fori_loop(0, t_steps, step, jnp.zeros((bt, h, wf), dt))


def _bwd_seq_kernel(t_steps, kh, zs_ref, cs_ref, dys_ref, bwhT_ref,
                    dzs_ref):
    """Sequential half of BPTT ONLY: the dh/dc chain — gate derivatives
    (VPU math on the saved pre-activations) plus the kh recurrent-band
    matmuls that push dh into step i-1 — emitting each step's dz to the
    dzs OUTPUT ([Bt, T, H+kh-1, 4WF], per-timestep H padding, zero pad
    rows). Everything T-parallel (dx, dBWx, dBWh, dbb) runs AFTERWARDS as
    plain-XLA batched GEMMs over the whole window (see _backward_split).

    Splitting exists because the all-in-one backward's VMEM working set is
    dominated by the f32 band-GRADIENT output blocks (2 x [W*C, 4*W*F]) +
    both transposed band operands — what retires the fused path at
    cin=F=16 (docs/ROOFLINE.md wide-F crossover). This kernel only holds
    bwhT + per-step blocks, so the fused forward + fused sequential
    backward extend exactly into that valley; the hoisted contractions are
    big healthy GEMMs XLA runs near its conv roofline anyway (the one HBM
    round-trip for dzs is a few MB against a multi-GFLOP tail)."""
    bt, _, h, _ = zs_ref.shape
    wf = cs_ref.shape[-1]
    ph = (kh - 1) // 2
    dt = zs_ref.dtype
    dzs_ref[:] = jnp.zeros_like(dzs_ref)
    zero_state = jnp.zeros((bt, h, wf), dt)

    def step(j, carry):
        dh_next, dc_next = carry
        i = t_steps - 1 - j
        i_prev = jnp.maximum(i - 1, 0)
        first = (i == 0)
        c_prev = jnp.where(first, zero_state,
                           cs_ref[:, pl.ds(i_prev, 1)][:, 0])
        z = zs_ref[:, pl.ds(i, 1)][:, 0]
        zi = z[..., :wf]
        zf = z[..., wf:2 * wf]
        zc = z[..., 2 * wf:3 * wf]
        zo = z[..., 3 * wf:]
        gi = _hard_sigmoid(zi)
        gf = _hard_sigmoid(zf)
        gg = jnp.tanh(zc)
        go = _hard_sigmoid(zo)
        cc = cs_ref[:, pl.ds(i, 1)][:, 0]
        tc = jnp.tanh(cc)
        one = jnp.asarray(1.0, dt)
        dh = dys_ref[:, pl.ds(i, 1)][:, 0] + dh_next
        do = dh * tc
        dc = dh * go * (one - tc * tc) + dc_next
        dzi = dc * gg * _d_hard_sigmoid(zi)
        dzf = dc * c_prev * _d_hard_sigmoid(zf)
        dzc = dc * gi * (one - gg * gg)
        dzo = do * _d_hard_sigmoid(zo)
        dz = jnp.concatenate([dzi, dzf, dzc, dzo], axis=-1)  # [Bt,H,4WF]
        dzs_ref[:, pl.ds(i, 1), ph:ph + h, :] = dz[:, None]
        wf4 = 4 * wf
        acc_h = None
        for dy in range(kh):
            off = kh - 1 - dy
            sl = dzs_ref[:, pl.ds(i, 1), off:off + h, :][:, 0] \
                .reshape(bt * h, wf4)
            part = jnp.dot(sl, bwhT_ref[dy],
                           preferred_element_type=jnp.float32)
            acc_h = part if acc_h is None else acc_h + part
        return acc_h.astype(dt).reshape(bt, h, wf), dc * gf

    jax.lax.fori_loop(0, t_steps, step, (zero_state, zero_state))


def _bwd_kernel(t_steps, kh, x_ref, zs_ref, ys_ref,
                cs_ref, dys_ref, bwxT_ref, bwhT_ref,
                dx_ref, dbwx_ref, dbwh_ref, dbb_ref, xp_ref, hp_ref,
                dzs_ref):
    """Mirrored BPTT, split into its sequential and T-parallel halves.

    The LOOP carries only what is inherently sequential: the dh/dc chain —
    gate derivatives (VPU) plus the kh recurrent-band matmuls that push dh
    into step i-1. Each step's dz lands in the dzs_ref scratch
    ([Bt, T, H+kh-1, 4WF], per-timestep H padding).

    Everything with no sequential dependency — dx (input dgrad), dBWx and
    dBWh (weight grads), and the bias grad — is then computed AFTER the
    loop as kh T-batched matmuls each (M = Bt*T*H rows), instead of 3*kh
    small matmuls with VMEM read-modify-write accumulators inside every
    step. Same FLOPs, 4x fewer sequential MXU ops, T-fold larger hoisted
    ones. (dBWh batches because h_prev comes from the SAVED ys, not from
    the loop carry.)
    """
    bt, _, h, _ = x_ref.shape
    wf = ys_ref.shape[-1]
    wf4 = 4 * wf
    ph = (kh - 1) // 2
    dt = x_ref.dtype
    xp_ref[:] = jnp.zeros_like(xp_ref)
    hp_ref[:] = jnp.zeros_like(hp_ref)
    dzs_ref[:] = jnp.zeros_like(dzs_ref)
    zero_state = jnp.zeros((bt, h, wf), dt)

    def step(j, carry):
        dh_next, dc_next = carry
        i = t_steps - 1 - j
        i_prev = jnp.maximum(i - 1, 0)
        first = (i == 0)
        h_prev = jnp.where(first, zero_state,
                           ys_ref[:, pl.ds(i_prev, 1)][:, 0])
        c_prev = jnp.where(first, zero_state,
                           cs_ref[:, pl.ds(i_prev, 1)][:, 0])
        hp_ref[:, pl.ds(i, 1), ph:ph + h, :] = h_prev[:, None]
        z = zs_ref[:, pl.ds(i, 1)][:, 0]
        zi = z[..., :wf]
        zf = z[..., wf:2 * wf]
        zc = z[..., 2 * wf:3 * wf]
        zo = z[..., 3 * wf:]
        gi = _hard_sigmoid(zi)
        gf = _hard_sigmoid(zf)
        gg = jnp.tanh(zc)
        go = _hard_sigmoid(zo)
        cc = cs_ref[:, pl.ds(i, 1)][:, 0]
        tc = jnp.tanh(cc)
        one = jnp.asarray(1.0, dt)
        dh = dys_ref[:, pl.ds(i, 1)][:, 0] + dh_next
        do = dh * tc
        dc = dh * go * (one - tc * tc) + dc_next
        dzi = dc * gg * _d_hard_sigmoid(zi)
        dzf = dc * c_prev * _d_hard_sigmoid(zf)
        dzc = dc * gi * (one - gg * gg)
        dzo = do * _d_hard_sigmoid(zo)
        dz = jnp.concatenate([dzi, dzf, dzc, dzo], axis=-1)  # [Bt,H,4WF]
        dzs_ref[:, pl.ds(i, 1), ph:ph + h, :] = dz[:, None]
        # sequential half of the dgrad: dh_{i-1} through the recurrent band
        acc_h = None
        for dy in range(kh):
            off = kh - 1 - dy
            sl = dzs_ref[:, pl.ds(i, 1), off:off + h, :][:, 0] \
                .reshape(bt * h, wf4)
            part = jnp.dot(sl, bwhT_ref[dy],
                           preferred_element_type=jnp.float32)
            acc_h = part if acc_h is None else acc_h + part
        return acc_h.astype(dt).reshape(bt, h, wf), dc * gf

    jax.lax.fori_loop(0, t_steps, step, (zero_state, zero_state))

    # ---- T-parallel half: everything below batches over the whole window
    xp_ref[:, :, ph:ph + h, :] = x_ref[:]
    # dx[y] = sum_dy dz_pad[y + (kh-1-dy)] @ BWx[dy]^T
    acc_x = None
    for dy in range(kh):
        off = kh - 1 - dy
        sl = dzs_ref[:, :, off:off + h, :].reshape(bt * t_steps * h, wf4)
        part = jnp.dot(sl, bwxT_ref[dy],
                       preferred_element_type=jnp.float32)
        acc_x = part if acc_x is None else acc_x + part
    dx_ref[:] = acc_x.astype(dt).reshape(dx_ref.shape)
    # weight/bias grads: one contraction over (Bt*T*H) per tap
    dz_all = dzs_ref[:, :, ph:ph + h, :].reshape(bt * t_steps * h, wf4)
    dbb_ref[0] = jnp.sum(dz_all.astype(jnp.float32), axis=0, keepdims=True)
    for dy in range(kh):
        slx = xp_ref[:, :, dy:dy + h, :]
        dbwx_ref[0, dy] = jax.lax.dot_general(
            slx.reshape(bt * t_steps * h, -1), dz_all,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        slh = hp_ref[:, :, dy:dy + h, :]
        dbwh_ref[0, dy] = jax.lax.dot_general(
            slh.reshape(bt * t_steps * h, -1), dz_all,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# VMEM sizing / dispatch
# --------------------------------------------------------------------------

def _lane_pad(c):
    """VMEM tiles always occupy full 128-wide lanes in the minor dim."""
    return -(-c // 128) * 128


def _budget(bt, t, h, w, cin, f, kh, itemsize):
    """Backward-program VMEM bytes (the larger of the two programs)."""
    wc = _lane_pad(w * cin)
    wf = _lane_pad(w * f)
    wf4 = _lane_pad(4 * w * f)
    hp = h + kh - 1
    blocks = bt * t * h * (2 * wc + 3 * wf + 2 * wf4) * itemsize
    bands = kh * (w * cin + w * f) * (4 * w * f) * 4 * 3
    # whole-window scratch (xp_all + hp_all + dzs, per-timestep H padding)
    scratch = bt * t * hp * (wc + wf + wf4) * itemsize
    # loop-body temporaries + the post-loop T-batched f32 accumulators
    # (acc_x [Bt*T*H, wc] and the f32 view of dz_all for the bias grad)
    stack = bt * h * (6 * wf4 + 6 * wf) * 4 + bt * t * h * (wc + wf4) * 4
    return blocks + bands + scratch + stack


def _budget_fwd(bt, t, h, w, cin, f, kh, itemsize):
    """Forward-program VMEM bytes (for the SPLIT-backward path only — the
    full-fused path keeps sizing both programs by `_budget` so its proven
    narrow-width batch tiles never change)."""
    wc = _lane_pad(w * cin)
    wf = _lane_pad(w * f)
    wf4 = _lane_pad(4 * w * f)
    hp = h + kh - 1
    # io blocks (x in; ys/cs/zs out), x2 for Mosaic's double buffering
    blocks = 2 * bt * t * h * (wc + 2 * wf + wf4) * itemsize
    bands = 2 * kh * (w * cin + w * f) * (4 * w * f) * itemsize
    # xp_all + per-step hp scratch + the zx scratch of the inference
    # variant (larger than the training one, which reuses zs)
    scratch = (bt * t * hp * wc + bt * hp * wf
               + bt * t * h * wf4) * itemsize
    # phase-1 f32 band-conv accumulator + per-step temporaries
    stack = bt * t * h * wf4 * 4 + bt * h * 8 * wf4 * 4
    return blocks + bands + scratch + stack


def _budget_seqbwd(bt, t, h, w, cin, f, kh, itemsize):
    """Sequential-BPTT-program VMEM bytes (split-backward path): only the
    transposed recurrent band + per-step blocks — no band-gradient output
    blocks, which is the whole point of the split."""
    wf = _lane_pad(w * f)
    wf4 = _lane_pad(4 * w * f)
    hp = h + kh - 1
    blocks = 2 * bt * t * (h * (wf4 + 2 * wf) + hp * wf4) * itemsize
    bands = 2 * kh * (4 * w * f) * (w * f) * itemsize
    stack = bt * h * (8 * wf4 + 6 * wf) * 4
    return blocks + bands + stack


def _pick_batch_tile(b, t, h, w, cin, f, kh, itemsize, budget=None):
    """Largest divisor-of-b batch tile (capped at 32 to keep Mosaic's
    load/compute pipelining across the grid) whose working set fits the
    budget, or None if even a single sample does not fit."""
    budget = budget or _budget
    if budget(1, t, h, w, cin, f, kh, itemsize) > _VMEM_LIMIT_BYTES:
        return None
    bt = min(b, 32)
    while bt > 1 and (budget(bt, t, h, w, cin, f, kh, itemsize)
                      > _VMEM_LIMIT_BYTES or b % bt != 0):
        bt -= 1
    return bt


def _cost(b, t, h, w_pad, w_logical, wc, wf, kh, kw, bwd,
          residuals=True):
    """Analytic LOGICAL cost of the fused layer (what an MFU numerator
    wants): SAME-conv FLOPs of the input + recurrent convs over the window
    at the TRUE width (wc/w_pad = Cin, wf/w_pad = F; lane-alignment padding
    is implementation detail), x2 for the backward (weight-grad +
    input-grad per conv). The band matmuls' structural zeros and the VMEM
    scratch traffic are likewise deliberately not counted."""
    cin = wc // w_pad
    f = wf // w_pad
    conv = 2 * b * t * h * w_logical * kh * kw * (cin + f) * 4 * f
    io = b * t * h * (wc + (2 * wf + 4 * wf if residuals else wf)) * 4
    return pl.CostEstimate(flops=(2 if bwd else 1) * conv,
                           transcendentals=2 * b * t * h * w_logical * f,
                           bytes_accessed=(2 if bwd else 1) * io)


def _dims_from(xp, bwx, f, budget=None):
    """Recover (kh, w_pad, cin, bt) from the packed operand shapes — shape-
    only, so it works on the per-shard shapes custom_partitioning hands the
    kernel under a multi-device mesh (each shard picks its own batch tile).
    `budget` selects the program being sized (default: the all-in-one
    backward, the larger of the full-fused pair)."""
    b, t, h, wc = xp.shape
    kh = bwx.shape[0]
    w_pad = bwx.shape[-1] // (4 * f)
    cin = wc // w_pad
    bt = _pick_batch_tile(b, t, h, w_pad, cin, f, kh, xp.dtype.itemsize,
                          budget=budget)
    return kh, w_pad, cin, bt


def _forward_pallas(xp, bwx, bwh, bb, f, interpret, w_logical, kw,
                    save_residuals=True, split=False):
    """Run the forward kernel. With save_residuals=False (inference /
    no-grad) only ys is emitted — cs/zs exist purely as backward residuals
    and would be ~6x extra HBM write traffic per layer. `split` sizes the
    batch tile for the split-backward path (fwd-only budget — the program
    is the same, but it may tile larger batches than the conservative
    all-in-one budget allows)."""
    b, t, h, wc = xp.shape
    kh = bwx.shape[0]
    wf = bwx.shape[-1] // 4
    bt = _dims_from(xp, bwx, f, budget=_budget_fwd if split else None)[3]
    state_spec = pl.BlockSpec((bt, t, h, wf), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    state_shape = jax.ShapeDtypeStruct((b, t, h, wf), xp.dtype)
    scratch = [
        pltpu.VMEM((bt, t, h + kh - 1, wc), xp.dtype),   # xp_all
        pltpu.VMEM((bt, h + kh - 1, wf), xp.dtype),      # hp (per step)
    ]
    if save_residuals:
        kern = functools.partial(_fwd_kernel, t, kh)
        out_specs = (state_spec, state_spec,
                     pl.BlockSpec((bt, t, h, 4 * wf), lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (state_shape, state_shape,
                     jax.ShapeDtypeStruct((b, t, h, 4 * wf), xp.dtype))
    else:
        def kern(x_ref, bwx_ref, bwh_ref, bb_ref, ys_ref, xp_ref, hp_ref,
                 zx_ref):
            _fwd_kernel(t, kh, x_ref, bwx_ref, bwh_ref, bb_ref, ys_ref,
                        cs_ref=None, zs_ref=None, xp_ref=xp_ref,
                        hp_ref=hp_ref, zx_ref=zx_ref)
        out_specs = state_spec
        out_shape = state_shape
        # zx buffer: in training mode the zs residual output serves this
        # role; inference needs its own scratch
        scratch.append(pltpu.VMEM((bt, t, h, 4 * wf), xp.dtype))
    band_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, t, h, wc), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            band_spec(bwx), band_spec(bwh), band_spec(bb),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=_cost(b, t, h, wf // f, w_logical, wc, wf, kh, kw,
                            bwd=False, residuals=save_residuals),
        interpret=interpret,
    )(xp, bwx, bwh, bb)
    return out


def _backward_pallas(xp, bwx, bwh, zs, ys, cs, dys, f, interpret,
                     w_logical, kw):
    b, t, h, wc = xp.shape
    kh = bwx.shape[0]
    wf = bwx.shape[-1] // 4
    wf4 = 4 * wf
    bt = _dims_from(xp, bwx, f)[3]
    nprog = b // bt
    bwxT = jnp.swapaxes(bwx, 1, 2)
    bwhT = jnp.swapaxes(bwh, 1, 2)
    kern = functools.partial(_bwd_kernel, t, kh)
    band_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                       memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((bt, t, h, wf), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    dx, dbwx_p, dbwh_p, dbb_p = pl.pallas_call(
        kern,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((bt, t, h, wc), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t, h, 4 * wf), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            state_spec, state_spec, state_spec,
            band_spec(bwxT), band_spec(bwhT),
        ],
        out_specs=(
            pl.BlockSpec((bt, t, h, wc), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + bwx.shape, lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + bwh.shape, lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wf4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, xp.dtype),
            jax.ShapeDtypeStruct((nprog,) + bwx.shape, jnp.float32),
            jax.ShapeDtypeStruct((nprog,) + bwh.shape, jnp.float32),
            jax.ShapeDtypeStruct((nprog, 1, wf4), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, t, h + kh - 1, wc), xp.dtype),    # xp_all
            pltpu.VMEM((bt, t, h + kh - 1, wf), xp.dtype),    # hp_all
            pltpu.VMEM((bt, t, h + kh - 1, wf4), xp.dtype),   # dzs
        ],
        cost_estimate=_cost(b, t, h, wf // f, w_logical, wc, wf, kh, kw,
                            bwd=True),
        interpret=interpret,
    )(xp, zs, ys, cs, dys, bwxT, bwhT)
    return (dx, jnp.sum(dbwx_p, axis=0), jnp.sum(dbwh_p, axis=0),
            jnp.sum(dbb_p, axis=0)[0])


def _seq_pallas(zs, cs, dys, bwhT, f, interpret, w_logical, kw):
    """Run the sequential-BPTT kernel (split-backward path); returns dzs
    [B, T, H+kh-1, 4WF] in the model dtype (per-timestep H padding, pad
    rows exactly zero)."""
    b, t, h, wf4 = zs.shape
    kh = bwhT.shape[0]
    wf = wf4 // 4
    w_pad = wf // f
    cin = 1  # unused by the seq budget; keep the shared picker signature
    bt = _pick_batch_tile(b, t, h, w_pad, cin, f, kh, zs.dtype.itemsize,
                          budget=_budget_seqbwd)
    kern = functools.partial(_bwd_seq_kernel, t, kh)
    band_spec = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                       memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((bt, t, h, wf), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    # cost: the sequential recurrent conv only (the T-parallel
    # contractions run in XLA afterwards and carry their own cost)
    cost = pl.CostEstimate(
        flops=2 * b * t * h * w_logical * kh * kw * f * 4 * f,
        transcendentals=4 * b * t * h * w_logical * f,
        bytes_accessed=b * t * h * (wf4 + 2 * wf) * zs.dtype.itemsize * 2)
    return pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, t, h, wf4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            state_spec, state_spec,
            band_spec(bwhT),
        ],
        out_specs=pl.BlockSpec((bt, t, h + kh - 1, wf4),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, h + kh - 1, wf4), zs.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(zs, cs, dys, bwhT)


# --------------------------------------------------------------------------
# SPMD partitioning (multi-device meshes)
#
# pallas_call has no built-in partitioning rule, so without help GSPMD
# would all-gather a batch-sharded input onto every device before running
# the kernel. The two wrappers below declare the rule the kernel actually
# has: batch dim sharded, everything else (window, rows, lanes, band
# matrices) replicated. Each shard then runs the SAME single-chip Mosaic
# lowering on its local batch; the backward's band-matrix/bias gradients
# are partial sums over local batches, all-reduced here with a psum over
# the batch mesh axes (the lower_fn must produce the declared-replicated
# global value itself — shardy's reduction factors only steer propagation).
# --------------------------------------------------------------------------

def _batch_axes(arg_shapes):
    """Mesh axes the first operand's leading (batch) dim is sharded over."""
    spec = arg_shapes[0].sharding.spec
    return spec[0] if len(spec) else None


def _bsharded(mesh, b, ndim):
    return NamedSharding(mesh, PartitionSpec(*((b,) + (None,) * (ndim - 1))))


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(f, interpret, w_logical, kw, save_residuals,
                     split=False):
    @custom_partitioning
    def fwd(xp, bwx, bwh, bb):
        return _forward_pallas(xp, bwx, bwh, bb, f, interpret, w_logical,
                               kw,
                               save_residuals, split)

    def infer(mesh, arg_shapes, result_shape):
        b = _batch_axes(arg_shapes)
        return jax.tree.map(lambda r: _bsharded(mesh, b, len(r.shape)),
                            result_shape)

    def part(mesh, arg_shapes, result_shape):
        b = _batch_axes(arg_shapes)
        rep = NamedSharding(mesh, PartitionSpec())
        arg_sh = (_bsharded(mesh, b, 4), rep, rep, rep)
        out_sh = jax.tree.map(lambda r: _bsharded(mesh, b, len(r.shape)),
                              result_shape)

        def lower(xp, bwx, bwh, bb):
            return _forward_pallas(xp, bwx, bwh, bb, f, interpret,
                                   w_logical, kw, save_residuals, split)

        return mesh, lower, out_sh, arg_sh

    out_rule = 'b t h e, b t h e, b t h z' if save_residuals else 'b t h e'
    fwd.def_partition(
        infer_sharding_from_operands=infer, partition=part,
        sharding_rule='b t h wc, kx mx z, kh mh z, u z -> ' + out_rule,
        need_replication_factors=('t', 'h', 'wc', 'kx', 'mx', 'z', 'kh',
                                  'mh', 'u', 'e'))
    return fwd


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(f, interpret, w_logical, kw):
    @custom_partitioning
    def bwd(xp, zs, ys, cs, dys, bwx, bwh):
        return _backward_pallas(xp, bwx, bwh, zs, ys, cs, dys, f,
                                interpret, w_logical, kw)

    def infer(mesh, arg_shapes, result_shape):
        b = _batch_axes(arg_shapes)
        rep = NamedSharding(mesh, PartitionSpec())
        return (_bsharded(mesh, b, 4), rep, rep, rep)

    def part(mesh, arg_shapes, result_shape):
        b = _batch_axes(arg_shapes)
        rep = NamedSharding(mesh, PartitionSpec())
        arg_sh = tuple(_bsharded(mesh, b, 4) for _ in range(5)) + (rep, rep)
        out_sh = (_bsharded(mesh, b, 4), rep, rep, rep)

        def lower(xp, zs, ys, cs, dys, bwx, bwh):
            dx, dbwx, dbwh, dbb = _backward_pallas(
                xp, bwx, bwh, zs, ys, cs, dys, f, interpret, w_logical,
                kw)
            if b is not None:
                dbwx, dbwh, dbb = jax.lax.psum((dbwx, dbwh, dbb), b)
            return dx, dbwx, dbwh, dbb

        return mesh, lower, out_sh, arg_sh

    bwd.def_partition(
        infer_sharding_from_operands=infer, partition=part,
        sharding_rule=('b t h wc, b t h z, b t h e, b t h e, b t h e, '
                       'kx wc z, kh e z -> b t h wc, kx wc z, kh e z, z'),
        need_replication_factors=('t', 'h', 'wc', 'z', 'e', 'kx', 'kh'))
    return bwd


@functools.lru_cache(maxsize=None)
def _bwd_seq_partitioned(f, interpret, w_logical, kw):
    """Partitioning rule for the sequential-BPTT kernel (split path):
    batch dim sharded, the transposed recurrent band replicated, dzs comes
    back batch-sharded. No psum — dzs is per-sample; the weight/bias
    gradients are formed by the XLA tail, whose batch-contracting GEMMs
    GSPMD all-reduces on its own."""
    @custom_partitioning
    def seq(zs, cs, dys, bwhT):
        return _seq_pallas(zs, cs, dys, bwhT, f, interpret, w_logical, kw)

    def infer(mesh, arg_shapes, result_shape):
        b = _batch_axes(arg_shapes)
        return _bsharded(mesh, b, 4)

    def part(mesh, arg_shapes, result_shape):
        b = _batch_axes(arg_shapes)
        rep = NamedSharding(mesh, PartitionSpec())
        arg_sh = tuple(_bsharded(mesh, b, 4) for _ in range(3)) + (rep,)
        out_sh = _bsharded(mesh, b, 4)

        def lower(zs, cs, dys, bwhT):
            return _seq_pallas(zs, cs, dys, bwhT, f, interpret, w_logical,
                               kw)

        return mesh, lower, out_sh, arg_sh

    seq.def_partition(
        infer_sharding_from_operands=infer, partition=part,
        sharding_rule='b t h z, b t h e, b t h e, k z e -> b t p z',
        need_replication_factors=('t', 'h', 'z', 'e', 'k', 'p'))
    return seq


def _backward_split(xp, bwx, bwh, zs, ys, cs, dys, f, interpret,
                    w_logical, kw):
    """Split backward: Pallas sequential BPTT (dzs) + plain-XLA T-batched
    contractions for dx / dBWx / dBWh / dbb. Numerically the same program
    as _backward_pallas (same band matmuls, same f32 accumulation) with
    the T-parallel half hoisted out of Pallas — the band-GRADIENT blocks
    it emits are what blow the one-kernel backward's VMEM budget at
    cin=F=16 (the wide-F-crossover valley, docs/ROOFLINE.md)."""
    b, t, h, wc = xp.shape
    kh = bwx.shape[0]
    wf = bwx.shape[-1] // 4
    wf4 = 4 * wf
    ph = (kh - 1) // 2
    dt = xp.dtype
    m = b * t * h
    bwxT = jnp.swapaxes(bwx, 1, 2)
    bwhT = jnp.swapaxes(bwh, 1, 2)
    dzs = _bwd_seq_partitioned(f, interpret, w_logical, kw)(
        zs, cs, dys, bwhT)
    # dx[y] = sum_dy dz_pad[y + (kh-1-dy)] @ BWx[dy]^T
    acc_x = None
    for dy in range(kh):
        off = kh - 1 - dy
        sl = dzs[:, :, off:off + h, :].reshape(m, wf4)
        part = jnp.dot(sl, bwxT[dy], preferred_element_type=jnp.float32)
        acc_x = part if acc_x is None else acc_x + part
    dx = acc_x.astype(dt).reshape(b, t, h, wc)
    # weight/bias grads: one (B*T*H)-contraction per tap — M-dim
    # reductions XLA maps to large healthy GEMMs
    dz_all = dzs[:, :, ph:ph + h, :].reshape(m, wf4)
    dbb = jnp.sum(dz_all.astype(jnp.float32), axis=0)
    xp_all = jnp.pad(xp, ((0, 0), (0, 0), (ph, kh - 1 - ph), (0, 0)))
    h_prev = jnp.concatenate(
        [jnp.zeros_like(ys[:, :1]), ys[:, :-1]], axis=1)
    hp_all = jnp.pad(h_prev, ((0, 0), (0, 0), (ph, kh - 1 - ph), (0, 0)))
    dbwx, dbwh = [], []
    for dy in range(kh):
        slx = xp_all[:, :, dy:dy + h, :].reshape(m, wc)
        dbwx.append(jax.lax.dot_general(
            slx, dz_all, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        slh = hp_all[:, :, dy:dy + h, :].reshape(m, wf)
        dbwh.append(jax.lax.dot_general(
            slh, dz_all, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    return dx, jnp.stack(dbwx), jnp.stack(dbwh), dbb


# --------------------------------------------------------------------------
# Differentiable entry point
# --------------------------------------------------------------------------

def dispatch_info(x_shape, wx_shape, wh_shape, itemsize=2, interpret=False,
                  training=False):
    """The fused-vs-XLA path decision for a ConvLSTM layer, as a dict —
    the EXACT logic `fused_convlstm` routes on (it calls this), exposed so
    tests and benchmarks can pin the dispatch without touching a TPU.

    ``training`` routes the cin=F=16 valley by MODE (measured,
    tools/convlstm_kernel_bench.py): the fused forward + split backward
    pair loses to XLA's joint fwd+bwd program there (~1.15 ms vs 757 us
    per layer — XLA's backward reuses its forward's conv structure), while
    the fused forward alone is 2.6x faster than the XLA forward (198.6 vs
    517.3 us). So training=True retires the valley to XLA (reason
    ``'train-slower'``) and training=False keeps the fused forward for
    inference/serving. The hint is advisory for CORRECTNESS: taking a
    gradient through a training=False dispatch still works — it runs the
    (correct, slower-than-XLA) split backward.

    Returns ``{'path': 'fused'|'fused-splitbwd'|'xla', 'reason': str,
    'w_pad': int, 'batch_tile': int|None}``. ``'fused'`` is the all-in-one
    pair (forward kernel + one BPTT backward kernel); ``'fused-splitbwd'``
    keeps the same forward kernel but runs the backward as the sequential
    BPTT kernel + plain-XLA T-batched contractions — chosen when only the
    all-in-one BACKWARD's working set (dominated by its f32 band-gradient
    output blocks) exceeds VMEM while the forward and the sequential
    kernel both fit (the cin=F=16 valley; reason ``'bwd-vmem'``,
    ``batch_tile`` is then the forward kernel's, with the sequential
    kernel's under ``'batch_tile_seqbwd'``). ``reason`` for the XLA path
    is one of ``'kernel-mismatch'`` (wx/wh kernel sizes differ — the band
    matrices assume one), ``'even-kernel'`` (asymmetric SAME padding),
    ``'vmem'`` (the [W*C, 4*W*F] band matrices + window state exceed the
    per-program VMEM budget even split — the bands grow O(W^2*C*F), so
    e.g. W=16/F=32 needs ~12 MB of forward bands alone; see
    docs/ROOFLINE.md "wide-F crossover"), or ``'lane-pad'`` (128-lane
    alignment would more than double W).
    """
    b, t, h, w, cin = x_shape
    kh, kw = wx_shape[0], wx_shape[1]
    f = wx_shape[3] // 4
    w_pad = w
    if not interpret and (w * f) % 128 != 0:
        step = 128 // math.gcd(f, 128)
        w_pad = -(-w // step) * step
    if tuple(wh_shape[:2]) != (kh, kw):
        return {'path': 'xla', 'reason': 'kernel-mismatch',
                'w_pad': w_pad, 'batch_tile': None}
    if kh % 2 == 0 or kw % 2 == 0:
        return {'path': 'xla', 'reason': 'even-kernel',
                'w_pad': w_pad, 'batch_tile': None}
    bt = _pick_batch_tile(b, t, h, w_pad, cin, f, kh, itemsize)
    if bt is None:
        bt_f = _pick_batch_tile(b, t, h, w_pad, cin, f, kh, itemsize,
                                budget=_budget_fwd)
        bt_s = _pick_batch_tile(b, t, h, w_pad, cin, f, kh, itemsize,
                                budget=_budget_seqbwd)
        if bt_f is None or bt_s is None:
            return {'path': 'xla', 'reason': 'vmem',
                    'w_pad': w_pad, 'batch_tile': None}
        if w_pad > 2 * w:
            return {'path': 'xla', 'reason': 'lane-pad',
                    'w_pad': w_pad, 'batch_tile': None}
        if training:
            return {'path': 'xla', 'reason': 'train-slower',
                    'w_pad': w_pad, 'batch_tile': None}
        return {'path': 'fused-splitbwd', 'reason': 'bwd-vmem',
                'w_pad': w_pad, 'batch_tile': bt_f,
                'batch_tile_seqbwd': bt_s}
    if w_pad > 2 * w:
        return {'path': 'xla', 'reason': 'lane-pad',
                'w_pad': w_pad, 'batch_tile': None}
    return {'path': 'fused', 'reason': 'fits',
            'w_pad': w_pad, 'batch_tile': bt}


def _prep(x, wx, bx, wh, w_valid):
    b, t, h, w, cin = x.shape
    xp = x.reshape(b, t, h, w * cin)                 # pure reshape
    bwx = _band(wx, w, w_valid).astype(x.dtype)
    bwh = _band(wh, w, w_valid).astype(x.dtype)
    bb = _band_bias(bx, w, w_valid).astype(x.dtype).reshape(1, -1)
    return xp, bwx, bwh, bb


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused(x, wx, bx, wh, interpret, w_valid, split=False):
    b, t, h, w, cin = x.shape
    f = wh.shape[2]
    xp, bwx, bwh, bb = _prep(x, wx, bx, wh, w_valid)
    ys = _fwd_partitioned(f, interpret, w_valid or w, wx.shape[1],
                          False, split)(
        xp, bwx, bwh, bb)
    return ys.reshape(b, t, h, w, f)                 # pure reshape


def _fused_fwd(x, wx, bx, wh, interpret, w_valid, split=False):
    b, t, h, w, cin = x.shape
    f = wh.shape[2]
    xp, bwx, bwh, bb = _prep(x, wx, bx, wh, w_valid)
    ysp, csp, zsp = _fwd_partitioned(f, interpret, w_valid or w,
                                     wx.shape[1], True, split)(
        xp, bwx, bwh, bb)
    meta = (jax.ShapeDtypeStruct(wx.shape, wx.dtype),
            jax.ShapeDtypeStruct(bx.shape, bx.dtype),
            jax.ShapeDtypeStruct(wh.shape, wh.dtype))
    return ysp.reshape(b, t, h, w, f), (xp, bwx, bwh, zsp, ysp, csp, meta)


def _fused_bwd(interpret, w_valid, split, res, dys):
    xp, bwx, bwh, zsp, ysp, csp, meta = res
    wx_sd, bx_sd, wh_sd = meta
    b, t, h, wc = xp.shape
    kh, kw, cin, _ = wx_sd.shape
    f = wh_sd.shape[2]
    w = wc // cin
    dysp = dys.reshape(b, t, h, w * f)               # pure reshape
    if split:
        dx, dbwx, dbwh, dbb = _backward_split(
            xp, bwx, bwh, zsp, ysp, csp, dysp, f, interpret,
            w_valid or w, kw)
    else:
        dx, dbwx, dbwh, dbb = _bwd_partitioned(f, interpret, w_valid or w,
                                               kw)(
            xp, zsp, ysp, csp, dysp, bwx, bwh)
    dwx = _unband(dbwx, kh, kw, cin, f, w, w_valid).reshape(wx_sd.shape)
    dwh = _unband(dbwh, kh, kw, f, f, w, w_valid).reshape(wh_sd.shape)
    dbxp = dbb.reshape(4, w, f)
    if w_valid is not None and w_valid < w:
        dbxp = dbxp[:, :w_valid]
    dbxp = dbxp.sum(axis=1).reshape(4 * f)
    return (dx.reshape(b, t, h, w, cin), dwx.astype(wx_sd.dtype),
            dbxp.astype(bx_sd.dtype), dwh.astype(wh_sd.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_convlstm(x, wx, bx, wh, interpret=None, training=False):
    """Fully-fused ConvLSTM layer: input conv + recurrence + gates in one
    VMEM-resident kernel per batch tile (differentiable; the BPTT backward
    is a single fused kernel too).

    x: [B, T, H, W, Cin]; wx: [kh, kw, Cin, 4F] input-conv kernel;
    bx: [4F] input-conv bias; wh: [kh, kw, F, 4F] recurrent kernel (no
    bias — Keras ConvLSTM2D layout, gate order i, f, c, o).
    Returns ys: [B, T, H, W, F].

    Falls back to the XLA path for even or mismatched wx/wh kernels
    (asymmetric SAME padding the band matrices don't model), when the
    working set — in particular the [W*C, 4*W*F] band matrices — cannot
    fit VMEM, or when lane alignment would more than double the width
    (unaligned W*F is PADDED up to the next 128-lane multiple with zeroed
    band tails and runs fused; only w_pad > 2*w falls back).

    Multi-device meshes: the kernel carries an explicit
    custom_partitioning rule (batch dim sharded, weights/bands replicated,
    backward weight-grads psum-reduced over the batch axes), so under a
    data-parallel pjit mesh each device runs the single-chip lowering on
    its local batch with no all-gather of activations.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, t, h, w, cin = x.shape
    # Routing (incl. the per-sample VMEM fit — independent of batch size,
    # so the global-shape check also covers every per-device shard) lives
    # in dispatch_info so tests/benchmarks can pin it off-TPU. For the
    # fused path: gate slices must sit on 128-lane boundaries, so W is
    # padded up to the smallest width whose W*F is a multiple of 128, with
    # band rows/cols beyond the true width zeroed so the tail stays exactly
    # zero (see _x_selector). The interpreter has no lane constraint, so
    # interpret mode runs at the true width (keeps unit tests on the real
    # code path; the padded path has its own dedicated test).
    info = dispatch_info(x.shape, wx.shape, wh.shape,
                         itemsize=x.dtype.itemsize, interpret=interpret,
                         training=training)
    if info['path'] == 'xla':
        ys, _ = convlstm_reference(x, wx, bx, wh)
        return ys
    split = info['path'] == 'fused-splitbwd'
    w_pad = info['w_pad']
    w_valid = w if w_pad != w else None
    if w_valid is None:
        return _fused(x, wx, bx, wh, interpret, None, split)
    xpad = jnp.pad(x, ((0, 0),) * 3 + ((0, w_pad - w), (0, 0)))
    ys = _fused(xpad, wx, bx, wh, interpret, w_valid, split)
    return ys[..., :w, :]
