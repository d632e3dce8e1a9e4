"""W4A8 fake-quantization math, functional.

Reproduces the reference portable_quantizer numerics exactly
(/root/reference/portable_quantizer/quantization_utils/quant_utils.py):

- Symmetric weight quantization (per-output-channel magnitude, optional
  0.1/99.9 percentile range), clamped to [-2^(k-1), 2^(k-1)-1]
  (quant_utils.py:205-227).
- Asymmetric activation quantization with integral zero point and the
  signed +2^(k-1) shift; notably the non-per-channel path does NOT clamp
  (quant_utils.py:191-198) — an idiosyncrasy preserved here.
- EMA min/max activation range tracking, momentum 0.99, with the
  first-batch initialization special case (quant_modules.py:202-219).
- Straight-through estimator: the backward of every quantizer is identity
  (quant_utils.py:200-202, 225-227), implemented with
  `x + stop_gradient(q(x) - x)`.

All functions are pure; activation range state lives in an explicit
`quant_stats` collection threaded through the train/eval step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _ste(x, qx):
    """Straight-through: forward qx, backward identity."""
    return x + jax.lax.stop_gradient(qx - x)


def _kth_smallest(flat, k):
    """1-indexed k-th smallest, k clamped to [1, L] (torch.kthvalue)."""
    k = jnp.clip(k, 1, flat.shape[0])
    s = jnp.sort(flat)
    return s[k - 1]


def percentile_min_max(flat, lower=0.1, upper=99.9):
    """torch-kthvalue percentile bounds (quant_utils.py:16-28).

    Indices use round() as in the reference.
    """
    n = flat.shape[0]
    lo_idx = int(round(n * lower * 0.01))
    up_idx = int(round(n * upper * 0.01))
    s = jnp.sort(flat)
    lo = s[max(lo_idx, 1) - 1]
    up = s[max(up_idx, 1) - 1]
    return lo, up


def weight_channel_min_max(w_oc_first, percentile=False):
    """Per-output-channel (min, max) of a (O, L) weight view.

    Mirrors Quant_Conv2d.forward (quant_modules.py:280-301): percentile mode
    uses ceil-indexed kthvalue; fewer than 10 elements per channel falls back
    to 0.95 * min/max.
    """
    import math
    o, l = w_oc_first.shape
    if not percentile:
        return w_oc_first.min(axis=1), w_oc_first.max(axis=1)
    if l < 10:
        return w_oc_first.min(axis=1) * 0.95, w_oc_first.max(axis=1) * 0.95
    lo_idx = max(int(math.ceil(l * 0.1 * 0.01)), 1)
    up_idx = min(max(int(math.ceil(l * 99.9 * 0.01)), 1), l)
    s = jnp.sort(w_oc_first, axis=1)
    return s[:, lo_idx - 1], s[:, up_idx - 1]


def symmetric_quant(x, k, x_min, x_max):
    """SymmetricQuantFunction (quant_utils.py:205-223). STE backward.

    x_min/x_max broadcast against x's leading (channel) axis layout is the
    caller's responsibility; here they must already broadcast against x.
    """
    magnitude = jnp.maximum(jnp.abs(x_min), jnp.abs(x_max))
    n = 2 ** (k - 1) - 1
    scale = n / jnp.clip(magnitude, 1e-10, None)
    q = jnp.round(scale * x)
    q = jnp.clip(q, -(2 ** (k - 1)), 2 ** (k - 1) - 1)
    dq = q / scale
    return _ste(x, dq)


def asymmetric_quant(x, k, x_min, x_max, clamp=False, signed_window=False):
    """AsymmetricQuantFunction (quant_utils.py:170-198). STE backward.

    The reference clamps to [0, 2^k - 1] only in per-channel mode; the
    activation path (per_channel=False) does not clamp — pass clamp=False to
    match it. signed_window=True clamps to the SIGNED int8 storage window
    [-2^(k-1), 2^(k-1)-1] instead (the window quantize_act_int8 stores in
    — deployment-faithful QAT).
    """
    n = 2 ** k - 1
    scale = n / jnp.clip(x_max - x_min, 1e-10, None)
    zero_point = jnp.round(scale * x_min)
    zero_point = zero_point + 2 ** (k - 1)  # signed shift (quant_utils.py:71-72)
    q = jnp.round(scale * x - zero_point)
    if clamp:
        if signed_window:
            q = jnp.clip(q, -(2 ** (k - 1)), 2 ** (k - 1) - 1)
        else:
            q = jnp.clip(q, 0, n)
    dq = (q + zero_point) / scale
    return _ste(x, dq)


def fake_quant_weight(w_hwio, k, mode="symmetric", per_channel=True,
                      percentile=False):
    """Fake-quantize an HWIO weight, per output channel.

    The reference flattens torch-layout (O, I, kh, kw) to (O, -1)
    (quant_modules.py:281); element order within a channel does not affect
    min/max/kth-value, so flattening HWIO per O gives identical ranges.
    """
    kh, kw, i, o = w_hwio.shape
    flat = jnp.transpose(w_hwio, (3, 0, 1, 2)).reshape(o, -1)
    if per_channel:
        w_min, w_max = weight_channel_min_max(flat, percentile)
        # broadcast per-O over HWIO
        w_min = w_min[None, None, None, :]
        w_max = w_max[None, None, None, :]
    else:
        if percentile:
            w_min, w_max = percentile_min_max(flat.reshape(-1))
        else:
            w_min, w_max = flat.min(), flat.max()
    if mode == "symmetric":
        return symmetric_quant(w_hwio, k, w_min, w_max)
    return asymmetric_quant(w_hwio, k, w_min, w_max, clamp=True)


def fake_quant_act(x, k, x_min, x_max, mode="asymmetric", clamp=False):
    """Fake-quantize activations with scalar range state.

    clamp=False reproduces the reference quirk (asymmetric activations
    are NOT clamped to the representable window, quant_utils.py:191-198)
    — values outside the EMA range keep extra linear headroom that no
    int8 hardware has. clamp=True is the deployment-faithful variant
    (matches quantize_act_int8 exactly): QAT trained with it adapts to
    saturation, closing the fake-vs-real-int8 AP gap."""
    if mode == "asymmetric":
        return asymmetric_quant(x, k, x_min, x_max, clamp=clamp,
                                signed_window=clamp)
    return symmetric_quant(x, k, x_min, x_max)


def act_range_observe(x, percentile=False):
    """Batch (min, max) for EMA tracking (quant_modules.py:204-209)."""
    flat = jax.lax.stop_gradient(x).reshape(-1)
    if percentile:
        return percentile_min_max(flat, 0.1, 99.9)
    return flat.min(), flat.max()


def ema_update(x_min, x_max, batch_min, batch_max, momentum=0.99):
    """EMA with first-batch init (quant_modules.py:210-219).

    State arrays are shape (1,).
    """
    init = (x_min == x_max)
    new_min = jnp.where(init, x_min + batch_min,
                        momentum * x_min + (1.0 - momentum) * batch_min)
    new_max = jnp.where(init, x_max + batch_max,
                        momentum * x_max + (1.0 - momentum) * batch_max)
    return new_min, new_max


# ---------------------------------------------------------------------------
# Real-int8 inference lowering
# ---------------------------------------------------------------------------

class QTensor(NamedTuple):
    """A quantized activation: int8 values with scalar (scale, zero_point).

    Dequantization contract matches the reference's asymmetric math
    (quant_utils.py:42-50): x = (values + zero_point) / scale. `values` are
    stored int8 (the +2^(k-1) signed shift is already inside zero_point).
    """
    values: jnp.ndarray     # int8
    scale: jnp.ndarray      # (1,) float32
    zero_point: jnp.ndarray  # (1,) float32 (integral value)

    def dequant(self):
        return (self.values.astype(jnp.float32)
                + self.zero_point) / self.scale


def quantize_act_int8(x, k, x_min, x_max):
    """Quantize activations to REAL int8 storage from frozen EMA ranges.

    Same scale/zero-point as fake-quant (asymmetric_quant) but values are
    clamped to the representable window [-2^(k-1), 2^(k-1)-1] — the one
    numerical deviation from the unclamped fake-quant path, affecting only
    out-of-EMA-range activations.
    """
    n = 2 ** k - 1
    scale = n / jnp.clip(x_max - x_min, 1e-10, None)
    zero_point = jnp.round(scale * x_min) + 2 ** (k - 1)
    q = jnp.round(scale * x - zero_point)
    q = jnp.clip(q, -(2 ** (k - 1)), 2 ** (k - 1) - 1)
    return QTensor(q.astype(jnp.int8), scale.astype(jnp.float32),
                   zero_point.astype(jnp.float32))


def quantize_weight_int(w_hwio, k, per_channel=True, percentile=False):
    """Integer weight levels + per-out-channel scale: w ~= q / scale,
    q in [-2^(k-1), 2^(k-1)-1] (symmetric, same ranges as fake-quant)."""
    kh, kw, i, o = w_hwio.shape
    flat = jnp.transpose(w_hwio, (3, 0, 1, 2)).reshape(o, -1)
    w_min, w_max = weight_channel_min_max(flat, percentile)
    magnitude = jnp.maximum(jnp.abs(w_min), jnp.abs(w_max))
    n = 2 ** (k - 1) - 1
    scale = n / jnp.clip(magnitude, 1e-10, None)  # (O,)
    q = jnp.round(w_hwio * scale[None, None, None, :])
    q = jnp.clip(q, -(2 ** (k - 1)), 2 ** (k - 1) - 1)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def int8_conv(qx: QTensor, q_w, w_scale, bias, stride=1, padding=1,
              groups=1):
    """Integer convolution with fused requantization.

    x = (qx.values + zp)/s_x and w_c = q_w/s_w_c, so
      conv(x, w)_c = [conv(q_v, q_w)_c + zp * taps_sum(q_w)_c] / (s_x s_w_c)
    computed with int32 accumulation on the MXU and one fused multiplier +
    bias per channel. Returns float32 NHWC.

    Lowering (measured on v5e, VERDICT r2 next-#2): 1x1 unpadded convs —
    the bulk of the network's FLOPs — go through `lax.dot_general` (int8
    MXU matmul, ~2x the bf16 conv rate and ~2x faster than XLA's int8
    conv lowering); their zero-point correction needs no ones-conv at all
    (no padding => every position sums all taps: a per-channel constant).
    k>1 convs (layer0, depthwise) keep the int32 conv + constant ones-conv
    correction (the correction constant-folds under the detector's
    weight-closure jit).
    """
    s = (stride, stride) if isinstance(stride, int) else stride
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    kh, kw, cin_pg, cout = q_w.shape
    no_pad = all(p == (0, 0) for p in padding)

    if kh == 1 and kw == 1 and groups == 1 and no_pad:
        v = qx.values[:, ::s[0], ::s[1], :]
        n, ho, wo, cin = v.shape
        acc = jax.lax.dot_general(
            v.reshape(-1, cin), q_w.reshape(cin, cout),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).reshape(n, ho, wo, cout)
        wsum = jnp.sum(q_w.astype(jnp.float32), axis=(0, 1, 2))  # (O,)
        y = (acc.astype(jnp.float32) + qx.zero_point * wsum) / (
            qx.scale * w_scale[None, None, None, :])
        if bias is not None:
            y = y + bias[None, None, None, :]
        return y

    acc = jax.lax.conv_general_dilated(
        qx.values, q_w, window_strides=s, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    # Zero padding holds q=0, but a real zero is q=-zp; the exact correction
    # is zp * (sum of q_w over the VALID taps at each position), obtained by
    # convolving an all-ones single-channel map with the channel-summed
    # kernel (cheap: O(HW*K*O) vs the main conv's O(HW*K*Cin*O)).
    wsum = jnp.sum(q_w.astype(jnp.float32), axis=2, keepdims=True)
    ones = jnp.ones(qx.values.shape[:3] + (1,), jnp.float32)
    valid_wsum = jax.lax.conv_general_dilated(
        ones, wsum, window_strides=s, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (N, Ho, Wo, O)
    y = (acc.astype(jnp.float32) + qx.zero_point * valid_wsum) / (
        qx.scale * w_scale[None, None, None, :])
    if bias is not None:
        y = y + bias[None, None, None, :]
    return y


def fold_bn(w_hwio, conv_bias, bn_gamma, bn_beta, bn_mean, bn_var, eps=1e-5):
    """BN-fold weights/bias from (frozen) running stats.

    QuantBnConv2d.forward (quant_modules.py:364-372): the fold always uses
    running statistics, so during QAT the BN is effectively frozen at its
    FP32-trained values.
    """
    std = jnp.sqrt(bn_var + eps)
    factor = bn_gamma / std
    scaled_w = w_hwio * factor[None, None, None, :]
    bias = conv_bias if conv_bias is not None else jnp.zeros_like(bn_mean)
    scaled_b = (bias - bn_mean) * factor + bn_beta
    return scaled_w, scaled_b
