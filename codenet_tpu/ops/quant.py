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


def asymmetric_quant(x, k, x_min, x_max, clamp=False):
    """AsymmetricQuantFunction (quant_utils.py:170-198). STE backward.

    The reference clamps to [0, 2^k - 1] only in per-channel mode; the
    activation path (per_channel=False) does not clamp — pass clamp=False to
    match it.
    """
    n = 2 ** k - 1
    scale = n / jnp.clip(x_max - x_min, 1e-10, None)
    zero_point = jnp.round(scale * x_min)
    zero_point = zero_point + 2 ** (k - 1)  # signed shift (quant_utils.py:71-72)
    q = jnp.round(scale * x - zero_point)
    if clamp:
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


def fake_quant_act(x, k, x_min, x_max, mode="asymmetric"):
    """Fake-quantize activations with scalar range state."""
    if mode == "asymmetric":
        return asymmetric_quant(x, k, x_min, x_max, clamp=False)
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
