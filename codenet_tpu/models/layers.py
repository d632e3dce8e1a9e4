"""Shared layers: conv/BN primitives with a quantized mode, shuffle units,
and the co-designed deformable block.

Every layer exists once with two execution modes selected by a static
`QuantSpec` attribute (None = FP32). The parameter tree is IDENTICAL in both
modes — quantized execution folds BN from the same `batch_stats` and
fake-quantizes the same kernels — so an FP32 checkpoint loads directly into
the quantized model, replacing the reference's in-place graph surgery
(portable_quantizer/quantization_utils/quantize_model.py:7-83) with a pure
config switch. Activation-range EMA state lives in a separate `quant_stats`
collection.

Layout: NHWC activations, HWIO kernels (TPU-native; the reference is
NCHW/OIHW).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quant as Q
from ..ops.quant import QTensor
from ..ops.deform_conv import codesign_deform_conv


def resolve_int8_weights(mod, kernel_folded, bias, w_bit, qspec):
    """(q_w, w_scale, bias) for the real-int8 conv path, with deployment
    artifact support (tools_tpu/export_w4a8.py).

    Three modes, decided by the 'deploy' variable collection:
    - capture (collection mutable): derive the integer weights from the
      float checkpoint exactly as runtime lowering does, and sow them so
      the exporter can pack the int4 artifact;
    - artifact (collection provided read-only): use its tensors verbatim —
      eval runs bit-identically from the packed artifact without ever
      touching float kernels (the reference ships exactly this: a
      quantized parameter file, README.md:14-18 model sizes);
    - plain (no collection): derive on the fly; under the detector's
      weight-closure jit XLA constant-folds the derivation.

    The capture branch must NOT run during model.init — flax makes every
    collection mutable there, so init would bake q_w derived from the
    random init weights into the variables, the tolerant checkpoint load
    would keep them (no deploy/* in the ckpt), and eval would consume
    garbage integer weights (found as a real int8 AP=0 on the config-a
    matrix run). Capture is only for an explicit
    apply(..., mutable=['deploy']) (engine/w4a8.py capture_deploy)."""
    if mod.is_mutable_collection("deploy") and not mod.is_initializing():
        q_w, w_scale = Q.quantize_weight_int(
            kernel_folded, w_bit, qspec.per_channel, qspec.wt_percentile)
        b = bias if bias is not None else jnp.zeros((0,), jnp.float32)
        mod.put_variable("deploy", "q_w", q_w)
        mod.put_variable("deploy", "w_scale", w_scale)
        mod.put_variable("deploy", "bias", b)
        mod.put_variable("deploy", "w_bit", jnp.int32(w_bit))
        return q_w, w_scale, bias
    if mod.has_variable("deploy", "q_w"):
        q_w = mod.get_variable("deploy", "q_w").astype(jnp.int8)
        w_scale = mod.get_variable("deploy", "w_scale")
        b = mod.get_variable("deploy", "bias")
        return q_w, w_scale, (None if b.shape[0] == 0 else b)
    q_w, w_scale = Q.quantize_weight_int(
        kernel_folded, w_bit, qspec.per_channel, qspec.wt_percentile)
    return q_w, w_scale, bias


def resolve_fakequant_weight(mod, kernel, w_bit, qspec):
    """Fake-quantized float weight, artifact-aware (deform kernels).

    At eval fake_quant_weight's output is exactly q/scale (the STE wrapper
    is numerically the dequantized levels), so the W4A8 artifact can carry
    these weights as int4 levels + scale too: capture mode sows (q, scale),
    artifact mode reconstructs q/scale — bit-identical to re-deriving from
    the float checkpoint. Falls back to plain fake-quant for range modes
    quantize_weight_int doesn't model (asymmetric / per-tensor)."""
    exportable = qspec.wt_mode == "symmetric" and qspec.per_channel
    if exportable and mod.is_mutable_collection("deploy") \
            and not mod.is_initializing():
        q_w, w_scale = Q.quantize_weight_int(
            kernel, w_bit, qspec.per_channel, qspec.wt_percentile)
        mod.put_variable("deploy", "q_w", q_w)
        mod.put_variable("deploy", "w_scale", w_scale)
        mod.put_variable("deploy", "bias", jnp.zeros((0,), jnp.float32))
        mod.put_variable("deploy", "w_bit", jnp.int32(w_bit))
        return q_w.astype(jnp.float32) / w_scale[None, None, None, :]
    if exportable and mod.has_variable("deploy", "q_w"):
        q_w = mod.get_variable("deploy", "q_w").astype(jnp.float32)
        w_scale = mod.get_variable("deploy", "w_scale")
        return q_w / w_scale[None, None, None, :]
    return Q.fake_quant_weight(kernel, w_bit, qspec.wt_mode,
                               qspec.per_channel, qspec.wt_percentile)


def qt_spatial(fn, x):
    """Apply a quantization-transparent spatial op (slice/concat/shuffle/
    maxpool/nearest-upsample) to a float array or a QTensor's values."""
    if isinstance(x, QTensor):
        return QTensor(fn(x.values), x.scale, x.zero_point)
    return fn(x)


def qt_concat(xs, axis=-1):
    """Concat float arrays or same-scale QTensors (the stage-shared
    activation quantizer guarantees matching scales at merge points)."""
    if isinstance(xs[0], QTensor):
        return QTensor(jnp.concatenate([x.values for x in xs], axis=axis),
                       xs[0].scale, xs[0].zero_point)
    return jnp.concatenate(xs, axis=axis)


def as_float(x):
    return x.dequant() if isinstance(x, QTensor) else x


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static quantization configuration (hashable; part of module config).

    Field semantics follow quantize_shufflenetv2_dcn's arguments
    (reference quantize_model.py:7-24).
    """
    w_bit: int = 4
    a_bit: int = 8
    wt_mode: str = "symmetric"
    act_mode: str = "asymmetric"
    per_channel: bool = True
    wt_percentile: bool = False
    act_percentile: bool = False
    # real-int8 inference lowering: QuantActs emit int8 QTensors and convs
    # run integer MXU matmuls with fused requantization (ops/quant.py)
    int8_infer: bool = False
    # deployment-faithful fake-quant: clamp activations to the signed
    # int8 window exactly like the real-int8 path (the reference's
    # unclamped asymmetric activations have headroom no hardware has;
    # QAT with act_clamp adapts the net to saturation)
    act_clamp: bool = False


def torch_conv_init(groups=1):
    """torch nn.Conv2d default (kaiming_uniform a=sqrt(5)): U(+-1/sqrt(fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin_pg, _ = shape
        fan_in = kh * kw * cin_pg
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def kaiming_normal_relu():
    """torch kaiming_normal_(nonlinearity='relu') on OIHW == normal(0, sqrt(2/fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin_pg, _ = shape
        fan_in = kh * kw * cin_pg
        std = np.sqrt(2.0 / fan_in)
        return jax.random.normal(key, shape, dtype) * std
    return init


def deform_weight_init(in_channels):
    """DeformConv.reset_parameters (modules/dcn_deform_conv.py:49-54):
    U(+-1/sqrt(in_channels * kh * kw)) — note: full in_channels, not per-group."""
    def init(key, shape, dtype=jnp.float32):
        kh, kw, _, _ = shape
        n = in_channels * kh * kw
        bound = 1.0 / np.sqrt(n)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def conv2d(x, kernel, stride=1, padding=1, groups=1, dtype=None):
    """Plain NHWC conv via lax (HWIO kernel)."""
    s = (stride, stride) if isinstance(stride, int) else stride
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=s, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def max_pool(x, window=3, stride=2, padding=1):
    """Max pooling (torch nn.MaxPool2d semantics with explicit padding).

    Float init must be -inf (not finfo.min) so JAX recognizes the max
    monoid and reverse-mode autodiff gets the select-and-scatter rule.
    """
    if jnp.issubdtype(x.dtype, jnp.floating):
        neg = -jnp.inf
    else:
        # reduce_window requires init dtype == operand dtype; a bare
        # Python int would weak-type to int32 and reject int8 operands
        # (--maxpool --int8_infer: layer0's pool runs on the int8 QTensor)
        neg = jnp.array(jnp.iinfo(x.dtype).min, dtype=x.dtype)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)))


def upsample_nearest_2x(x):
    """2x nearest-neighbour upsample (torch nn.Upsample(scale_factor=2))."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def channel_shuffle(x, groups=2):
    """ShuffleNet channel shuffle, NHWC (reference shufflenetv2_dcn.py:29-34)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


def hardtanh(x, min_val, max_val):
    return jnp.clip(x, min_val, max_val)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch semantics (momentum 0.1, unbiased running var).

    In FP32 training mode, normalizes with batch statistics and updates
    running stats (mutable 'batch_stats'). In eval / quant mode it is the
    caller's job to use `mean/var` params (e.g. via fold_bn); calling this
    module with train=False normalizes with running stats.
    """
    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features))
        if train:
            axes = (0, 1, 2)
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean(jnp.square(x - mean[None, None, None, :]),
                           axis=axes)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * n / max(n - 1, 1)
            if not self.is_initializing():
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean[None, None, None, :]) * (scale * inv)[None, None,
                                                               None, :] \
            + bias[None, None, None, :]


class QuantAct(nn.Module):
    """EMA-range activation fake-quantizer (reference QuantAct,
    quant_modules.py:163-225). Identity when qspec is None.

    `update` mirrors running_stat: EMA updates happen before quantization.
    """
    qspec: Optional[QuantSpec]
    mode: str = "asymmetric"

    @nn.compact
    def __call__(self, x, update: bool = False):
        if self.qspec is None:
            return x
        x_min = self.variable("quant_stats", "x_min", lambda: jnp.zeros(1))
        x_max = self.variable("quant_stats", "x_max", lambda: jnp.zeros(1))
        if update and not self.is_initializing():
            assert not self.qspec.int8_infer, \
                "int8 inference runs with frozen activation ranges"
            bmin, bmax = Q.act_range_observe(x, self.qspec.act_percentile)
            nmin, nmax = Q.ema_update(x_min.value, x_max.value, bmin, bmax)
            x_min.value = nmin
            x_max.value = nmax
        if self.qspec.int8_infer and self.mode == "asymmetric":
            return Q.quantize_act_int8(x.astype(jnp.float32),
                                       self.qspec.a_bit, x_min.value,
                                       x_max.value)
        xf = x.astype(jnp.float32)
        out = Q.fake_quant_act(xf, self.qspec.a_bit, x_min.value, x_max.value,
                               self.mode, clamp=self.qspec.act_clamp)
        return out.astype(x.dtype)


class QuantLinear(nn.Module):
    """Quantized linear layer (reference QuantLinear,
    portable_quantizer/quant_modules.py:23-160) — unused by every CoDeNet
    detector, ported for inventory completeness with its quirks intact:
    ranges are per-INPUT-channel (the torch code transposes to dim 1),
    weight ranges are EMA-tracked across forwards (momentum .99, buffers
    in 'quant_stats'), optional group quantization pools ranges over
    `group_number` input-channel groups, and `alpha` blends quantized
    with full-precision weights."""
    features: int
    weight_bit: int = 8
    quant_mode: str = "symmetric"
    per_channel: bool = True
    weight_percentile: bool = False
    group_quantization: bool = False
    group_number: int = 60
    alpha: Optional[float] = None
    full_precision: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update: bool = True):
        cin = x.shape[-1]
        kernel = self.param("kernel", torch_conv_init(),
                            (1, 1, cin, self.features))
        w = kernel[0, 0]  # (cin, features); torch weight is (out, in)
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None

        # per-input-channel ranges over the OUTPUT axis (the reference's
        # transpose(0, 1) makes dim-1 = input features the channel axis)
        if self.per_channel:
            w_min = jnp.min(w, axis=1)
            w_max = jnp.max(w, axis=1)
            if self.weight_percentile and not self.group_quantization:
                n = w.shape[1]
                lo = int(round(n * 0.1 * 0.01))
                hi = int(round(n * 99.9 * 0.01))
                s = jnp.sort(w, axis=1)
                if lo >= 1:
                    w_min = s[:, lo - 1]
                w_max = s[:, min(hi, n) - 1]
            if self.group_quantization:
                g = self.group_number
                glen = cin // g
                gm = w_min[:g * glen].reshape(g, glen)
                gM = w_max[:g * glen].reshape(g, glen)
                w_min = w_min.at[:g * glen].set(
                    jnp.repeat(gm.min(axis=1), glen))
                w_max = w_max.at[:g * glen].set(
                    jnp.repeat(gM.max(axis=1), glen))
            shape = (cin,)
        else:
            if self.weight_percentile:
                w_min, w_max = Q.percentile_min_max(w.reshape(-1))
            else:
                w_min, w_max = w.min(), w.max()
            w_min = jnp.reshape(w_min, (1,))
            w_max = jnp.reshape(w_max, (1,))
            shape = (1,)

        x_min = self.variable("quant_stats", "x_min",
                              lambda: jnp.zeros(shape))
        x_max = self.variable("quant_stats", "x_max",
                              lambda: jnp.zeros(shape))
        if update and not self.is_initializing():
            init = jnp.all(x_min.value == x_max.value)
            nmin = jnp.where(init, w_min,
                             0.99 * x_min.value + 0.01 * w_min)
            nmax = jnp.where(init, w_max,
                             0.99 * x_max.value + 0.01 * w_max)
            x_min.value = nmin
            x_max.value = nmax
        rmin, rmax = x_min.value, x_max.value

        if not self.full_precision:
            b = rmin[:, None] if self.per_channel else rmin
            t = rmax[:, None] if self.per_channel else rmax
            if self.quant_mode == "symmetric":
                wq = Q.symmetric_quant(w, self.weight_bit, b, t)
            else:
                wq = Q.asymmetric_quant(w, self.weight_bit, b, t,
                                        clamp=True)
        else:
            wq = w
        if self.alpha is not None:
            wq = self.alpha * wq + (1.0 - self.alpha) * w
        y = x @ wq
        if bias is not None:
            y = y + bias
        return y


class Conv(nn.Module):
    """Conv2d with optional weight fake-quant (reference Quant_Conv2d,
    quant_modules.py:228-321). Bias stays full precision (bias_bit=None)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1
    use_bias: bool = True
    qspec: Optional[QuantSpec] = None
    w_bit: Optional[int] = None  # override (layer0 uses 8)
    kernel_init: Callable = None  # type: ignore[assignment]
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        is_qt = isinstance(x, QTensor)
        cin = (x.values if is_qt else x).shape[-1]
        kinit = self.kernel_init or torch_conv_init(self.groups)
        kernel = self.param(
            "kernel", kinit,
            (self.kernel_size, self.kernel_size, cin // self.groups,
             self.features))
        bias = self.param("bias", self.bias_init, (self.features,)) \
            if self.use_bias else None
        if is_qt and self.qspec is not None and self.qspec.int8_infer:
            q_w, w_scale, bias = resolve_int8_weights(
                self, kernel, bias, self.w_bit or self.qspec.w_bit,
                self.qspec)
            return Q.int8_conv(x, q_w, w_scale, bias, self.stride,
                               self.padding, self.groups)
        x = as_float(x)
        if self.qspec is not None:
            kernel = Q.fake_quant_weight(
                kernel, self.w_bit or self.qspec.w_bit, self.qspec.wt_mode,
                self.qspec.per_channel, self.qspec.wt_percentile)
        y = conv2d(x, kernel, self.stride, self.padding, self.groups,
                   dtype=self.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)[None, None, None, :]
        return y


class ConvBN(nn.Module):
    """Conv + BatchNorm, BN variables inlined so quant mode can fold them.

    FP32 mode: conv -> batchnorm (torch momentum 0.1 semantics).
    Quant mode: fold BN from (frozen) running stats into the kernel/bias,
    fake-quant the folded kernel per channel, then one conv — the reference
    QuantBnConv2d (quant_modules.py:324-419): QAT trains against frozen
    folded BN, running stats never update in quant mode.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1
    qspec: Optional[QuantSpec] = None
    w_bit: Optional[int] = None
    momentum: float = 0.1
    eps: float = 1e-5
    kernel_init: Callable = None  # type: ignore[assignment]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        is_qt = isinstance(x, QTensor)
        cin = (x.values if is_qt else x).shape[-1]
        f = self.features
        kinit = self.kernel_init or torch_conv_init(self.groups)
        kernel = self.param(
            "kernel", kinit,
            (self.kernel_size, self.kernel_size, cin // self.groups, f))
        gamma = self.param("scale", nn.initializers.ones, (f,))
        beta = self.param("bias", nn.initializers.zeros, (f,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(f))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(f))

        if self.qspec is not None:
            w, b = Q.fold_bn(kernel, None, gamma, beta, ra_mean.value,
                             ra_var.value, self.eps)
            if is_qt and self.qspec.int8_infer:
                q_w, w_scale, b = resolve_int8_weights(
                    self, w, b, self.w_bit or self.qspec.w_bit,
                    self.qspec)
                return Q.int8_conv(x, q_w, w_scale, b, self.stride,
                                   self.padding, self.groups)
            x = as_float(x)
            w = Q.fake_quant_weight(
                w, self.w_bit or self.qspec.w_bit, self.qspec.wt_mode,
                self.qspec.per_channel, self.qspec.wt_percentile)
            y = conv2d(x, w, self.stride, self.padding, self.groups,
                       dtype=self.dtype)
            return y + b.astype(y.dtype)[None, None, None, :]
        x = as_float(x)

        y = conv2d(x, kernel, self.stride, self.padding, self.groups,
                   dtype=self.dtype)
        y = y.astype(jnp.float32)
        if train:
            mean = jnp.mean(y, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(y - mean[None, None, None, :]),
                           axis=(0, 1, 2))
            n = y.shape[0] * y.shape[1] * y.shape[2]
            unbiased = var * n / max(n - 1, 1)
            if not self.is_initializing():
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps)
        return (y - mean[None, None, None, :]) * (gamma * inv)[None, None,
                                                               None, :] \
            + beta[None, None, None, :]


class CodesignDeformBlock(nn.Module):
    """DeformConvWithOffsetScaleBoundPositive (+ its following BN), both modes.

    FP32 (reference modules/dcn_deform_conv.py:285-330 + the BN placed after
    it in the deconv stage, shufflenetv2_dcn.py:300-307):
      s = Hardtanh[-bound+1, bound](conv_scale(x)); o = anchor*(s-1)
      y = depthwise_deform_conv(x, o); y = conv_channel(y) if in != out
      y = BN(y)
    Quant (reference QuantDeformConvWithOffsetScaleBoundPositive,
    quant_modules.py:621-671): conv_scale weights quantized, s additionally
    QuantAct'd after the Hardtanh, deform weights quantized, a QuantAct
    between deform and the 1x1 mixer, and the mixer+BN folded/quantized.

    The ReLU + (QuantAct) + upsample that follow in the deconv stage belong
    to the caller.
    """
    features: int
    stride: int = 1
    offset_bound: int = 8
    qspec: Optional[QuantSpec] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False):
        cin = (x.values if isinstance(x, QTensor) else x).shape[-1]
        # 1x1 scale predictor at the module stride (output space), weight
        # zero / bias one init (modules/dcn_deform_conv.py:295-302)
        conv_scale = Conv(1, kernel_size=1, stride=self.stride, padding=0,
                          use_bias=True, qspec=self.qspec,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.ones,
                          dtype=self.dtype, name="conv_scale")
        s = conv_scale(x)
        s = hardtanh(s, -self.offset_bound + 1, self.offset_bound)
        s = QuantAct(self.qspec, mode="asymmetric", name="scale_act")(
            s, update=update_stats)
        s = as_float(s)

        dw_kernel = self.param("deform_kernel", deform_weight_init(cin),
                               (3, 3, 1, cin))
        if self.qspec is not None:
            dw_kernel = resolve_fakequant_weight(
                self, dw_kernel, self.qspec.w_bit, self.qspec)
        # bilinear gather needs the float domain; integer inputs dequantize
        # here (the sampled values feed the quantized 1x1 mixer next)
        xf = as_float(x)
        from ..ops.deform_pallas import codesign_deform_conv_fast, \
            use_fast_path
        if self.stride == 1 and use_fast_path():
            # VMEM-resident Pallas kernel (Pallas backward too): the fast
            # path for every stride-1 mode — f32 default eval/train, bf16,
            # QAT fake-quant, and the dequantized int8 deform input.
            # int8 inference samples in bf16: the input has only 2^a_bit
            # levels (exact in bf16) and the next QuantAct re-quantizes to
            # a_bit anyway, so bf16 interpolation costs no accuracy while
            # using the fast MXU path.
            if self.dtype == jnp.bfloat16 or (
                    self.qspec is not None and self.qspec.int8_infer):
                kdtype = jnp.bfloat16
            else:
                kdtype = xf.dtype
            y = codesign_deform_conv_fast(xf.astype(kdtype),
                                          s.astype(jnp.float32),
                                          dw_kernel.astype(kdtype))
        else:
            y = codesign_deform_conv(xf, s, dw_kernel, stride=self.stride)

        y = QuantAct(self.qspec, mode=self.qspec.act_mode if self.qspec
                     else "asymmetric", name="deform_act")(
            y, update=update_stats)

        if cin != self.features:
            mixer = ConvBN(self.features, kernel_size=1, stride=1, padding=0,
                           qspec=self.qspec,
                           kernel_init=kaiming_normal_relu(),
                           dtype=self.dtype, name="conv_channel")
            y = mixer(y, train=train)
        else:
            bn = BatchNorm(self.features, name="bn")
            y = bn(y, train=train)
        return y
