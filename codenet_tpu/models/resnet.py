"""ResNet + transposed-conv backbone (reference
lib/models/networks/msra_resnet.py, PoseResNet :108-281).

NHWC flax rebuild: resnet stem (7x7 s2 + maxpool), 4 stages of
BasicBlock/Bottleneck, 3 ConvTranspose 4x4 s2 deconvs to stride 4, simple
3x3+1x1 heads with hm bias -2.19. Quantization is not defined for this arch
in the reference (portable_quantizer targets shufflenetv2 only); qspec is
accepted and ignored with a warning for CLI parity.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import BatchNorm, max_pool, torch_conv_init


def _deconv_init(std=0.001):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std
    return init


def conv_transpose_4x4_s2(x, kernel):
    """torch ConvTranspose2d(k=4, s=2, p=1) in NHWC: output 2x spatial.

    Gradient-style transpose: input dilated by 2, spatially-flipped kernel,
    padding k-1-p=2 (verified numerically against torch.conv_transpose2d).
    kernel layout: HWIO (kh, kw, in, out).
    """
    flipped = kernel[::-1, ::-1]
    return jax.lax.conv_general_dilated(
        x, flipped, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion = 1

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False,
                    kernel_init=torch_conv_init())(x)
        y = BatchNorm(self.planes, name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    kernel_init=torch_conv_init())(y)
        y = BatchNorm(self.planes, name="bn2")(y, train)
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               kernel_init=torch_conv_init(),
                               name="down_conv")(x)
            residual = BatchNorm(self.planes, name="down_bn")(residual,
                                                              train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion = 4

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        out_planes = self.planes * 4
        y = nn.Conv(self.planes, (1, 1), use_bias=False,
                    kernel_init=torch_conv_init())(x)
        y = BatchNorm(self.planes, name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False,
                    kernel_init=torch_conv_init())(y)
        y = BatchNorm(self.planes, name="bn2")(y, train)
        y = nn.relu(y)
        y = nn.Conv(out_planes, (1, 1), use_bias=False,
                    kernel_init=torch_conv_init())(y)
        y = BatchNorm(out_planes, name="bn3")(y, train)
        if self.downsample:
            residual = nn.Conv(out_planes, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               kernel_init=torch_conv_init(),
                               name="down_conv")(x)
            residual = BatchNorm(out_planes, name="down_bn")(residual, train)
        return nn.relu(y + residual)


RESNET_SPEC = {
    18: (BasicBlock, [2, 2, 2, 2]),
    34: (BasicBlock, [3, 4, 6, 3]),
    50: (Bottleneck, [3, 4, 6, 3]),
    101: (Bottleneck, [3, 4, 23, 3]),
    152: (Bottleneck, [3, 8, 36, 3]),
}


class PoseResNet(nn.Module):
    heads: Tuple[Tuple[str, int], ...]
    num_layers: int = 18
    head_conv: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False):
        block, layers = RESNET_SPEC[self.num_layers]
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    kernel_init=torch_conv_init(), name="conv1")(x)
        y = BatchNorm(64, name="bn1")(y, train)
        y = nn.relu(y)
        y = max_pool(y, 3, 2, 1)

        inplanes = 64
        for si, (planes, blocks) in enumerate(
                zip([64, 128, 256, 512], layers)):
            stride = 1 if si == 0 else 2
            need_down = stride != 1 or inplanes != planes * block.expansion
            y = block(planes, stride, need_down,
                      name=f"layer{si + 1}_0")(y, train)
            for bi in range(1, blocks):
                y = block(planes, 1, False,
                          name=f"layer{si + 1}_{bi}")(y, train)
            inplanes = planes * block.expansion

        # 3 deconvs to stride 4 (reference :185-210), weights N(0, 0.001)
        for i in range(3):
            cin = y.shape[-1]
            kernel = self.param(f"deconv{i}_kernel", _deconv_init(),
                                (4, 4, cin, 256))
            y = conv_transpose_4x4_s2(y, kernel)
            y = BatchNorm(256, name=f"deconv{i}_bn")(y, train)
            y = nn.relu(y)

        out = {}
        for name, classes in self.heads:
            if self.head_conv > 0:
                h = nn.Conv(self.head_conv, (3, 3), padding=1, use_bias=True,
                            kernel_init=torch_conv_init(),
                            name=f"head_{name}_conv1")(y)
                h = nn.relu(h)
                bias_init = (nn.initializers.constant(-2.19)
                             if "hm" in name else nn.initializers.zeros)
                kinit = (torch_conv_init() if "hm" in name
                         else _deconv_init())
                h = nn.Conv(classes, (1, 1), use_bias=True,
                            kernel_init=kinit, bias_init=bias_init,
                            name=f"head_{name}_out")(h)
            else:
                bias_init = (nn.initializers.constant(-2.19)
                             if "hm" in name else nn.initializers.zeros)
                h = nn.Conv(classes, (1, 1), use_bias=True,
                            kernel_init=torch_conv_init(),
                            bias_init=bias_init,
                            name=f"head_{name}_out")(y)
            out[name] = h.astype(jnp.float32)
        return out


def _dcn_up_init():
    """resnet_dcn's transposed-conv init (reference resnet_dcn.py
    fill_up_weights): torch-default uniform, then output channel 0 gets
    the bilinear kernel from every input channel — the upstream quirk is
    that only out-channel 0 is overwritten (fill_up_weights was written
    for DLA's grouped out-per-group=1 transposed convs)."""
    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        w = torch_conv_init()(key, shape, dtype)
        f = (kh + 1) // 2
        c = (2 * f - 1 - f % 2) / (2.0 * f)
        i = jnp.arange(kh, dtype=dtype)
        j = jnp.arange(kw, dtype=dtype)
        bil = ((1 - jnp.abs(i / f - c))[:, None]
               * (1 - jnp.abs(j / f - c))[None, :])
        return w.at[:, :, :, 0].set(bil[:, :, None])
    return init


class PoseResNetDCN(nn.Module):
    """ResNet + DCNv2 deconv path (reference resnet_dcn.py, the arch the
    reference comments out of its factory, model.py:12-13,20-21 — wired
    here): each of the 3 deconv stages is DCN(3x3) -> BN -> ReLU ->
    ConvTranspose(4x4, s2) -> BN -> ReLU, planes [256, 128, 64]."""
    heads: Tuple[Tuple[str, int], ...]
    num_layers: int = 18
    head_conv: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False):
        from .deform_modules import ModulatedDeformConvPack

        block, layers = RESNET_SPEC[self.num_layers]
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    kernel_init=torch_conv_init(), name="conv1")(x)
        y = BatchNorm(64, name="bn1")(y, train)
        y = nn.relu(y)
        y = max_pool(y, 3, 2, 1)

        inplanes = 64
        for si, (planes, blocks) in enumerate(
                zip([64, 128, 256, 512], layers)):
            stride = 1 if si == 0 else 2
            need_down = stride != 1 or inplanes != planes * block.expansion
            y = block(planes, stride, need_down,
                      name=f"layer{si + 1}_0")(y, train)
            for bi in range(1, blocks):
                y = block(planes, 1, False,
                          name=f"layer{si + 1}_{bi}")(y, train)
            inplanes = planes * block.expansion

        for i, planes in enumerate([256, 128, 64]):
            y = ModulatedDeformConvPack(planes, name=f"deconv{i}_dcn")(y)
            y = BatchNorm(planes, name=f"deconv{i}_bn1")(y, train)
            y = nn.relu(y)
            kernel = self.param(f"deconv{i}_up", _dcn_up_init(),
                                (4, 4, planes, planes))
            y = conv_transpose_4x4_s2(y, kernel)
            y = BatchNorm(planes, name=f"deconv{i}_bn2")(y, train)
            y = nn.relu(y)

        out = {}
        for name, classes in self.heads:
            if self.head_conv > 0:
                h = nn.Conv(self.head_conv, (3, 3), padding=1,
                            use_bias=True, kernel_init=torch_conv_init(),
                            name=f"head_{name}_conv1")(y)
                h = nn.relu(h)
                bias_init = (nn.initializers.constant(-2.19)
                             if "hm" in name else nn.initializers.zeros)
                h = nn.Conv(classes, (1, 1), use_bias=True,
                            kernel_init=torch_conv_init(),
                            bias_init=bias_init,
                            name=f"head_{name}_out")(h)
            else:
                bias_init = (nn.initializers.constant(-2.19)
                             if "hm" in name else nn.initializers.zeros)
                h = nn.Conv(classes, (1, 1), use_bias=True,
                            kernel_init=torch_conv_init(),
                            bias_init=bias_init,
                            name=f"head_{name}_out")(y)
            out[name] = h.astype(jnp.float32)
        return out


def get_pose_net_dcn(num_layers, heads, head_conv=64, qspec=None,
                     dtype=None):
    if qspec is not None:
        print("warning: quantization is only defined for the shufflenetv2 "
              "arch (reference portable_quantizer); running resdcn in FP32")
    heads_t = tuple(sorted(heads.items())) if isinstance(heads, dict) \
        else tuple(heads)
    return PoseResNetDCN(heads=heads_t, num_layers=num_layers or 18,
                         head_conv=head_conv, dtype=dtype)


def get_pose_net(num_layers, heads, head_conv=64, qspec=None, dtype=None):
    if qspec is not None:
        print("warning: quantization is only defined for the shufflenetv2 "
              "arch (reference portable_quantizer); running resnet in FP32")
    heads_t = tuple(sorted(heads.items())) if isinstance(heads, dict) \
        else tuple(heads)
    return PoseResNet(heads=heads_t, num_layers=num_layers or 18,
                      head_conv=head_conv, dtype=dtype)
