"""DLA-v0 backbone + IDA upsampling (reference lib/models/networks/dlav0.py).

DLA34 (levels [1,1,1,2,2,1], channels [16,32,64,128,256,512]) with the
hierarchical Tree/Root aggregation, DLAUp iterative deep aggregation to
stride `down_ratio`, and CenterNet heads — NHWC flax. The IDA upsamplers are
depthwise transposed convs initialized to bilinear interpolation
(fill_up_weights, reference :429-438), expressed as grouped dilated convs.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import BatchNorm, max_pool


def _msra_init():
    """normal(0, sqrt(2/fan_out)) as in DLA's init (reference :254-257)."""
    def init(key, shape, dtype=jnp.float32):
        kh, kw, _, out = shape
        n = kh * kw * out
        return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / n)
    return init


def _head_init(std=0.001):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std
    return init


def bilinear_up_kernel(f):
    """fill_up_weights bilinear kernel of size 2f (reference :429-438)."""
    k = 2 * f
    fc = math.ceil(k / 2)
    c = (2 * fc - 1 - fc % 2) / (2.0 * fc)
    w = np.zeros((k, k), np.float32)
    for i in range(k):
        for j in range(k):
            w[i, j] = (1 - abs(i / fc - c)) * (1 - abs(j / fc - c))
    return w


def depthwise_up(x, f, kernel_hw):
    """torch ConvTranspose2d(C, C, 2f, stride=f, padding=f//2, groups=C) as
    a grouped dilated conv (NHWC). kernel_hw: (2f, 2f) shared per channel."""
    c = x.shape[-1]
    k = 2 * f
    kernel = jnp.broadcast_to(kernel_hw[::-1, ::-1, None, None],
                              (k, k, 1, c))
    pad = k - 1 - f // 2
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
        lhs_dilation=(f, f), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


class ConvBnRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        pad = (self.kernel - 1) // 2
        y = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride), padding=pad, use_bias=False,
                    kernel_init=_msra_init())(x)
        y = BatchNorm(self.features, name="bn")(y, train)
        return nn.relu(y)


class DlaBasicBlock(nn.Module):
    """DLA BasicBlock (reference :29-59); forward takes explicit residual."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, residual=None, train=False):
        if residual is None:
            residual = x
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=_msra_init())(x)
        y = BatchNorm(self.planes, name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    kernel_init=_msra_init())(y)
        y = BatchNorm(self.planes, name="bn2")(y, train)
        return nn.relu(y + residual)


class Root(nn.Module):
    """Aggregation node (reference :145-163)."""
    out_channels: int
    residual: bool = False

    @nn.compact
    def __call__(self, xs, train=False):
        x = jnp.concatenate(xs, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    kernel_init=_msra_init())(x)
        x = BatchNorm(self.out_channels, name="bn")(x, train)
        if self.residual:
            x = x + xs[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Hierarchical aggregation tree (reference :166-219)."""
    levels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False

    @nn.compact
    def __call__(self, x, residual=None, children=None, train=False):
        in_channels = x.shape[-1]
        root_dim = self.root_dim
        if root_dim == 0:
            root_dim = 2 * self.out_channels
        if self.level_root:
            root_dim += in_channels

        children = [] if children is None else list(children)
        bottom = max_pool(x, self.stride, self.stride, 0) \
            if self.stride > 1 else x
        if in_channels != self.out_channels:
            res = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                          kernel_init=_msra_init(), name="project_conv")(
                bottom)
            res = BatchNorm(self.out_channels, name="project_bn")(res, train)
        else:
            res = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = DlaBasicBlock(self.out_channels, self.stride,
                               name="tree1")(x, res, train)
            x2 = DlaBasicBlock(self.out_channels, 1, name="tree2")(
                x1, None, train)
            out = Root(self.out_channels, self.root_residual, name="root")(
                [x2, x1] + children, train)
        else:
            x1 = Tree(self.levels - 1, self.out_channels, self.stride,
                      root_residual=self.root_residual, name="tree1")(
                x, res, None, train)
            children.append(x1)
            out = Tree(self.levels - 1, self.out_channels, 1,
                       root_dim=root_dim + self.out_channels,
                       root_residual=self.root_residual, name="tree2")(
                x1, None, children, train)
        return out


class IDAUp(nn.Module):
    """Iterative deep aggregation step (reference :441-497)."""
    out_dim: int
    up_factors: Tuple[int, ...]

    @nn.compact
    def __call__(self, layers, train=False):
        layers = list(layers)
        for i, l in enumerate(layers):
            if l.shape[-1] != self.out_dim:
                l = nn.Conv(self.out_dim, (1, 1), use_bias=False,
                            kernel_init=_msra_init(),
                            name=f"proj_{i}_conv")(l)
                l = BatchNorm(self.out_dim, name=f"proj_{i}_bn")(l, train)
                l = nn.relu(l)
            f = int(self.up_factors[i])
            if f > 1:
                up_k = self.param(f"up_{i}_kernel",
                                  lambda key, shape: jnp.asarray(
                                      bilinear_up_kernel(f)),
                                  (2 * f, 2 * f))
                l = depthwise_up(l, f, up_k)
            layers[i] = l
        x = layers[0]
        ys = []
        for i in range(1, len(layers)):
            x = ConvBnRelu(self.out_dim, kernel=3, name=f"node_{i}")(
                jnp.concatenate([x, layers[i]], axis=-1), train)
            ys.append(x)
        return x, ys


class DLASeg(nn.Module):
    """DLA34 + DLAUp + heads (reference DLASeg :534-619)."""
    heads: Tuple[Tuple[str, int], ...]
    head_conv: int = 256
    down_ratio: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False):
        levels = [1, 1, 1, 2, 2, 1]
        channels = [16, 32, 64, 128, 256, 512]
        first_level = int(np.log2(self.down_ratio))

        # base DLA34 (reference DLA :222-296)
        y = ConvBnRelu(channels[0], kernel=7, name="base_layer")(x, train)
        outs = []
        # level0/level1: plain conv levels
        y = ConvBnRelu(channels[0], name="level0")(y, train)
        outs.append(y)
        y = ConvBnRelu(channels[1], stride=2, name="level1")(y, train)
        outs.append(y)
        y = Tree(levels[2], channels[2], 2, level_root=False,
                 name="level2")(y, None, None, train)
        outs.append(y)
        y = Tree(levels[3], channels[3], 2, level_root=True,
                 name="level3")(y, None, None, train)
        outs.append(y)
        y = Tree(levels[4], channels[4], 2, level_root=True,
                 name="level4")(y, None, None, train)
        outs.append(y)
        y = Tree(levels[5], channels[5], 2, level_root=True,
                 name="level5")(y, None, None, train)
        outs.append(y)

        # DLAUp (reference :500-531)
        layers = outs[first_level:]
        chans = channels[first_level:]
        scales = np.array([2 ** i for i in range(len(chans))], int)
        in_channels = list(chans)
        x_out = None
        for i in range(len(layers) - 1):
            j = -i - 2
            ida = IDAUp(chans[j],
                        tuple(int(s) for s in scales[j:] // scales[j]),
                        name=f"ida_{i}")
            x_out, ys = ida(layers[j:], train)
            layers[-i - 1:] = ys
            scales[j + 1:] = scales[j]
            in_channels[j + 1:] = [chans[j] for _ in chans[j + 1:]]

        ret = {}
        for name, classes in self.heads:
            if self.head_conv > 0:
                h = nn.Conv(self.head_conv, (3, 3), padding=1, use_bias=True,
                            kernel_init=_msra_init(),
                            name=f"head_{name}_conv1")(x_out)
                h = nn.relu(h)
                bias_init = (nn.initializers.constant(-2.19)
                             if "hm" in name else nn.initializers.zeros)
                kinit = _msra_init() if "hm" in name else _head_init()
                h = nn.Conv(classes, (1, 1), use_bias=True,
                            kernel_init=kinit, bias_init=bias_init,
                            name=f"head_{name}_out")(h)
            else:
                bias_init = (nn.initializers.constant(-2.19)
                             if "hm" in name else nn.initializers.zeros)
                h = nn.Conv(classes, (1, 1), use_bias=True,
                            kernel_init=_msra_init(), bias_init=bias_init,
                            name=f"head_{name}_out")(x_out)
            ret[name] = h.astype(jnp.float32)
        return ret


def get_pose_net(num_layers, heads, head_conv=256, qspec=None, dtype=None,
                 down_ratio=4):
    if num_layers not in (0, 34):
        print(f"dlav0: only dla34 is implemented; got dla{num_layers}, "
              "using 34")
    if qspec is not None:
        print("warning: quantization is only defined for the shufflenetv2 "
              "arch (reference portable_quantizer); running dlav0 in FP32")
    heads_t = tuple(sorted(heads.items())) if isinstance(heads, dict) \
        else tuple(heads)
    return DLASeg(heads=heads_t, head_conv=head_conv, down_ratio=down_ratio,
                  dtype=dtype)
