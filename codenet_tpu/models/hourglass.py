"""Large Hourglass backbone (reference lib/models/networks/large_hourglass.py,
CornerNet-style exkp) in NHWC flax.

2-stack hourglass with intermediate supervision: pre (7x7 s2 conv-128 +
residual s2 256), recursive hourglass (n=5, dims [256,256,384,384,384,512],
modules [2,2,2,2,2,4], stride-2 residuals in place of pooling —
make_hg_layer, reference :290-293), per-stack heads (3x3 conv no-BN + 1x1;
hm bias -2.19). Forward returns a LIST of head dicts, one per stack
(intermediate supervision, reference :268-283).

Note: this arch uses BN with torch default momentum 0.1 like the others.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, torch_conv_init, upsample_nearest_2x


class ConvBlock(nn.Module):
    """convolution (reference :17-30): conv (+BN) + ReLU."""
    out_dim: int
    k: int = 3
    stride: int = 1
    with_bn: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        pad = (self.k - 1) // 2
        y = nn.Conv(self.out_dim, (self.k, self.k),
                    (self.stride, self.stride), padding=pad,
                    use_bias=not self.with_bn,
                    kernel_init=torch_conv_init())(x)
        if self.with_bn:
            y = BatchNorm(self.out_dim, name="bn")(y, train)
        return nn.relu(y)


class Residual(nn.Module):
    """residual (reference :49-76)."""
    out_dim: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        inp_dim = x.shape[-1]
        y = nn.Conv(self.out_dim, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False,
                    kernel_init=torch_conv_init())(x)
        y = BatchNorm(self.out_dim, name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.out_dim, (3, 3), padding=1, use_bias=False,
                    kernel_init=torch_conv_init())(y)
        y = BatchNorm(self.out_dim, name="bn2")(y, train)
        if self.stride != 1 or inp_dim != self.out_dim:
            skip = nn.Conv(self.out_dim, (1, 1),
                           (self.stride, self.stride), use_bias=False,
                           kernel_init=torch_conv_init(), name="skip_conv")(x)
            skip = BatchNorm(self.out_dim, name="skip_bn")(skip, train)
        else:
            skip = x
        return nn.relu(y + skip)


class ResidualChain(nn.Module):
    """make_layer / make_layer_revr / make_hg_layer as one module."""
    out_dim: int
    modules: int
    mode: str = "up"  # 'up': [in->out, out->out...]; 'revr': [in->in..., in->out]; 'hg': [s2 in->out, out->out...]

    @nn.compact
    def __call__(self, x, train=False):
        if self.mode == "revr":
            inp = x.shape[-1]
            for i in range(self.modules - 1):
                x = Residual(inp, name=f"res{i}")(x, train)
            return Residual(self.out_dim,
                            name=f"res{self.modules - 1}")(x, train)
        first_stride = 2 if self.mode == "hg" else 1
        x = Residual(self.out_dim, first_stride, name="res0")(x, train)
        for i in range(1, self.modules):
            x = Residual(self.out_dim, name=f"res{i}")(x, train)
        return x


class KpModule(nn.Module):
    """Recursive hourglass (reference kp_module :128-186)."""
    n: int
    dims: Tuple[int, ...]
    modules: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, train=False):
        curr_mod, next_mod = self.modules[0], self.modules[1]
        curr_dim, next_dim = self.dims[0], self.dims[1]

        up1 = ResidualChain(curr_dim, curr_mod, "up", name="up1")(x, train)
        low1 = ResidualChain(next_dim, curr_mod, "hg", name="low1")(x, train)
        if self.n > 1:
            low2 = KpModule(self.n - 1, self.dims[1:], self.modules[1:],
                            name="low2")(low1, train)
        else:
            low2 = ResidualChain(next_dim, next_mod, "up",
                                 name="low2")(low1, train)
        low3 = ResidualChain(curr_dim, curr_mod, "revr",
                             name="low3")(low2, train)
        up2 = upsample_nearest_2x(low3)
        return up1 + up2


class HourglassNet(nn.Module):
    """exkp (reference :189-283)."""
    heads: Tuple[Tuple[str, int], ...]
    num_stacks: int = 2
    cnv_dim: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False):
        n = 5
        dims = (256, 256, 384, 384, 384, 512)
        modules = (2, 2, 2, 2, 2, 4)
        curr_dim = dims[0]

        inter = ConvBlock(128, k=7, stride=2, name="pre_conv")(x, train)
        inter = Residual(256, stride=2, name="pre_res")(inter, train)

        outs = []
        for ind in range(self.num_stacks):
            kp = KpModule(n, dims, modules, name=f"kp{ind}")(inter, train)
            cnv = ConvBlock(self.cnv_dim, name=f"cnv{ind}")(kp, train)

            out = {}
            for head, classes in self.heads:
                h = ConvBlock(curr_dim, with_bn=False,
                              name=f"{head}{ind}_conv")(cnv, train)
                bias_init = (nn.initializers.constant(-2.19)
                             if "hm" in head else nn.initializers.zeros)
                h = nn.Conv(classes, (1, 1), use_bias=True,
                            kernel_init=torch_conv_init(),
                            bias_init=bias_init,
                            name=f"{head}{ind}_out")(h)
                out[head] = h.astype(jnp.float32)
            outs.append(out)

            if ind < self.num_stacks - 1:
                a = nn.Conv(curr_dim, (1, 1), use_bias=False,
                            kernel_init=torch_conv_init(),
                            name=f"inters_conv{ind}")(inter)
                a = BatchNorm(curr_dim, name=f"inters_bn{ind}")(a, train)
                b = nn.Conv(curr_dim, (1, 1), use_bias=False,
                            kernel_init=torch_conv_init(),
                            name=f"cnvs_conv{ind}")(cnv)
                b = BatchNorm(curr_dim, name=f"cnvs_bn{ind}")(b, train)
                inter = nn.relu(a + b)
                inter = Residual(curr_dim, name=f"inter_res{ind}")(inter,
                                                                   train)
        return outs


def get_large_hourglass_net(num_layers, heads, head_conv=64, qspec=None,
                            dtype=None):
    del num_layers, head_conv
    if qspec is not None:
        print("warning: quantization is only defined for the shufflenetv2 "
              "arch (reference portable_quantizer); running hourglass FP32")
    heads_t = tuple(sorted(heads.items())) if isinstance(heads, dict) \
        else tuple(heads)
    return HourglassNet(heads=heads_t, num_stacks=2, dtype=dtype)
