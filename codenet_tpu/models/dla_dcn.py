"""DLA-34 + DCNv2 upsampling ("dla" arch, reference pose_dla_dcn.py).

The reference tree ships this network but comments it out of its factory
(model.py:12-13,20-21); here it is wired and working. Differences from
dlav0 (dlav0.py): the up path replaces plain 1x1 projections and concat
nodes with DCNv2 DeformConv blocks (pose_dla_dcn.py:346-360) and SUM
nodes (IDAUp.forward :382-388), and a final IDAUp aggregates the three
finest levels into the stride-4 head feature (DLASeg.forward :470-478).

Layout: NHWC; the DCN runs through the general deformable conv
(ops/deform_conv.py) with mask (DCNv2).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .dlav0 import (ConvBnRelu, Tree, _msra_init, bilinear_up_kernel,
                    depthwise_up)
from .deform_modules import ModulatedDeformConvPack
from .layers import BatchNorm


class DeformConvBlock(nn.Module):
    """DCN -> BN -> ReLU (reference pose_dla_dcn.py DeformConv :346-360)."""
    features: int

    @nn.compact
    def __call__(self, x, train=False):
        y = ModulatedDeformConvPack(self.features, name="conv")(x)
        y = BatchNorm(self.features, name="bn")(y, train)
        return nn.relu(y)


class IDAUpDCN(nn.Module):
    """IDAUp with DCN proj/node and sum merge (reference :363-388).

    Processes a layer list: layers[0] passes through; each later layer is
    proj -> bilinear-up -> node(l + previous). Returns the new list.
    """
    out_dim: int
    up_factors: Tuple[int, ...]

    @nn.compact
    def __call__(self, layers, train=False):
        layers = list(layers)
        for i in range(1, len(layers)):
            l = DeformConvBlock(self.out_dim, name=f"proj_{i}")(
                layers[i], train)
            f = int(self.up_factors[i])
            if f > 1:
                up_k = self.param(
                    f"up_{i}_kernel",
                    lambda key, shape, f=f: jnp.asarray(
                        bilinear_up_kernel(f)), (2 * f, 2 * f))
                l = depthwise_up(l, f, up_k)
            layers[i] = DeformConvBlock(self.out_dim, name=f"node_{i}")(
                l + layers[i - 1], train)
        return layers


class DLASegDCN(nn.Module):
    """DLA base + DCN DLAUp + final IDAUp + heads (reference DLASeg
    :428-478). first_level = log2(down_ratio); last_level = 5."""
    heads: Tuple[Tuple[str, int], ...]
    head_conv: int = 256
    down_ratio: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False):
        levels = [1, 1, 1, 2, 2, 1]
        channels = [16, 32, 64, 128, 256, 512]
        first_level = int(np.log2(self.down_ratio))
        last_level = 5

        # base DLA-34 (reference DLA :227-296; structure shared with dlav0)
        y = ConvBnRelu(channels[0], kernel=7, name="base_layer")(x, train)
        outs = []
        y = ConvBnRelu(channels[0], name="level0")(y, train)
        outs.append(y)
        y = ConvBnRelu(channels[1], stride=2, name="level1")(y, train)
        outs.append(y)
        for lv in (2, 3, 4, 5):
            y = Tree(levels[lv], channels[lv], 2, level_root=lv != 2,
                     name=f"level{lv}")(y, None, None, train)
            outs.append(y)

        # DLAUp over channels[first_level:] (reference :391-415)
        layers = outs[first_level:]
        chans = channels[first_level:]
        scales = np.array([2 ** i for i in range(len(chans))], int)
        out_list = [layers[-1]]
        for i in range(len(chans) - 1):
            j = -i - 2
            ida = IDAUpDCN(chans[j],
                           tuple(int(s) for s in scales[j:] // scales[j]),
                           name=f"ida_{i}")
            layers[j:] = ida(layers[j:], train)
            out_list.insert(0, layers[-1])
            scales[j + 1:] = scales[j]

        # final IDAUp to the stride-4 feature (reference :446-447,470-475)
        n_final = last_level - first_level
        y_fin = IDAUpDCN(channels[first_level],
                         tuple(2 ** i for i in range(n_final)),
                         name="ida_up")(out_list[:n_final], train)
        feat = y_fin[-1]

        ret = {}
        for name, classes in self.heads:
            if self.head_conv > 0:
                h = nn.Conv(self.head_conv, (3, 3), padding=1,
                            use_bias=True, kernel_init=_msra_init(),
                            name=f"head_{name}_conv1")(feat)
                h = nn.relu(h)
                bias_init = (nn.initializers.constant(-2.19)
                             if "hm" in name else nn.initializers.zeros)
                h = nn.Conv(classes, (1, 1), use_bias=True,
                            kernel_init=_msra_init(), bias_init=bias_init,
                            name=f"head_{name}_out")(h)
            else:
                bias_init = (nn.initializers.constant(-2.19)
                             if "hm" in name else nn.initializers.zeros)
                h = nn.Conv(classes, (1, 1), use_bias=True,
                            kernel_init=_msra_init(), bias_init=bias_init,
                            name=f"head_{name}_out")(feat)
            ret[name] = h.astype(jnp.float32)
        return ret


def get_pose_net(num_layers, heads, head_conv=256, qspec=None, dtype=None,
                 down_ratio=4):
    if num_layers not in (0, 34):
        print(f"dla_dcn: only dla34 is implemented; got dla{num_layers}, "
              "using 34")
    if qspec is not None:
        print("warning: quantization is only defined for the shufflenetv2 "
              "arch (reference portable_quantizer); running dla in FP32")
    heads_t = tuple(sorted(heads.items())) if isinstance(heads, dict) \
        else tuple(heads)
    return DLASegDCN(heads=heads_t, head_conv=head_conv,
                     down_ratio=down_ratio, dtype=dtype)
