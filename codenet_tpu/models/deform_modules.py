"""The deformable-convolution design-space ladder, flax.

The CoDeNet paper's algorithm-hardware co-design explores a ladder of
deformable-conv constraints (reference
lib/models/external/modules/dcn_deform_conv.py:61-384): free-form offsets,
bounded offsets, rounded (integer) offsets, one-scalar-scale square
patterns, and modulated (DCNv2) variants. The flagship
DeformConvWithOffsetScaleBoundPositive lives in layers.CodesignDeformBlock;
this module provides the remaining rungs for experiments and for the
resdcn/dla-dcn architectures (reference DCNv2/dcn_v2.py DCN module).

All operate in NHWC on ops.deform_conv.deform_conv2d.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform_conv import ANCHOR_OFFSETS, deform_conv2d
from .layers import deform_weight_init, hardtanh, torch_conv_init


class DeformConvPack(nn.Module):
    """Free offsets from a 3x3 predictor (reference :61-83)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        offset = nn.Conv(self.deformable_groups * 2 * k * k, (k, k),
                         (self.stride, self.stride), padding=self.padding,
                         use_bias=True, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name="conv_offset")(x)
        weight = self.param("weight", deform_weight_init(cin),
                            (k, k, cin // self.groups, self.features))
        return deform_conv2d(x, offset, weight, self.stride, self.padding,
                             groups=self.groups,
                             deformable_groups=self.deformable_groups)


class DeformConvPack1x1(nn.Module):
    """Offsets from a 1x1 predictor (reference :86-108)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        offset = nn.Conv(self.deformable_groups * 2 * k * k, (1, 1),
                         (self.stride, self.stride), padding=0,
                         use_bias=True, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name="conv_offset")(x)
        weight = self.param("weight", deform_weight_init(cin),
                            (k, k, cin // self.groups, self.features))
        return deform_conv2d(x, offset, weight, self.stride, self.padding,
                             groups=self.groups,
                             deformable_groups=self.deformable_groups)


class DeformConvPackDW(nn.Module):
    """Depthwise+pointwise offset predictor (reference :111-129)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        o = nn.Conv(cin, (3, 3), padding=1, feature_group_count=cin,
                    use_bias=True, kernel_init=torch_conv_init(cin),
                    name="conv_dw")(x)
        offset = nn.Conv(self.deformable_groups * 18, (1, 1), padding=0,
                         use_bias=True, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros, name="conv_pw")(o)
        weight = self.param("weight", deform_weight_init(cin),
                            (k, k, cin // self.groups, self.features))
        return deform_conv2d(x, offset, weight, self.stride, self.padding,
                             groups=self.groups,
                             deformable_groups=self.deformable_groups)


class ModulatedDeformConvPack(nn.Module):
    """DCNv2: offsets + sigmoid mask (reference :179-205 and
    DCNv2/dcn_v2.py:96-130 `DCN` — the module used by the resdcn/dla-dcn
    upsampling paths)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1
    deformable_groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        dg = self.deformable_groups
        om = nn.Conv(dg * 3 * k * k, (k, k), (self.stride, self.stride),
                     padding=self.padding, use_bias=True,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     name="conv_offset_mask")(x)
        o1, o2, mask = jnp.split(om, 3, axis=-1)
        # reference layout: offset channels interleave (dy, dx) per tap
        n, ho, wo, _ = o1.shape
        offset = jnp.stack([o1.reshape(n, ho, wo, dg, k * k),
                            o2.reshape(n, ho, wo, dg, k * k)],
                           axis=-1).reshape(n, ho, wo, dg * 2 * k * k)
        mask = jax.nn.sigmoid(mask)
        weight = self.param("weight", deform_weight_init(cin),
                            (k, k, cin // self.groups, self.features))
        y = deform_conv2d(x, offset, weight, self.stride, self.padding,
                          groups=self.groups, deformable_groups=dg,
                          mask=mask)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias[None, None, None, :]
        return y


class DeformConvWithOffsetBound(nn.Module):
    """Hardtanh-bounded free offsets (reference :208-222)."""
    features: int
    offset_bound: int = 8
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        offset = nn.Conv(self.deformable_groups * 18, (3, 3), padding=1,
                         use_bias=True, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name="conv_offset")(x)
        offset = hardtanh(offset, -self.offset_bound, self.offset_bound)
        weight = self.param("weight", deform_weight_init(cin),
                            (3, 3, cin, self.features))
        return deform_conv2d(x, offset, weight,
                             deformable_groups=self.deformable_groups)


class DeformConvWithOffsetRound(nn.Module):
    """Integer offsets — no bilinear (reference :225-237). The round is a
    straight-through op so the offset predictor still trains."""
    features: int
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        offset = nn.Conv(self.deformable_groups * 18, (3, 3), padding=1,
                         use_bias=True, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name="conv_offset")(x)
        offset = offset + jax.lax.stop_gradient(jnp.round(offset) - offset)
        weight = self.param("weight", deform_weight_init(cin),
                            (3, 3, cin, self.features))
        return deform_conv2d(x, offset, weight,
                             deformable_groups=self.deformable_groups)


class DeformConvWithOffsetScale(nn.Module):
    """One scalar scale per position, unbounded (reference :240-258)."""
    features: int
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        s = nn.Conv(self.deformable_groups, (3, 3), padding=1, use_bias=True,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.ones, name="conv_scale")(x)
        anchor = jnp.asarray(ANCHOR_OFFSETS).reshape(18)
        offset = anchor[None, None, None, :] * (s - 1.0)
        weight = self.param("weight", deform_weight_init(cin),
                            (3, 3, cin, self.features))
        return deform_conv2d(x, offset, weight,
                             deformable_groups=self.deformable_groups)


class DeformConvWithOffsetScaleBound(nn.Module):
    """Scale bounded to [-bound, bound] (reference :261-282)."""
    features: int
    offset_bound: int = 8
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        s = nn.Conv(self.deformable_groups, (3, 3), padding=1, use_bias=True,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.ones, name="conv_scale")(x)
        s = hardtanh(s, -self.offset_bound, self.offset_bound)
        anchor = jnp.asarray(ANCHOR_OFFSETS).reshape(18)
        offset = anchor[None, None, None, :] * (s - 1.0)
        weight = self.param("weight", deform_weight_init(cin),
                            (3, 3, cin, self.features))
        return deform_conv2d(x, offset, weight,
                             deformable_groups=self.deformable_groups)


class ModulatedDeformConvWithOffsetScaleBoundPositive(nn.Module):
    """Scale-square pattern + per-tap modulation mask (reference :333-357)."""
    features: int
    offset_bound: int = 8
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        dg = self.deformable_groups
        mask = nn.Conv(dg * 9, (3, 3), padding=1, use_bias=True,
                       kernel_init=torch_conv_init(), name="conv_mask")(x)
        s = nn.Conv(dg, (3, 3), padding=1, use_bias=True,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.ones, name="conv_scale")(x)
        s = hardtanh(s, 0, self.offset_bound)
        anchor = jnp.asarray(ANCHOR_OFFSETS).reshape(18)
        offset = anchor[None, None, None, :] * (s - 1.0)
        weight = self.param("weight", deform_weight_init(cin),
                            (3, 3, cin, self.features))
        return deform_conv2d(x, offset, weight, deformable_groups=dg,
                             mask=mask)
