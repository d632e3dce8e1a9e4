"""ShuffleNetV2 + co-designed deformable deconv — the CoDeNet flagship.

TPU-native rebuild of reference lib/models/networks/shufflenetv2_dcn.py
(PoseShuffleNetV2, :189-330): NHWC, flax, one module tree for both FP32 and
W4A8-quantized execution (see layers.py). The quantized placement map —
which activations are range-tracked, which convs share a per-stage range at
the concat/shuffle merge — mirrors
portable_quantizer/quantization_utils/quantize_model.py:26-82 exactly, since
that placement is accuracy-critical.

Fixes two reference defects noted in SURVEY.md §2.3: `w2`/`maxpool` are
threaded through the factory (reference model.py:27-32 drops them), and
pretrained-backbone loading is an explicit converter step instead of dead
code (shufflenetv2_dcn.py:343-361).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import (BatchNorm, CodesignDeformBlock, Conv, ConvBN, QuantAct,
                     QuantSpec, channel_shuffle, kaiming_normal_relu,
                     max_pool, qt_concat, qt_spatial, upsample_nearest_2x)


class BaseNode(nn.Module):
    """ShuffleNetV2 unit (reference shufflenetv2_dcn.py:57-114).

    stride 1: split channels; branch2 = pw+BN+ReLU -> dw+BN -> pw+BN+ReLU.
    stride 2: branch1 = dw(s2)+BN -> pw+BN+ReLU; branch2 = pw+BN+ReLU ->
    dw(s2)+BN -> pw+BN+ReLU. Concat + channel shuffle.

    Quantized activation placement follows QuantBaseNode
    (quant_modules.py:809-907): asymmetric act after the first pw-ReLU,
    act_quant_mode act after the dw, and the STAGE-SHARED act at every
    branch output feeding the concat (set_act, quantize_model.py:40-51).
    """
    oup: int
    stride: int
    qspec: Optional[QuantSpec] = None
    deform: bool = False
    dtype: Optional[jnp.dtype] = None

    def _dw(self, name, features, stride):
        """The 3x3 depthwise conv(+BN): plain, or the co-designed deform
        variant when deform_backbone is on (reference
        shufflenetv2_dcn.py:216-230 conv_kernel selection; quantized
        counterpart QuantBaseNodeDeform, quant_modules.py:915-1010)."""
        if self.deform:
            block = CodesignDeformBlock(features, stride=stride,
                                        qspec=self.qspec, dtype=self.dtype,
                                        name=name)
            return lambda x, train: block(x, train=train)
        conv = ConvBN(features, kernel_size=3, stride=stride, padding=1,
                      groups=features, qspec=self.qspec, dtype=self.dtype,
                      name=name)
        return lambda x, train: conv(x, train=train)

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False):
        """Returns (x1, x2, x1_needs_share): the two branches BEFORE the
        stage-shared activation quantizer. The Stage applies the shared
        quantizer (to x2 always; to x1 only for stride-2 nodes — stride-1
        passes x1 through untouched, QuantBaseNode.forward
        quant_modules.py:883-889) and then concat + channel-shuffles."""
        oup_inc = self.oup // 2
        q = self.qspec
        amode = q.act_mode if q else "asymmetric"

        if self.stride == 1:
            xv = x.values if hasattr(x, "values") else x
            split = xv.shape[-1] // 2
            x1 = qt_spatial(lambda v: v[..., :split], x)
            x2 = qt_spatial(lambda v: v[..., split:], x)
            x1_needs_share = False
        else:
            cin = (x.values if hasattr(x, "values") else x).shape[-1]
            # branch 1: dw s2 + BN -> pw + BN + ReLU
            b1 = self._dw("b1_conv1", cin, 2)(x, train)
            b1 = QuantAct(q, mode=amode, name="b1_act1")(b1, update=update_stats)
            b1 = ConvBN(oup_inc, kernel_size=1, stride=1, padding=0, qspec=q,
                        dtype=self.dtype, name="b1_conv2")(b1, train=train)
            x1 = nn.relu(b1)
            x2 = x
            x1_needs_share = True

        # branch 2: pw + BN + ReLU -> dw + BN -> pw + BN + ReLU
        y = ConvBN(oup_inc, kernel_size=1, stride=1, padding=0, qspec=q,
                   dtype=self.dtype, name="b2_conv1")(x2, train=train)
        y = nn.relu(y)
        y = QuantAct(q, mode="asymmetric", name="b2_act1")(y, update=update_stats)
        y = self._dw("b2_conv2", oup_inc, self.stride)(y, train)
        y = QuantAct(q, mode=amode, name="b2_act2")(y, update=update_stats)
        y = ConvBN(oup_inc, kernel_size=1, stride=1, padding=0, qspec=q,
                   dtype=self.dtype, name="b2_conv3")(y, train=train)
        x2 = nn.relu(y)
        return x1, x2, x1_needs_share


class Stage(nn.Module):
    """One backbone stage: a stride-2 node + `repeats` stride-1 nodes,
    all sharing ONE activation quantizer at the branch-merge points so the
    concat sees a consistent range (quantize_model.py:40-51 `share_act`)."""
    oup: int
    repeats: int
    qspec: Optional[QuantSpec] = None
    deform: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False):
        share = QuantAct(self.qspec, mode="asymmetric", name="share_act")
        for i in range(self.repeats + 1):
            node = BaseNode(self.oup, 2 if i == 0 else 1, self.qspec,
                            self.deform, self.dtype, name=f"node{i}")
            x1, x2, share_x1 = node(x, train, update_stats)
            if share_x1:
                x1 = share(x1, update=update_stats)
            x2 = share(x2, update=update_stats)
            x = qt_spatial(lambda v: channel_shuffle(v, 2),
                           qt_concat([x1, x2]))
        return x


class Head(nn.Module):
    """Detection head (reference shufflenetv2_dcn.py:244-271): 1x1+BN+ReLU ->
    3x3 depthwise+BN+ReLU -> 1x1 to classes. hm heads get bias -2.19; other
    heads use kaiming-normal conv init (fill_fc_weights)."""
    classes: int
    head_conv: int
    is_hm: bool
    qspec: Optional[QuantSpec] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False):
        q = self.qspec
        kinit = None if self.is_hm else kaiming_normal_relu()
        y = ConvBN(self.head_conv, kernel_size=1, stride=1, padding=0,
                   qspec=q, kernel_init=kinit, dtype=self.dtype,
                   name="conv1")(x, train=train)
        y = nn.relu(y)
        y = QuantAct(q, mode="asymmetric", name="act1")(y, update=update_stats)
        y = ConvBN(self.head_conv, kernel_size=3, stride=1, padding=1,
                   groups=self.head_conv, qspec=q, kernel_init=kinit,
                   dtype=self.dtype, name="conv2")(y, train=train)
        y = nn.relu(y)
        y = QuantAct(q, mode="asymmetric", name="act2")(y, update=update_stats)
        bias_init = (nn.initializers.constant(-2.19) if self.is_hm
                     else nn.initializers.zeros)
        out = Conv(self.classes, kernel_size=1, stride=1, padding=0,
                   use_bias=True, qspec=q, kernel_init=kinit,
                   bias_init=bias_init, dtype=self.dtype, name="out")(y)
        return out.astype(jnp.float32)


class PoseShuffleNetV2(nn.Module):
    """The flagship detector backbone+neck+heads.

    heads: tuple of (name, classes) pairs, e.g. (('hm', 20), ('wh', 2),
    ('reg', 2)). Returns {name: (N, H/4, W/4, classes)}.
    """
    heads: Tuple[Tuple[str, int], ...]
    head_conv: int = 64
    w2: bool = False
    maxpool: bool = False
    deform_backbone: bool = False
    qspec: Optional[QuantSpec] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, update_stats: bool = False,
                 return_neck: bool = False):
        """return_neck=True stops after the deconv stage and returns the
        (N, H/4, W/4, 64) neck features — the fused-heads eval path
        (models/fused_heads.py) computes all heads in one pass from it."""
        q = self.qspec
        # channels (reference shufflenetv2_dcn.py:199-202)
        channels = [24, 244, 488, 976, 2153] if self.w2 \
            else [24, 116, 232, 464, 1024]

        # layer0 (reference :204-212); quantized layer0 conv uses 8-bit
        # weights (quantize_model.py:28)
        if self.maxpool:
            y = ConvBN(channels[0], kernel_size=3, stride=2, padding=1,
                       qspec=q, w_bit=8, dtype=self.dtype, name="layer0")(
                x, train=train)
            y = nn.relu(y)
            y = QuantAct(q, mode="asymmetric", name="layer0_act")(
                y, update=update_stats)
            y = qt_spatial(lambda v: max_pool(v, 3, 2, 1), y)
        else:
            y = ConvBN(channels[0], kernel_size=3, stride=4, padding=1,
                       qspec=q, w_bit=8, dtype=self.dtype, name="layer0")(
                x, train=train)
            y = nn.relu(y)
            y = QuantAct(q, mode="asymmetric", name="layer0_act")(
                y, update=update_stats)

        # stages 1-3, repeats [3, 7, 3] (reference :214-231)
        for idx, repeats in enumerate([3, 7, 3]):
            y = Stage(channels[idx + 1], repeats, q, self.deform_backbone,
                      self.dtype, name=f"layer{idx + 1}")(y, train,
                                                          update_stats)

        # layer4: 1x1 expand (reference :233-235)
        y = ConvBN(channels[4], kernel_size=1, stride=1, padding=0, qspec=q,
                   dtype=self.dtype, name="layer4")(y, train=train)
        y = nn.relu(y)
        y = QuantAct(q, mode="asymmetric", name="layer4_act")(
            y, update=update_stats)

        # deconv stage: 3 x [codesign deform + BN + ReLU + 2x up]
        # (reference :238-242, 286-312; quant placement quantize_model.py:70-82)
        num_filters = [256, 128, 64]
        for i, planes in enumerate(num_filters):
            y = CodesignDeformBlock(planes, qspec=q, dtype=self.dtype,
                                    name=f"deconv{i}")(
                y, train=train, update_stats=update_stats)
            y = nn.relu(y)
            y = QuantAct(q, mode="asymmetric", name=f"deconv{i}_act")(
                y, update=update_stats)
            y = qt_spatial(upsample_nearest_2x, y)

        if return_neck:
            return y
        out = {}
        for name, classes in self.heads:
            out[name] = Head(classes, self.head_conv, is_hm="hm" in name,
                             qspec=q, dtype=self.dtype, name=f"head_{name}")(
                y, train=train, update_stats=update_stats)
        return out


def get_shufflenetv2_dcn(num_layers, heads, head_conv=64, w2=False,
                         maxpool=False, deform_backbone=False, qspec=None,
                         dtype=None):
    """Factory (reference shufflenetv2_dcn.py:364-373) — with w2/maxpool
    actually honored, plus the deform-in-backbone variant the reference
    gates behind `deform=True`."""
    del num_layers  # reference ignores it too
    heads_t = tuple(sorted(heads.items())) if isinstance(heads, dict) \
        else tuple(heads)
    return PoseShuffleNetV2(heads=heads_t, head_conv=head_conv, w2=w2,
                            maxpool=maxpool, deform_backbone=deform_backbone,
                            qspec=qspec, dtype=dtype)
