"""TPU-native ops: deformable convolution, decode primitives, NMS, quant math."""

from .deform_conv import (  # noqa: F401
    deform_sample,
    deform_conv2d,
    codesign_deform_conv,
    ANCHOR_OFFSETS,
)
