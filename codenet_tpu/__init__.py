"""codenet-tpu: a TPU-native (JAX/XLA/Pallas/pjit) object-detection framework.

A from-scratch rebuild of the capabilities of Zhen-Dong/CoDeNet (reference at
/root/reference): CenterNet-style anchor-free detection (ctdet / ddd /
multi_pose / exdet) around a hardware-co-designed deformable convolution and
W4A8 quantization-aware training, engineered TPU-first:

- NHWC layouts, static shapes, one jitted program per (resolution, K).
- The co-designed deform conv (reference
  lib/models/external/modules/dcn_deform_conv.py:285) as an XLA gather-conv
  with a Pallas fast path instead of CUDA im2col.
- W4A8 fake-quant as a functional parameterization (explicit `quant_stats`
  state) that lowers to int8 convolutions for inference.
- Data parallelism via `jax.sharding.Mesh` + XLA collectives instead of
  torch DataParallel (reference lib/models/data_parallel.py).
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: CLI runs recompile the same programs
# (first compile through the remote service can take minutes); cache across
# processes unless the user already configured one.
import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "codenet_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
