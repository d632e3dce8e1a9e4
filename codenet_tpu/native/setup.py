"""Build the native extensions: python codenet_tpu/native/setup.py build_ext --inplace
(run from the repo root; also triggered lazily by codenet_tpu.native.build())."""

import numpy as np
from setuptools import Extension, setup

setup(
    name="codenet_tpu_native",
    ext_modules=[
        Extension(
            "_codenet_nms",
            sources=["codenet_tpu/native/nms.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
        ),
    ],
)
