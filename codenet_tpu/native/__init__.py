"""Native (C++) runtime components with lazy build + numpy fallback.

The reference ships Cython NMS kernels built by lib/models/external/make.sh;
here the equivalent C++ extension builds on first use via setuptools and the
pure-numpy implementations in ops/nms.py serve as fallback, so the framework
never hard-requires the toolchain at runtime.
"""

from __future__ import annotations

import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_BUILD_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_build")


def build(quiet=True):
    """Compile the extensions in-place (idempotent)."""
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [sys.executable, os.path.join("codenet_tpu", "native", "setup.py"),
           "build_ext", "--build-lib", _BUILD_DIR,
           "--build-temp", os.path.join(_BUILD_DIR, "tmp")]
    res = subprocess.run(cmd, cwd=_REPO_ROOT, capture_output=quiet)
    if res.returncode != 0:
        if quiet and res.stderr:
            sys.stderr.write(res.stderr.decode(errors="replace"))
        raise RuntimeError("native build failed")
    return _BUILD_DIR


def load_nms(auto_build=True):
    """Import the native NMS module, building it if needed; returns the
    module or None when unavailable."""
    if _BUILD_DIR not in sys.path:
        sys.path.insert(0, _BUILD_DIR)
    try:
        import _codenet_nms
        return _codenet_nms
    except ImportError:
        if not auto_build:
            return None
        try:
            build()
            import _codenet_nms
            return _codenet_nms
        except Exception as e:  # toolchain missing etc.
            print(f"native nms unavailable ({e}); using numpy fallback")
            return None
