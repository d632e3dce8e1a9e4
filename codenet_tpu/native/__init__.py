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


def _stale(src_name):
    """True if the built .so predates the source file (or is missing)."""
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)), src_name)
    try:
        newest_so = max(
            (os.path.getmtime(os.path.join(_BUILD_DIR, f))
             for f in os.listdir(_BUILD_DIR)
             if f.startswith("_codenet_nms") and f.endswith(".so")),
            default=None)
    except OSError:
        newest_so = None
    return newest_so is None or newest_so < os.path.getmtime(src)


def load_nms(auto_build=True):
    """Import the native NMS module, (re)building it if missing or older
    than nms.cpp; returns the module or None when unavailable."""
    if _BUILD_DIR not in sys.path:
        sys.path.insert(0, _BUILD_DIR)
    try:
        if auto_build and _stale("nms.cpp"):
            build()
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
    except Exception as e:  # build failed on a stale source refresh
        print(f"native nms unavailable ({e}); using numpy fallback")
        return None
