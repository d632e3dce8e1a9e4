"""Model cost accounting — the thop.profile analogue.

The reference prints MACs/params at model construction via thop
(shufflenetv2_dcn.py:368-371). Here: parameter counts from the pytree and
FLOPs from XLA's own cost analysis of the compiled forward — measured on
the program that actually runs rather than estimated per-module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def count_params(variables):
    """Total parameter count (the 'params' collection only)."""
    params = variables.get("params", variables)
    return int(sum(np.prod(p.shape)
                   for p in jax.tree_util.tree_leaves(params)))


def count_flops(fn, *args):
    """FLOPs of the jitted fn via XLA cost analysis (None if unavailable)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) or None
    except Exception:
        return None


class trace:
    """Context manager around jax.profiler.trace — capture an XLA/TensorBoard
    trace of whatever runs inside (the observability upgrade over the
    reference's wall-clock stage timers, base_detector.py:109-148).

        with profile.trace("exp/ctdet/run/trace"):
            detector.run(img)

    View with `tensorboard --logdir <dir>` or xprof. Degrades to a no-op
    when the backend can't trace (e.g. remote-compile TPU paths)."""

    def __init__(self, log_dir):
        self.log_dir = log_dir
        self._active = False

    def __enter__(self):
        try:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        except Exception as e:  # pragma: no cover
            print(f"[profile] trace unavailable: {e}")
        return self

    def __exit__(self, *exc):
        if self._active:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                print(f"[profile] stop_trace failed: {e}")
        return False


def profile_model(model, input_shape=(1, 512, 512, 3), variables=None):
    """Print MACs + params like the reference (MACs ~= flops / 2)."""
    x = jnp.zeros(input_shape, jnp.float32)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), x)
    n_params = count_params(variables)
    flops = count_flops(lambda v, x: model.apply(v, x, train=False),
                        variables, x)
    macs = flops / 2 if flops else None
    print("MACs:", macs, "Parameters:", n_params)
    return macs, n_params
