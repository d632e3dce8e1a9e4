"""Pallas deform kernel vs the XLA formulation (interpret mode on CPU).

On-hardware correctness was additionally validated on the v5e (rel err
~3e-3 from bf16 MXU accumulation); here interpret mode checks the kernel
logic exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codenet_tpu.ops import deform_pallas as DP
from codenet_tpu.ops.deform_conv import codesign_deform_conv


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import functools
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


@pytest.mark.parametrize("shape", [(8, 8, 256), (16, 8, 128)])
def test_pallas_matches_xla(shape):
    H, W, C = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32))
    s = jnp.asarray(rng.uniform(-2.0, 3.0, (2, H, W, 1)).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 1, C) * 0.2).astype(np.float32))
    a = np.asarray(codesign_deform_conv(x, s, w,
                                        precision=jax.lax.Precision.HIGHEST))
    b = np.asarray(DP.codesign_deform_conv_fast(x, s, w))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_pallas_gradients_route_through_xla():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    s = jnp.asarray(rng.uniform(-1, 2, (1, 8, 8, 1)).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 1, 128) * 0.2).astype(np.float32))

    def f_fast(x, s, w):
        return jnp.sum(jnp.sin(DP.codesign_deform_conv_fast(x, s, w)))

    def f_xla(x, s, w):
        return jnp.sum(jnp.sin(codesign_deform_conv(x, s, w)))

    g_fast = jax.grad(f_fast, argnums=(0, 1, 2))(x, s, w)
    g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(x, s, w)
    for a, b in zip(g_fast, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)
