"""Deform-conv contract tests, mirroring the reference's DCNv2/test.py trio
(zero-offset identity, vs-naive-reference, finite-difference gradients)."""

import numpy as np
import jax
import jax.numpy as jnp

from codenet_tpu.ops import deform_conv as D


def test_zero_offset_equals_standard_conv():
    """Reference DCNv2/test.py:32-65 invariant: zero offsets => plain conv."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 11, 8).astype(np.float32)
    w = rng.randn(3, 3, 8, 16).astype(np.float32)
    offset = np.zeros((2, 9, 11, 18), np.float32)

    got = D.deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(w),
                          precision=jax.lax.Precision.HIGHEST)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_codesign_scale_one_is_identity_sampling():
    """s == 1 everywhere => anchor*(s-1) == 0 => standard depthwise conv."""
    rng = np.random.RandomState(1)
    c = 6
    x = rng.randn(1, 8, 8, c).astype(np.float32)
    w = rng.randn(3, 3, 1, c).astype(np.float32)
    s = np.ones((1, 8, 8, 1), np.float32)
    got = D.codesign_deform_conv(jnp.asarray(x), jnp.asarray(s), jnp.asarray(w),
                                 precision=jax.lax.Precision.HIGHEST)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_matches_naive_reference_random_offsets():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 6, 7, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 5).astype(np.float32)
    offset = (rng.randn(2, 6, 7, 18) * 2.0).astype(np.float32)
    got = np.asarray(D.deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                     jnp.asarray(w),
                                     precision=jax.lax.Precision.HIGHEST))
    ref = D.deform_conv2d_naive(x, offset, w)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_matches_naive_reference_stride2_groups():
    rng = np.random.RandomState(3)
    c = 4
    x = rng.randn(1, 9, 9, c).astype(np.float32)
    w = rng.randn(3, 3, 1, c).astype(np.float32)  # depthwise
    offset = (rng.randn(1, 5, 5, 18) * 1.5).astype(np.float32)
    got = np.asarray(D.deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                                     jnp.asarray(w), stride=2, padding=1,
                                     groups=c,
                                     precision=jax.lax.Precision.HIGHEST))
    ref = D.deform_conv2d_naive(x, offset, w, stride=2, padding=1, groups=c)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_codesign_matches_naive_via_offsets():
    """codesign path == general path fed with anchor*(s-1) offsets."""
    rng = np.random.RandomState(4)
    c = 4
    x = rng.randn(1, 7, 7, c).astype(np.float32)
    w = rng.randn(3, 3, 1, c).astype(np.float32)
    s = rng.uniform(-2.0, 3.0, size=(1, 7, 7, 1)).astype(np.float32)
    got = np.asarray(D.codesign_deform_conv(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(w),
        precision=jax.lax.Precision.HIGHEST))
    offs = (D.ANCHOR_OFFSETS[None, None, None] * (s[..., None] - 1.0))
    offset = offs.reshape(1, 7, 7, 18)
    ref = D.deform_conv2d_naive(x, offset, w, groups=c)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_gradients_finite_difference():
    """Reference DCNv2/test.py:67-96 gradcheck analogue (eps 1e-3)."""
    rng = np.random.RandomState(5)
    x = rng.randn(1, 5, 5, 3).astype(np.float64)
    w = rng.randn(3, 3, 3, 2).astype(np.float64)
    # keep sampling positions away from integer lattice so floor() is smooth
    offset = (rng.uniform(-1.5, 1.5, size=(1, 5, 5, 18)) + 0.3).astype(
        np.float64)

    def f(x_, o_, w_):
        return jnp.sum(jnp.sin(
            D.deform_conv2d(x_, o_, w_) * 0.7))

    with jax.enable_x64(True):
        g = jax.grad(f, argnums=(0, 1, 2))(jnp.asarray(x), jnp.asarray(offset),
                                           jnp.asarray(w))
        eps = 1e-5
        for argi, arr in enumerate((x, offset, w)):
            flat = arr.reshape(-1)
            ganalytic = np.asarray(g[argi]).reshape(-1)
            idxs = rng.choice(flat.size, size=min(12, flat.size),
                              replace=False)
            for i in idxs:
                pert = flat.copy()
                pert[i] += eps
                args = [jnp.asarray(x), jnp.asarray(offset), jnp.asarray(w)]
                args[argi] = jnp.asarray(pert.reshape(arr.shape))
                fp = float(f(*args))
                pert[i] -= 2 * eps
                args[argi] = jnp.asarray(pert.reshape(arr.shape))
                fm = float(f(*args))
                fd = (fp - fm) / (2 * eps)
                assert abs(fd - ganalytic[i]) < 1e-4, (
                    f"arg{argi}[{i}]: fd={fd} vs ad={ganalytic[i]}")
