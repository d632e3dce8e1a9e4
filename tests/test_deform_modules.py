"""Deform-module ladder + PSROI pooling smoke/semantics tests."""

import numpy as np
import jax
import jax.numpy as jnp

from codenet_tpu.models import deform_modules as DM
from codenet_tpu.ops.deform_pool import deform_psroi_pooling


def _run(mod, x):
    v = mod.init(jax.random.PRNGKey(0), x)
    return v, mod.apply(v, x)


def test_ladder_forward_shapes():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 6),
                    jnp.float32)
    for mod in (DM.DeformConvPack(10), DM.DeformConvPack1x1(10),
                DM.DeformConvPackDW(10), DM.ModulatedDeformConvPack(10),
                DM.DeformConvWithOffsetBound(10),
                DM.DeformConvWithOffsetRound(10),
                DM.DeformConvWithOffsetScale(10),
                DM.DeformConvWithOffsetScaleBound(10),
                DM.ModulatedDeformConvWithOffsetScaleBoundPositive(10)):
        _, y = _run(mod, x)
        assert y.shape == (1, 8, 8, 10), type(mod).__name__


def test_zero_init_packs_equal_plain_conv():
    """Offset predictors init to zero => standard conv behavior."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    mod = DM.DeformConvPack(5)
    v, y = _run(mod, x)
    ref = jax.lax.conv_general_dilated(
        x, v["params"]["weight"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_modulated_mask_scales_output():
    """At init the mask conv is zero => sigmoid(0)=0.5 scales the samples."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    mod = DM.ModulatedDeformConvPack(5, use_bias=False)
    v, y = _run(mod, x)
    ref = jax.lax.conv_general_dilated(
        x, v["params"]["weight"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) * 0.5
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_psroi_pooling_uniform_input():
    """Constant channel value => every bin pools that value."""
    c_out, gs = 2, 2
    c = c_out * gs * gs
    data = np.zeros((1, 16, 16, c), np.float32)
    for ci in range(c):
        data[..., ci] = ci + 1.0
    rois = jnp.asarray([[0, 0.0, 0.0, 200.0, 200.0]], jnp.float32)
    out = deform_psroi_pooling(jnp.asarray(data), rois, None,
                               output_dim=c_out, pooled_size=4,
                               group_size=gs, spatial_scale=1.0 / 16)
    out = np.asarray(out)
    assert out.shape == (1, 4, 4, c_out)
    # bin (0,0) of class 0 reads channel (0*2+0)*2+0 = 0 -> value 1
    np.testing.assert_allclose(out[0, 0, 0, 0], 1.0, rtol=1e-5)
    # bin (3,3) of class 0 reads channel (0*2+1)*2+1 = 3 -> value 4
    np.testing.assert_allclose(out[0, 3, 3, 0], 4.0, rtol=1e-5)
    # class 1, bin (0,0): channel (1*2+0)*2+0 = 4 -> value 5
    np.testing.assert_allclose(out[0, 0, 0, 1], 5.0, rtol=1e-5)
