"""Pallas deform kernels vs the XLA formulation (interpret mode on CPU).

On-hardware correctness is additionally validated on the v5e; here
interpret mode (automatic off-TPU) checks the kernel logic exactly:
forward over aligned/ragged map sizes and dtypes, and the fused Pallas
backward (dX/ds/dw) against the XLA-formulation VJP the reference
gradients were verified with (finite differences in test_deform_conv)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codenet_tpu.ops import deform_pallas as DP
from codenet_tpu.ops.deform_conv import codesign_deform_conv


def _case(shape, seed=0, dtype=np.float32):
    H, W, C = shape
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, H, W, C).astype(dtype))
    s = jnp.asarray(rng.uniform(-2.0, 3.0, (2, H, W, 1)).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 1, C) * 0.2).astype(dtype))
    return x, s, w


# 12x12 (=144 positions) is the pascal-384 deconv map that round 1's gate
# excluded; 24x24 (=576) exercises the ragged row-padding path.
@pytest.mark.parametrize("shape", [(8, 8, 256), (16, 8, 128), (12, 12, 64),
                                   (24, 24, 32)])
def test_pallas_matches_xla(shape):
    x, s, w = _case(shape)
    a = np.asarray(codesign_deform_conv(x, s, w,
                                        precision=jax.lax.Precision.HIGHEST))
    b = np.asarray(DP.codesign_deform_conv_fast(x, s, w))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_pallas_bf16_matches_xla_loosely():
    x, s, w = _case((8, 8, 128), seed=2)
    a = np.asarray(codesign_deform_conv(x, s, w,
                                        precision=jax.lax.Precision.HIGHEST))
    b = np.asarray(DP.codesign_deform_conv_fast(
        x.astype(jnp.bfloat16), s, w.astype(jnp.bfloat16))
        .astype(jnp.float32))
    np.testing.assert_allclose(a, b, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("shape", [(8, 8, 128), (12, 12, 32)])
def test_pallas_backward_matches_xla(shape):
    """The fused Pallas backward must reproduce the XLA-formulation VJP
    (which test_deform_conv ties to finite differences)."""
    x, s, w = _case(shape, seed=1)

    def f_fast(x, s, w):
        return jnp.sum(jnp.sin(DP.codesign_deform_conv_fast(x, s, w)))

    def f_xla(x, s, w):
        return jnp.sum(jnp.sin(codesign_deform_conv(x, s, w)))

    g_fast = jax.grad(f_fast, argnums=(0, 1, 2))(x, s, w)
    g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(x, s, w)
    for name, a, b in zip(("dx", "ds", "dw"), g_fast, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


def test_channel_chunked_matches_unchunked(monkeypatch):
    """Wide-C calls split into channel chunks (depthwise independence):
    at the w2 deconv0 train shape (C=2153, 16x16 map, f32) BOTH Mosaic
    tap-loop regimes exceed the 16 MiB scoped-VMEM limit through the
    (q, C) temporaries alone (17.6 MiB measured on v5e, round 5), so
    _forward/_backward_pallas slice C at CODENET_DEFORM_C_CHUNK. Chunked
    out/dx/dw must be bit-equal to unchunked (disjoint channel slices);
    ds sums per-chunk f32 partials, so it only matches to summation
    order. Chunk=8 over C=20 exercises interior + ragged-tail chunks."""
    x, s, w = _case((8, 8, 20), seed=4)

    def grads(x, s, w):
        def f(x, s, w):
            return jnp.sum(jnp.sin(DP.codesign_deform_conv_fast(x, s, w)))
        return (DP.codesign_deform_conv_fast(x, s, w),
                *jax.grad(f, argnums=(0, 1, 2))(x, s, w))

    monkeypatch.setenv("CODENET_DEFORM_C_CHUNK", "9999")
    ref = grads(x, s, w)
    monkeypatch.setenv("CODENET_DEFORM_C_CHUNK", "8")
    chunked = grads(x, s, w)
    for name, a, b in zip(("out", "dx", "ds", "dw"), ref, chunked):
        tol = 1e-5 if name == "ds" else 0.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=tol, atol=tol, err_msg=name)


def test_out_of_contract_s_clamped_uniformly():
    """Op contract: s beyond the co-design reach is clamped to [-7, 8] at
    the op boundary in EVERY regime — including 32x32 maps, where the
    forward runs the dense unrolled kernel but the backward runs banded —
    with zero ds beyond the clamp (Hardtanh-like). Before this contract,
    such a caller got an UNclamped forward and a banded/clamped backward:
    gradients of a different function than the forward computed."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 32, 32, 32).astype(np.float32))
    s = jnp.asarray(
        rng.uniform(-12.0, 14.0, (1, 32, 32, 1)).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 1, 32) * 0.2).astype(np.float32))

    def clamp(s):
        return jnp.clip(s, -7.0, 8.0)

    a = np.asarray(codesign_deform_conv(
        x, clamp(s), w, precision=jax.lax.Precision.HIGHEST))
    b = np.asarray(DP.codesign_deform_conv_fast(x, s, w))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    def f_fast(x, s, w):
        return jnp.sum(jnp.sin(DP.codesign_deform_conv_fast(x, s, w)))

    def f_ref(x, s, w):
        return jnp.sum(jnp.sin(codesign_deform_conv(x, clamp(s), w)))

    g_fast = jax.grad(f_fast, argnums=(0, 1, 2))(x, s, w)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, s, w)
    for name, ga, gb in zip(("dx", "ds", "dw"), g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=5e-3, atol=5e-3, err_msg=name)
    outside = (np.asarray(s) <= -7.0) | (np.asarray(s) >= 8.0)
    assert outside.any()  # the draw actually exercised the clamp
    assert np.all(np.asarray(g_fast[1])[outside] == 0.0)


def test_pallas_backward_under_jit_and_integer_scales():
    """Integer s lands exactly on grid points (fy=fx=0) — the boundary of
    the bilinear cells; gradients must still agree there."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    s = jnp.asarray(rng.randint(-1, 3, (2, 8, 8, 1)).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 1, 64) * 0.2).astype(np.float32))

    @jax.jit
    def g_fast(x, s, w):
        return jax.grad(
            lambda *a: jnp.sum(DP.codesign_deform_conv_fast(*a) ** 2),
            argnums=(0, 1, 2))(x, s, w)

    @jax.jit
    def g_xla(x, s, w):
        return jax.grad(
            lambda *a: jnp.sum(codesign_deform_conv(*a) ** 2),
            argnums=(0, 1, 2))(x, s, w)

    for name, a, b in zip(("dx", "ds", "dw"), g_fast(x, s, w),
                          g_xla(x, s, w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


@pytest.mark.slow
@pytest.mark.parametrize("flag", ["1", "0"])
def test_banded_unrolled_small_map(monkeypatch, flag):
    """CODENET_BANDED_UNROLLED=1 (the default since the v5e measurement —
    see _banded_unrolled_enabled) bands the forward on small (<=1024 pos)
    maps with the tap loop still unrolled (PERF.md headroom #1); "0" is
    the rolled opt-out. Both regimes' outputs and gradients must match
    the XLA reference exactly."""
    monkeypatch.setenv("CODENET_BANDED_UNROLLED", flag)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 32, 32, 64).astype(np.float32))
    s = jnp.asarray(rng.uniform(-7.0, 8.0, (2, 32, 32, 1))
                    .astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 1, 64) * 0.2).astype(np.float32))
    a = np.asarray(codesign_deform_conv(
        x, s, w, precision=jax.lax.Precision.HIGHEST))
    b = np.asarray(DP.codesign_deform_conv_fast(x, s, w))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    g_fast = jax.grad(lambda *t: jnp.sum(
        jnp.sin(DP.codesign_deform_conv_fast(*t))), argnums=(0, 1, 2))(
        x, s, w)
    g_xla = jax.grad(lambda *t: jnp.sum(
        jnp.sin(codesign_deform_conv(*t))), argnums=(0, 1, 2))(x, s, w)
    for name, ga, gb in zip(("dx", "ds", "dw"), g_fast, g_xla):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=5e-3, atol=5e-3, err_msg=name)

    # the flag also unrolls the backward on small DENSE maps (banding
    # ineligible at 16x8: band would not shrink q) — grads must agree
    x2, s2, w2 = _case((16, 8, 64), seed=8)
    g_fast2 = jax.grad(lambda *t: jnp.sum(
        DP.codesign_deform_conv_fast(*t) ** 2), argnums=(0, 1, 2))(
        x2, s2, w2)
    g_xla2 = jax.grad(lambda *t: jnp.sum(
        codesign_deform_conv(*t) ** 2), argnums=(0, 1, 2))(x2, s2, w2)
    for name, ga, gb in zip(("dx", "ds", "dw"), g_fast2, g_xla2):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=5e-3, atol=5e-3, err_msg=name)

    # 64-wide maps (the w2/512² shapes) band at 1280 cols — inside the
    # default unrolled gates (qmax 1408) only when flag=1; both regimes
    # must match XLA (fwd + grads)
    x3, s3, w3 = _case((64, 64, 8), seed=9)
    a3 = np.asarray(codesign_deform_conv(
        x3, s3, w3, precision=jax.lax.Precision.HIGHEST))
    b3 = np.asarray(DP.codesign_deform_conv_fast(x3, s3, w3))
    np.testing.assert_allclose(a3, b3, rtol=2e-3, atol=2e-3)
    g_fast3 = jax.grad(lambda *t: jnp.sum(
        DP.codesign_deform_conv_fast(*t) ** 2), argnums=(0, 1, 2))(
        x3, s3, w3)
    g_xla3 = jax.grad(lambda *t: jnp.sum(
        codesign_deform_conv(*t) ** 2), argnums=(0, 1, 2))(x3, s3, w3)
    for name, ga, gb in zip(("dx", "ds", "dw"), g_fast3, g_xla3):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


def test_model_integration_interpret(monkeypatch):
    """CODENET_PALLAS_INTERPRET=1 routes CodesignDeformBlock through the
    Pallas kernel on CPU; outputs must match the XLA-path model."""
    monkeypatch.delenv("CODENET_PALLAS_INTERPRET", raising=False)
    from codenet_tpu.models.layers import CodesignDeformBlock
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
    block = CodesignDeformBlock(features=16)
    variables = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(variables, x)
    monkeypatch.setenv("CODENET_PALLAS_INTERPRET", "1")
    fast = block.apply(variables, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast),
                               rtol=2e-3, atol=2e-3)


def test_sharded_custom_partitioning(monkeypatch):
    """On a multi-device mesh the kernels must partition over the batch dim
    (not replicate): dx/out stay batch-sharded, dw comes back replicated
    via the lower_fn psum. Validated in interpret mode on the 8-device
    virtual CPU mesh."""
    monkeypatch.setenv("CODENET_PALLAS_INTERPRET", "1")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    rng = np.random.RandomState(0)
    xh = rng.randn(8, 8, 8, 64).astype(np.float32)
    sh = rng.uniform(-1, 2, (8, 8, 8, 1)).astype(np.float32)
    w = jnp.asarray((rng.randn(3, 3, 1, 64) * 0.2).astype(np.float32))
    x = jax.device_put(xh, NamedSharding(mesh, P("data")))
    s = jax.device_put(sh, NamedSharding(mesh, P("data")))

    out = jax.jit(DP.codesign_deform_conv_fast)(x, s, w)
    ref = codesign_deform_conv(jnp.asarray(xh), jnp.asarray(sh), w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    assert out.sharding.spec == P("data"), out.sharding

    g = jax.jit(jax.grad(
        lambda x, s, w: jnp.sum(jnp.sin(DP.codesign_deform_conv_fast(
            x, s, w))), argnums=(0, 1, 2)))(x, s, w)
    gr = jax.grad(
        lambda x, s, w: jnp.sum(jnp.sin(codesign_deform_conv(x, s, w))),
        argnums=(0, 1, 2))(jnp.asarray(xh), jnp.asarray(sh), w)
    for name, a, b in zip(("dx", "ds", "dw"), g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=name)
    assert g[0].sharding.spec == P("data")
    assert g[2].sharding.is_fully_replicated


@pytest.mark.parametrize("shape", [(64, 64, 8), (40, 40, 8)])
def test_pallas_banded_matches_xla(shape):
    """Banded-B regime (maps where the +-8px co-design reach covers only
    a fraction of the rows): fwd AND bwd vs the XLA formulation. 64x64 is
    the 512-config deconv map that previously OOM'd / fell back."""
    x, s, w = _case(shape, seed=3)
    h, w_dim = shape[0], shape[1]
    from codenet_tpu.ops.deform_pallas import _band_rows, _use_banding
    assert _use_banding(h, w_dim, 128, x.dtype), "banding must engage"

    a = np.asarray(codesign_deform_conv(x, s, w,
                                        precision=jax.lax.Precision.HIGHEST))
    b = np.asarray(DP.codesign_deform_conv_fast(x, s, w))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    import codenet_tpu.ops.deform_pallas as dp
    old = dp._BWD_MAX_HW
    dp._BWD_MAX_HW = 4096
    try:
        def f_fast(x, s, w):
            return jnp.sum(jnp.sin(DP.codesign_deform_conv_fast(x, s, w)))

        def f_xla(x, s, w):
            return jnp.sum(jnp.sin(codesign_deform_conv(x, s, w)))

        g_fast = jax.grad(f_fast, argnums=(0, 1, 2))(x, s, w)
        g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(x, s, w)
        for name, ga, gb in zip(("dx", "ds", "dw"), g_fast, g_xla):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       rtol=5e-3, atol=5e-3, err_msg=name)
    finally:
        dp._BWD_MAX_HW = old


def test_pallas_banded_extreme_scales_at_borders():
    """Banding relies on the Hardtanh reach bound: s at the clamp limits
    (-7 and 8 => displacement +-8..9 px incl. the bilinear corner) and
    objects at the map borders must still match the XLA formulation."""
    H, W, C = 48, 48, 4
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32))
    s_np = np.full((2, H, W, 1), -7.0, np.float32)
    s_np[0] = 8.0  # max positive scale everywhere
    s = jnp.asarray(s_np)
    w = jnp.asarray((rng.randn(3, 3, 1, C) * 0.2).astype(np.float32))
    a = np.asarray(codesign_deform_conv(x, s, w,
                                        precision=jax.lax.Precision.HIGHEST))
    b = np.asarray(DP.codesign_deform_conv_fast(x, s, w))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)
