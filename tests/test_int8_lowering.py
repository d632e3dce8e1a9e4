"""Real-int8 lowering vs fake-quant numerics.

The W4A8 fake-quant path and the int8 path must agree: with activations
inside their EMA ranges the integer conv + fused requantization is
algebraically identical to convolving the dequantized fake-quant values
(int32 accumulation is exact; the fake path accumulates in float).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codenet_tpu.ops import quant as Q
from codenet_tpu.models import create_model
from codenet_tpu.models.layers import QuantSpec

HEADS = {"hm": 4, "wh": 2, "reg": 2}


def test_int8_conv_matches_dequant_conv():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 9, 8).astype(np.float32)
    w = (rng.randn(3, 3, 8, 16) * 0.2).astype(np.float32)
    bias = rng.randn(16).astype(np.float32)
    x_min = jnp.asarray([float(x.min())])
    x_max = jnp.asarray([float(x.max())])

    qx = Q.quantize_act_int8(jnp.asarray(x), 8, x_min, x_max)
    q_w, w_scale = Q.quantize_weight_int(jnp.asarray(w), 4)

    got = np.asarray(Q.int8_conv(qx, q_w, w_scale, jnp.asarray(bias)))

    # reference: float conv of the dequantized tensors
    x_dq = np.asarray(qx.dequant())
    w_dq = np.asarray(q_w.astype(jnp.float32)
                      / w_scale[None, None, None, :])
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x_dq), jnp.asarray(w_dq), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + bias
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)

    # boundary correctness: padding must contribute exactly zero real value
    # (checked implicitly above at all border positions)


def test_int8_act_quant_matches_fake_within_range():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(-0.9, 1.9, size=(64,)).astype(np.float32))
    x_min, x_max = jnp.asarray([-1.0]), jnp.asarray([2.0])
    fake = np.asarray(Q.fake_quant_act(x, 8, x_min, x_max, "asymmetric"))
    qt = Q.quantize_act_int8(x, 8, x_min, x_max)
    np.testing.assert_allclose(np.asarray(qt.dequant()), fake,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_full_model_int8_close_to_fake_quant():
    qs = QuantSpec()
    qs8 = QuantSpec(int8_infer=True)
    fake = create_model("shufflenetv2", HEADS, 64, qspec=qs)
    int8 = create_model("shufflenetv2", HEADS, 64, qspec=qs8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3)) * 0.5

    v = fake.init(jax.random.PRNGKey(1), x)
    # warm BN-ish stats + EMA ranges with two update passes
    v = dict(v)
    for _ in range(2):
        _, upd = fake.apply(v, x, update_stats=True,
                            mutable=["quant_stats"])
        v["quant_stats"] = upd["quant_stats"]

    out_fake = fake.apply(v, x)
    out_int8 = int8.apply(v, x)
    a = np.asarray(out_fake["hm"]).ravel()
    b = np.asarray(out_int8["hm"]).ravel()
    # identical up to fake-path float accumulation + range clamping
    denom = np.abs(a).max() + 1e-6
    assert np.abs(a - b).max() / denom < 2e-2, np.abs(a - b).max()


def test_act_clamp_fake_matches_int8_exactly():
    """--act_clamp fake-quant == real-int8 storage semantics INCLUDING
    out-of-EMA-range activations (the unclamped reference quirk is the
    source of the fake-vs-int8 AP gap measured by the delta harness)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray((rng.randn(256) * 4).astype(np.float32))  # heavy tails
    x_min, x_max = jnp.asarray([-1.5]), jnp.asarray([2.5])
    clamped = np.asarray(Q.fake_quant_act(x, 8, x_min, x_max,
                                          "asymmetric", clamp=True))
    qt = Q.quantize_act_int8(x, 8, x_min, x_max)
    np.testing.assert_allclose(clamped, np.asarray(qt.dequant()),
                               rtol=1e-6, atol=1e-6)
    # and plenty of inputs actually hit the clamp in this fixture
    unclamped = np.asarray(Q.fake_quant_act(x, 8, x_min, x_max,
                                            "asymmetric", clamp=False))
    assert (np.abs(unclamped - clamped) > 1e-6).sum() > 10


def test_layer_audit_lowering_noise_floor():
    """tools_tpu/int8_audit.py (SURVEY hard part #6): on a calibrated
    random model, EVERY layer's real-int8 output must track the
    clamped-fake-quant output to the requant noise floor — isolating
    integer-lowering error from the (expected, separately-reported)
    clamp-semantics divergence."""
    import sys
    sys.path.insert(0, "tools_tpu")
    from int8_audit import run_audit
    rows = run_audit(ckpt=None, input_res=64, seed=0)
    assert len(rows) > 100  # every module captured, not a stub walk
    worst = max(rows, key=lambda r: r["int8_vs_clamped"])
    assert worst["int8_vs_clamped"] < 0.05, worst
    # and the audit must be able to SEE clamp divergence when ranges
    # undershoot (otherwise the 0-lowering result proves nothing)
    assert max(r["clamped_vs_qat"] for r in rows) > 0.01


def test_int8_maxpool_config_b_geometry():
    """--maxpool + --int8_infer (config b/e deployed eval): layer0's
    maxpool runs on the int8 QTensor, and reduce_window requires the
    init value dtype to match the operand — a bare Python int weak-types
    to int32 and raises. First exercised by the round-5 config-b int8
    eval (the audits before it all used config a's stride-4 layer0)."""
    qs = QuantSpec(int8_infer=True)
    m = create_model("shufflenetv2", HEADS, 64, maxpool=True, qspec=qs)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = dict(m.init(jax.random.PRNGKey(0), x))
    v["quant_stats"] = jax.tree_util.tree_map_with_path(
        lambda p, a: a - 4.0 if "x_min" in str(p) else a + 4.0,
        v["quant_stats"])
    out = m.apply(v, x)
    assert out["hm"].shape == (1, 16, 16, 4)
    assert np.all(np.isfinite(np.asarray(out["hm"], np.float32)))
