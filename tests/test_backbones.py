"""Hourglass and DLAv0 backbone forward/shape tests (small inputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codenet_tpu.models import create_model

HEADS = {"hm": 3, "wh": 2, "reg": 2}


@pytest.mark.slow
def test_hourglass_two_stacks():
    model = create_model("hourglass", HEADS, 64)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(v, x)
    assert isinstance(outs, list) and len(outs) == 2
    for out in outs:
        assert out["hm"].shape == (1, 32, 32, 3)
        assert out["wh"].shape == (1, 32, 32, 2)
    # hm bias -2.19 on each stack's final conv
    b0 = v["params"]["hm0_out"]["bias"]
    b1 = v["params"]["hm1_out"]["bias"]
    np.testing.assert_allclose(np.asarray(b0), -2.19, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b1), -2.19, atol=1e-6)


@pytest.mark.slow
def test_dlav0_forward():
    model = create_model("dlav0_34", HEADS, 256)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    assert out["hm"].shape == (1, 32, 32, 3)
    assert out["reg"].shape == (1, 32, 32, 2)


def test_dla_bilinear_up_matches_torch():
    """IDA's depthwise transposed conv == torch ConvTranspose2d with the
    fill_up_weights bilinear kernel."""
    import torch
    import torch.nn.functional as F
    from codenet_tpu.models.dlav0 import bilinear_up_kernel, depthwise_up

    rng = np.random.RandomState(0)
    c, f = 5, 2
    x = rng.randn(1, c, 7, 9).astype(np.float32)
    khw = bilinear_up_kernel(f)
    w = np.broadcast_to(khw, (c, 1, 2 * f, 2 * f)).copy()
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                             stride=f, padding=f // 2, groups=c).numpy()
    x_n = np.transpose(x, (0, 2, 3, 1))
    got = depthwise_up(jnp.asarray(x_n), f, jnp.asarray(khw))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dla_dcn_forward_and_grads():
    """dla_34 (reference pose_dla_dcn.py, excluded from the reference's
    own factory): DCNv2 IDA upsampling produces stride-4 heads and finite
    gradients. Also the reference's DEFAULT --arch dla_34 now works."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from codenet_tpu.models import create_model

    heads = {"hm": 3, "wh": 2, "reg": 2}
    model = create_model("dla_34", heads, 256)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, train=False)
    assert out["hm"].shape == (1, 16, 16, 3)
    assert out["wh"].shape == (1, 16, 16, 2)
    np.testing.assert_allclose(
        np.asarray(variables["params"]["head_hm_out"]["bias"]), -2.19,
        rtol=1e-6)

    def loss(p):
        vs = {"params": p, **{k: v for k, v in variables.items()
                              if k != "params"}}
        out, _ = model.apply(vs, jnp.ones_like(x), train=True,
                             mutable=["batch_stats"])
        return sum(jnp.sum(v ** 2) for v in out.values())

    g = jax.grad(loss)(variables["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
