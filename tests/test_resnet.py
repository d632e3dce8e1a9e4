"""PoseResNet backbone forward/shape tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codenet_tpu.models import create_model


@pytest.mark.slow
def test_res18_forward_shapes():
    model = create_model("res_18", {"hm": 20, "wh": 2, "reg": 2}, 64)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    assert out["hm"].shape == (1, 16, 16, 20)
    assert out["wh"].shape == (1, 16, 16, 2)
    b = v["params"]["head_hm_out"]["bias"]
    np.testing.assert_allclose(np.asarray(b), -2.19, atol=1e-6)


def test_conv_transpose_matches_torch():
    from codenet_tpu.models.resnet import conv_transpose_4x4_s2
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 6, 6).astype(np.float32)
    w = rng.randn(3, 5, 4, 4).astype(np.float32)  # torch (in, out, kh, kw)
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                             stride=2, padding=1).numpy()
    x_n = np.transpose(x, (0, 2, 3, 1))
    w_hwio = np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))
    got = conv_transpose_4x4_s2(jnp.asarray(x_n), jnp.asarray(w_hwio))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_resdcn_forward_and_grads():
    """resdcn_18 (reference resnet_dcn.py, excluded from the reference's
    own factory): DCNv2 deconv stages produce stride-4 heads and finite
    gradients; out-channel-0 of each up kernel carries the bilinear init
    (fill_up_weights quirk)."""
    import jax
    import jax.numpy as jnp
    from codenet_tpu.models import create_model

    heads = {"hm": 4, "wh": 2, "reg": 2}
    model = create_model("resdcn_18", heads, 64)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, train=False)
    assert out["hm"].shape == (1, 16, 16, 4)
    assert out["wh"].shape == (1, 16, 16, 2)
    # hm bias init -2.19
    np.testing.assert_allclose(
        np.asarray(variables["params"]["head_hm_out"]["bias"]), -2.19,
        rtol=1e-6)
    up0 = np.asarray(variables["params"]["deconv0_up"])
    expect = np.outer([0.25, 0.75, 0.75, 0.25], [0.25, 0.75, 0.75, 0.25])
    np.testing.assert_allclose(up0[:, :, 0, 0], expect, rtol=1e-6)

    def loss(p):
        vs = {"params": p, **{k: v for k, v in variables.items()
                              if k != "params"}}
        out, _ = model.apply(vs, jnp.ones_like(x), train=True,
                             mutable=["batch_stats"])
        return sum(jnp.sum(v ** 2) for v in out.values())

    g = jax.grad(loss)(variables["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
