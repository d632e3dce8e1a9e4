"""PoseResNet backbone forward/shape tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from codenet_tpu.models import create_model


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
