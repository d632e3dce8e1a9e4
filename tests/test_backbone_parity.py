"""Numeric forward parity for the secondary backbones against the
reference's own torch modules (VERDICT r3 #8).

resnet_18 / dlav0_34 / hourglass get the same oracle treatment
test_reference_parity.py gives decode/losses: instantiate the reference
torch network on CPU, export its state_dict through
engine.torch_import.convert_*, run both on one fixed input, and require
the head maps to agree — the strongest evidence the NHWC/flax rebuilds
compute the same functions as msra_resnet.py / dlav0.py /
large_hourglass.py.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

HEADS = {"hm": 4, "wh": 2, "reg": 2}


def _load(name, path):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _compare_heads(ref_out, our_out, atol, label):
    for h in HEADS:
        np.testing.assert_allclose(
            np.asarray(our_out[h]), _nhwc(ref_out[h]), atol=atol,
            rtol=1e-4, err_msg=f"{label}:{h}")


def test_resnet18_forward_matches_reference():
    R = _load("ref_resnet", REF + "/lib/models/networks/msra_resnet.py")
    torch.manual_seed(0)
    block, layers = R.resnet_spec[18]
    net = R.PoseResNet(block, layers, HEADS, head_conv=64)
    net.eval()
    # nudge BN running stats off their init so eval-mode normalization
    # is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)

    from codenet_tpu.engine.torch_import import convert_resnet
    from codenet_tpu.models.resnet import PoseResNet
    variables = convert_resnet(net.state_dict(), heads=tuple(HEADS),
                               head_conv=64)
    ours = PoseResNet(heads=tuple(sorted(HEADS.items())), num_layers=18,
                      head_conv=64)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = net(_nchw(x))[0]
    our_out = ours.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)
    _compare_heads(ref_out, our_out, 2e-4, "resnet18")


def test_dlav0_34_forward_matches_reference():
    D = _load("ref_dlav0", REF + "/lib/models/networks/dlav0.py")
    torch.manual_seed(1)
    net = D.DLASeg("dla34", HEADS, pretrained=False, down_ratio=4,
                   head_conv=64)
    net.eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)

    from codenet_tpu.engine.torch_import import convert_dlav0
    from codenet_tpu.models.dlav0 import DLASeg
    variables = convert_dlav0(net.state_dict(), heads=tuple(HEADS))
    ours = DLASeg(heads=tuple(sorted(HEADS.items())), head_conv=64,
                  down_ratio=4)

    rng = np.random.RandomState(1)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = net(_nchw(x))[0]
    our_out = ours.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)
    _compare_heads(ref_out, our_out, 5e-4, "dlav0_34")


def test_hourglass_forward_matches_reference():
    H = _load("ref_hg", REF + "/lib/models/networks/large_hourglass.py")
    torch.manual_seed(2)
    net = H.get_large_hourglass_net(0, HEADS, 64)
    net.eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)

    from codenet_tpu.engine.torch_import import convert_hourglass
    from codenet_tpu.models.hourglass import HourglassNet
    variables = convert_hourglass(net.state_dict(), heads=tuple(HEADS))
    ours = HourglassNet(heads=tuple(sorted(HEADS.items())), num_stacks=2)

    rng = np.random.RandomState(2)
    # hourglass needs stride-128-divisible-ish input; 128 covers n=5 downs
    x = rng.rand(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = net(_nchw(x))
    our_outs = ours.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)
    assert len(ref_outs) == len(our_outs) == 2
    for s, (ref_out, our_out) in enumerate(zip(ref_outs, our_outs)):
        _compare_heads(ref_out, our_out, 1e-3, f"hourglass_stack{s}")


def test_converted_param_trees_are_complete():
    """Every converted tree must initialize-shape-match our models: a
    missing/renamed leaf silently stays at init and would weaken the
    forward-parity evidence; catch it structurally."""
    import jax
    from flax.core import freeze
    from flax.traverse_util import flatten_dict

    R = _load("ref_resnet", REF + "/lib/models/networks/msra_resnet.py")
    torch.manual_seed(0)
    block, layers = R.resnet_spec[18]
    net = R.PoseResNet(block, layers, HEADS, head_conv=64)
    from codenet_tpu.engine.torch_import import convert_resnet
    from codenet_tpu.models.resnet import PoseResNet
    variables = convert_resnet(net.state_dict(), heads=tuple(HEADS),
                               head_conv=64)
    ours = PoseResNet(heads=tuple(sorted(HEADS.items())), num_layers=18,
                      head_conv=64)
    init = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    want = {k: v.shape for k, v in
            flatten_dict(freeze(init["params"])).items()}
    got = {k: np.asarray(v).shape for k, v in
           flatten_dict(freeze(variables["params"])).items()}
    assert want == got
