"""Torch-checkpoint converter: synthetic reference-layout state_dict ->
our variable tree, loaded into the flax model with zero mismatches."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def _synth_reference_state_dict():
    """Build a state_dict with the reference PoseShuffleNetV2 key layout
    (1x, stride-4, heads hm/wh/reg, head_conv 64) and random values."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5

    channels = [24, 116, 232, 464, 1024]
    conv("layer0.0", 24, 3, 3)
    bn("layer0.1", 24)
    for L, reps in ((1, 3), (2, 7), (3, 3)):
        inp, oup = channels[L - 1], channels[L]
        half = oup // 2
        for k in range(reps + 1):
            base = f"layer{L}.{k}"
            if k == 0:  # stride 2
                conv(f"{base}.b1.0", inp, 1, 3)
                bn(f"{base}.b1.1", inp)
                conv(f"{base}.b1.2", half, inp, 1)
                bn(f"{base}.b1.3", half)
                conv(f"{base}.b2.0", half, inp, 1)
            else:
                conv(f"{base}.b2.0", half, half, 1)
            bn(f"{base}.b2.1", half)
            conv(f"{base}.b2.3", half, 1, 3)
            bn(f"{base}.b2.4", half)
            conv(f"{base}.b2.5", half, half, 1)
            bn(f"{base}.b2.6", half)
    conv("layer4.0", 1024, 464, 1)
    bn("layer4.1", 1024)
    planes = [(1024, 256), (256, 128), (128, 64)]
    for i, (cin, cout) in enumerate(planes):
        base = f"deconv_layers.{4 * i}"
        conv(f"{base}.conv_scale", 1, cin, 1)
        sd[f"{base}.conv_scale.bias"] = np.ones(1, np.float32)
        conv(f"{base}.conv", cin, 1, 3)
        conv(f"{base}.conv_channel", cout, cin, 1)
        bn(f"deconv_layers.{4 * i + 1}", cout)
    for h, classes in (("hm", 20), ("wh", 2), ("reg", 2)):
        conv(f"{h}.0", 64, 64, 1)
        bn(f"{h}.1", 64)
        conv(f"{h}.3", 64, 1, 3)
        bn(f"{h}.4", 64)
        conv(f"{h}.6", classes, 64, 1)
        sd[f"{h}.6.bias"] = rng.randn(classes).astype(np.float32) * 0.01
    return sd


def test_convert_and_load_exact():
    from tools_tpu.convert_torch_ckpt import convert_shufflenetv2
    from codenet_tpu.models import create_model
    from codenet_tpu.engine import checkpoint

    sd = _synth_reference_state_dict()
    variables = convert_shufflenetv2(sd)

    model = create_model("shufflenetv2", {"hm": 20, "wh": 2, "reg": 2}, 64)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init_vars = dict(model.init(jax.random.PRNGKey(0), x))

    # every converted leaf must land on an existing leaf with matching shape
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "conv.ckpt")
        checkpoint.save_model(p, 0, variables)
        loaded, _, _ = checkpoint.load_model(p, init_vars, strict=True)

    # spot values survive the round trip (incl. OIHW->HWIO transpose)
    k = np.asarray(loaded["params"]["layer0"]["kernel"])
    np.testing.assert_allclose(
        k, np.transpose(sd["layer0.0.weight"], (2, 3, 1, 0)))
    dm = np.asarray(loaded["batch_stats"]["layer4"]["mean"])
    np.testing.assert_allclose(dm, sd["layer4.1.running_mean"])
    # forward runs with converted weights
    out = model.apply(loaded, x)
    assert out["hm"].shape == (1, 16, 16, 20)


def test_load_model_pth_transparent(tmp_path):
    """--load_model foo.pth converts in place (VERDICT r2 next-#7): the
    torch payload routes through the converter, no manual tool run."""
    import os
    import torch
    from codenet_tpu.models import create_model
    from codenet_tpu.engine import checkpoint

    sd = _synth_reference_state_dict()
    p = os.path.join(str(tmp_path), "model_last.pth")
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd.items()}, "epoch": 7}, p)

    model = create_model("shufflenetv2", {"hm": 20, "wh": 2, "reg": 2}, 64)
    init_vars = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3), jnp.float32)))
    loaded, epoch, _ = checkpoint.load_model(p, init_vars, strict=True)
    assert epoch == 7
    k = np.asarray(loaded["params"]["layer0"]["kernel"])
    np.testing.assert_allclose(
        k, np.transpose(sd["layer0.0.weight"], (2, 3, 1, 0)))


def test_pytorchcv_backbone_numerics(tmp_path):
    """ImageNet warm start: a pytorchcv-layout checkpoint converts into
    the backbone and our eval forward matches torch's conv+BN numerics
    (the reference's init_weights rename table, done right —
    shufflenetv2_dcn.py:343-361 dead code)."""
    import torch
    import torch.nn.functional as F
    from codenet_tpu.models.layers import ConvBN
    from codenet_tpu.engine.torch_import import convert_pretrained_backbone

    rng = np.random.RandomState(1)
    w = rng.randn(24, 3, 3, 3).astype(np.float32) * 0.1
    g = rng.rand(24).astype(np.float32) + 0.5
    b = rng.randn(24).astype(np.float32) * 0.1
    mean = rng.randn(24).astype(np.float32) * 0.1
    var = rng.rand(24).astype(np.float32) + 0.5

    sd = {
        "features.init_block.conv.conv.weight": w,
        "features.init_block.conv.bn.weight": g,
        "features.init_block.conv.bn.bias": b,
        "features.init_block.conv.bn.running_mean": mean,
        "features.init_block.conv.bn.running_var": var,
    }
    variables = convert_pretrained_backbone(sd)
    assert "layer0" in variables["params"]

    x = rng.randn(2, 24, 24, 3).astype(np.float32)
    mod = ConvBN(24, kernel_size=3, stride=4, padding=1, name="layer0")
    vars_full = {
        "params": {"scale": g, "bias": b,
                   "kernel": variables["params"]["layer0"]["kernel"]},
        "batch_stats": {"mean": mean, "var": var},
    }
    ours = np.asarray(mod.apply(vars_full, jnp.asarray(x), train=False))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    yt = F.conv2d(xt, torch.from_numpy(w), stride=4, padding=1)
    yt = F.batch_norm(yt, torch.from_numpy(mean), torch.from_numpy(var),
                      torch.from_numpy(g), torch.from_numpy(b),
                      training=False)
    theirs = np.transpose(yt.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)


def test_pytorchcv_full_rename_coverage():
    """Every pytorchcv stage/unit key renames onto a reference key the
    backbone converter consumes (stride-2 and stride-1 units)."""
    from codenet_tpu.engine.torch_import import pytorchcv_to_reference_names

    names = {
        "features.stage2.unit1.compress_conv1.weight": "layer2.0.b2.0.weight",
        "features.stage2.unit1.compress_bn1.running_mean":
            "layer2.0.b2.1.running_mean",
        "features.stage2.unit1.dw_conv2.weight": "layer2.0.b2.3.weight",
        "features.stage2.unit1.dw_bn2.weight": "layer2.0.b2.4.weight",
        "features.stage2.unit1.expand_conv3.weight": "layer2.0.b2.5.weight",
        "features.stage2.unit1.expand_bn3.bias": "layer2.0.b2.6.bias",
        "features.stage2.unit1.dw_conv4.weight": "layer2.0.b1.0.weight",
        "features.stage2.unit1.dw_bn4.running_var":
            "layer2.0.b1.1.running_var",
        "features.stage2.unit1.expand_conv5.weight": "layer2.0.b1.2.weight",
        "features.stage2.unit1.expand_bn5.weight": "layer2.0.b1.3.weight",
        "features.stage3.unit4.compress_conv1.weight": "layer3.3.b2.0.weight",
        "features.final_block.conv.weight": "layer4.0.weight",
        "features.final_block.bn.weight": "layer4.1.weight",
    }
    out = pytorchcv_to_reference_names(
        {k: np.zeros(1, np.float32) for k in names})
    for src, want in names.items():
        assert want in out, (src, want, sorted(out))


def _synth_resdcn18_state_dict(heads=None, head_conv=64):
    """Torch-layout state_dict matching resnet_dcn.py:108-245 for
    num_layers=18: BasicBlock stages + 3 DCN deconv stages of 6 modules
    [DCN, BN, ReLU, ConvTranspose, BN, ReLU]."""
    heads = heads or {"hm": 4, "wh": 2, "reg": 2}
    rng = np.random.RandomState(3)
    sd = {}

    def w(*s):
        return rng.randn(*s).astype(np.float32)

    def bn(prefix, c):
        sd[prefix + ".weight"] = w(c)
        sd[prefix + ".bias"] = w(c)
        sd[prefix + ".running_mean"] = w(c)
        sd[prefix + ".running_var"] = np.abs(w(c)) + 0.5

    sd["conv1.weight"] = w(64, 3, 7, 7)
    bn("bn1", 64)
    inp = 64
    for s, planes in enumerate([64, 128, 256, 512], 1):
        for b in range(2):
            base = f"layer{s}.{b}"
            cin = inp if b == 0 else planes
            sd[f"{base}.conv1.weight"] = w(planes, cin, 3, 3)
            bn(f"{base}.bn1", planes)
            sd[f"{base}.conv2.weight"] = w(planes, planes, 3, 3)
            bn(f"{base}.bn2", planes)
            if b == 0 and s != 1:
                sd[f"{base}.downsample.0.weight"] = w(planes, cin, 1, 1)
                bn(f"{base}.downsample.1", planes)
        inp = planes
    for i, planes in enumerate([256, 128, 64]):
        base = f"deconv_layers.{6 * i}"
        sd[base + ".weight"] = w(planes, inp, 3, 3)
        sd[base + ".bias"] = w(planes)
        sd[base + ".conv_offset_mask.weight"] = w(27, inp, 3, 3)
        sd[base + ".conv_offset_mask.bias"] = w(27)
        bn(f"deconv_layers.{6 * i + 1}", planes)
        sd[f"deconv_layers.{6 * i + 3}.weight"] = w(planes, planes, 4, 4)
        bn(f"deconv_layers.{6 * i + 4}", planes)
        inp = planes
    for h, c in heads.items():
        sd[f"{h}.0.weight"] = w(head_conv, 64, 3, 3)
        sd[f"{h}.0.bias"] = w(head_conv)
        sd[f"{h}.2.weight"] = w(c, head_conv, 1, 1)
        sd[f"{h}.2.bias"] = w(c)
    return sd


def test_resdcn18_pth_dispatch_and_full_coverage(tmp_path):
    """A resnet_dcn .pth (DCN deconv stages, 6-module layout) must route
    through convert_resnet(dcn=True) and cover EVERY PoseResNetDCN leaf —
    the structural-dispatch bug this pins had the DCN variant silently
    falling into the msra layout (deconv_layers.{0,3,6} = ConvTranspose),
    which skips the deconv weights and drops the offset branches."""
    import os
    import torch
    from codenet_tpu.models.resnet import get_pose_net_dcn
    from codenet_tpu.engine import checkpoint

    heads = {"hm": 4, "wh": 2, "reg": 2}
    sd = _synth_resdcn18_state_dict(heads)
    p = os.path.join(str(tmp_path), "resdcn18.pth")
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd.items()}, "epoch": 3}, p)

    model = get_pose_net_dcn(18, heads, 64)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init_vars = dict(model.init(jax.random.PRNGKey(0), x))
    # strict: raises on ANY missing/mismatched/dropped leaf
    loaded, epoch, _ = checkpoint.load_model(p, init_vars, strict=True)
    assert epoch == 3
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["deconv0_dcn"]["weight"]),
        np.transpose(sd["deconv_layers.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["deconv0_dcn"]["conv_offset_mask"]
                   ["kernel"]),
        np.transpose(sd["deconv_layers.0.conv_offset_mask.weight"],
                     (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["deconv1_up"]),
        np.transpose(sd["deconv_layers.9.weight"], (2, 3, 0, 1)))
    np.testing.assert_allclose(
        np.asarray(loaded["batch_stats"]["deconv2_bn2"]["mean"]),
        sd["deconv_layers.16.running_mean"])
    out = model.apply(loaded, x)
    assert out["hm"].shape == (1, 16, 16, 4)


def test_dla_dcn_pth_fails_loudly(tmp_path):
    """pose_dla_dcn checkpoints (DLASeg stem + conv_offset_mask keys) have
    no converter; they must NOT silently misroute through convert_dlav0."""
    import os
    import torch
    import pytest as _pytest
    from codenet_tpu.engine import checkpoint

    sd = {"base.base_layer.0.weight": np.zeros((16, 3, 7, 7), np.float32),
          "dla_up.ida_0.proj_1.conv.conv_offset_mask.weight":
              np.zeros((27, 16, 3, 3), np.float32)}
    p = os.path.join(str(tmp_path), "dla_dcn.pth")
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, p)
    with _pytest.raises(NotImplementedError):
        checkpoint.load_model(p, {"params": {}})
