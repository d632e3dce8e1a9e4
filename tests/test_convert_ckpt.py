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
