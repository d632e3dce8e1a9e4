"""Torch-checkpoint ingestion (reference .pth -> flax variables).

Core of tools_tpu/convert_torch_ckpt.py, importable by the engine so
`--load_model foo.pth` transparently converts (VERDICT r2 next-#7): the
reference PoseShuffleNetV2 state_dict layout
(/root/reference/lib/models/networks/shufflenetv2_dcn.py:189-330, saved
by lib/models/model.py:91-100) maps onto our variables tree — OIHW->HWIO,
BN weight/bias -> scale/bias + running stats -> batch_stats, deform
pieces -> CodesignDeformBlock. `convert_pretrained_backbone` applies the
pytorchcv rename table the reference built but never used
(shufflenetv2_dcn.py:343-361 dead code) for ImageNet warm starts.
"""

from __future__ import annotations

import numpy as np

def conv_w(t):
    """torch OIHW -> HWIO."""
    return np.transpose(np.asarray(t, dtype=np.float32), (2, 3, 1, 0))


def _bn(dst, tree_path, sd, prefix):
    """Route one BN module to (params scale/bias, batch_stats mean/var)."""
    params, stats = dst
    p = params
    for k in tree_path[:-1]:
        p = p.setdefault(k, {})
    s = stats
    for k in tree_path[:-1]:
        s = s.setdefault(k, {})
    leaf = tree_path[-1]
    p = p.setdefault(leaf, {})
    s = s.setdefault(leaf, {})
    p["scale"] = np.asarray(sd[prefix + ".weight"], np.float32)
    p["bias"] = np.asarray(sd[prefix + ".bias"], np.float32)
    s["mean"] = np.asarray(sd[prefix + ".running_mean"], np.float32)
    s["var"] = np.asarray(sd[prefix + ".running_var"], np.float32)


def _set(params, tree_path, name, value):
    p = params
    for k in tree_path:
        p = p.setdefault(k, {})
    p[name] = value


def convert_shufflenetv2(sd, heads=("hm", "wh", "reg")):
    """Returns {'params': ..., 'batch_stats': ...} numpy trees."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    params, stats = {}, {}
    dst = (params, stats)

    # layer0: conv + BN (+ maxpool has no params)
    _set(params, ["layer0"], "kernel", conv_w(sd["layer0.0.weight"]))
    _bn(dst, ["layer0"], sd, "layer0.1")

    # stages: reference layerL.k.b{1,2}.i
    stage_nodes = {1: 4, 2: 8, 3: 4}
    for L, nodes in stage_nodes.items():
        for k in range(nodes):
            base = f"layer{L}.{k}"
            node_path = [f"layer{L}", f"node{k}"]
            if f"{base}.b1.0.weight" in sd:  # stride-2 node
                _set(params, node_path + ["b1_conv1"], "kernel",
                     conv_w(sd[f"{base}.b1.0.weight"]))
                _bn(dst, node_path + ["b1_conv1"], sd, f"{base}.b1.1")
                _set(params, node_path + ["b1_conv2"], "kernel",
                     conv_w(sd[f"{base}.b1.2.weight"]))
                _bn(dst, node_path + ["b1_conv2"], sd, f"{base}.b1.3")
            _set(params, node_path + ["b2_conv1"], "kernel",
                 conv_w(sd[f"{base}.b2.0.weight"]))
            _bn(dst, node_path + ["b2_conv1"], sd, f"{base}.b2.1")
            _set(params, node_path + ["b2_conv2"], "kernel",
                 conv_w(sd[f"{base}.b2.3.weight"]))
            _bn(dst, node_path + ["b2_conv2"], sd, f"{base}.b2.4")
            _set(params, node_path + ["b2_conv3"], "kernel",
                 conv_w(sd[f"{base}.b2.5.weight"]))
            _bn(dst, node_path + ["b2_conv3"], sd, f"{base}.b2.6")

    _set(params, ["layer4"], "kernel", conv_w(sd["layer4.0.weight"]))
    _bn(dst, ["layer4"], sd, "layer4.1")

    # deconv stage: deconv_layers.[4i]=deform module, [4i+1]=BN
    for i in range(3):
        base = f"deconv_layers.{4 * i}"
        path = [f"deconv{i}"]
        _set(params, path + ["conv_scale"], "kernel",
             conv_w(sd[f"{base}.conv_scale.weight"]))
        _set(params, path + ["conv_scale"], "bias",
             np.asarray(sd[f"{base}.conv_scale.bias"], np.float32))
        _set(params, path, "deform_kernel",
             conv_w(sd[f"{base}.conv.weight"]))
        _set(params, path + ["conv_channel"], "kernel",
             conv_w(sd[f"{base}.conv_channel.weight"]))
        _bn(dst, path + ["conv_channel"], sd, f"deconv_layers.{4 * i + 1}")

    # heads: Sequential [conv1x1, BN, ReLU, dwconv, BN, ReLU, conv1x1]
    for h in heads:
        hp = [f"head_{h}"]
        _set(params, hp + ["conv1"], "kernel", conv_w(sd[f"{h}.0.weight"]))
        _bn(dst, hp + ["conv1"], sd, f"{h}.1")
        _set(params, hp + ["conv2"], "kernel", conv_w(sd[f"{h}.3.weight"]))
        _bn(dst, hp + ["conv2"], sd, f"{h}.4")
        _set(params, hp + ["out"], "kernel", conv_w(sd[f"{h}.6.weight"]))
        _set(params, hp + ["out"], "bias",
             np.asarray(sd[f"{h}.6.bias"], np.float32))

    return {"params": params, "batch_stats": stats}


PYTORCHCV_RENAMES = [
    # pytorchcv shufflenetv2_w1/w2 names -> reference CoDeNet names, the
    # rename table the reference built but never applied (dead code,
    # shufflenetv2_dcn.py:343-361); applying it here completes pretrained
    # backbone loading
    ("features.stage1.", "layer1."), ("features.stage2.", "layer2."),
    ("features.stage3.", "layer3."),
    ("unit1.", "0."), ("unit2.", "1."), ("unit3.", "2."), ("unit4.", "3."),
    ("unit5.", "4."), ("unit6.", "5."), ("unit7.", "6."), ("unit8.", "7."),
    ("compress_layer0", "b2.0"),
    ("dw_conv2", "b2.3"), ("compress_bn1", "b2.1"),
    ("dw_bn2", "b2.4"), ("compress_conv1", "b2.0"),
    ("expand_conv3", "b2.5"), ("expand_bn3", "b2.6"),
    ("dw_conv4", "b1.0"), ("dw_bn4", "b1.1"),
    ("expand_conv5", "b1.2"), ("expand_bn5", "b1.3"),
    ("features.final_block.conv", "layer4.0"),
    ("features.final_block.bn", "layer4.1"),
    ("features.init_block.conv.conv", "layer0.0"),
    ("features.init_block.conv.bn", "layer0.1"),
]


def pytorchcv_to_reference_names(sd):
    """Rename a pytorchcv ShuffleNetV2 state_dict to the reference layout
    (then convert_shufflenetv2 can ingest the backbone weights)."""
    out = {}
    for key, value in sd.items():
        new = key
        for old, repl in PYTORCHCV_RENAMES:
            new = new.replace(old, repl)
        out[new] = value
    # pytorchcv conv modules nest a `.conv`/`.bn` suffix in some places;
    # strip straggling '.conv.weight' -> '.weight'
    fixed = {}
    for key, value in out.items():
        fixed[key.replace(".conv.weight", ".weight")] = value
    return fixed


def convert_pretrained_backbone(sd, heads=("hm", "wh", "reg")):
    """Partial conversion: only backbone keys (layers 0-4); deconv/head
    params stay at init. Combine with checkpoint.load_model's tolerant
    semantics to warm-start training (fixes the reference's dead
    init_weights)."""
    sd = pytorchcv_to_reference_names(sd)
    partial = {}
    for k, v in sd.items():
        if k.startswith(("layer0.", "layer1.", "layer2.", "layer3.",
                         "layer4.")):
            partial[k] = v
    # convert_shufflenetv2 requires the full set; build only backbone trees
    params, stats = {}, {}
    dst = (params, stats)
    if "layer0.0.weight" in partial:
        _set(params, ["layer0"], "kernel", conv_w(partial["layer0.0.weight"]))
        _bn(dst, ["layer0"], partial, "layer0.1")
    stage_nodes = {1: 4, 2: 8, 3: 4}
    for L, nodes in stage_nodes.items():
        for k in range(nodes):
            base = f"layer{L}.{k}"
            if f"{base}.b2.0.weight" not in partial:
                continue
            node_path = [f"layer{L}", f"node{k}"]
            if f"{base}.b1.0.weight" in partial:
                _set(params, node_path + ["b1_conv1"], "kernel",
                     conv_w(partial[f"{base}.b1.0.weight"]))
                _bn(dst, node_path + ["b1_conv1"], partial, f"{base}.b1.1")
                _set(params, node_path + ["b1_conv2"], "kernel",
                     conv_w(partial[f"{base}.b1.2.weight"]))
                _bn(dst, node_path + ["b1_conv2"], partial, f"{base}.b1.3")
            _set(params, node_path + ["b2_conv1"], "kernel",
                 conv_w(partial[f"{base}.b2.0.weight"]))
            _bn(dst, node_path + ["b2_conv1"], partial, f"{base}.b2.1")
            _set(params, node_path + ["b2_conv2"], "kernel",
                 conv_w(partial[f"{base}.b2.3.weight"]))
            _bn(dst, node_path + ["b2_conv2"], partial, f"{base}.b2.4")
            _set(params, node_path + ["b2_conv3"], "kernel",
                 conv_w(partial[f"{base}.b2.5.weight"]))
            _bn(dst, node_path + ["b2_conv3"], partial, f"{base}.b2.6")
    if "layer4.0.weight" in partial:
        _set(params, ["layer4"], "kernel", conv_w(partial["layer4.0.weight"]))
        _bn(dst, ["layer4"], partial, "layer4.1")
    return {"params": params, "batch_stats": stats}




def deconv_w(t):
    """torch ConvTranspose2d IOHW -> HWIO (models.resnet applies the
    spatial flip inside conv_transpose_4x4_s2, so no flip here)."""
    return np.transpose(np.asarray(t, dtype=np.float32), (2, 3, 0, 1))


def _conv(params, path, sd, key, bias_key=None):
    _set(params, path, "kernel", conv_w(sd[key]))
    if bias_key is not None and bias_key in sd:
        _set(params, path, "bias", np.asarray(sd[bias_key], np.float32))


def convert_resnet(sd, heads=("hm", "wh", "reg"), head_conv=64, dcn=False):
    """Reference PoseResNet state_dict (msra_resnet.py:108-281) -> our
    models.resnet.PoseResNet variables. Handles BasicBlock and Bottleneck
    stages, the 3 bias-free ConvTranspose deconvs (deconv_layers.{0,3,6}),
    and the sorted-head Sequentials ({head}.0/.2 when head_conv>0).

    dcn=True reads the resnet_dcn.py:213-245 deconv layout instead — each
    stage is 6 modules [DCN, BN, ReLU, ConvTranspose, BN, ReLU], so the
    DCN sits at deconv_layers.{6i} (with its conv_offset_mask submodule)
    and the ConvTranspose at deconv_layers.{6i+3} — mapped onto
    models.resnet.PoseResNetDCN (deconv{i}_dcn / bn1 / up / bn2)."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    params, stats = {}, {}
    dst = (params, stats)
    _conv(params, ["conv1"], sd, "conv1.weight")
    _bn(dst, ["bn1"], sd, "bn1")
    bottleneck = "layer1.0.conv3.weight" in sd
    for s in range(1, 5):
        b = 0
        while f"layer{s}.{b}.conv1.weight" in sd:
            base = f"layer{s}.{b}"
            path = [f"layer{s}_{b}"]
            _conv(params, path + ["Conv_0"], sd, f"{base}.conv1.weight")
            _bn(dst, path + ["bn1"], sd, f"{base}.bn1")
            _conv(params, path + ["Conv_1"], sd, f"{base}.conv2.weight")
            _bn(dst, path + ["bn2"], sd, f"{base}.bn2")
            if bottleneck:
                _conv(params, path + ["Conv_2"], sd, f"{base}.conv3.weight")
                _bn(dst, path + ["bn3"], sd, f"{base}.bn3")
            if f"{base}.downsample.0.weight" in sd:
                _conv(params, path + ["down_conv"], sd,
                      f"{base}.downsample.0.weight")
                _bn(dst, path + ["down_bn"], sd, f"{base}.downsample.1")
            b += 1
    for i in range(3):
        if dcn:
            base = f"deconv_layers.{6 * i}"
            _set(params, [f"deconv{i}_dcn"], "weight",
                 conv_w(sd[f"{base}.weight"]))
            if f"{base}.bias" in sd:
                _set(params, [f"deconv{i}_dcn"], "bias",
                     np.asarray(sd[f"{base}.bias"], np.float32))
            _conv(params, [f"deconv{i}_dcn", "conv_offset_mask"], sd,
                  f"{base}.conv_offset_mask.weight",
                  f"{base}.conv_offset_mask.bias")
            _bn(dst, [f"deconv{i}_bn1"], sd, f"deconv_layers.{6 * i + 1}")
            params[f"deconv{i}_up"] = deconv_w(
                sd[f"deconv_layers.{6 * i + 3}.weight"])
            _bn(dst, [f"deconv{i}_bn2"], sd, f"deconv_layers.{6 * i + 4}")
            continue
        params[f"deconv{i}_kernel"] = deconv_w(
            sd[f"deconv_layers.{3 * i}.weight"])
        _bn(dst, [f"deconv{i}_bn"], sd, f"deconv_layers.{3 * i + 1}")
    for h in heads:
        if head_conv > 0:
            _conv(params, [f"head_{h}_conv1"], sd, f"{h}.0.weight",
                  f"{h}.0.bias")
            _conv(params, [f"head_{h}_out"], sd, f"{h}.2.weight",
                  f"{h}.2.bias")
        else:
            _conv(params, [f"head_{h}_out"], sd, f"{h}.weight", f"{h}.bias")
    return {"params": params, "batch_stats": stats}


def _dla_block(dst, path, sd, prefix):
    """One DLA BasicBlock (dlav0.py:29-59): conv1/bn1/conv2/bn2."""
    params, _ = dst
    _conv(params, path + ["Conv_0"], sd, f"{prefix}.conv1.weight")
    _bn(dst, path + ["bn1"], sd, f"{prefix}.bn1")
    _conv(params, path + ["Conv_1"], sd, f"{prefix}.conv2.weight")
    _bn(dst, path + ["bn2"], sd, f"{prefix}.bn2")


def _dla_tree(dst, path, sd, prefix, levels):
    """Recursive Tree (dlav0.py:166-219): tree1/tree2 + root at the leaf
    level, optional project on channel change."""
    params, _ = dst
    if f"{prefix}.project.0.weight" in sd:
        _conv(params, path + ["project_conv"], sd,
              f"{prefix}.project.0.weight")
        _bn(dst, path + ["project_bn"], sd, f"{prefix}.project.1")
    if levels == 1:
        _dla_block(dst, path + ["tree1"], sd, f"{prefix}.tree1")
        _dla_block(dst, path + ["tree2"], sd, f"{prefix}.tree2")
        _conv(params, path + ["root", "Conv_0"], sd,
              f"{prefix}.root.conv.weight")
        _bn(dst, path + ["root", "bn"], sd, f"{prefix}.root.bn")
    else:
        _dla_tree(dst, path + ["tree1"], sd, f"{prefix}.tree1", levels - 1)
        _dla_tree(dst, path + ["tree2"], sd, f"{prefix}.tree2", levels - 1)
        if f"{prefix}.root.conv.weight" in sd:
            _conv(params, path + ["root", "Conv_0"], sd,
                  f"{prefix}.root.conv.weight")
            _bn(dst, path + ["root", "bn"], sd, f"{prefix}.root.bn")


def convert_dlav0(sd, heads=("hm", "wh", "reg"), down_ratio=4):
    """Reference DLASeg/dla34 state_dict (dlav0.py:534-619) -> our
    models.dlav0.DLASeg variables.

    Limitation: the reference's IDAUp up_{i} is a per-channel grouped
    ConvTranspose; our IDAUp stores ONE shared (2f,2f) kernel (every
    channel is fill_up_weights-initialized identically, dlav0.py:429-438).
    Channel 0's plane is taken; a ckpt whose up kernels diverged across
    channels during training cannot be represented exactly."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    params, stats = {}, {}
    dst = (params, stats)
    _conv(params, ["base_layer", "Conv_0"], sd, "base.base_layer.0.weight")
    _bn(dst, ["base_layer", "bn"], sd, "base.base_layer.1")
    for lv in (0, 1):
        _conv(params, [f"level{lv}", "Conv_0"], sd,
              f"base.level{lv}.0.weight")
        _bn(dst, [f"level{lv}", "bn"], sd, f"base.level{lv}.1")
    for lv, levels in zip((2, 3, 4, 5), (1, 2, 2, 1)):
        _dla_tree(dst, [f"level{lv}"], sd, f"base.level{lv}", levels)
    import re
    ida_ids = sorted({int(m.group(1)) for k in sd
                      for m in [re.match(r"dla_up\.ida_(\d+)\.", k)] if m})
    for i in ida_ids:
        base = f"dla_up.ida_{i}"
        path = [f"ida_{i}"]
        sub_ids = sorted({
            int(m.group(2)) for k in sd
            for m in [re.match(
                rf"{re.escape(base)}\.(proj|up|node)_(\d+)\.", k)] if m})
        for j in sub_ids:
            if f"{base}.proj_{j}.0.weight" in sd:
                _conv(params, path + [f"proj_{j}_conv"], sd,
                      f"{base}.proj_{j}.0.weight")
                _bn(dst, path + [f"proj_{j}_bn"], sd, f"{base}.proj_{j}.1")
            if f"{base}.up_{j}.weight" in sd:
                # grouped convT weight (C, 1, 2f, 2f): shared plane
                w = np.asarray(sd[f"{base}.up_{j}.weight"], np.float32)
                _set(params, path, f"up_{j}_kernel", w[0, 0])
            if f"{base}.node_{j}.0.weight" in sd:
                _conv(params, path + [f"node_{j}", "Conv_0"], sd,
                      f"{base}.node_{j}.0.weight")
                _bn(dst, path + [f"node_{j}", "bn"], sd,
                    f"{base}.node_{j}.1")
    for h in heads:
        _conv(params, [f"head_{h}_conv1"], sd, f"{h}.0.weight",
              f"{h}.0.bias")
        _conv(params, [f"head_{h}_out"], sd, f"{h}.2.weight", f"{h}.2.bias")
    return {"params": params, "batch_stats": stats}


def _hg_residual(dst, path, sd, prefix):
    """large_hourglass residual (large_hourglass.py:49-76)."""
    params, _ = dst
    _conv(params, path + ["Conv_0"], sd, f"{prefix}.conv1.weight")
    _bn(dst, path + ["bn1"], sd, f"{prefix}.bn1")
    _conv(params, path + ["Conv_1"], sd, f"{prefix}.conv2.weight")
    _bn(dst, path + ["bn2"], sd, f"{prefix}.bn2")
    if f"{prefix}.skip.0.weight" in sd:
        _conv(params, path + ["skip_conv"], sd, f"{prefix}.skip.0.weight")
        _bn(dst, path + ["skip_bn"], sd, f"{prefix}.skip.1")


def _hg_chain(dst, path, sd, prefix):
    """make_layer/_revr/_hg Sequential of residuals -> ResidualChain."""
    j = 0
    while f"{prefix}.{j}.conv1.weight" in sd:
        _hg_residual(dst, path + [f"res{j}"], sd, f"{prefix}.{j}")
        j += 1


def _hg_module(dst, path, sd, prefix, n):
    """Recursive kp_module (large_hourglass.py:128-186)."""
    _hg_chain(dst, path + ["up1"], sd, f"{prefix}.up1")
    _hg_chain(dst, path + ["low1"], sd, f"{prefix}.low1")
    if n > 1:
        _hg_module(dst, path + ["low2"], sd, f"{prefix}.low2", n - 1)
    else:
        _hg_chain(dst, path + ["low2"], sd, f"{prefix}.low2")
    _hg_chain(dst, path + ["low3"], sd, f"{prefix}.low3")


def convert_hourglass(sd, heads=("hm", "wh", "reg"), num_stacks=2):
    """Reference exkp/large-hourglass state_dict (large_hourglass.py:
    189-283) -> our models.hourglass.HourglassNet variables: pre stem,
    recursive kp stacks, per-stack cnv/intermediate fusion, and the
    per-stack no-BN head Sequentials ({head}.{stack}.0.conv + .1)."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    params, stats = {}, {}
    dst = (params, stats)
    _conv(params, ["pre_conv", "Conv_0"], sd, "pre.0.conv.weight")
    _bn(dst, ["pre_conv", "bn"], sd, "pre.0.bn")
    _hg_residual(dst, ["pre_res"], sd, "pre.1")
    for s in range(num_stacks):
        _hg_module(dst, [f"kp{s}"], sd, f"kps.{s}", 5)
        _conv(params, [f"cnv{s}", "Conv_0"], sd, f"cnvs.{s}.conv.weight")
        _bn(dst, [f"cnv{s}", "bn"], sd, f"cnvs.{s}.bn")
        if s < num_stacks - 1:
            _conv(params, [f"inters_conv{s}"], sd, f"inters_.{s}.0.weight")
            _bn(dst, [f"inters_bn{s}"], sd, f"inters_.{s}.1")
            _conv(params, [f"cnvs_conv{s}"], sd, f"cnvs_.{s}.0.weight")
            _bn(dst, [f"cnvs_bn{s}"], sd, f"cnvs_.{s}.1")
            _hg_residual(dst, [f"inter_res{s}"], sd, f"inters.{s}")
        for h in heads:
            _conv(params, [f"{h}{s}_conv", "Conv_0"], sd,
                  f"{h}.{s}.0.conv.weight", f"{h}.{s}.0.conv.bias")
            _conv(params, [f"{h}{s}_out"], sd, f"{h}.{s}.1.weight",
                  f"{h}.{s}.1.bias")
    return {"params": params, "batch_stats": stats}
