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


