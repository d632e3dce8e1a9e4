"""W4A8 deployment artifact: pack, save, load, and run bit-identically.

The reference's headline deliverable is the DEPLOYED quantized model —
0.76 MB (1x) / 2.90 MB (2x --w2) parameter files with 4-bit weights
(README.md:14-18, produced by portable_quantizer at w_bit=4 per
quant_main.py:43-47) driving the FPGA/int8 runtime. This module is the
TPU-native equivalent: it captures the exact integer weights the
real-int8 inference lowering derives (models/layers.py
resolve_int8_weights 'capture' mode), packs the 4-bit levels two per
byte, and writes one .npz whose loader reproduces the int8 eval
bit-identically — the artifact, not the float checkpoint, is what a
deployment consumes.

Contents:
- per quantized conv (every Conv/ConvBN that executes Q.int8_conv):
  int4/int8 weight levels (packed), per-output-channel f32 scales, f32
  folded bias, w_bit;
- every other param leaf (deform kernels, unfolded BatchNorm) raw f32 —
  they are fake-quantized at run time from float, and re-deriving ranges
  from reconstructed values would NOT round-trip, so exactness wins over
  the few extra KB;
- the frozen activation-range EMA state (quant_stats) f32;
- uncovered batch_stats leaves f32.

Covered params/batch_stats (conv kernels + folded BN) are NOT shipped —
the loader fills them from the model template's init values; the int8
path never reads them when a 'deploy' collection is present.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def _flatten(tree, prefix=()):
    """Nested-dict tree -> {('a','b',...): leaf}."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
            out.update(_flatten(dict(v), prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def pack_int4(q):
    """int8 levels in [-8, 7] -> uint8, two per byte (lo nibble first)."""
    flat = (np.asarray(q, np.int8).reshape(-1) + 8).astype(np.uint8)
    if flat.size % 2:
        flat = np.concatenate([flat, np.zeros(1, np.uint8)])
    return flat[0::2] | (flat[1::2] << 4)


def unpack_int4(packed, shape):
    n = int(np.prod(shape))
    lo = (packed & 0x0F).astype(np.int16)
    hi = (packed >> 4).astype(np.int16)
    flat = np.empty(packed.size * 2, np.int16)
    flat[0::2] = lo
    flat[1::2] = hi
    return (flat[:n] - 8).astype(np.int8).reshape(shape)


def capture_deploy(model, variables, input_hw):
    """Run one int8 forward with a mutable 'deploy' collection: every
    quantized conv sows the (q_w, w_scale, bias) the lowering computes
    (models/layers.py resolve_int8_weights)."""
    import jax.numpy as jnp
    dummy = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    clean = {k: v for k, v in variables.items() if k != "deploy"}
    _, mut = model.apply(clean, dummy, train=False, mutable=["deploy"])
    return jax.device_get(dict(mut["deploy"]))


def export_w4a8(model, variables, input_hw, path):
    """Write the packed artifact. Returns a size-breakdown dict."""
    deploy = capture_deploy(model, variables, input_hw)
    flat_deploy = _flatten(deploy)
    # group the per-conv leaves by module path
    convs = {}
    for p, v in flat_deploy.items():
        convs.setdefault(p[:-1], {})[p[-1]] = np.asarray(v)

    manifest = {"convs": [], "floats": [], "quant_stats": [],
                "format": "codenet-tpu-w4a8-v1"}
    # single concatenated blobs (per-array zip entries cost ~1 KB each;
    # with ~90 convs that overhead alone would dwarf the size claim)
    q_parts, s_parts, b_parts = [], [], []
    covered = set()
    for p, entry in sorted(convs.items()):
        q_w = entry["q_w"].astype(np.int8)
        wb = int(entry["w_bit"])
        packed = pack_int4(q_w) if wb <= 4 \
            else q_w.reshape(-1).view(np.uint8)
        manifest["convs"].append(
            {"path": list(p), "shape": list(q_w.shape), "w_bit": wb,
             "q_bytes": int(packed.nbytes),
             "n_bias": int(entry["bias"].size)})
        q_parts.append(packed)
        s_parts.append(entry["w_scale"].astype(np.float32))
        b_parts.append(entry["bias"].astype(np.float32))
        covered.add(p)

    f_parts = []
    for coll in ("params", "batch_stats"):
        flat = _flatten(jax.device_get(dict(variables.get(coll, {}))))
        for p, v in sorted(flat.items()):
            if p[:-1] in covered:
                continue
            a = np.asarray(v, np.float32)
            manifest["floats"].append(
                {"path": list(p), "coll": coll, "shape": list(a.shape)})
            f_parts.append(a.reshape(-1))
    qs_parts = []
    qstats = _flatten(jax.device_get(dict(variables.get("quant_stats", {}))))
    for p, v in sorted(qstats.items()):
        a = np.asarray(v, np.float32)
        manifest["quant_stats"].append(
            {"path": list(p), "shape": list(a.shape)})
        qs_parts.append(a.reshape(-1))

    cat = (lambda parts, dt: np.concatenate(parts).astype(dt)
           if parts else np.zeros(0, dt))
    arrays = {
        "q_blob": cat(q_parts, np.uint8),
        "s_blob": cat(s_parts, np.float32),
        "b_blob": cat(b_parts, np.float32),
        "f_blob": cat(f_parts, np.float32),
        "qs_blob": cat(qs_parts, np.float32),
        "manifest": np.frombuffer(json.dumps(manifest).encode(), np.uint8),
    }
    # npz without compression: the size claim is the honest packed size
    np.savez(path, **arrays)

    import os
    sizes = {
        "int4_weights": int(arrays["q_blob"].nbytes),
        "scales_biases": int(arrays["s_blob"].nbytes
                             + arrays["b_blob"].nbytes),
        "float_leaves": int(arrays["f_blob"].nbytes),
        "quant_stats": int(arrays["qs_blob"].nbytes),
        "file_bytes": os.path.getsize(path),
    }
    return sizes


def load_w4a8(path, init_variables):
    """Rebuild eval variables from the artifact.

    init_variables: a fresh model.init(...) tree (shapes template). The
    covered conv params keep their init values — the int8 path reads the
    'deploy' collection instead (resolve_int8_weights artifact mode)."""
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    manifest = json.loads(bytes(arrays["manifest"].tobytes()).decode())
    if manifest.get("format") != "codenet-tpu-w4a8-v1":
        raise ValueError(f"{path}: not a codenet-tpu W4A8 artifact")

    deploy_flat = {}
    qo = so = bo = 0
    for c in manifest["convs"]:
        p = tuple(c["path"])
        shape = tuple(c["shape"])
        raw = arrays["q_blob"][qo:qo + c["q_bytes"]]
        qo += c["q_bytes"]
        q_w = unpack_int4(raw, shape) if c["w_bit"] <= 4 \
            else raw.view(np.int8).reshape(shape)
        n_out = shape[-1]
        deploy_flat[p + ("q_w",)] = q_w
        deploy_flat[p + ("w_scale",)] = arrays["s_blob"][so:so + n_out]
        so += n_out
        deploy_flat[p + ("bias",)] = arrays["b_blob"][bo:bo + c["n_bias"]]
        bo += c["n_bias"]
        deploy_flat[p + ("w_bit",)] = np.int32(c["w_bit"])

    flat_vars = {coll: _flatten(dict(tree))
                 for coll, tree in init_variables.items()
                 if coll != "deploy"}
    fo = 0
    for f in manifest["floats"]:
        n = int(np.prod(f["shape"])) if f["shape"] else 1
        flat_vars.setdefault(f["coll"], {})[tuple(f["path"])] = \
            arrays["f_blob"][fo:fo + n].reshape(f["shape"])
        fo += n
    qso = 0
    flat_vars["quant_stats"] = {}
    for q in manifest["quant_stats"]:
        n = int(np.prod(q["shape"])) if q["shape"] else 1
        flat_vars["quant_stats"][tuple(q["path"])] = \
            arrays["qs_blob"][qso:qso + n].reshape(q["shape"])
        qso += n

    out = {coll: _unflatten(flat) for coll, flat in flat_vars.items()}
    out["deploy"] = _unflatten(deploy_flat)
    return out
