"""Checkpoint save/load with reference-compatible tolerant semantics.

Reference lib/models/model.py:35-100: `load_model` strips DataParallel
prefixes and loads shape-mismatch-tolerantly with warnings (enabling
FP32 -> quantized partial loads and cross-arch transfer); `save_model`
writes {epoch, state_dict[, optimizer]}. Here: a msgpack file holding
{epoch, variables, (opt_state)}, loaded tolerantly by matching flattened
paths and shapes. Learning-rate recomputation on resume mirrors
model.py:72-84.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def save_model(path, epoch, variables, opt_state=None, extra=None):
    """Write {epoch, variables[, opt_state, extra]} (reference
    model.py:91-100)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "epoch": int(epoch),
        "variables": jax.tree_util.tree_map(np.asarray, variables),
    }
    if opt_state is not None:
        payload["opt_state"] = jax.tree_util.tree_map(
            lambda a: np.asarray(a) if hasattr(a, "shape") else a, opt_state)
    if extra:
        payload["extra"] = extra
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_model(path, variables, strict=False):
    """Tolerant load: keep checkpoint values whose path+shape match the
    target `variables` tree; warn on mismatches/missing (reference
    model.py:40-69). Returns (variables, epoch, payload)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    ckpt_flat = _flatten(payload["variables"])
    tgt_flat = _flatten(variables)
    out = {}
    for path_key, tgt in tgt_flat.items():
        if path_key in ckpt_flat:
            src = ckpt_flat[path_key]
            if tuple(np.shape(src)) == tuple(np.shape(tgt)):
                out[path_key] = jnp.asarray(src, dtype=tgt.dtype)
            else:
                msg = ("Skip loading parameter {}, required shape {}, "
                       "loaded shape {}.".format(
                           "/".join(path_key), np.shape(tgt), np.shape(src)))
                if strict:
                    raise ValueError(msg)
                print(msg)
                out[path_key] = tgt
        else:
            msg = "No param {}.".format("/".join(path_key))
            if strict:
                raise ValueError(msg)
            print(msg)
            out[path_key] = tgt
    for path_key in ckpt_flat:
        if path_key not in tgt_flat:
            msg = "Drop parameter {}.".format("/".join(path_key))
            if strict:
                raise ValueError(msg)
            print(msg)
    return _unflatten(out), payload.get("epoch", 0), payload


def resume_lr(base_lr, lr_step, start_epoch):
    """LR after resuming at `start_epoch` (reference model.py:78-84)."""
    lr = base_lr
    for step in lr_step:
        if start_epoch >= step:
            lr *= 0.1
    return lr
