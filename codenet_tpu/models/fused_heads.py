"""Fused multi-head eval path (PERF.md headroom #3).

The reference runs one head pipeline per output (1x1+BN+ReLU ->
dw3x3+BN+ReLU -> 1x1, shufflenetv2_dcn.py:244-271); each stem re-reads
the full (N, H/4, W/4, 64) neck map from HBM, making the heads ~1.25 ms
of pure memory traffic at 256^2 b128 (tools_tpu/roofline.py). Fusing the
H heads into ONE widened pipeline — concatenated 1x1 stem (64 -> 64*H),
grouped depthwise 3x3, grouped+padded class convs — reads the neck once
and halves the head traffic, with bit-identical math: concatenating
independent output channels changes no dot product, and the BN affine
stays the separate post-conv f32 elementwise op it is in ConvBN (no
fold-into-kernel rounding differences).

Reads the UNCHANGED per-head param tree (checkpoint layout untouched);
FP32/bf16 only — quant modes keep the per-head QuantAct ranges and stay
on the reference-shaped path. `apply_fused_heads` is the eval form (BN
running stats); `apply_fused_heads_train` is the train form (batch
stats + running-stat updates — exact, since BN statistics are
per-channel and channel concatenation preserves them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import conv2d


def can_fuse_heads(model, qspec) -> bool:
    """Only PoseShuffleNetV2's head layout is fusable, and only outside
    quant modes (per-head activation ranges differ)."""
    from .shufflenetv2 import PoseShuffleNetV2
    return isinstance(model, PoseShuffleNetV2) and qspec is None \
        and model.qspec is None


def apply_fused_heads(variables, neck, heads, dtype=None):
    """heads: tuple of (name, classes); neck: (N, H, W, 64) f32.

    Returns {name: (N, H, W, classes) f32} == the per-head Head outputs.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    names = [n for n, _ in heads]
    classes = [c for _, c in heads]
    nh = len(names)
    eps = 1e-5

    def cat(getter):
        return jnp.concatenate([getter(params[f"head_{n}"]) for n in names],
                               axis=-1)

    def cat1(col, field, sub):
        return jnp.concatenate(
            [col[f"head_{n}"][sub][field] for n in names], axis=-1)

    def affine(y, sub):
        mean = cat1(stats, "mean", sub)
        var = cat1(stats, "var", sub)
        gamma = cat1(params, "scale", sub)
        beta = cat1(params, "bias", sub)
        inv = jax.lax.rsqrt(var + eps)
        return (y - mean[None, None, None, :]) \
            * (gamma * inv)[None, None, None, :] \
            + beta[None, None, None, :]

    hc = params[f"head_{names[0]}"]["conv1"]["kernel"].shape[-1]

    # stem: one (1,1,64,64*H) conv — same per-channel contractions as H
    # separate convs, the input read once
    k1 = cat(lambda p: p["conv1"]["kernel"])
    y = conv2d(neck, k1, stride=1, padding=0, dtype=dtype)
    y = jax.nn.relu(affine(y.astype(jnp.float32), "conv1"))

    # grouped depthwise 3x3 over all 64*H channels
    k2 = cat(lambda p: p["conv2"]["kernel"])
    y = conv2d(y, k2, stride=1, padding=1, groups=hc * nh, dtype=dtype)
    y = jax.nn.relu(affine(y.astype(jnp.float32), "conv2"))

    # class convs: grouped 1x1 with per-group cout padded to the max —
    # group g consumes channels [g*hc, (g+1)*hc) and emits
    # [g*cmax, g*cmax+classes[g]) real channels (zero-kernel padding)
    cmax = max(classes)
    kos, bos = [], []
    for n, c in heads:
        ko = params[f"head_{n}"]["out"]["kernel"]
        bo = params[f"head_{n}"]["out"]["bias"]
        if c < cmax:
            ko = jnp.pad(ko, ((0, 0), (0, 0), (0, 0), (0, cmax - c)))
            bo = jnp.pad(bo, ((0, cmax - c),))
        kos.append(ko)
        bos.append(bo)
    ko = jnp.concatenate(kos, axis=-1)
    bo = jnp.concatenate(bos, axis=-1)
    out_all = conv2d(y, ko, stride=1, padding=0, groups=nh, dtype=dtype)
    out_all = out_all + bo.astype(out_all.dtype)[None, None, None, :]
    out_all = out_all.astype(jnp.float32)

    out = {}
    for i, (n, c) in enumerate(heads):
        out[n] = out_all[..., i * cmax:i * cmax + c]
    return out


def apply_fused_heads_train(variables, neck, heads, dtype=None,
                            momentum=0.1, eps=1e-5):
    """Train-mode fused heads: same widened pipeline, BN on BATCH stats.

    BatchNorm is per-channel, so batch mean/var computed over the
    concatenated conv outputs are exactly the per-head statistics — the
    fusion is bit-identical in train mode too (torch momentum-0.1 /
    unbiased running-var semantics of layers.ConvBN preserved). Returns
    (outputs, batch_stats_updates) where the updates tree mirrors the
    per-head ``{head_X: {conv1: {mean, var}, conv2: {...}}}`` layout so
    the trainer can merge it with the backbone's mutated collection.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    names = [n for n, _ in heads]
    nh = len(names)

    def cat(getter):
        return jnp.concatenate([getter(params[f"head_{n}"]) for n in names],
                               axis=-1)

    def bn_train(y, sub):
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(y32 - mean[None, None, None, :]),
                       axis=(0, 1, 2))
        n = y.shape[0] * y.shape[1] * y.shape[2]
        unbiased = var * n / max(n - 1, 1)
        gamma = jnp.concatenate(
            [params[f"head_{n}"][sub]["scale"] for n in names])
        beta = jnp.concatenate(
            [params[f"head_{n}"][sub]["bias"] for n in names])
        inv = jax.lax.rsqrt(var + eps)
        out = (y32 - mean[None, None, None, :]) \
            * (gamma * inv)[None, None, None, :] \
            + beta[None, None, None, :]
        return out, mean, unbiased

    hc = params[f"head_{names[0]}"]["conv1"]["kernel"].shape[-1]

    k1 = cat(lambda p: p["conv1"]["kernel"])
    y = conv2d(neck, k1, stride=1, padding=0, dtype=dtype)
    y, m1, v1 = bn_train(y, "conv1")
    y = jax.nn.relu(y)

    k2 = cat(lambda p: p["conv2"]["kernel"])
    y = conv2d(y, k2, stride=1, padding=1, groups=hc * nh, dtype=dtype)
    y, m2, v2 = bn_train(y, "conv2")
    y = jax.nn.relu(y)

    classes = [c for _, c in heads]
    cmax = max(classes)
    kos, bos = [], []
    for n, c in heads:
        ko = params[f"head_{n}"]["out"]["kernel"]
        bo = params[f"head_{n}"]["out"]["bias"]
        if c < cmax:
            ko = jnp.pad(ko, ((0, 0), (0, 0), (0, 0), (0, cmax - c)))
            bo = jnp.pad(bo, ((0, cmax - c),))
        kos.append(ko)
        bos.append(bo)
    ko = jnp.concatenate(kos, axis=-1)
    bo = jnp.concatenate(bos, axis=-1)
    out_all = conv2d(y, ko, stride=1, padding=0, groups=nh, dtype=dtype)
    out_all = out_all + bo.astype(out_all.dtype)[None, None, None, :]
    out_all = out_all.astype(jnp.float32)

    out, updates = {}, {}
    for i, (n, c) in enumerate(heads):
        out[n] = out_all[..., i * cmax:i * cmax + c]
        old = stats[f"head_{n}"]
        sl = slice(i * hc, (i + 1) * hc)
        updates[f"head_{n}"] = {
            "conv1": {
                "mean": (1 - momentum) * old["conv1"]["mean"]
                        + momentum * m1[sl],
                "var": (1 - momentum) * old["conv1"]["var"]
                       + momentum * v1[sl]},
            "conv2": {
                "mean": (1 - momentum) * old["conv2"]["mean"]
                        + momentum * m2[sl],
                "var": (1 - momentum) * old["conv2"]["var"]
                       + momentum * v2[sl]},
        }
    return out, updates


def eval_forward(model, variables, images, qspec=None):
    """Eval-mode forward returning the LAST stack's head dict, via the
    fused-heads path when the model supports it (detectors and bench use
    this instead of model.apply + [-1])."""
    if can_fuse_heads(model, qspec):
        neck = model.apply(variables, images, train=False,
                           return_neck=True)
        return apply_fused_heads(variables, neck, model.heads,
                                 dtype=model.dtype)
    out = model.apply(variables, images, train=False)
    return out[-1] if isinstance(out, (list, tuple)) else out
