"""InPlace-ABN — activated batch-norm with output-only residency.

TPU-native rebuild of the reference's third CUDA extension
(lib/models/external/src/inplace_abn.cpp:86-94, inplace_abn_cpu.cpp:45-84)
— built by the reference but unreferenced by any of its models (SURVEY.md
§2.1 marks it skip/note-only); provided to close the op inventory.

The op's entire point is MEMORY: standard BN+activation keeps the input x
(or the normalized x-hat) alive for the backward, while InPlace-ABN saves
only the activation OUTPUT and reconstructs everything else by inverting
the (invertible) activation and the affine transform. In the torch world
that is literal in-place buffer reuse; the functional TPU equivalent is a
`jax.custom_vjp` whose residuals are (out, var, weight, bias) — x never
appears in the saved set, so XLA is free to release it after the forward,
halving the activation footprint exactly like the original.

Semantics preserved from the reference C++:
- effective scale is |weight| + eps (abs keeps the affine invertible,
  inplace_abn_cpu.cpp:37-43,56);
- backward: y = (z - bias) / (|weight| + eps); edz = sum(dz);
  eydz = sum(y * dz); dx = (dz - edz/num - y * eydz/num)
  * rsqrt(var + eps) * (|weight| + eps)  (backward_cpu:76-85) —
  i.e. the full train-mode BN backward expressed in output terms;
- dweight = eydz * sign(weight), dbias = edz (the abs chain rule);
- activations: leaky_relu (slope), elu, identity — all invertible
  (leaky_relu_backward_cpu:87+; elu variants in inplace_abn_cuda.cu).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _act(z, activation, slope):
    if activation == "leaky_relu":
        return jnp.where(z >= 0, z, slope * z)
    if activation == "elu":
        return jnp.where(z >= 0, z, jnp.expm1(z))
    return z


def _inv_act(out, activation, slope):
    """Reconstruct pre-activation z from the output (the in-place trick)."""
    if activation == "leaky_relu":
        return jnp.where(out >= 0, out, out / slope)
    if activation == "elu":
        return jnp.where(out >= 0, out, jnp.log1p(out))
    return out


def _dact_from_out(out, activation, slope):
    """activation'(z) recovered from the output's sign."""
    if activation == "leaky_relu":
        return jnp.where(out >= 0, 1.0, slope)
    if activation == "elu":
        # d elu/dz = exp(z) = out + 1 for z < 0
        return jnp.where(out >= 0, 1.0, out + 1.0)
    return jnp.ones_like(out)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def inplace_abn(x, weight, bias, mean, var, eps=1e-5,
                activation="leaky_relu", slope=0.01, training=True):
    """act((x - mean) * rsqrt(var + eps) * (|weight| + eps) + bias).

    x: (..., C) NHWC; weight/bias/mean/var: (C,). mean/var are the
    normalization statistics — gradients do NOT flow into them here.
    With training=True (batch stats computed from x by the caller) the
    backward applies the full through-statistics BN formula, which the
    reference's edz/eydz backward folds into dx (backward_cpu:76-85);
    with training=False (frozen running stats) mean/var really are
    constants and dx reduces to dz * mul.
    """
    gamma = jnp.abs(weight) + eps
    z = (x - mean) * jax.lax.rsqrt(var + eps) * gamma + bias
    return _act(z, activation, slope)


def _fwd(x, weight, bias, mean, var, eps, activation, slope, training):
    out = inplace_abn(x, weight, bias, mean, var, eps, activation, slope,
                      training)
    # residuals: OUTPUT only (plus the per-channel vectors) — x is dead
    return out, (out, weight, bias, var)


def _bwd(eps, activation, slope, training, res, dout):
    out, weight, bias, var = res
    gamma = jnp.abs(weight) + eps
    z = _inv_act(out, activation, slope)
    dz = dout * _dact_from_out(out, activation, slope)
    y = (z - bias) / gamma  # normalized x-hat
    red = tuple(range(out.ndim - 1))
    num = 1
    for d in red:
        num *= out.shape[d]
    edz = dz.sum(axis=red)
    eydz = (y * dz).sum(axis=red)
    mul = jax.lax.rsqrt(var + eps) * gamma
    if training:
        dx = (dz - edz / num - y * eydz / num) * mul
    else:
        dx = dz * mul  # frozen stats: plain affine chain rule
    dweight = eydz * jnp.sign(weight)
    dbias = edz
    # mean/var receive no cotangent (folded into dx, see docstring)
    return dx, dweight, dbias, jnp.zeros_like(var), jnp.zeros_like(var)


inplace_abn.defvjp(_fwd, _bwd)


def abn_reference(x, weight, bias, mean, var, eps=1e-5,
                  activation="leaky_relu", slope=0.01):
    """Plain-autodiff oracle with identical math (keeps x alive)."""
    gamma = jnp.abs(weight) + eps
    z = (x - mean) * jax.lax.rsqrt(var + eps) * gamma + bias
    return _act(z, activation, slope)


class InPlaceABN:
    """Module-style wrapper: batch stats in training, running stats at
    eval, matching the extension's mean_var + forward pairing
    (inplace_abn_cpu.cpp:45-64). Kept framework-light (callable over an
    explicit state dict) since no reference model instantiates it."""

    def __init__(self, num_features, eps=1e-5, momentum=0.1,
                 activation="leaky_relu", slope=0.01):
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.activation = activation
        self.slope = slope

    def init_state(self):
        c = self.num_features
        return {
            "weight": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
            "running_mean": jnp.zeros((c,), jnp.float32),
            "running_var": jnp.ones((c,), jnp.float32),
        }

    def __call__(self, state, x, training=True):
        if training:
            red = tuple(range(x.ndim - 1))
            mean = x.mean(axis=red)
            var = ((x - mean) ** 2).mean(axis=red)
            m = self.momentum
            new_state = dict(state)
            new_state["running_mean"] = (
                (1 - m) * state["running_mean"] + m * mean)
            new_state["running_var"] = (
                (1 - m) * state["running_var"] + m * var)
        else:
            mean, var = state["running_mean"], state["running_var"]
            new_state = state
        out = inplace_abn(x, state["weight"], state["bias"],
                          jax.lax.stop_gradient(mean),
                          jax.lax.stop_gradient(var),
                          self.eps, self.activation, self.slope, training)
        return out, new_state
