"""Deformable convolution, TPU-native.

The reference implements deformable conv as CUDA im2col + GEMM
(/root/reference/lib/models/external/src/dcn_deform_conv_cuda_kernel.cu:190-242,
bilinear sampling at :84-115). Here the same op is a differentiable XLA
program in NHWC:

  1. `deform_sample` gathers, for every output position and kernel tap, a
     bilinear blend of 4 neighbours from the input (one flat gather over
     H*W, shared across channels — offsets do not depend on channel for a
     deformable group, so a single index vector feeds a C-wide gather that
     XLA vectorizes over the 128-lane axis).
  2. A tap-weight contraction on the MXU (einsum) replaces the GEMM.

Boundary semantics match the CUDA kernel exactly: a sampling position
contributes 0 outside (-1, H) x (-1, W), with per-corner zeroing inside
(kernel.cu:97-109). Gradients need no custom VJP: the adjoint of the gather
is XLA's scatter-add (the col2im of kernel.cu:279-341), and the coordinate
gradient flows through the fractional bilinear weights (floor() has zero
gradient), which is term-for-term the CUDA `get_coordinate_weight`
(kernel.cu:146-190).

The co-designed CoDeNet variant (reference modules/dcn_deform_conv.py:285-330)
constrains every tap offset to `anchor * (s - 1)` for one scalar s per
position, so `codesign_deform_conv` builds tap positions directly from s —
taps sample the axis-aligned square `p + (i, j) * s`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Per-tap (dy, dx) anchors of a 3x3 kernel, row-major — the reference's
# anchor_offset constant (modules/dcn_deform_conv.py:319-321) reshaped (9, 2).
ANCHOR_OFFSETS = np.array(
    [[-1, -1], [-1, 0], [-1, 1],
     [0, -1], [0, 0], [0, 1],
     [1, -1], [1, 0], [1, 1]], dtype=np.float32)


def _conv_out_size(size, k, stride, pad, dil):
    return (size + 2 * pad - (dil * (k - 1) + 1)) // stride + 1


def deform_sample(x, tap_offsets, kernel_size=(3, 3), stride=1, padding=1,
                  dilation=1):
    """Bilinear-sample deformable im2col columns.

    Args:
      x: (N, H, W, C) input features.
      tap_offsets: (N, Ho, Wo, K, 2) per-tap (dy, dx) offsets added to the
        standard convolution sampling positions (K = kh*kw). For
        deformable_groups > 1 call per group on the channel slice.
      kernel_size, stride, padding, dilation: ints or (h, w) pairs.

    Returns:
      (N, Ho, Wo, K, C) sampled columns (zeros outside the input).
    """
    kh, kw = kernel_size if isinstance(kernel_size, tuple) else (kernel_size,) * 2
    sh, sw = stride if isinstance(stride, tuple) else (stride,) * 2
    ph, pw = padding if isinstance(padding, tuple) else (padding,) * 2
    dh, dw = dilation if isinstance(dilation, tuple) else (dilation,) * 2

    n, h, w, c = x.shape
    ho = _conv_out_size(h, kh, sh, ph, dh)
    wo = _conv_out_size(w, kw, sw, pw, dw)
    k = kh * kw
    assert tap_offsets.shape[1:] == (ho, wo, k, 2), (
        f"tap_offsets {tap_offsets.shape} vs expected {(ho, wo, k, 2)}")

    # Standard conv sampling positions per tap (output grid).
    ys = jnp.arange(ho, dtype=jnp.float32) * sh - ph
    xs = jnp.arange(wo, dtype=jnp.float32) * sw - pw
    ti = jnp.arange(kh, dtype=jnp.float32) * dh  # tap row offsets
    tj = jnp.arange(kw, dtype=jnp.float32) * dw
    # base positions: (Ho, Wo, K)
    base_y = ys[:, None, None] + jnp.tile(
        jnp.repeat(ti, kw), 1)[None, None, :]
    base_x = xs[None, :, None] + jnp.tile(tj, kh)[None, None, :]

    sy = base_y[None] + tap_offsets[..., 0]  # (N, Ho, Wo, K)
    sx = base_x[None] + tap_offsets[..., 1]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0).astype(x.dtype)
    fx = (sx - x0).astype(x.dtype)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    x_flat = x.reshape(n, h * w, c)

    def corner(yi, xi, wgt):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        flat_idx = idx.reshape(n, -1)  # (N, Ho*Wo*K)
        g = jnp.take_along_axis(x_flat, flat_idx[..., None], axis=1)
        g = g.reshape(n, ho, wo, k, c)
        return g * (wgt * valid.astype(x.dtype))[..., None]

    out = corner(y0i, x0i, (1 - fy) * (1 - fx))
    out += corner(y0i, x0i + 1, (1 - fy) * fx)
    out += corner(y0i + 1, x0i, fy * (1 - fx))
    out += corner(y0i + 1, x0i + 1, fy * fx)
    return out


def _contract(cols, weight, groups, precision=None):
    """Tap-weight contraction on the MXU.

    cols: (N, Ho, Wo, K, C); weight: HWIO (kh, kw, Cin/groups, Cout).
    """
    kh, kw, cpg, cout = weight.shape
    k = kh * kw
    n, ho, wo, _, c = cols.shape
    wf = weight.reshape(k, cpg, cout)
    if groups == 1:
        return jnp.einsum("nhwkc,kco->nhwo", cols, wf, precision=precision,
                          preferred_element_type=cols.dtype)
    if cpg == 1 and cout == c * 1 and groups == c:
        # depthwise fast path: output channel o reads input channel o
        return jnp.einsum("nhwkc,kc->nhwc", cols, wf.reshape(k, cout),
                          precision=precision,
                          preferred_element_type=cols.dtype)
    opg = cout // groups
    colsg = cols.reshape(n, ho, wo, k, groups, cpg)
    # torch groups order out channels consecutively per group
    wg = wf.reshape(k, cpg, groups, opg)
    out = jnp.einsum("nhwkgc,kcgo->nhwgo", colsg, wg, precision=precision,
                     preferred_element_type=cols.dtype)
    return out.reshape(n, ho, wo, cout)


def deform_conv2d(x, offset, weight, stride=1, padding=1, dilation=1,
                  groups=1, deformable_groups=1, mask=None, precision=None):
    """General deformable convolution, reference-compatible semantics.

    Args:
      x: (N, H, W, C) NHWC input.
      offset: (N, Ho, Wo, dg*2*K) with the reference channel layout
        [tap0_dy, tap0_dx, tap1_dy, tap1_dx, ...] per deformable group
        (kernel.cu:221-227).
      weight: HWIO (kh, kw, C//groups, Cout).
      mask: optional (N, Ho, Wo, dg*K) modulation (DCNv2); multiplies the
        sampled columns (reference src/dcn_deform_conv_cuda.cpp:486+).

    Returns: (N, Ho, Wo, Cout).
    """
    kh, kw = weight.shape[0], weight.shape[1]
    k = kh * kw
    n, ho, wo, oc = offset.shape
    dg = deformable_groups
    assert oc == dg * 2 * k, f"offset channels {oc} != {dg * 2 * k}"
    offs = offset.reshape(n, ho, wo, dg, k, 2)

    c = x.shape[-1]
    cpdg = c // dg
    outs = []
    for g in range(dg):
        xg = x[..., g * cpdg:(g + 1) * cpdg] if dg > 1 else x
        cols = deform_sample(xg, offs[:, :, :, g], (kh, kw), stride, padding,
                             dilation)
        if mask is not None:
            m = mask.reshape(n, ho, wo, dg, k)[:, :, :, g]
            cols = cols * m[..., None]
        outs.append(cols)
    cols = outs[0] if dg == 1 else jnp.concatenate(outs, axis=-1)
    return _contract(cols, weight, groups, precision)


def codesign_deform_conv(x, s, weight, stride=1, padding=1, dilation=1,
                         groups=None, precision=None):
    """CoDeNet's co-designed deformable conv: one scale per position.

    Tap (i, j) of the 3x3 kernel samples at `p + (i, j) * dilation +
    anchor_(i,j) * (s - 1)`; with dilation 1 that is the axis-aligned square
    `p + (i, j) * s` (reference modules/dcn_deform_conv.py:323-330).

    Args:
      x: (N, H, W, C).
      s: (N, Ho, Wo, 1) bounded scale map (deformable_groups=1, as shipped).
      weight: HWIO (3, 3, C//groups, Cout); flagship uses depthwise
        (3, 3, 1, C).
      groups: default depthwise (groups = C), matching the shipped module
        (modules/dcn_deform_conv.py:307-309).
    """
    c = x.shape[-1]
    if groups is None:
        groups = c
    anchor = jnp.asarray(ANCHOR_OFFSETS)  # (9, 2)
    tap_offsets = anchor[None, None, None] * (s[..., None] - 1.0)
    cols = deform_sample(x, tap_offsets, (3, 3), stride, padding, dilation)
    return _contract(cols, weight, groups, precision)


# ---------------------------------------------------------------------------
# Naive reference implementation (tests only; mirrors the CUDA bilinear math
# literally, in numpy loops).
# ---------------------------------------------------------------------------

def deform_conv2d_naive(x, offset, weight, stride=1, padding=1, dilation=1,
                        groups=1, deformable_groups=1):
    """O(N*Ho*Wo*K*C) python-loop reference for correctness tests."""
    x = np.asarray(x, dtype=np.float64)
    offset = np.asarray(offset, dtype=np.float64)
    weight = np.asarray(weight, dtype=np.float64)
    kh, kw, cpg, cout = weight.shape
    n, h, w, c = x.shape
    ho = _conv_out_size(h, kh, stride, padding, dilation)
    wo = _conv_out_size(w, kw, stride, padding, dilation)
    k = kh * kw
    dg = deformable_groups
    cpdg = c // dg
    opg = cout // groups
    cin_pg = c // groups
    out = np.zeros((n, ho, wo, cout))

    def bilin(img2d, sy, sx):
        if sy <= -1 or sy >= h or sx <= -1 or sx >= w:
            return 0.0
        y0, x0 = int(np.floor(sy)), int(np.floor(sx))
        fy, fx = sy - y0, sx - x0
        v = 0.0
        for (yy, xx, wgt) in ((y0, x0, (1 - fy) * (1 - fx)),
                              (y0, x0 + 1, (1 - fy) * fx),
                              (y0 + 1, x0, fy * (1 - fx)),
                              (y0 + 1, x0 + 1, fy * fx)):
            if 0 <= yy < h and 0 <= xx < w:
                v += wgt * img2d[yy, xx]
        return v

    for b in range(n):
        for oy in range(ho):
            for ox in range(wo):
                for o in range(cout):
                    g = o // opg
                    acc = 0.0
                    for ci in range(cin_pg):
                        cin = g * cin_pg + ci
                        dgi = cin // cpdg
                        for ti in range(kh):
                            for tj in range(kw):
                                tap = ti * kw + tj
                                oy_off = offset[b, oy, ox,
                                                dgi * 2 * k + 2 * tap]
                                ox_off = offset[b, oy, ox,
                                                dgi * 2 * k + 2 * tap + 1]
                                sy = oy * stride - padding + ti * dilation + oy_off
                                sx = ox * stride - padding + tj * dilation + ox_off
                                acc += weight[ti, tj, ci, o] * bilin(
                                    x[b, :, :, cin], sy, sx)
                    out[b, oy, ox, o] = acc
    return out
