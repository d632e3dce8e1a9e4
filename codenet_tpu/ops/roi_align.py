"""ROI-Align (TPU-native rebuild of the reference's CUDA extension).

Reference: lib/models/external/src/roi_align_cuda.cpp:116-117 +
roi_align_kernel.cu (Caffe2-style, UNALIGNED coordinates — no -0.5 pixel
shift) — built by the reference but unreferenced by any of its models
(SURVEY.md §2.1 marks it skip/note-only); provided here to close the op
inventory. Semantics preserved exactly:

- roi coords scaled by `spatial_scale` without rounding
  (roi_align_kernel.cu:186-190), malformed ROIs forced to 1x1
  (kernel.cu:197-198);
- per-bin sample grid: `sampling_ratio` if > 0 else
  ceil(roi_size / pooled_size) (kernel.cu:211-215), samples at bin
  centers, averaged over the grid;
- bilinear boundary handling: samples with y outside [-1, H] (or x
  outside [-1, W]) contribute 0; otherwise y, x clamp to >= 0 and the
  high corner collapses onto the low one at the far edge
  (bilinear_interpolate, kernel.cu:43-96).

Design: one jit-friendly program — the (R, P, P, gh, gw) sample lattice
is built as a single batched computation, the 4 bilinear corners become
one `jnp.take` gather over the flattened (H*W) axis per corner, and the
channel axis rides along vectorized (NHWC: the gather returns (..., C)
rows, which XLA lowers to efficient dynamic-slice rows on TPU — no
scalar loops). Differentiable by construction (pure jnp), so the CUDA
backward (RoIAlignBackwardFeature scatter) is subsumed by autodiff's
transposed gather. The adaptive (sampling_ratio=0) grid is data-
dependent in the reference; under jit we build a static `max_grid`
lattice and mask samples beyond each ROI's ceil() count — bit-identical
averages with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_gather(flat_img, h, w, y, x):
    """flat_img: (N, H*W, C); y, x: (N, ...) sample coords (image scale).

    Returns (N, ..., C) with the reference's boundary semantics."""
    inside = (y >= -1.0) & (y <= h) & (x >= -1.0) & (x <= w)
    y = jnp.maximum(y, 0.0)
    x = jnp.maximum(x, 0.0)
    y0 = jnp.minimum(jnp.floor(y).astype(jnp.int32), h - 1)
    x0 = jnp.minimum(jnp.floor(x).astype(jnp.int32), w - 1)
    # far-edge collapse: when y0 == h-1 the high corner equals the low
    # corner and the fractional part is forced to 0 (kernel.cu:67-80)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = jnp.where(y0 == h - 1, 0.0, y - y0)
    lx = jnp.where(x0 == w - 1, 0.0, x - x0)
    hy, hx = 1.0 - ly, 1.0 - lx

    def take(yi, xi):
        idx = yi * w + xi  # (N, ...)
        return jnp.take_along_axis(
            flat_img, idx.reshape(idx.shape[0], -1, 1), axis=1
        ).reshape((*idx.shape, flat_img.shape[-1]))

    out = (take(y0, x0) * (hy * hx)[..., None]
           + take(y0, x1) * (hy * lx)[..., None]
           + take(y1, x0) * (ly * hx)[..., None]
           + take(y1, x1) * (ly * lx)[..., None])
    return out * inside[..., None]


def roi_align(data, rois, *, pooled_height=7, pooled_width=7,
              spatial_scale=1.0 / 16, sampling_ratio=0, max_grid=8):
    """data: (N, H, W, C); rois: (R, 5) [batch_idx, x1, y1, x2, y2].

    Returns (R, pooled_height, pooled_width, C).

    `max_grid` bounds the adaptive per-bin grid when sampling_ratio == 0
    (static shapes under jit); ROIs needing a finer grid than max_grid
    use max_grid samples per bin per axis.
    """
    n, h, w, c = data.shape
    flat = data.reshape(n, h * w, c)
    ph_n, pw_n = pooled_height, pooled_width

    bi = jnp.round(rois[:, 0]).astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_h = roi_h / ph_n  # (R,)
    bin_w = roi_w / pw_n

    if sampling_ratio > 0:
        gh = jnp.full_like(bi, sampling_ratio)
        gw = jnp.full_like(bi, sampling_ratio)
        g = sampling_ratio
    else:
        gh = jnp.minimum(jnp.ceil(roi_h / ph_n).astype(jnp.int32), max_grid)
        gw = jnp.minimum(jnp.ceil(roi_w / pw_n).astype(jnp.int32), max_grid)
        gh = jnp.maximum(gh, 1)
        gw = jnp.maximum(gw, 1)
        g = max_grid

    ph = jnp.arange(ph_n, dtype=jnp.float32)
    pw = jnp.arange(pw_n, dtype=jnp.float32)
    iy = jnp.arange(g, dtype=jnp.float32)
    ix = jnp.arange(g, dtype=jnp.float32)

    # sample coords: (R, P, 1, G, 1) x (R, 1, P, 1, G) broadcast lattice
    ys = (y1[:, None, None] + ph[None, :, None] * bin_h[:, None, None]
          + (iy[None, None, :] + 0.5) * bin_h[:, None, None]
          / gh[:, None, None].astype(jnp.float32))  # (R, P, G)
    xs = (x1[:, None, None] + pw[None, :, None] * bin_w[:, None, None]
          + (ix[None, None, :] + 0.5) * bin_w[:, None, None]
          / gw[:, None, None].astype(jnp.float32))  # (R, P, G)
    my = (jnp.arange(g)[None, None, :] < gh[:, None, None])  # (R, 1, G)
    mx = (jnp.arange(g)[None, None, :] < gw[:, None, None])

    yy = jnp.broadcast_to(ys[:, :, None, :, None], (len(bi), ph_n, pw_n, g, g))
    xx = jnp.broadcast_to(xs[:, None, :, None, :], (len(bi), ph_n, pw_n, g, g))
    mask = (my[:, :, None, :, None] & mx[:, None, :, None, :])
    mask = jnp.broadcast_to(
        mask, (len(bi), ph_n, pw_n, g, g)).astype(data.dtype)

    per_roi_img = jnp.take(flat, bi, axis=0)  # (R, H*W, C)
    vals = _bilinear_gather(per_roi_img, h, w, yy, xx)  # (R,P,P,G,G,C)
    vals = vals * mask[..., None]
    count = (gh * gw).astype(data.dtype)  # (R,)
    return vals.sum(axis=(3, 4)) / count[:, None, None, None]
