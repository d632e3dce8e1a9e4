"""Deformable position-sensitive ROI pooling (DCNv2 op).

Rebuild of the reference's second CUDA extension
(lib/models/external/src/dcn_deform_pool_cuda.cpp:81-85 +
dcn_deform_pool_cuda_kernel.cu) — built by the reference but unreferenced
by any of its models (SURVEY.md §2.1); provided for op-inventory parity in
NHWC jax: per ROI, a pooled_size x pooled_size grid of bins, each averaging
sample_per_part^2 bilinear samples from its position-sensitive channel
group, with learnable per-part (dy, dx) offsets scaled by trans_std.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear(img, y, x):
    """img: (H, W, C); y, x scalars (clamped outside by caller's masks)."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    fy = y - y0
    fx = x - x0

    def corner(yi, xi, wgt):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return v * (wgt * valid)

    return (corner(y0, x0, (1 - fy) * (1 - fx))
            + corner(y0, x0 + 1, (1 - fy) * fx)
            + corner(y0 + 1, x0, fy * (1 - fx))
            + corner(y0 + 1, x0 + 1, fy * fx))


def deform_psroi_pooling(data, rois, trans=None, *, output_dim,
                         pooled_size=7, group_size=1, part_size=None,
                         sample_per_part=4, spatial_scale=1.0 / 16,
                         trans_std=0.1):
    """data: (N, H, W, C) with C == output_dim * group_size^2;
    rois: (R, 5) [batch_idx, x1, y1, x2, y2] in image coords;
    trans: (R, part, part, 2*output_dim_cls) or None (no_trans).

    Returns (R, pooled_size, pooled_size, output_dim).
    """
    part = part_size or pooled_size
    p = pooled_size
    n, h, w, c = data.shape

    def pool_roi(roi, tr):
        bi = roi[0].astype(jnp.int32)
        x1 = roi[1] * spatial_scale - 0.5
        y1 = roi[2] * spatial_scale - 0.5
        x2 = (roi[3] + 1.0) * spatial_scale - 0.5
        y2 = (roi[4] + 1.0) * spatial_scale - 0.5
        roi_w = jnp.maximum(x2 - x1, 0.1)
        roi_h = jnp.maximum(y2 - y1, 0.1)
        bin_w = roi_w / p
        bin_h = roi_h / p
        sub_w = bin_w / sample_per_part
        sub_h = bin_h / sample_per_part
        img = data[bi]

        def pool_bin(ph, pw, ctop):
            part_h = (ph * part) // p
            part_w = (pw * part) // p
            if tr is not None:
                dy = tr[part_h, part_w, 2 * ctop] * trans_std * roi_h
                dx = tr[part_h, part_w, 2 * ctop + 1] * trans_std * roi_w
            else:
                dy = dx = 0.0
            gh = (ph * group_size) // p
            gw = (pw * group_size) // p
            cin = (ctop * group_size + gh) * group_size + gw
            img2d = jnp.take(img, cin, axis=2)[..., None]

            def sample(iy, ix):
                yy = y1 + ph * bin_h + (iy + 0.5) * sub_h + dy
                xx = x1 + pw * bin_w + (ix + 0.5) * sub_w + dx
                inside = (yy > -1) & (yy < h) & (xx > -1) & (xx < w)
                v = _bilinear(img2d,
                              jnp.clip(yy, 0.0, h - 1.0),
                              jnp.clip(xx, 0.0, w - 1.0))[0]
                return v * inside

            grid = jnp.arange(sample_per_part)
            vals = jax.vmap(lambda iy: jax.vmap(
                lambda ix: sample(iy, ix))(grid))(grid)
            return vals.sum() / (sample_per_part ** 2)

        phs = jnp.arange(p)
        out = jax.vmap(lambda ph: jax.vmap(lambda pw: jax.vmap(
            lambda ct: pool_bin(ph, pw, ct))(jnp.arange(output_dim)))(
            phs))(phs)
        return out  # (p, p, output_dim)

    if trans is None:
        return jax.vmap(lambda r: pool_roi(r, None))(rois)
    return jax.vmap(pool_roi)(rois, trans)
