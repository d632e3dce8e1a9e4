"""Pallas TPU kernels for the co-designed deformable depthwise convolution.

The XLA-gather formulation (deform_conv.py) materializes 4 corner gathers
x 9 taps of the full feature map in HBM — measured ~22 ms of a 38 ms
ctdet-256 forward (profiled on v5e). These kernels exploit two facts:

1. CoDeNet's deconv feature maps are tiny (8x8x1024, 16x16x256, 32x32x128
   at 256 input) — map + scratch fit comfortably in VMEM (~16 MB/core).
2. A bilinear gather is a sparse matmul: for tap t, sample_t = B_t @ X
   where B_t[p, q] holds the 4 bilinear corner weights of output position p
   against flattened input position q. Building B_t in VMEM via iota
   comparisons and contracting on the MXU replaces HBM gather traffic with
   dense FLOPs the MXU is idle for anyway.

Forward: per grid step (one image block), load X (HW, C) and the scale map
s; for each of the 9 taps build B_t (tile, HW) from `anchor_t * (s - 1)`
displacements (boundary zeroing folded into the weights — identical
semantics to the reference CUDA bilinear,
dcn_deform_conv_cuda_kernel.cu:84-115) and accumulate (B_t @ X) * w[t]
into the output. Depthwise weights w: (9, C).

Backward (jax.custom_vjp): a second Pallas kernel computes all three
cotangents in one pass, replacing the round-1 XLA recompute (the HBM
gathers dominated the train step):
  dX  = sum_t B_t^T @ (g * w_t)                    (col2im as a matmul —
        the transposed contraction subsumes the CUDA scatter-add col2im,
        kernel.cu:279-341, with no atomics)
  dw_t = sum_p (B_t @ X) ⊙ g                       (per-tap sampled ⋅ grad)
  ds  = sum_t sum_c (D_t @ X) ⊙ (g * w_t)          where D_t = ∂B_t/∂s via
        the analytic ∂bilinear/∂(fy,fx) chain with ∂(sy,sx)/∂s = anchor_t —
        term-for-term the CUDA `get_coordinate_weight`
        (kernel.cu:146-190) contracted against the co-design anchors.

Both kernels are dtype-generic (f32 and bf16 inputs; f32 accumulation) and
handle any map size: ragged HW is padded to the 128-lane tile in the
position/output dimension only (padded B columns are identically zero, so
padded X rows never contribute; padded output rows are sliced off).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deform_conv import ANCHOR_OFFSETS, codesign_deform_conv as _xla_impl


def _interpret():
    """Pallas interpret mode off-TPU (tests/CPU dryrun run the same kernel
    logic as traced JAX)."""
    return jax.default_backend() != "tpu"


def use_fast_path():
    """Model-integration routing: real kernels on TPU; CPU keeps the XLA
    formulation unless CODENET_PALLAS_INTERPRET=1 forces interpret mode
    (integration tests)."""
    return (jax.default_backend() == "tpu"
            or os.environ.get("CODENET_PALLAS_INTERPRET", "") == "1")

_TAPS = tuple((int(a[0]), int(a[1])) for a in ANCHOR_OFFSETS)

# bilinear corner stencil: (dy, dx, wgt(fy, fx), dwgt/dfy, dwgt/dfx)
_CORNERS = (
    (0, 0, lambda fy, fx: (1 - fy) * (1 - fx),
     lambda fy, fx: -(1 - fx), lambda fy, fx: -(1 - fy)),
    (0, 1, lambda fy, fx: (1 - fy) * fx,
     lambda fy, fx: -fx, lambda fy, fx: (1 - fy)),
    (1, 0, lambda fy, fx: fy * (1 - fx),
     lambda fy, fx: (1 - fx), lambda fy, fx: -fy),
    (1, 1, lambda fy, fx: fy * fx,
     lambda fy, fx: fx, lambda fy, fx: fy),
)


def _tap_geometry(s, py, px, ai, aj):
    """Integer corner base + fractional parts for tap (ai, aj)."""
    sy = py + ai * s
    sx = px + aj * s
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    return (y0.astype(jnp.int32), x0.astype(jnp.int32), sy - y0, sx - x0)


def _make_b(s, py, px, ai, aj, q_iota, h, w_dim, d_ds=False):
    """Interpolation matrix rows for tap (ai, aj): (tile, HWpad).

    d_ds=True builds D_t = ∂B_t/∂s instead (same sparsity, derivative
    corner weights chained through ∂(sy,sx)/∂s = (ai, aj))."""
    y0i, x0i, fy, fx = _tap_geometry(s, py, px, ai, aj)
    B = None
    for dy, dx, wfn, dwfy, dwfx in _CORNERS:
        yi = y0i + dy
        xi = x0i + dx
        valid = ((yi >= 0) & (yi < h) & (xi >= 0)
                 & (xi < w_dim)).astype(jnp.float32)
        idx = jnp.clip(yi, 0, h - 1) * w_dim + jnp.clip(xi, 0, w_dim - 1)
        if d_ds:
            wgt = dwfy(fy, fx) * ai + dwfx(fy, fx) * aj
        else:
            wgt = wfn(fy, fx)
        term = (wgt * valid) * (q_iota == idx).astype(jnp.float32)
        B = term if B is None else B + term
    return B


def _fwd_kernel(x_ref, s_ref, w_ref, o_ref, *, h, w_dim, tile, img_block):
    """One (image-block, row-tile) grid step: for each of `img_block`
    images, build per-tap interpolation matrices (tile, HWpad) in VMEM and
    contract with the image's flattened map on the MXU."""
    j = pl.program_id(1)
    row0 = j * tile

    pos = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + row0
    py = (pos // w_dim).astype(jnp.float32)
    px = (pos % w_dim).astype(jnp.float32)
    hw_pad = x_ref.shape[1]
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, hw_pad), 1)

    for ib in range(img_block):
        x = x_ref[ib]  # (HWpad, C)
        s = s_ref[ib]  # (tile, 1)
        acc = jnp.zeros((tile, x.shape[-1]), jnp.float32)
        for t, (ai, aj) in enumerate(_TAPS):
            B = _make_b(s, py, px, ai, aj, q_iota, h, w_dim)
            tap_w = w_ref[t, :]
            acc = acc + jnp.dot(B.astype(x.dtype), x,
                                preferred_element_type=jnp.float32) \
                * tap_w[None, :].astype(jnp.float32)
        o_ref[ib] = acc.astype(o_ref.dtype)


def _bwd_kernel(x_ref, s_ref, g_ref, w_ref, dx_ref, ds_ref, dw_ref, *,
                h, w_dim, tile, img_block):
    """Fused backward: accumulate dX over row-tiles (j), dw over the whole
    grid; ds is written per (image, tile)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = j * tile

    pos = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + row0
    py = (pos // w_dim).astype(jnp.float32)
    px = (pos % w_dim).astype(jnp.float32)
    hw_pad = x_ref.shape[1]
    c = x_ref.shape[-1]
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, hw_pad), 1)

    @pl.when(j == 0)
    def _init_dx():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    @pl.when((i == 0) & (j == 0))
    def _init_dw():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for ib in range(img_block):
        x = x_ref[ib]                          # (HWpad, C)
        s = s_ref[ib]                          # (tile, 1)
        g = g_ref[ib].astype(jnp.float32)      # (tile, C)
        ds_acc = jnp.zeros((tile, 1), jnp.float32)
        dx_acc = jnp.zeros((hw_pad, c), jnp.float32)
        for t, (ai, aj) in enumerate(_TAPS):
            B = _make_b(s, py, px, ai, aj, q_iota, h, w_dim)
            D = _make_b(s, py, px, ai, aj, q_iota, h, w_dim, d_ds=True)
            tap_w = w_ref[t, :].astype(jnp.float32)
            gw = g * tap_w[None, :]            # (tile, C)
            Bx = jnp.dot(B.astype(x.dtype), x,
                         preferred_element_type=jnp.float32)  # sampled
            Dx = jnp.dot(D.astype(x.dtype), x,
                         preferred_element_type=jnp.float32)
            dw_ref[t, :] += jnp.sum(Bx * g, axis=0)
            ds_acc = ds_acc + jnp.sum(Dx * gw, axis=1, keepdims=True)
            dx_acc = dx_acc + jnp.dot(B.T.astype(gw.dtype), gw,
                                      preferred_element_type=jnp.float32)
        ds_ref[ib] = ds_acc
        dx_ref[ib] += dx_acc.astype(dx_ref.dtype)


def _plan(x, img_block, vmem_cap_bytes):
    """Shared shape/tiling plan: flatten HW, pad to the 128 tile, cap the
    per-step image block by VMEM footprint."""
    n, h, w_dim, c = x.shape
    hw = h * w_dim
    tile = min(hw, 128)
    hw_pad = -(-hw // tile) * tile
    bytes_per_img = hw_pad * c * x.dtype.itemsize
    while img_block > 1 and img_block * bytes_per_img > vmem_cap_bytes:
        img_block //= 2
    while n % img_block != 0:
        img_block //= 2
    return n, h, w_dim, c, hw, hw_pad, tile, img_block


def _pad_rows(a, hw, hw_pad):
    if hw_pad == hw:
        return a
    return jnp.pad(a, ((0, 0), (0, hw_pad - hw), (0, 0)))


def _forward_pallas(x, s, weight_kc, img_block=8):
    n, h, w_dim, c, hw, hw_pad, tile, img_block = _plan(
        x, img_block, 2 * 1024 * 1024)
    kernel = functools.partial(_fwd_kernel, h=h, w_dim=w_dim, tile=tile,
                               img_block=img_block)
    x_flat = _pad_rows(x.reshape(n, hw, c), hw, hw_pad)
    s_flat = _pad_rows(s.astype(jnp.float32).reshape(n, hw, 1), hw, hw_pad)
    out = pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(n // img_block, hw_pad // tile),
        in_specs=[
            pl.BlockSpec((img_block, hw_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((img_block, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((img_block, tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw_pad, c), x.dtype),
    )(x_flat, s_flat, weight_kc)
    return out[:, :hw].reshape(n, h, w_dim, c)


def _backward_pallas(x, s, weight_kc, g, img_block=8):
    n, h, w_dim, c, hw, hw_pad, tile, img_block = _plan(
        x, img_block, 1024 * 1024)
    kernel = functools.partial(_bwd_kernel, h=h, w_dim=w_dim, tile=tile,
                               img_block=img_block)
    x_flat = _pad_rows(x.reshape(n, hw, c), hw, hw_pad)
    s_flat = _pad_rows(s.astype(jnp.float32).reshape(n, hw, 1), hw, hw_pad)
    g_flat = _pad_rows(g.reshape(n, hw, c), hw, hw_pad)
    dx, ds, dw = pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(n // img_block, hw_pad // tile),
        in_specs=[
            pl.BlockSpec((img_block, hw_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((img_block, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((img_block, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((img_block, hw_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((img_block, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hw_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((n, hw_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((9, c), jnp.float32),
        ],
    )(x_flat, s_flat, g_flat, weight_kc)
    dx = dx[:, :hw].reshape(n, h, w_dim, c)
    ds = ds[:, :hw].reshape(n, h, w_dim, 1)
    return dx, ds, dw


@jax.custom_vjp
def codesign_deform_conv_fast(x, s, weight):
    """Depthwise co-designed deform conv, Pallas fast path.

    x: (N, H, W, C), f32 or bf16; s: (N, H, W, 1); weight: HWIO (3, 3, 1, C).
    Semantics identical to deform_conv.codesign_deform_conv (stride 1,
    padding 1, depthwise); forward accumulates f32 on the MXU.
    """
    weight_kc = weight.reshape(9, weight.shape[-1])
    return _forward_pallas(x, s, weight_kc)


def _fwd(x, s, weight):
    return codesign_deform_conv_fast(x, s, weight), (x, s, weight)


def _bwd(res, g):
    x, s, weight = res
    c = weight.shape[-1]
    dx, ds, dw = _backward_pallas(x, s, weight.reshape(9, c), g)
    return (dx.astype(x.dtype), ds.astype(s.dtype),
            dw.reshape(weight.shape).astype(weight.dtype))


codesign_deform_conv_fast.defvjp(_fwd, _bwd)


def codesign_deform_conv_xla_grad(x, s, weight):
    """Fast Pallas forward with the exact XLA-recompute backward (round-1
    semantics) — kept for A/B validation of the Pallas backward."""
    return _xla_grad_op(x, s, weight)


@jax.custom_vjp
def _xla_grad_op(x, s, weight):
    return _forward_pallas(x, s, weight.reshape(9, weight.shape[-1]))


def _xla_fwd(x, s, weight):
    return _xla_grad_op(x, s, weight), (x, s, weight)


def _xla_bwd(res, g):
    x, s, weight = res
    _, vjp = jax.vjp(lambda x_, s_, w_: _xla_impl(x_, s_, w_), x, s, weight)
    return vjp(g)


_xla_grad_op.defvjp(_xla_fwd, _xla_bwd)
