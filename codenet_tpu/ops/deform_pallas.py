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
    (integration tests). CODENET_FORCE_XLA_DEFORM=1 disables the kernels
    outright — needed when the default backend is a TPU but the program
    targets a CPU mesh (the driver's virtual-device dryrun initializes
    the TPU plugin before falling back to host devices)."""
    if os.environ.get("CODENET_FORCE_XLA_DEFORM", "") == "1":
        return False
    return (jax.default_backend() == "tpu"
            or os.environ.get("CODENET_PALLAS_INTERPRET", "") == "1")

_TAPS = tuple((int(a[0]), int(a[1])) for a in ANCHOR_OFFSETS)


def _axis_factors(s, p_axis, q_axis, want_grad):
    """Separable bilinear factors per anchor component a in {-1, 0, 1}.

    Bilinear weights factor across axes: B_t[p, q] = RY[ai][p, q] *
    RX[aj][p, q] where RY[a][p, q] = (q_y == floor(sy)) * (1 - fy) +
    (q_y == floor(sy) + 1) * fy for sy = p_y + a * s[p]. The 9 taps share
    only the 3 distinct per-axis factors, and out-of-range rows are
    automatically zero (q_y never equals a floor outside [0, H)) — this is
    bit-identical to the 4-corner formulation with validity masking but
    ~4x fewer VPU ops.

    Returns {a: R} and, when want_grad, {a: dR/ds} (chain dfy/ds = a).
    """
    R, dR = {}, {}
    for a in (-1, 0, 1):
        sp = p_axis + a * s
        f0 = jnp.floor(sp)
        frac = sp - f0
        i0 = f0.astype(jnp.int32)
        hit0 = (q_axis == i0).astype(jnp.float32)
        hit1 = (q_axis == i0 + 1).astype(jnp.float32)
        R[a] = hit0 * (1.0 - frac) + hit1 * frac
        if want_grad:
            dR[a] = (hit1 - hit0) * a
    return R, dR


def _row_select(w_ref, t):
    """Row t of a small (9, C) VMEM ref as (1, C) f32, via a one-hot
    reduction — Mosaic cannot prove alignment for a dynamic sublane index
    (bf16 tiles pack 16 sublanes), and the array is tiny anyway."""
    hot = (jax.lax.broadcasted_iota(jnp.int32, (9, 1), 0)
           == t).astype(jnp.float32)
    return jnp.sum(w_ref[...].astype(jnp.float32) * hot, axis=0,
                   keepdims=True)


def _grid_geometry(w_dim, tile, hw_pad):
    """Per-grid-step output positions and flattened q-axis indices."""
    j = pl.program_id(1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + j * tile
    py = (pos // w_dim).astype(jnp.float32)
    px = (pos % w_dim).astype(jnp.float32)
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, hw_pad), 1)
    qy = q_iota // w_dim
    qx = q_iota % w_dim
    return py, px, qy, qx


# Banded-B regime: the co-design bounds the sampling displacement to
# |anchor * s| <= 8 px (taps at p + anchor*s, Hardtanh[-7, 8] on s,
# anchor in {-1,0,1}),
# so an output row-tile only ever reads input rows [r0 - 8, r1 + 9] —
# a ~(tile_rows + 18)-row BAND instead of the whole map. The B matrices
# shrink from (tile, HW) to (tile, band), cutting both the VPU factor
# build and the MXU contraction by H/band_rows (~3x on 64x64 maps) and
# the scoped-VMEM footprint with it. The input is physically padded with
# _BAND_REACH_B zero rows on top (so the band's dynamic row start is
# simply r0 * W >= 0) and enough below; out-of-image samples land on
# those zero rows, reproducing the boundary-zero semantics exactly.
_BAND_REACH_B = 8    # rows of reach above an output row (floor(p - 8))
_BAND_REACH_A = 10   # rows below (floor(p + 8) + 1 bilinear corner, +1)


def _band_rows(tile, w_dim):
    """Input rows one output tile can touch (static)."""
    tile_span = (tile - 1) // w_dim + 2  # rows the tile's outputs span
    return tile_span + _BAND_REACH_B + _BAND_REACH_A


def _use_banding(h, w_dim, tile, dtype):
    """Banding pays when the band is meaningfully narrower than the map
    and the dynamic row start is sublane-aligned for the dtype."""
    sub = 16 if dtype == jnp.bfloat16 else 8
    return (w_dim % sub == 0) and (_band_rows(tile, w_dim) + 4 < h)


def _banded_geometry(w_dim, tile, band_rows):
    """Output positions + banded q-axis indices for grid step j.

    Returns (py, px, qy, qx, start) where start is the PHYSICAL flat
    offset of the band in the row-padded input and qy holds REAL image
    row indices (negative / >= h rows are the physical zero padding)."""
    j = pl.program_id(1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + j * tile
    py = (pos // w_dim).astype(jnp.float32)
    px = (pos % w_dim).astype(jnp.float32)
    r0 = (j * tile) // w_dim
    band_cols = band_rows * w_dim
    ql = jax.lax.broadcasted_iota(jnp.int32, (tile, band_cols), 1)
    qy = (r0 - _BAND_REACH_B) + ql // w_dim   # real row index
    qx = ql % w_dim
    # physical band start: real row (r0 - REACH_B) + REACH_B pad rows
    start = r0 * w_dim
    return py, px, qy, qx, start


def _fwd_kernel(x_ref, s_ref, w_ref, o_ref, *scratch, h, w_dim, tile,
                img_block, rolled, band_rows=0):
    """One (image-block, row-tile) grid step: for each of `img_block`
    images, build the separable per-axis bilinear factors in VMEM, form
    the 9 tap matrices as RY*RX products, and contract with the image's
    flattened map on the MXU.

    rolled=True switches the tap loop to lax.fori_loop for large maps:
    Mosaic stack-allocates unrolled temporaries, and 9 x (tile, HWpad)
    matrices exceed the 16 MB scoped-VMEM limit when HWpad*4KB is large;
    small maps keep the unrolled loop. Both regimes share the 3 distinct
    per-axis factors across the 9 taps — the rolled loop via VMEM scratch
    indexed from the fori_loop (6 builds per image instead of 18).

    band_rows > 0 (rolled only) contracts against the input BAND an
    output tile can actually reach instead of the whole map (see
    _banded_geometry) — x_ref is then the row-padded physical map."""
    if band_rows:
        py, px, qy, qx, start = _banded_geometry(w_dim, tile, band_rows)
        q_cols = band_rows * w_dim
    else:
        q_cols = x_ref.shape[1]
        py, px, qy, qx = _grid_geometry(w_dim, tile, q_cols)
        start = None

    for ib in range(img_block):
        if band_rows:
            x = x_ref[ib, pl.ds(start, q_cols)]  # (band, C)
        else:
            x = x_ref[ib]  # (HWpad, C)
        s = s_ref[ib]  # (tile, 1)
        c = x.shape[-1]
        if not rolled:
            RY, _ = _axis_factors(s, py, qy, want_grad=False)
            RX, _ = _axis_factors(s, px, qx, want_grad=False)
            acc = jnp.zeros((tile, c), jnp.float32)
            for t, (ai, aj) in enumerate(_TAPS):
                B = RY[ai] * RX[aj]
                tap_w = w_ref[t, :]
                acc = acc + jnp.dot(B.astype(x.dtype), x,
                                    preferred_element_type=jnp.float32) \
                    * tap_w[None, :].astype(jnp.float32)
        else:
            ry_ref, rx_ref = scratch
            for k, a in enumerate((-1.0, 0.0, 1.0)):
                ry_ref[k], _ = _axis_factor_traced(s, py, qy, a)
                rx_ref[k], _ = _axis_factor_traced(s, px, qx, a)

            def tap_body(t, acc):
                B = ry_ref[t // 3] * rx_ref[t % 3]
                tap_w = _row_select(w_ref, t)  # (1, C)
                return acc + jnp.dot(B.astype(x.dtype), x,
                                     preferred_element_type=jnp.float32) \
                    * tap_w

            acc = jax.lax.fori_loop(0, len(_TAPS), tap_body,
                                    jnp.zeros((tile, c), jnp.float32))
        o_ref[ib] = acc.astype(o_ref.dtype)


def _axis_factor_traced(s, p_axis, q_axis, a):
    """Single separable bilinear factor + its d/ds for a traced anchor
    component `a` (used inside the backward's tap fori_loop)."""
    sp = p_axis + a * s
    f0 = jnp.floor(sp)
    frac = sp - f0
    i0 = f0.astype(jnp.int32)
    hit0 = (q_axis == i0).astype(jnp.float32)
    hit1 = (q_axis == i0 + 1).astype(jnp.float32)
    R = hit0 * (1.0 - frac) + hit1 * frac
    dR = (hit1 - hit0) * a
    return R, dR


def _bwd_kernel(x_ref, s_ref, g_ref, w_ref, dx_ref, ds_ref, dw_ref,
                *scratch, h, w_dim, tile, img_block, rolled=True,
                band_rows=0):
    """Fused backward: accumulate dX over row-tiles (j), dw over the whole
    grid; ds is written per (image, tile). D_t = dB_t/ds via the product
    rule on the separable factors: D_t = dRY[ai]*RX[aj] + RY[ai]*dRX[aj].

    rolled=True: the tap loop is a lax.fori_loop — Mosaic stack-allocates
    unrolled temporaries, and 9 taps x (B, D, dots) of (tile, HWpad) f32
    blew the 16 MB scoped-VMEM limit at 32x32x128/batch-64 shapes; the
    rolled loop reuses one iteration's buffers. Small q_cols maps
    (CODENET_BANDED_UNROLLED) unroll the 9 static taps instead — static
    w_ref rows and a stacked dw replace the _row_select/one-hot overhead
    that made the rolled loop the forward's 67%-slower regime (NOTES #18).

    The 9 taps share only 3 distinct per-axis factors; rebuilding all 4
    per tap made the VPU factor build the kernel's bottleneck on
    small-C maps (r2 NOTES). Rolled: each image's 6 factor pairs build
    ONCE into VMEM scratch and the tap loop dynamically indexes them
    (leading-axis ref indexing) — 6 builds instead of 36 per image."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    c = x_ref.shape[-1]
    if band_rows:
        py, px, qy, qx, start = _banded_geometry(w_dim, tile, band_rows)
        q_cols = band_rows * w_dim
    else:
        q_cols = x_ref.shape[1]
        py, px, qy, qx = _grid_geometry(w_dim, tile, q_cols)
        start = None

    @pl.when(j == 0)
    def _init_dx():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    @pl.when((i == 0) & (j == 0))
    def _init_dw():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for ib in range(img_block):
        if band_rows:
            x = x_ref[ib, pl.ds(start, q_cols)]  # (band, C)
        else:
            x = x_ref[ib]                      # (HWpad, C)
        s = s_ref[ib]                          # (tile, 1)
        g = g_ref[ib].astype(jnp.float32)      # (tile, C)

        if not rolled:
            RY3, dRY3 = _axis_factors(s, py, qy, want_grad=True)
            RX3, dRX3 = _axis_factors(s, px, qx, want_grad=True)
            ds_acc = jnp.zeros((tile, 1), jnp.float32)
            dx_acc = jnp.zeros((q_cols, c), jnp.float32)
            dw_rows = []
            for t, (ai, aj) in enumerate(_TAPS):
                RY, RX = RY3[ai], RX3[aj]
                B = RY * RX
                tap_w = w_ref[t, :].astype(jnp.float32)[None, :]  # (1, C)
                Gt = jnp.dot(B.T.astype(x.dtype), g.astype(x.dtype),
                             preferred_element_type=jnp.float32)
                dw_rows.append(jnp.sum(x.astype(jnp.float32) * Gt,
                                       axis=0, keepdims=True))
                dx_acc = dx_acc + Gt * tap_w
                if (ai, aj) != (0, 0):  # center tap: D == 0
                    D = dRY3[ai] * RX + RY * dRX3[aj]
                    Dx = jnp.dot(D.astype(x.dtype), x,
                                 preferred_element_type=jnp.float32)
                    ds_acc = ds_acc + jnp.sum(Dx * (g * tap_w), axis=1,
                                              keepdims=True)
            dw_acc = jnp.concatenate(dw_rows, axis=0)  # (9, C)
            ds_ref[ib] = ds_acc
            if band_rows:
                dx_ref[ib, pl.ds(start, q_cols)] += dx_acc.astype(
                    dx_ref.dtype)
            else:
                dx_ref[ib] += dx_acc.astype(dx_ref.dtype)
            dw_ref[...] += dw_acc
            continue

        ry_ref, dry_ref, rx_ref, drx_ref = scratch
        for k, a in enumerate((-1.0, 0.0, 1.0)):
            R, dR = _axis_factor_traced(s, py, qy, a)
            ry_ref[k], dry_ref[k] = R, dR
            R, dR = _axis_factor_traced(s, px, qx, a)
            rx_ref[k], drx_ref[k] = R, dR

        def tap_body(t, carry):
            ds_acc, dx_acc, dw_acc = carry
            # tap t of the row-major 3x3 grid: anchor = (t//3 - 1, t%3 - 1)
            ai = t // 3
            aj = t % 3
            RY, dRY = ry_ref[ai], dry_ref[ai]
            RX, dRX = rx_ref[aj], drx_ref[aj]
            B = RY * RX
            D = dRY * RX + RY * dRX
            tap_w = _row_select(w_ref, t)      # (1, C)
            gw = g * tap_w                     # (tile, C)
            # one scatter matmul per tap, in the INPUT dtype (bf16 mode
            # must not pay the 4x-slower f32 MXU rate): G_t = B^T g.
            # The per-channel tap weight commutes through the column dim,
            # so G_t serves BOTH cotangents — dx_t = G_t * w_t, and
            # dw[t, c] = sum_p g (B x) = sum_q x * G_t — eliminating the
            # former sampled-tap (B x) matmul entirely (1/3 of the MACs).
            Gt = jnp.dot(B.T.astype(x.dtype), g.astype(x.dtype),
                         preferred_element_type=jnp.float32)  # (q, C)
            Dx = jnp.dot(D.astype(x.dtype), x,
                         preferred_element_type=jnp.float32)
            # accumulate into row t of the (9, C) carry via a one-hot mask
            # (dynamic_update_slice is not lowerable on TPU values)
            row_hot = (jax.lax.broadcasted_iota(jnp.int32, (9, 1), 0)
                       == t).astype(jnp.float32)
            dw_acc = dw_acc + row_hot * jnp.sum(
                x.astype(jnp.float32) * Gt, axis=0, keepdims=True)
            ds_acc = ds_acc + jnp.sum(Dx * gw, axis=1, keepdims=True)
            dx_acc = dx_acc + Gt * tap_w
            return ds_acc, dx_acc, dw_acc

        # the CENTER tap (t=4, anchor (0,0)) has D ≡ 0 (dR carries the
        # chain factor a = 0), so its Dx matmul and ds term vanish: loop
        # the 8 off-center taps (index remap skips 4) and handle t=4
        # below with only the scatter matmul.
        def off_center_body(k, carry):
            return tap_body(k + (k >= 4).astype(k.dtype), carry)

        ds_acc, dx_acc, dw_acc = jax.lax.fori_loop(
            0, len(_TAPS) - 1, off_center_body,
            (jnp.zeros((tile, 1), jnp.float32),
             jnp.zeros((q_cols, c), jnp.float32),
             jnp.zeros((9, c), jnp.float32)))
        B4 = ry_ref[1] * rx_ref[1]
        tap_w4 = _row_select(w_ref, 4)
        Gt4 = jnp.dot(B4.T.astype(x.dtype), g.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        hot4 = (jax.lax.broadcasted_iota(jnp.int32, (9, 1), 0)
                == 4).astype(jnp.float32)
        dw_acc = dw_acc + hot4 * jnp.sum(x.astype(jnp.float32) * Gt4,
                                         axis=0, keepdims=True)
        dx_acc = dx_acc + Gt4 * tap_w4
        ds_ref[ib] = ds_acc
        if band_rows:
            dx_ref[ib, pl.ds(start, q_cols)] += dx_acc.astype(dx_ref.dtype)
        else:
            dx_ref[ib] += dx_acc.astype(dx_ref.dtype)
        dw_ref[...] += dw_acc


# ---------------------------------------------------------------------------
# SPMD partitioning: on a multi-chip mesh the kernels are embarrassingly
# parallel over the batch dim (each grid step consumes whole images), so we
# register a batch-sharding rule instead of letting the partitioner
# replicate the custom call. dw in the backward is a cross-batch reduction:
# each shard computes its partial sum and lower_fn psums over the batch
# mesh axes. (Replaces the reference's DataParallel gradient reduction,
# lib/models/data_parallel.py:10-129, with an XLA collective over ICI.)
# ---------------------------------------------------------------------------

def _batch_axes(arg_shapes):
    """Mesh axis name(s) the leading (batch) dim of x is sharded over."""
    sharding = arg_shapes[0].sharding
    spec = getattr(sharding, "spec", None)
    if not spec or len(spec) == 0 or spec[0] is None:
        return None
    names = spec[0]
    return names if isinstance(names, tuple) else (names,)


def _shard3(mesh, batch_axes, *ranks):
    """NamedShardings: batch dim on `batch_axes`, everything else open."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    out = []
    for rank, has_batch in ranks:
        if has_batch and batch_axes:
            out.append(NamedSharding(
                mesh, P(batch_axes, *([None] * (rank - 1)))))
        else:
            out.append(NamedSharding(mesh, P(*([None] * rank))))
    return out


@functools.lru_cache(maxsize=None)
def _fwd_op(h, w_dim, tile, img_block, band_rows=0):
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(x_flat, s_flat, w_kc):
        return _fwd_pallas_call(x_flat, s_flat, w_kc, h=h, w_dim=w_dim,
                                tile=tile, img_block=img_block,
                                band_rows=band_rows)

    op = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        (res,) = _shard3(mesh, _batch_axes(arg_shapes), (3, True))
        return res

    def partition(mesh, arg_shapes, result_shape):
        batch_axes = _batch_axes(arg_shapes)
        arg_shardings = _shard3(mesh, batch_axes, (3, True), (3, True),
                                (2, False))
        (res,) = _shard3(mesh, batch_axes, (3, True))

        def lower_fn(x_flat, s_flat, w_kc):
            # re-plan the image block for the LOCAL shard size
            ib = img_block
            while x_flat.shape[0] % ib != 0:
                ib //= 2
            return _fwd_pallas_call(x_flat, s_flat, w_kc, h=h, w_dim=w_dim,
                                    tile=tile, img_block=ib,
                                    band_rows=band_rows)

        return mesh, lower_fn, res, tuple(arg_shardings)

    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="n q c, n p u, k c -> n p c")
    return op


@functools.lru_cache(maxsize=None)
def _bwd_op(h, w_dim, tile, img_block, band_rows=0):
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(x_flat, s_flat, g_flat, w_kc):
        return _bwd_pallas_call(x_flat, s_flat, g_flat, w_kc, h=h,
                                w_dim=w_dim, tile=tile, img_block=img_block,
                                band_rows=band_rows)

    op = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        batch_axes = _batch_axes(arg_shapes)
        dx, ds, dw = _shard3(mesh, batch_axes, (3, True), (3, True),
                             (2, False))
        return (dx, ds, dw)

    def partition(mesh, arg_shapes, result_shape):
        batch_axes = _batch_axes(arg_shapes)
        arg_shardings = _shard3(mesh, batch_axes, (3, True), (3, True),
                                (3, True), (2, False))
        dx, ds, dw = _shard3(mesh, batch_axes, (3, True), (3, True),
                             (2, False))

        def lower_fn(x_flat, s_flat, g_flat, w_kc):
            ib = img_block
            while x_flat.shape[0] % ib != 0:
                ib //= 2
            ldx, lds, ldw = _bwd_pallas_call(
                x_flat, s_flat, g_flat, w_kc, h=h, w_dim=w_dim, tile=tile,
                img_block=ib, band_rows=band_rows)
            if batch_axes:
                # dw is a cross-batch reduction; shards hold partial sums
                ldw = jax.lax.psum(ldw, batch_axes)
            return ldx, lds, ldw

        return mesh, lower_fn, (dx, ds, dw), tuple(arg_shardings)

    # note: `n` cannot be declared a reduction factor while it appears in
    # the dx/ds mappings; the rule instead leaves dw without `n` (i.e.
    # replicated), which is true because lower_fn psums the partial sums.
    op.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="n q c, n p u, n p c, k c -> n q c, n p u, k c")
    return op


def _plan(x, img_block, vmem_cap_bytes, tile_budget_bytes=None,
          assume_f32=False):
    """Shared shape/tiling plan: flatten HW, pad to the 128 tile, cap the
    per-step image block by VMEM footprint. `tile_budget_bytes` bounds one
    (tile, HWpad) f32 matrix — the scoped-VMEM unit the kernels multiply —
    shrinking the row tile on large maps (the backward keeps ~7 such
    matrices live per tap iteration). assume_f32 sizes the image block as
    if inputs were f32: on rolled large maps the f32 interpolation
    temporaries dominate, so a bf16 input must not double img_block."""
    n, h, w_dim, c = x.shape
    hw = h * w_dim
    tile = min(hw, 128)
    hw_pad = -(-hw // tile) * tile
    if tile_budget_bytes is not None:
        while tile > 16 and tile * hw_pad * 4 > tile_budget_bytes:
            tile //= 2
    itemsize = 4 if assume_f32 else x.dtype.itemsize
    bytes_per_img = hw_pad * c * itemsize
    while img_block > 1 and img_block * bytes_per_img > vmem_cap_bytes:
        img_block //= 2
    while n % img_block != 0:
        img_block //= 2
    return n, h, w_dim, c, hw, hw_pad, tile, img_block


def _pad_rows(a, hw, hw_pad):
    if hw_pad == hw:
        return a
    return jnp.pad(a, ((0, 0), (0, hw_pad - hw), (0, 0)))


def _band_safe_s(s):
    """The op's s contract: tap (i, j) samples at p + anchor*s (see
    deform_conv.codesign_deform_conv), and the module's Hardtanh[-7, 8]
    bounds |anchor*s| <= 8 — exactly the banded kernels' row reach. s is
    clamped to that range at the OP BOUNDARY — in every regime, forward
    and backward — making the fast op's semantics regime-independent:
    out-of-contract callers get clamped sampling with a zero gradient
    beyond the clamp (`_bwd` masks ds; exactly the Hardtanh behavior),
    never silently-truncated band reads. (An earlier clamp of [-7, 9],
    derived for a p + anchor*(s-1) convention the kernels don't use, let
    s=9's p-9 tap escape the 8-row band.)"""
    return jnp.clip(s, _S_LO, _S_HI)


_S_LO, _S_HI = -7.0, 8.0


def _pad_rows_banded(a, h, w_dim, out_pad, tile, band_rows):
    """Physically row-pad (n, hw, c) for the banded kernels: _BAND_REACH_B
    zero rows before, and after-padding sized so the LAST tile's band
    slice [r0*W, r0*W + band*W) stays inside the array."""
    n, hw, c = a.shape
    before = _BAND_REACH_B * w_dim
    r0_max = ((out_pad // tile - 1) * tile) // w_dim
    phys = max(before + hw + _BAND_REACH_A * w_dim,
               r0_max * w_dim + band_rows * w_dim)
    return jnp.pad(a, ((0, 0), (before, phys - before - hw), (0, 0)))


def _unpad_rows_banded(a, hw, w_dim):
    start = _BAND_REACH_B * w_dim
    return a[:, start:start + hw]


def _fwd_pallas_call(x_flat, s_flat, w_kc, *, h, w_dim, tile, img_block,
                     band_rows=0):
    """Raw forward pallas_call. x_flat: (n, X, C) where X = out-padded
    positions (band_rows == 0) or the physically row-padded map
    (band_rows > 0); s_flat: (n, OUTpad, 1) sets the output grid."""
    n, x_cols, c = x_flat.shape
    out_pad = s_flat.shape[1]
    q_cols = band_rows * w_dim if band_rows else x_cols
    # the scoped-VMEM driver is the set of (tile, q_cols) tap matrices the
    # unrolled loop keeps live (~15 x tile*q_cols*4B incl. shared factors);
    # past _fwd_unroll_qmax that approaches the 16 MB limit (the planner
    # shrinks the tile first — see _forward_pallas), so roll the loop.
    # Banded kernels roll only when the unrolled small-band regime is
    # disabled (CODENET_BANDED_UNROLLED=0) — unrolled measured faster on
    # every engaging shape (see _banded_unrolled_enabled)
    rolled = q_cols > _fwd_unroll_qmax() or (
        band_rows > 0 and not _banded_unrolled_enabled())
    kernel = functools.partial(_fwd_kernel, h=h, w_dim=w_dim, tile=tile,
                               img_block=img_block, rolled=rolled,
                               band_rows=band_rows)
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(n // img_block, out_pad // tile),
        in_specs=[
            pl.BlockSpec((img_block, x_cols, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((img_block, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((img_block, tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_pad, c), x_flat.dtype),
        scratch_shapes=([pltpu.VMEM((3, tile, q_cols), jnp.float32)
                         for _ in range(2)] if rolled else []),
    )(x_flat, s_flat, w_kc)


def _banded_unrolled_enabled():
    """Banded-unrolled regime (PERF.md headroom #1): band the forward on
    SMALL maps too (32x32: q_cols 1024 -> 736, -28% MACs and factor-build
    ops) where the band still fits the unrolled tap loop — avoiding the
    rolled-loop overhead that made rolled banding 67% slower there
    (NOTES #18). ON by default: measured on v5e (batch 128, bf16) it wins
    everywhere it engages — fwd+bwd deconv2 8.81->6.67 ms, deconv1
    1.91->1.19, deconv0 1.17->0.75; fwd-only deconv2 2.64->2.35
    (tools_tpu/layer_bench.py deform). CODENET_BANDED_UNROLLED=0 restores
    the rolled kernels."""
    return os.environ.get("CODENET_BANDED_UNROLLED", "1") != "0"


def _fwd_unroll_qmax():
    """Max q (band/map) columns the unrolled FORWARD tap loop accepts;
    beyond it the loop rolls. Default 1408 admits the 64-wide w2/512²
    bands (1280 cols at the shrunk tile 64: v5e measured 13.6 vs 22.2 ms
    rolled at batch 128 bf16) while keeping 128-wide maps (2560 cols)
    rolled. Raising it further needs a matching tile shrink or the ~15
    stack-allocated (tile, q) f32 temporaries blow the 16 MB scoped-VMEM
    limit (64 x 1408 x 4B x 15 = 5.4 MB today)."""
    return int(os.environ.get("CODENET_UNROLL_FWD_QMAX", "1408"))


def _bwd_unroll_qmax():
    """Max band columns the unrolled BACKWARD tap loop accepts (~17
    stack-allocated (tile, q) f32 temporaries live; tile shrinks to 32
    past the 256 KB per-matrix budget, so 1408 cols = 3.1 MB). Default
    1408 admits the 64-wide w2/512² bands — v5e measured 57.3 vs 75.8 ms
    (vjp program, batch 128 bf16) at band 1280."""
    return int(os.environ.get("CODENET_UNROLL_BWD_QMAX", "1408"))


def _bwd_unroll_stack_ok(q_cols, c):
    """Channel-aware scoped-VMEM gate for the unrolled BACKWARD: its
    per-tap scatter products Gt = B^T g are (q_cols, C) f32, and with the
    9-tap loop unrolled Mosaic keeps most of them (plus dx_acc and the
    f32 x read) live on the kernel stack at once. The q_cols gate alone
    misses this C term: at the w2 deconv0 shape (16x16 map, C=2153,
    512^2 train) the stack measured 17.61 MiB against the 16 MiB scoped
    limit (v5e compile error, round 5) while q_cols was only 256. The
    rolled loop reuses ONE Gt buffer, so its (q, C) floor is ~3 matrices
    and it fits every model shape. Estimate ~9 live (q, Cpad) f32
    matrices and roll past the cap (default 12 MiB, leaving headroom for
    the (tile, q) factor temporaries); all w1 and 512^2-w1 shapes stay
    unrolled under it (largest: deconv0 at 512^2, 9*256*1024*4 = 9.4 MB)."""
    c_pad = -(-c // 128) * 128
    cap = int(os.environ.get("CODENET_UNROLL_BWD_STACK_CAP",
                             str(12 * 1024 * 1024)))
    return 9 * q_cols * c_pad * 4 <= cap


def _c_chunk():
    """Channel-chunk size for very wide depthwise deforms. The kernels hold
    (q_cols, C) and (tile, C) f32 temporaries on the Mosaic stack, so C
    multiplies the scoped-VMEM footprint; at the w2 deconv0 train shape
    (16x16 map, C=2153, f32) BOTH tap-loop regimes exceed the 16 MiB limit
    (17.6 MiB measured, v5e round 5). The op is depthwise — every channel
    is independent (s is shared but only READ) — so wide calls split into
    ≤chunk channel slices, each compiled as its own pallas_call in its
    normal (usually unrolled) regime: out/dx/dw concatenate, ds sums over
    chunks. 1024 keeps the w1 deconv0 (C=1024) single-chunk/unchanged."""
    return int(os.environ.get("CODENET_DEFORM_C_CHUNK", "1024"))


def _forward_pallas(x, s, weight_kc, img_block=8):
    cc = _c_chunk()
    if x.shape[-1] > cc:
        return jnp.concatenate(
            [_forward_pallas(x[..., lo:lo + cc], s, weight_kc[:, lo:lo + cc],
                             img_block)
             for lo in range(0, x.shape[-1], cc)], axis=-1)
    n, h, w_dim, c, hw, hw_pad, tile, img_block = _plan(
        x, img_block, 2 * 1024 * 1024)
    band_rows = 0
    if (hw_pad <= 1024 and _banded_unrolled_enabled()
            and _use_banding(h, w_dim, min(hw, 128), x.dtype)):
        tile = _banded_tile(h, w_dim, hw, 1024 * 1024)
        if _band_rows(tile, w_dim) * w_dim < hw_pad:  # band must shrink q
            hw_pad = -(-hw // tile) * tile
            band_rows = _band_rows(tile, w_dim)
    elif hw_pad > 1024:
        if _use_banding(h, w_dim, min(hw, 128), x.dtype):
            # banded regime: B shrinks to (tile, band) — replan with the
            # band as the scoped-VMEM unit
            n, h, w_dim, c, hw, hw_pad, tile, img_block = _plan(
                x, img_block, 1024 * 1024,
                tile_budget_bytes=None, assume_f32=True)
            tile = _banded_tile(h, w_dim, hw, 1024 * 1024)
            if (_banded_unrolled_enabled()
                    and _band_rows(tile, w_dim) * w_dim
                    <= _fwd_unroll_qmax()):
                # unrolled tap loop will engage: halve the per-matrix
                # budget so its ~15 stack temporaries stay inside VMEM
                tile = _banded_tile(h, w_dim, hw, 512 * 1024)
            hw_pad = -(-hw // tile) * tile
            band_rows = _band_rows(tile, w_dim)
        else:
            # rolled-loop regime: f32 factor/B temporaries + the 6 shared-
            # factor scratch matrices dominate scoped VMEM (~10 x
            # tile*HWpad*4B live); replan with an f32-basis image block and
            # a tile budget that keeps that under the 16 MB limit (verified
            # on v5e: tile 128 @ HWpad 4096 OOM'd by 48 KB with a 2 MB
            # budget once scratch landed)
            n, h, w_dim, c, hw, hw_pad, tile, img_block = _plan(
                x, img_block, 1024 * 1024, tile_budget_bytes=1024 * 1024,
                assume_f32=True)
    s = _band_safe_s(s)  # op contract: same clamp in every regime
    s_flat = _pad_rows(s.astype(jnp.float32).reshape(n, hw, 1), hw, hw_pad)
    if band_rows:
        x_flat = _pad_rows_banded(x.reshape(n, hw, c), h, w_dim, hw_pad,
                                  tile, band_rows)
    else:
        x_flat = _pad_rows(x.reshape(n, hw, c), hw, hw_pad)
    out = _fwd_op(h, w_dim, tile, img_block, band_rows)(
        x_flat, s_flat, weight_kc)
    return out[:, :hw].reshape(n, h, w_dim, c)


def _bwd_pallas_call(x_flat, s_flat, g_flat, w_kc, *, h, w_dim, tile,
                     img_block, band_rows=0):
    """Raw backward pallas_call. x_flat (and the dx output): (n, X, C)
    with X = out-padded positions, or the physically row-padded map when
    band_rows > 0; s/g set the output grid."""
    n, x_cols, c = x_flat.shape
    out_pad = s_flat.shape[1]
    q_cols = band_rows * w_dim if band_rows else x_cols
    # the unrolled backward keeps ~12 (tile, q_cols)/(q_cols, C) f32
    # temporaries live (Mosaic stack-allocates); gate it to small q_cols
    # AND a small q*C product (_bwd_unroll_stack_ok — w2 channel widths
    # blow the scoped limit through C alone)
    rolled = not (_banded_unrolled_enabled()
                  and q_cols <= _bwd_unroll_qmax()
                  and _bwd_unroll_stack_ok(q_cols, c))
    kernel = functools.partial(_bwd_kernel, h=h, w_dim=w_dim, tile=tile,
                               img_block=img_block, rolled=rolled,
                               band_rows=band_rows)
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(n // img_block, out_pad // tile),
        in_specs=[
            pl.BlockSpec((img_block, x_cols, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((img_block, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((img_block, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((img_block, x_cols, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((img_block, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, x_cols, c), jnp.float32),
            jax.ShapeDtypeStruct((n, out_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((9, c), jnp.float32),
        ],
        scratch_shapes=([pltpu.VMEM((3, tile, q_cols), jnp.float32)
                         for _ in range(4)] if rolled else []),
    )(x_flat, s_flat, g_flat, w_kc)


def _banded_tile(h, w_dim, hw, budget_bytes):
    """Largest power-of-2 row tile whose (tile, band) matrix fits the
    scoped-VMEM unit budget (banding decouples the tile from the full
    map width, so big maps keep big tiles)."""
    tile = min(hw, 128)
    while tile > 16:
        band_cols = _band_rows(tile, w_dim) * w_dim
        if tile * band_cols * 4 <= budget_bytes:
            return tile
        tile //= 2
    return tile


def _backward_pallas(x, s, weight_kc, g, img_block=8):
    cc = _c_chunk()
    if x.shape[-1] > cc:
        dx_parts, ds_total, dw_parts = [], None, []
        for lo in range(0, x.shape[-1], cc):
            dx_c, ds_c, dw_c = _backward_pallas(
                x[..., lo:lo + cc], s, weight_kc[:, lo:lo + cc],
                g[..., lo:lo + cc], img_block)
            dx_parts.append(dx_c)
            dw_parts.append(dw_c)
            ds_total = ds_c if ds_total is None else ds_total + ds_c
        return (jnp.concatenate(dx_parts, axis=-1), ds_total,
                jnp.concatenate(dw_parts, axis=-1))
    n, h, w_dim, c, hw, hw_pad, tile, img_block = _plan(
        x, img_block, 1024 * 1024, tile_budget_bytes=512 * 1024,
        assume_f32=True)
    band_rows = 0
    if _use_banding(h, w_dim, min(hw, 128), x.dtype):
        # re-plan the tile against the BAND (not the full map): the band
        # is the matrix the kernel actually builds/contracts. The unrolled
        # backward stack-allocates ~17 (tile, band) temporaries, so when
        # it will actually be used (flag on AND the band is small enough
        # that _bwd_pallas_call picks the unrolled kernel) the tile gets
        # a smaller per-matrix budget to stay inside scoped VMEM; rolled
        # maps must NOT pay the halved tile (more grid steps for nothing).
        tile = _banded_tile(h, w_dim, hw, 512 * 1024)
        band_q = _band_rows(tile, w_dim) * w_dim
        if (_banded_unrolled_enabled()
                and band_q <= _bwd_unroll_qmax()
                and _bwd_unroll_stack_ok(band_q, c)):
            tile = _banded_tile(h, w_dim, hw, 256 * 1024)
        hw_pad = -(-hw // tile) * tile
        band_rows = _band_rows(tile, w_dim)
    s = _band_safe_s(s)  # op contract: same clamp in every regime
    s_flat = _pad_rows(s.astype(jnp.float32).reshape(n, hw, 1), hw, hw_pad)
    g_flat = _pad_rows(g.reshape(n, hw, c), hw, hw_pad)
    if band_rows:
        x_flat = _pad_rows_banded(x.reshape(n, hw, c), h, w_dim, hw_pad,
                                  tile, band_rows)
    else:
        x_flat = _pad_rows(x.reshape(n, hw, c), hw, hw_pad)
    dx, ds, dw = _bwd_op(h, w_dim, tile, img_block, band_rows)(
        x_flat, s_flat, g_flat, weight_kc)
    if band_rows:
        dx = _unpad_rows_banded(dx, hw, w_dim).reshape(n, h, w_dim, c)
    else:
        dx = dx[:, :hw].reshape(n, h, w_dim, c)
    ds = ds[:, :hw].reshape(n, h, w_dim, 1)
    return dx, ds, dw


@jax.custom_vjp
def codesign_deform_conv_fast(x, s, weight):
    """Depthwise co-designed deform conv, Pallas fast path.

    x: (N, H, W, C), f32 or bf16; s: (N, H, W, 1); weight: HWIO (3, 3, 1, C).
    Semantics identical to deform_conv.codesign_deform_conv (stride 1,
    padding 1, depthwise) with s clamped to [-7, 8] at the op boundary
    (the co-design Hardtanh range, which bounds the banded kernels' row
    band; ds is 0 beyond the clamp) — a no-op for every in-contract
    caller, uniform across kernel regimes for everyone else. Forward
    accumulates f32 on the MXU.
    """
    weight_kc = weight.reshape(9, weight.shape[-1])
    return _forward_pallas(x, s, weight_kc)


def _fwd(x, s, weight):
    return codesign_deform_conv_fast(x, s, weight), (x, s, weight)


# Largest flattened map the fused backward kernel fits in scoped VMEM
# WITHOUT banding (verified on v5e: 48x48 maps pass at tile 32; 64x64
# exceeded the 16 MB limit pre-banding). The banded regime (w % 8 == 0
# maps — every CoDeNet shape) keeps B at (tile, ~20 rows), so no size
# limit applies there; only banding-ineligible large maps fall back to
# the XLA gather formulation.
_BWD_MAX_HW = 2304


def _bwd(res, g):
    x, s, weight = res
    h, w_dim = x.shape[1], x.shape[2]
    if (h * w_dim > _BWD_MAX_HW
            and not _use_banding(h, w_dim, min(h * w_dim, 128), x.dtype)):
        _, vjp = jax.vjp(lambda x_, s_, w_: _xla_impl(x_, _band_safe_s(s_),
                                                      w_),
                         x, s, weight)
        dx, ds, dw = vjp(g)
        # same STRICT interior mask as the Pallas branch — clip's own vjp
        # gives a nonzero tie gradient at exactly s == _S_LO/_S_HI, which
        # would make the op's boundary gradient regime-dependent
        ds = jnp.where((s > _S_LO) & (s < _S_HI), ds, 0.0).astype(s.dtype)
        return dx, ds, dw
    c = weight.shape[-1]
    dx, ds, dw = _backward_pallas(x, s, weight.reshape(9, c), g)
    # zero gradient where the op-boundary clamp was active (Hardtanh-like)
    ds = jnp.where((s > _S_LO) & (s < _S_HI), ds, 0.0)
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
    _, vjp = jax.vjp(lambda x_, s_, w_: _xla_impl(x_, _band_safe_s(s_), w_),
                     x, s, weight)
    dx, ds, dw = vjp(g)
    ds = jnp.where((s > _S_LO) & (s < _S_HI), ds, 0.0).astype(s.dtype)
    return dx, ds, dw


_xla_grad_op.defvjp(_xla_fwd, _xla_bwd)
