"""ROI-Align and InPlace-ABN — the last two op-inventory rows.

Both are built-but-unreferenced in the reference (SURVEY.md §2.1); these
tests pin their rebuilt semantics against a naive numpy oracle that
transcribes the CUDA loop (roi_align_kernel.cu:163-240 — the repo's
standard test-oracle pattern, cf. ops/deform_conv.py's naive loop) and a
plain-autodiff oracle (ABN). torchvision is not in this image, or its
`roi_align(aligned=False)` would be the oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codenet_tpu.ops.roi_align import roi_align
from codenet_tpu.ops import abn as A


def _rand_rois(rng, n_img, h, w, r, scale):
    """ROIs in image coords (feature map is h x w at 1/scale)."""
    x1 = rng.rand(r) * (w / scale * 0.6)
    y1 = rng.rand(r) * (h / scale * 0.6)
    x2 = x1 + rng.rand(r) * (w / scale * 0.4) + 2
    y2 = y1 + rng.rand(r) * (h / scale * 0.4) + 2
    bi = rng.randint(0, n_img, r)
    return np.stack([bi, x1, y1, x2, y2], 1).astype(np.float32)


def _bilinear_np(img2d, h, w, y, x):
    """bilinear_interpolate, roi_align_kernel.cu:43-96."""
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return 0.0
    y = max(y, 0.0)
    x = max(x, 0.0)
    y0, x0 = int(y), int(x)
    if y0 >= h - 1:
        y1i = y0 = h - 1
        y = float(y0)
    else:
        y1i = y0 + 1
    if x0 >= w - 1:
        x1i = x0 = w - 1
        x = float(x0)
    else:
        x1i = x0 + 1
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx
    return (hy * hx * img2d[y0, x0] + hy * lx * img2d[y0, x1i]
            + ly * hx * img2d[y1i, x0] + ly * lx * img2d[y1i, x1i])


def _roi_align_np(data, rois, ph_n, pw_n, scale, sampling_ratio):
    """RoIAlignForward, roi_align_kernel.cu:163-240 (NHWC)."""
    n, h, w, c = data.shape
    out = np.zeros((len(rois), ph_n, pw_n, c), np.float32)
    for r, roi in enumerate(rois):
        bi = int(round(roi[0]))
        x1, y1, x2, y2 = [v * scale for v in roi[1:]]
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_h, bin_w = roi_h / ph_n, roi_w / pw_n
        gh = sampling_ratio if sampling_ratio > 0 else int(
            np.ceil(roi_h / ph_n))
        gw = sampling_ratio if sampling_ratio > 0 else int(
            np.ceil(roi_w / pw_n))
        for ph in range(ph_n):
            for pw in range(pw_n):
                acc = np.zeros(c, np.float32)
                for iy in range(gh):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / gh
                    for ix in range(gw):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / gw
                        acc += _bilinear_np(data[bi], h, w, yy, xx)
                out[r, ph, pw] = acc / (gh * gw)
    return out


@pytest.mark.parametrize("sampling_ratio", [2, 0])
def test_roi_align_matches_cuda_loop_oracle(sampling_ratio):
    rng = np.random.RandomState(0)
    n, h, w, c = 2, 16, 20, 8
    scale = 1.0 / 4
    x = rng.randn(n, h, w, c).astype(np.float32)
    rois = _rand_rois(rng, n, h, w, r=7, scale=scale)

    got = np.asarray(roi_align(
        jnp.asarray(x), jnp.asarray(rois), pooled_height=5, pooled_width=3,
        spatial_scale=scale, sampling_ratio=sampling_ratio))
    want = _roi_align_np(x, rois, 5, 3, scale, sampling_ratio)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_boundary_samples():
    # ROIs hanging off every edge: the y in [-1, 0] clamp band, the
    # far-edge corner collapse, and fully-outside zero contribution
    rng = np.random.RandomState(5)
    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    rois = np.array([
        [0, -8.0, -8.0, 4.0, 4.0],     # spans the top-left outside band
        [0, 20.0, 20.0, 40.0, 40.0],   # far edge / fully outside
        [0, -30.0, -30.0, -20.0, -20.0],  # entirely outside
    ], np.float32)
    got = np.asarray(roi_align(jnp.asarray(x), jnp.asarray(rois),
                               pooled_height=4, pooled_width=4,
                               spatial_scale=0.25, sampling_ratio=2))
    want = _roi_align_np(x, rois, 4, 4, 0.25, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_grad_finite_difference():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 7, 2).astype(np.float64)
    rois = _rand_rois(rng, 1, 6, 7, r=2, scale=0.5).astype(np.float64)
    cot = rng.randn(2, 3, 3, 2)

    def loss(xj):
        out = roi_align(xj, jnp.asarray(rois), pooled_height=3,
                        pooled_width=3, spatial_scale=0.5,
                        sampling_ratio=2)
        return (out * cot).sum()

    with jax.enable_x64(True):
        gx = np.asarray(jax.grad(loss)(jnp.asarray(x)))
        eps = 1e-6
        # spot-check 20 coordinates against central differences
        idx = [np.unravel_index(i, x.shape) for i in
               rng.choice(x.size, 20, replace=False)]
        for ij in idx:
            xp = x.copy(); xp[ij] += eps
            xm = x.copy(); xm[ij] -= eps
            fd = (float(loss(jnp.asarray(xp)))
                  - float(loss(jnp.asarray(xm)))) / (2 * eps)
            assert abs(fd - gx[ij]) < 1e-5, (ij, fd, gx[ij])


def test_roi_align_malformed_roi_forced_1x1():
    # x2 < x1: Caffe2 forces roi size to 1x1 instead of producing NaNs
    x = jnp.ones((1, 8, 8, 2))
    rois = jnp.array([[0, 5.0, 5.0, 4.0, 4.0]])
    out = roi_align(x, rois, pooled_height=2, pooled_width=2,
                    spatial_scale=1.0, sampling_ratio=1)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


@pytest.mark.parametrize("activation", ["leaky_relu", "elu", "identity"])
def test_inplace_abn_matches_autodiff_oracle(activation):
    """The output-residency backward must equal plain autodiff through
    batch statistics (the reference's edz/eydz formula IS that backward,
    inplace_abn_cpu.cpp:76-85)."""
    rng = np.random.RandomState(2)
    x = rng.randn(4, 6, 6, 5).astype(np.float32)
    w = rng.randn(5).astype(np.float32)  # mixed signs exercise |w|+eps
    b = rng.randn(5).astype(np.float32)
    cot = rng.randn(4, 6, 6, 5).astype(np.float32)

    def run(fn, x, w, b):
        mean = x.mean(axis=(0, 1, 2))
        var = ((x - mean) ** 2).mean(axis=(0, 1, 2))
        if fn is A.inplace_abn:  # stats folded into the custom backward
            mean, var = map(jax.lax.stop_gradient, (mean, var))
        return fn(x, w, b, mean, var, 1e-5, activation, 0.01)

    args = (jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    out_ip = run(A.inplace_abn, *args)
    out_ref = run(A.abn_reference, *args)
    np.testing.assert_allclose(np.asarray(out_ip), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)

    def scalar(fn):
        def f(x, w, b):
            return (run(fn, x, w, b) * cot).sum()
        return f

    g_ip = jax.grad(scalar(A.inplace_abn), argnums=(0, 1, 2))(*args)
    g_ref = jax.grad(scalar(A.abn_reference), argnums=(0, 1, 2))(*args)
    for gi, gr, name in zip(g_ip, g_ref, ("dx", "dweight", "dbias")):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_inplace_abn_frozen_stats_grad():
    """training=False (frozen running stats): dx must be the plain
    affine chain rule dz * mul, NOT the through-statistics formula."""
    rng = np.random.RandomState(7)
    x = rng.randn(3, 5, 5, 4).astype(np.float32)
    w = rng.randn(4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    mean = rng.randn(4).astype(np.float32)
    var = (rng.rand(4).astype(np.float32) + 0.5)
    cot = rng.randn(3, 5, 5, 4).astype(np.float32)
    args = tuple(map(jnp.asarray, (x, w, b)))
    mv = tuple(map(jnp.asarray, (mean, var)))

    def f_ip(x, w, b):
        return (A.inplace_abn(x, w, b, *mv, 1e-5, "leaky_relu", 0.01,
                              False) * cot).sum()

    def f_ref(x, w, b):
        return (A.abn_reference(x, w, b, *mv, 1e-5, "leaky_relu",
                                0.01) * cot).sum()

    g_ip = jax.grad(f_ip, argnums=(0, 1, 2))(*args)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(np.asarray(g_ip[0]), np.asarray(g_ref[0]),
                               rtol=2e-4, atol=2e-4, err_msg="dx")
    np.testing.assert_allclose(np.asarray(g_ip[1]), np.asarray(g_ref[1]),
                               rtol=2e-4, atol=2e-4, err_msg="dweight")
    np.testing.assert_allclose(np.asarray(g_ip[2]), np.asarray(g_ref[2]),
                               rtol=2e-4, atol=2e-4, err_msg="dbias")


def test_inplace_abn_module_running_stats():
    m = A.InPlaceABN(3, momentum=0.5)
    state = m.init_state()
    x = jnp.asarray(np.random.RandomState(3).randn(2, 4, 4, 3)
                    .astype(np.float32) * 2 + 1)
    out, state = m(state, x, training=True)
    assert out.shape == x.shape
    # running stats moved halfway toward the batch stats
    bm = np.asarray(x).mean(axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(state["running_mean"]),
                               0.5 * bm, rtol=1e-5, atol=1e-5)
    out_eval, state2 = m(state, x, training=False)
    assert state2 is state  # eval does not mutate


def test_inplace_abn_residuals_drop_input():
    """The saved set must contain the OUTPUT, not x — the memory claim."""
    x = jnp.asarray(np.random.RandomState(4).randn(2, 8, 8, 4)
                    .astype(np.float32))
    w = jnp.ones((4,))
    b = jnp.zeros((4,))
    mean = jnp.zeros((4,))
    var = jnp.ones((4,))

    def f(x):
        return A.inplace_abn(x, w, b, mean, var, 1e-5, "leaky_relu", 0.01)

    out, vjp = jax.vjp(f, x)
    # walk the vjp closure: every saved array equal to x would defeat the
    # point; the only (2,8,8,4) residual must be the output
    leaves = jax.tree_util.tree_leaves(vjp)
    big = [np.asarray(l) for l in leaves
           if hasattr(l, "shape") and l.shape == x.shape]
    assert big, "expected one full-size residual (the output)"
    for arr in big:
        assert not np.allclose(arr, np.asarray(x)), \
            "input x captured as residual — in-place trick defeated"
        np.testing.assert_allclose(arr, np.asarray(out), atol=0)
