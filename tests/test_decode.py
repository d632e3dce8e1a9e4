"""ctdet decode semantics vs hand-computed expectations + back-projection
parity with the numpy transform_preds path."""

import numpy as np
import jax.numpy as jnp

from codenet_tpu.data import affine as A
from codenet_tpu.models import decode as D


def _make_heat(n, h, w, c, peaks):
    """peaks: list of (b, y, x, cls, score)."""
    hm = np.full((n, h, w, c), 0.01, np.float32)
    for b, y, x, cls, s in peaks:
        hm[b, y, x, cls] = s
    return hm


def test_ctdet_decode_basic():
    h = w = 16
    peaks = [(0, 4, 5, 2, 0.9), (0, 10, 12, 7, 0.7)]
    hm = _make_heat(1, h, w, 20, peaks)
    wh = np.zeros((1, h, w, 2), np.float32)
    reg = np.zeros((1, h, w, 2), np.float32)
    wh[0, 4, 5] = [6.0, 4.0]
    wh[0, 10, 12] = [2.0, 8.0]
    reg[0, 4, 5] = [0.25, -0.25]

    dets = np.asarray(D.ctdet_decode(jnp.asarray(hm), jnp.asarray(wh),
                                     jnp.asarray(reg), k=10))
    assert dets.shape == (1, 10, 6)
    # top detection: score .9 at (5.25, 3.75), wh (6,4), class 2
    d0 = dets[0, 0]
    np.testing.assert_allclose(d0[4], 0.9, atol=1e-6)
    assert int(d0[5]) == 2
    np.testing.assert_allclose(d0[:4],
                               [5.25 - 3, 3.75 - 2, 5.25 + 3, 3.75 + 2],
                               atol=1e-5)
    d1 = dets[0, 1]
    np.testing.assert_allclose(d1[4], 0.7, atol=1e-6)
    assert int(d1[5]) == 7
    np.testing.assert_allclose(d1[:4], [12 - 1, 10 - 4, 12 + 1, 10 + 4],
                               atol=1e-5)


def test_heat_nms_suppresses_nonpeaks():
    hm = np.full((1, 8, 8, 1), 0.1, np.float32)
    hm[0, 3, 3, 0] = 0.9
    hm[0, 3, 4, 0] = 0.8  # adjacent, lower -> suppressed
    out = np.asarray(D.heat_nms(jnp.asarray(hm)))
    assert out[0, 3, 3, 0] == np.float32(0.9)
    assert out[0, 3, 4, 0] == 0.0


def test_no_reg_adds_half_pixel():
    hm = _make_heat(1, 8, 8, 3, [(0, 2, 6, 1, 0.5)])
    wh = np.zeros((1, 8, 8, 2), np.float32)
    wh[0, 2, 6] = [2.0, 2.0]
    dets = np.asarray(D.ctdet_decode(jnp.asarray(hm), jnp.asarray(wh), None,
                                     k=5))
    np.testing.assert_allclose(dets[0, 0, :4], [5.5, 1.5, 7.5, 3.5],
                               atol=1e-5)


def test_cat_spec_wh():
    c = 4
    hm = _make_heat(1, 8, 8, c, [(0, 3, 3, 2, 0.8)])
    wh = np.zeros((1, 8, 8, 2 * c), np.float32)
    wh[0, 3, 3, 2 * 2:2 * 2 + 2] = [4.0, 6.0]  # class-2 slot
    wh[0, 3, 3, 0:2] = [99.0, 99.0]  # wrong-class slot must be ignored
    dets = np.asarray(D.ctdet_decode(jnp.asarray(hm), jnp.asarray(wh), None,
                                     cat_spec_wh=True, k=5))
    np.testing.assert_allclose(dets[0, 0, :4], [3.5 - 2, 3.5 - 3,
                                                3.5 + 2, 3.5 + 3], atol=1e-5)


def test_backproject_matches_transform_preds():
    rng = np.random.RandomState(0)
    center = np.array([333.0, 211.0], np.float32)
    scale = 640.0
    out_w, out_h = 64, 64
    dets = rng.uniform(0, 64, size=(1, 10, 6)).astype(np.float32)

    trans_inv = A.get_affine_transform(center, scale, 0, [out_w, out_h],
                                       inv=1).astype(np.float32)
    got = np.asarray(D.backproject_dets(jnp.asarray(dets),
                                        jnp.asarray(trans_inv[None])))
    ref01 = A.transform_preds(dets[0, :, 0:2], center, scale, (out_w, out_h))
    ref23 = A.transform_preds(dets[0, :, 2:4], center, scale, (out_w, out_h))
    np.testing.assert_allclose(got[0, :, 0:2], ref01, atol=1e-3)
    np.testing.assert_allclose(got[0, :, 2:4], ref23, atol=1e-3)
    np.testing.assert_allclose(got[0, :, 4:], dets[0, :, 4:], atol=1e-6)


def test_losses_focal_and_l1():
    from codenet_tpu.models import losses as L
    import jax
    # focal: perfect prediction => ~0 loss
    gt = np.zeros((1, 8, 8, 2), np.float32)
    gt[0, 4, 4, 0] = 1.0
    pred = np.clip(gt, 1e-4, 1 - 1e-4)
    loss = float(L.neg_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert loss < 1e-2
    # masked L1 gather
    out = np.zeros((1, 8, 8, 2), np.float32)
    out[0, 2, 3] = [1.0, 2.0]
    ind = np.array([[2 * 8 + 3, 0]], np.int64)
    target = np.array([[[0.5, 1.0], [9.0, 9.0]]], np.float32)
    mask = np.array([[1, 0]], np.uint8)
    l1 = float(L.reg_l1_loss(jnp.asarray(out), jnp.asarray(mask),
                             jnp.asarray(ind), jnp.asarray(target)))
    # |1-0.5| + |2-1| = 1.5 over mask sum 2
    np.testing.assert_allclose(l1, 1.5 / 2, rtol=1e-4)


def test_topk_pooled_matches_two_stage():
    """The 2x2-pool domain-reduced top-k must reproduce the reference
    two-stage selection exactly on peak-masked maps with distinct values
    (strict 3x3 peaks can't share an aligned 2x2 block). Covers odd and
    even extents and k greater/smaller than the peak count."""
    rng = np.random.RandomState(0)
    for h, w, c, k in [(16, 16, 20, 10), (17, 23, 5, 40), (8, 8, 3, 60)]:
        raw = rng.rand(2, h, w, c).astype(np.float32)
        # distinct values (ties measure-zero for sigmoid outputs)
        masked = np.asarray(D.heat_nms(jnp.asarray(raw)))
        a = D.topk(jnp.asarray(masked), k, method="two_stage")
        b = D.topk(jnp.asarray(masked), k, method="pooled")
        sa, sb = np.asarray(a[0]), np.asarray(b[0])
        np.testing.assert_allclose(sb, sa, atol=1e-7, err_msg=f"{h}x{w}x{c}")
        # indices/classes must agree wherever the score is a real peak
        # (zero-score tail entries may differ in tie order)
        nz = sa > 0
        for ia, ib, name in [(a[1], b[1], "ind"), (a[2], b[2], "cls"),
                             (a[3], b[3], "ys"), (a[4], b[4], "xs")]:
            np.testing.assert_array_equal(np.asarray(ia)[nz],
                                          np.asarray(ib)[nz],
                                          err_msg=f"{name} {h}x{w}x{c}")


def test_topk_pooled_small_k_fallback():
    """k larger than the pooled domain falls back to two_stage."""
    rng = np.random.RandomState(1)
    raw = rng.rand(1, 4, 4, 1).astype(np.float32)
    masked = D.heat_nms(jnp.asarray(raw))
    out = D.topk(masked, 16)  # pooled domain = 2*2*1 = 4 < 16
    assert np.asarray(out[0]).shape == (1, 16)


def test_topk_channel_pooled_matches_two_stage():
    """Per-class pooled top-k must reproduce the literal per-class sort
    on peak-masked maps with distinct values."""
    rng = np.random.RandomState(2)
    for h, w, c, k in [(16, 16, 17, 10), (13, 21, 4, 30)]:
        raw = rng.rand(2, h, w, c).astype(np.float32)
        masked = np.asarray(D.heat_nms(jnp.asarray(raw)))
        a = D.topk_channel(jnp.asarray(masked), k, method="two_stage")
        b = D.topk_channel(jnp.asarray(masked), k, method="pooled")
        sa = np.asarray(a[0])
        np.testing.assert_allclose(np.asarray(b[0]), sa, atol=1e-7,
                                   err_msg=f"{h}x{w}x{c}")
        nz = sa > 0
        for ia, ib, name in [(a[1], b[1], "ind"), (a[2], b[2], "ys"),
                             (a[3], b[3], "xs")]:
            np.testing.assert_array_equal(np.asarray(ia)[nz],
                                          np.asarray(ib)[nz],
                                          err_msg=f"{name} {h}x{w}x{c}")
