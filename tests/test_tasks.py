"""Secondary task families: ddd / multi_pose / exdet decodes + losses,
oracle maps, soft-NMS semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from codenet_tpu.models import decode as D
from codenet_tpu.models import losses as L
from codenet_tpu import config as cfg


def test_ddd_decode_shapes():
    n, h, w, c = 1, 16, 16, 3
    heat = np.full((n, h, w, c), 0.01, np.float32)
    heat[0, 5, 6, 1] = 0.9
    rot = np.zeros((n, h, w, 8), np.float32)
    dep = np.ones((n, h, w, 1), np.float32) * 12.0
    dim = np.ones((n, h, w, 3), np.float32)
    wh = np.ones((n, h, w, 2), np.float32) * 4
    reg = np.zeros((n, h, w, 2), np.float32)
    dets = np.asarray(D.ddd_decode(jnp.asarray(heat), jnp.asarray(rot),
                                   jnp.asarray(dep), jnp.asarray(dim),
                                   wh=jnp.asarray(wh), reg=jnp.asarray(reg),
                                   k=5))
    assert dets.shape == (1, 5, 18)
    assert abs(dets[0, 0, 2] - 0.9) < 1e-5  # score
    assert int(dets[0, 0, -1]) == 1  # class
    assert abs(dets[0, 0, 11] - 12.0) < 1e-5  # depth


def test_multi_pose_decode_shapes():
    n, h, w = 1, 16, 16
    heat = np.full((n, h, w, 1), 0.01, np.float32)
    heat[0, 8, 8, 0] = 0.95
    wh = np.ones((n, h, w, 2), np.float32) * 6
    kps = np.zeros((n, h, w, 34), np.float32)
    hm_hp = np.full((n, h, w, 17), 0.01, np.float32)
    hm_hp[0, 7, 7, :] = 0.9
    hp_off = np.zeros((n, h, w, 2), np.float32)
    reg = np.zeros((n, h, w, 2), np.float32)
    dets = np.asarray(D.multi_pose_decode(
        jnp.asarray(heat), jnp.asarray(wh), jnp.asarray(kps),
        reg=jnp.asarray(reg), hm_hp=jnp.asarray(hm_hp),
        hp_offset=jnp.asarray(hp_off), k=4))
    assert dets.shape == (1, 4, 40)
    assert abs(dets[0, 0, 4] - 0.95) < 1e-5
    # joints snapped to the detected heatmap peak (7, 7) inside the box
    assert abs(dets[0, 0, 5] - 7.0) < 1e-4
    assert abs(dets[0, 0, 6] - 7.0) < 1e-4


def test_exct_decode_rejects_and_scores():
    n, h, w, c = 1, 16, 16, 2
    base = np.full((n, h, w, c), 0.01, np.float32)
    t = base.copy(); t[0, 2, 8, 0] = 0.9     # top at y=2
    l = base.copy(); l[0, 8, 3, 0] = 0.9     # left at x=3
    b = base.copy(); b[0, 13, 8, 0] = 0.9    # bottom y=13
    r = base.copy(); r[0, 8, 12, 0] = 0.9    # right x=12
    ct = base.copy()
    ct[0, 7, 7, 0] = 0.8                     # center ((3+12+0.5)/2, (2+13+0.5)/2)
    dets = np.asarray(D.exct_decode(
        jnp.asarray(t), jnp.asarray(l), jnp.asarray(b), jnp.asarray(r),
        jnp.asarray(ct), k=4, num_dets=20))
    assert dets.shape == (1, 20, 14)
    top = dets[0, 0]
    # box = (l_x, t_y, r_x, b_y) + 0.5
    np.testing.assert_allclose(top[:4], [3.5, 2.5, 12.5, 13.5], atol=1e-4)
    expected_score = (0.9 * 4 + 2 * 0.8) / 6
    np.testing.assert_allclose(top[4], expected_score, rtol=1e-4)
    assert int(top[-1]) == 0


def test_task_losses_finite():
    opt = cfg.init("ddd")
    n, h, w = 2, 8, 8
    out = {
        "hm": jnp.zeros((n, h, w, 3)), "dep": jnp.zeros((n, h, w, 1)),
        "rot": jnp.zeros((n, h, w, 8)), "dim": jnp.zeros((n, h, w, 3)),
        "wh": jnp.zeros((n, h, w, 2)), "reg": jnp.zeros((n, h, w, 2)),
    }
    batch = {
        "hm": jnp.zeros((n, h, w, 3)), "dep": jnp.zeros((n, 4, 1)),
        "dim": jnp.zeros((n, 4, 3)), "ind": jnp.zeros((n, 4), jnp.int32),
        "rotbin": jnp.zeros((n, 4, 2), jnp.int32),
        "rotres": jnp.zeros((n, 4, 2)),
        "reg_mask": jnp.ones((n, 4), jnp.uint8),
        "rot_mask": jnp.ones((n, 4), jnp.uint8),
        "wh": jnp.zeros((n, 4, 2)), "reg": jnp.zeros((n, 4, 2)),
    }
    loss, stats = L.ddd_loss([out], batch, opt)
    assert np.isfinite(float(loss))

    opt = cfg.init("exdet")
    out = {}
    batch = {"reg_mask": jnp.ones((n, 4), jnp.uint8)}
    for p in ("t", "l", "b", "r", "c"):
        cls = 1 if p != "c" and opt.agnostic_ex else opt.num_classes
        out["hm_" + p] = jnp.zeros((n, h, w, cls))
        batch["hm_" + p] = jnp.zeros((n, h, w, cls))
        if p != "c":
            out["reg_" + p] = jnp.zeros((n, h, w, 2))
            batch["reg_" + p] = jnp.zeros((n, 4, 2))
            batch["ind_" + p] = jnp.zeros((n, 4), jnp.int32)
    loss, stats = L.exdet_loss([out], batch, opt)
    assert np.isfinite(float(loss))


def test_oracle_map_nearest_fill():
    from codenet_tpu.utils.oracle import gen_oracle_map
    feat = np.zeros((1, 2, 2), np.float32)
    feat[0, 0] = [1.0, 10.0]
    feat[0, 1] = [2.0, 20.0]
    ind = np.array([[1 * 8 + 1, 6 * 8 + 6]])  # (1,1) and (6,6)
    out = gen_oracle_map(feat, ind, 8, 8)
    assert out.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(out[0, 1, 1], [1.0, 10.0])
    np.testing.assert_allclose(out[0, 6, 6], [2.0, 20.0])
    np.testing.assert_allclose(out[0, 0, 0], [1.0, 10.0])  # nearest = seed 1
    np.testing.assert_allclose(out[0, 7, 7], [2.0, 20.0])  # nearest = seed 2


def test_soft_nms_decays_overlaps():
    from codenet_tpu.ops.nms import soft_nms, nms
    boxes = np.array([
        [0, 0, 10, 10, 0.9],
        [1, 1, 11, 11, 0.8],   # heavy overlap with first
        [50, 50, 60, 60, 0.7],
    ], np.float32)
    b = boxes.copy()
    keep = soft_nms(b, Nt=0.5, method=2, sigma=0.5)
    assert b[0, 4] == np.float32(0.9)
    # overlapping box decayed, distant box untouched
    decayed = b[np.argmin(np.abs(b[:, 0] - 1.0)), 4]
    assert decayed < 0.8
    far = b[np.argmin(np.abs(b[:, 0] - 50.0)), 4]
    assert far == np.float32(0.7)
    # hard nms keeps first and far box only
    kept = nms(boxes.copy(), 0.5)
    assert len(kept) == 2


def test_soft_nms_39_native_matches_numpy():
    from codenet_tpu.ops.nms import soft_nms_39, _soft_nms_39_numpy
    rng = np.random.RandomState(9)
    n = 40
    boxes = np.concatenate(
        [rng.rand(n, 2) * 50, rng.rand(n, 2) * 50 + 60, rng.rand(n, 1),
         rng.rand(n, 34) * 100], axis=1).astype(np.float32)
    b1, b2 = boxes.copy(), boxes.copy()
    k1 = soft_nms_39(b1, Nt=0.5, method=2)
    k2 = _soft_nms_39_numpy(b2, Nt=0.5, method=2)
    assert k1 == k2
    np.testing.assert_allclose(b1, b2, rtol=1e-5, atol=1e-6)


def test_soft_nms_merge_native_matches_numpy():
    """Coordinate-merging soft-NMS (reference nms.pyx:277-391): the C++
    kernel and the literal numpy transcription must agree on keep counts,
    merged coordinates, and decayed scores across methods."""
    from codenet_tpu.ops.nms import soft_nms_merge, _soft_nms_merge_numpy
    rng = np.random.RandomState(11)
    for method in (0, 1, 2):
        n = 50
        xy = rng.rand(n, 2) * 40
        boxes = np.concatenate(
            [xy, xy + 10 + rng.rand(n, 2) * 40, rng.rand(n, 1),
             rng.rand(n, 2) * 0.9 + 0.1], axis=1).astype(np.float32)
        b1, b2 = boxes.copy(), boxes.copy()
        k1 = soft_nms_merge(b1, Nt=0.4, method=method, weight_exp=6.0)
        k2 = _soft_nms_merge_numpy(b2, Nt=0.4, method=method,
                                   weight_exp=6.0)
        assert k1 == k2, method
        np.testing.assert_allclose(b1, b2, rtol=1e-4, atol=1e-4)


def test_soft_nms_merge_merges_coordinates():
    """Two heavily-overlapping boxes: the kept box's corners become the
    mw-weighted average (gaussian decay), pulled toward the suppressed
    box; a distant box is untouched."""
    from codenet_tpu.ops.nms import _soft_nms_merge_numpy
    b = np.array([
        [0, 0, 10, 10, 0.9, 1.0, 1.0],
        [2, 2, 12, 12, 0.8, 1.0, 1.0],   # heavy overlap
        [50, 50, 60, 60, 0.7, 1.0, 1.0],
    ], np.float32)
    _soft_nms_merge_numpy(b, Nt=0.3, method=2, sigma=0.5, weight_exp=2.0)
    # merged corner strictly between the two contributors
    assert 0.0 < b[0, 0] < 2.0
    assert 10.0 < b[0, 2] < 12.0
    # hand-check the weighted average for the x1 coordinate
    iw = min(10, 12) - max(0, 2) + 1
    ih = iw
    ua = 11 * 11 * 2 - iw * ih
    ov = iw * ih / ua
    w = np.exp(-(ov * ov) / 0.5)
    mw = (1 - w) ** 2.0
    np.testing.assert_allclose(b[0, 0], (0 * 1 + 2 * mw) / (1 + mw),
                               rtol=1e-5)
    # distant box untouched (the max-selection swap moved it to row 1:
    # its 0.7 score beats row 1's gaussian-decayed 0.8)
    far = int(np.argmin(np.abs(b[:, 0] - 50.0)))
    np.testing.assert_allclose(b[far, :4], [50, 50, 60, 60])
