"""On-device head decoding — one jitted program, no host round-trips.

Rebuild of reference lib/models/decode.py in NHWC jax: 3x3 maxpool peak-keep
(decode.py:10-16), two-stage top-k (per-class then global, decode.py:110-126
— kept two-stage to minimize tie-break drift vs torch), offset/size gathers,
and box assembly (ctdet_decode, decode.py:474-505). Unlike the reference,
the affine back-projection to original image pixels
(lib/utils/post_process.py:86-103) is fused into the same jitted program via
a per-image inverse transform, so detections leave the device already in
image coordinates: (N, K, 6) [x1 y1 x2 y2 score cls].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def heat_nms(heat, kernel=3):
    """Peak-keep via 3x3 max-pool equality (reference decode.py:10-16)."""
    pad = (kernel - 1) // 2
    neg = jnp.finfo(heat.dtype).min
    hmax = jax.lax.reduce_window(
        heat, neg, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)))
    keep = (hmax == heat).astype(heat.dtype)
    return heat * keep


def _gather_feat_nhwc(feat, ind):
    """Gather rows of an (N, H*W, C) feature at flat spatial indices (N, K).

    The NHWC analogue of reference models/utils.py:14-29
    (_transpose_and_gather_feat) — NHWC needs no transpose.
    """
    return jnp.take_along_axis(feat, ind[..., None], axis=1)


def topk(scores, k=40):
    """Two-stage top-k (reference decode.py:110-126).

    scores: (N, H, W, C). Returns (score, inds, clses, ys, xs), each (N, K);
    inds are flat y*W+x spatial indices.
    """
    n, h, w, c = scores.shape
    flat = scores.reshape(n, h * w, c)
    percls = jnp.transpose(flat, (0, 2, 1))  # (N, C, H*W)
    topk_scores, topk_inds = jax.lax.top_k(percls, k)  # (N, C, K)
    topk_ys = (topk_inds // w).astype(jnp.float32)
    topk_xs = (topk_inds % w).astype(jnp.float32)

    topk_score, topk_ind = jax.lax.top_k(topk_scores.reshape(n, c * k), k)
    topk_clses = (topk_ind // k).astype(jnp.int32)
    gather = lambda t: jnp.take_along_axis(t.reshape(n, c * k), topk_ind,
                                           axis=1)
    return (topk_score, gather(topk_inds), topk_clses, gather(topk_ys),
            gather(topk_xs))


def topk_channel(scores, k=40):
    """Per-class top-k without the global stage (reference decode.py:99-108)."""
    n, h, w, c = scores.shape
    percls = jnp.transpose(scores.reshape(n, h * w, c), (0, 2, 1))
    topk_scores, topk_inds = jax.lax.top_k(percls, k)
    topk_ys = (topk_inds // w).astype(jnp.float32)
    topk_xs = (topk_inds % w).astype(jnp.float32)
    return topk_scores, topk_inds, topk_ys, topk_xs


def ctdet_decode(heat, wh, reg=None, cat_spec_wh=False, k=100):
    """CenterNet box decode (reference decode.py:474-505).

    heat: (N, H, W, C) POST-sigmoid heatmap; wh: (N, H, W, 2 or 2C);
    reg: (N, H, W, 2) or None. Returns (N, K, 6) feature-space detections
    [x1 y1 x2 y2 score cls].
    """
    n = heat.shape[0]
    c = heat.shape[-1]
    heat = heat_nms(heat)
    scores, inds, clses, ys, xs = topk(heat, k)

    if reg is not None:
        regf = _gather_feat_nhwc(reg.reshape(n, -1, 2), inds)
        xs = xs[..., None] + regf[..., 0:1]
        ys = ys[..., None] + regf[..., 1:2]
    else:
        xs = xs[..., None] + 0.5
        ys = ys[..., None] + 0.5

    whc = wh.shape[-1]
    whf = _gather_feat_nhwc(wh.reshape(n, -1, whc), inds)
    if cat_spec_wh:
        whf = whf.reshape(n, k, c, 2)
        cls_idx = clses[..., None, None].astype(jnp.int32)
        whf = jnp.take_along_axis(whf, jnp.broadcast_to(
            cls_idx, (n, k, 1, 2)), axis=2).reshape(n, k, 2)

    clses_f = clses[..., None].astype(jnp.float32)
    scores_f = scores[..., None]
    bboxes = jnp.concatenate([xs - whf[..., 0:1] / 2,
                              ys - whf[..., 1:2] / 2,
                              xs + whf[..., 0:1] / 2,
                              ys + whf[..., 1:2] / 2], axis=2)
    return jnp.concatenate([bboxes, scores_f, clses_f], axis=2)


def apply_affine_points(pts, trans):
    """pts: (..., 2); trans: (2, 3) mapping (x, y) -> (x', y')."""
    x = trans[0, 0] * pts[..., 0] + trans[0, 1] * pts[..., 1] + trans[0, 2]
    y = trans[1, 0] * pts[..., 0] + trans[1, 1] * pts[..., 1] + trans[1, 2]
    return jnp.stack([x, y], axis=-1)


def backproject_dets(dets, trans_inv, inv_scale=1.0):
    """Fused ctdet_post_process (reference post_process.py:86-103 without the
    per-class bucketing): map box corners through the inverse affine and
    divide by the test scale (reference detectors/ctdet.py:56).

    dets: (N, K, 6); trans_inv: (N, 2, 3). Returns (N, K, 6) in original
    image pixels.
    """
    def one(det, t):
        p1 = apply_affine_points(det[:, 0:2], t)
        p2 = apply_affine_points(det[:, 2:4], t)
        return jnp.concatenate([p1 * inv_scale, p2 * inv_scale, det[:, 4:]],
                               axis=1)
    return jax.vmap(one)(dets, trans_inv)


def ddd_decode(heat, rot, depth, dim, wh=None, reg=None, k=40):
    """KITTI 3D decode (reference decode.py:435-471). heat post-sigmoid.

    Returns (N, K, 18 or 16): [xs ys score rot(8) depth dim(3) (wh) cls].
    """
    n = heat.shape[0]
    heat = heat_nms(heat)
    scores, inds, clses, ys, xs = topk(heat, k)
    if reg is not None:
        regf = _gather_feat_nhwc(reg.reshape(n, -1, 2), inds)
        xs = xs[..., None] + regf[..., 0:1]
        ys = ys[..., None] + regf[..., 1:2]
    else:
        xs = xs[..., None] + 0.5
        ys = ys[..., None] + 0.5
    rotf = _gather_feat_nhwc(rot.reshape(n, -1, 8), inds)
    depf = _gather_feat_nhwc(depth.reshape(n, -1, 1), inds)
    dimf = _gather_feat_nhwc(dim.reshape(n, -1, 3), inds)
    clses_f = clses[..., None].astype(jnp.float32)
    scores_f = scores[..., None]
    parts = [xs, ys, scores_f, rotf, depf, dimf]
    if wh is not None:
        parts.append(_gather_feat_nhwc(wh.reshape(n, -1, 2), inds))
    parts.append(clses_f)
    return jnp.concatenate(parts, axis=2)


def multi_pose_decode(heat, wh, kps, reg=None, hm_hp=None, hp_offset=None,
                      k=100):
    """COCO-keypoints decode (reference decode.py:508-582).

    Returns (N, K, 40): bbox(4) score kps(34) cls.
    """
    n, h, w, _ = heat.shape
    num_joints = kps.shape[-1] // 2
    heat = heat_nms(heat)
    scores, inds, clses, ys, xs = topk(heat, k)

    kpsf = _gather_feat_nhwc(kps.reshape(n, -1, num_joints * 2), inds)
    kpsf = kpsf.reshape(n, k, num_joints, 2)
    kpsf = kpsf + jnp.stack([jnp.broadcast_to(xs[..., None],
                                              (n, k, num_joints)),
                             jnp.broadcast_to(ys[..., None],
                                              (n, k, num_joints))], axis=-1)

    if reg is not None:
        regf = _gather_feat_nhwc(reg.reshape(n, -1, 2), inds)
        xs_c = xs[..., None] + regf[..., 0:1]
        ys_c = ys[..., None] + regf[..., 1:2]
    else:
        xs_c = xs[..., None] + 0.5
        ys_c = ys[..., None] + 0.5
    whf = _gather_feat_nhwc(wh.reshape(n, -1, 2), inds)
    bboxes = jnp.concatenate([xs_c - whf[..., 0:1] / 2,
                              ys_c - whf[..., 1:2] / 2,
                              xs_c + whf[..., 0:1] / 2,
                              ys_c + whf[..., 1:2] / 2], axis=2)

    if hm_hp is not None:
        # keypoint heatmap association (reference decode.py:538-579): snap
        # each regressed joint to the nearest detected heatmap peak, gated
        # by the person box.
        hm_hp = heat_nms(hm_hp)
        thresh = 0.1
        kps_reg = jnp.transpose(kpsf, (0, 2, 1, 3))  # (N, J, K, 2)
        hm_score, hm_inds, hm_ys, hm_xs = topk_channel(hm_hp, k)  # (N, J, K)
        if hp_offset is not None:
            hp_off = _gather_feat_nhwc(hp_offset.reshape(n, -1, 2),
                                       hm_inds.reshape(n, -1))
            hp_off = hp_off.reshape(n, num_joints, k, 2)
            hm_xs = hm_xs + hp_off[..., 0]
            hm_ys = hm_ys + hp_off[..., 1]
        else:
            hm_xs = hm_xs + 0.5
            hm_ys = hm_ys + 0.5
        mask = (hm_score > thresh)
        hm_score = jnp.where(mask, hm_score, -1.0)
        hm_xs_m = jnp.where(mask, hm_xs, -10000.0)
        hm_ys_m = jnp.where(mask, hm_ys, -10000.0)
        hm_kps = jnp.stack([hm_xs_m, hm_ys_m], axis=-1)  # (N, J, K, 2)
        # distances between regressed joints and heatmap joints
        dist = jnp.sqrt(jnp.sum(
            (kps_reg[:, :, :, None, :] - hm_kps[:, :, None, :, :]) ** 2,
            axis=-1))  # (N, J, K_person, K_peak)
        min_dist = jnp.min(dist, axis=-1)
        min_ind = jnp.argmin(dist, axis=-1)  # (N, J, K_person)
        hm_score_sel = jnp.take_along_axis(hm_score, min_ind, axis=2)
        hm_kps_sel = jnp.take_along_axis(
            hm_kps, min_ind[..., None], axis=2)  # (N, J, K_person, 2)
        # gate: peak must be inside the person box, score above thresh,
        # distance below 0.3*max(w,h)
        l = bboxes[:, None, :, 0]
        t = bboxes[:, None, :, 1]
        r = bboxes[:, None, :, 2]
        b = bboxes[:, None, :, 3]
        bad = ((hm_kps_sel[..., 0] < l) | (hm_kps_sel[..., 0] > r) |
               (hm_kps_sel[..., 1] < t) | (hm_kps_sel[..., 1] > b) |
               (hm_score_sel < thresh) |
               (min_dist > jnp.maximum(b - t, r - l) * 0.3))
        kps_out = jnp.where(bad[..., None], kps_reg, hm_kps_sel)
        kpsf = jnp.transpose(kps_out, (0, 2, 1, 3))

    kps_flat = kpsf.reshape(n, k, num_joints * 2)
    clses_f = clses[..., None].astype(jnp.float32)
    return jnp.concatenate([bboxes, scores[..., None], kps_flat, clses_f],
                           axis=2)
