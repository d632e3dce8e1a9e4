"""NMS / Soft-NMS.

Port of the reference Cython kernels (lib/models/external/nms.pyx:24-170) in
vectorized numpy, preserving the reference's exact caller-visible semantics —
ctdet's merge_outputs calls soft_nms for its IN-PLACE score decay and ignores
the returned keep list (reference detectors/ctdet.py:64-65), including the
quirk that below-threshold rows are swapped to the tail and the logical N
shrinks while the array keeps its physical size.

These run on ≤100 boxes per class on the host after decode; a jit/Pallas
variant is unnecessary at this size (the on-device maxpool peak-keep in
decode.py already does the heavy suppression).
"""

from __future__ import annotations

import numpy as np

_native = None
_native_checked = False


def _get_native():
    """Lazily load the C++ extension (codenet_tpu/native); None = fallback."""
    global _native, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from ..native import load_nms
            _native = load_nms()
        except Exception:
            _native = None
    return _native


def nms(dets, thresh):
    native = _get_native()
    if native is not None and dets.dtype == np.float32 \
            and dets.flags["C_CONTIGUOUS"]:
        return native.nms(dets, float(thresh))
    return _nms_numpy(dets, thresh)


def _nms_numpy(dets, thresh):
    """Greedy hard NMS (reference nms.pyx:24-75). Returns kept indices."""
    x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    scores = dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]

    keep = []
    suppressed = np.zeros(dets.shape[0], dtype=bool)
    for _i in range(len(order)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(int(i))
        rest = order[_i + 1:]
        rest = rest[~suppressed[rest]]
        if rest.size == 0:
            continue
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[rest] - inter)
        suppressed[rest[ovr >= thresh]] = True
    return keep


def soft_nms(boxes, sigma=0.5, Nt=0.3, threshold=0.001, method=0):
    """Soft-NMS (reference nms.pyx:77-170), in-place on (N, 5) float boxes.

    method: 0 hard, 1 linear, 2 gaussian. Returns keep = list(range(N'))
    where N' is the shrunk logical count, exactly like the Cython version.
    """
    native = _get_native()
    if native is not None and boxes.dtype == np.float32 \
            and boxes.flags["C_CONTIGUOUS"]:
        return native.soft_nms(boxes, sigma=float(sigma), Nt=float(Nt),
                               threshold=float(threshold),
                               method=int(method))
    return _soft_nms_numpy(boxes, sigma, Nt, threshold, method)


def _soft_nms_numpy(boxes, sigma=0.5, Nt=0.3, threshold=0.001, method=0):
    N = boxes.shape[0]
    i = 0
    while i < N:
        # move the max-score box among [i, N) to position i
        maxpos = i + int(np.argmax(boxes[i:N, 4]))
        if maxpos != i:
            boxes[[i, maxpos]] = boxes[[maxpos, i]].copy()
        tx1, ty1, tx2, ty2 = boxes[i, 0], boxes[i, 1], boxes[i, 2], boxes[i, 3]

        pos = i + 1
        while pos < N:
            x1, y1, x2, y2 = boxes[pos, 0], boxes[pos, 1], boxes[pos, 2], \
                boxes[pos, 3]
            area = (x2 - x1 + 1) * (y2 - y1 + 1)
            iw = min(tx2, x2) - max(tx1, x1) + 1
            if iw > 0:
                ih = min(ty2, y2) - max(ty1, y1) + 1
                if ih > 0:
                    ua = (tx2 - tx1 + 1) * (ty2 - ty1 + 1) + area - iw * ih
                    ov = iw * ih / ua
                    if method == 1:
                        weight = 1 - ov if ov > Nt else 1.0
                    elif method == 2:
                        weight = np.exp(-(ov * ov) / sigma)
                    else:
                        weight = 0.0 if ov > Nt else 1.0
                    boxes[pos, 4] = weight * boxes[pos, 4]
                    if boxes[pos, 4] < threshold:
                        boxes[pos] = boxes[N - 1].copy()
                        N -= 1
                        pos -= 1
            pos += 1
        i += 1
    return list(range(N))


def soft_nms_merge(boxes, sigma=0.5, Nt=0.3, threshold=0.001, method=0,
                   weight_exp=6.0):
    """Coordinate-merging Soft-NMS (reference nms.pyx:277-391), in-place on
    (N, 7) float boxes [x1 y1 x2 y2 score ts bs]: each kept box's corners
    become the mw=(1-weight)^weight_exp-weighted average over its
    overlapping boxes, x1/y1 weighted by column 5 and x2/y2 by column 6.

    Reference quirks preserved exactly: the max-selection swap and the
    tail-discard swap move only columns 0-4 (columns 5-6 stay with their
    original rows), and the merge accumulators read the PRE-swap row i's
    columns 5-6. Unused by any reference detector (ExtremeNet upstream's
    merge_bbox mode); ported for inventory parity.
    """
    native = _get_native()
    if native is not None and boxes.dtype == np.float32 \
            and boxes.flags["C_CONTIGUOUS"]:
        return native.soft_nms_merge(boxes, sigma=float(sigma),
                                     Nt=float(Nt),
                                     threshold=float(threshold),
                                     method=int(method),
                                     weight_exp=float(weight_exp))
    return _soft_nms_merge_numpy(boxes, sigma, Nt, threshold, method,
                                 weight_exp)


def _soft_nms_merge_numpy(boxes, sigma=0.5, Nt=0.3, threshold=0.001,
                          method=0, weight_exp=6.0):
    N = boxes.shape[0]
    i = 0
    while i < N:
        maxpos = i + int(np.argmax(boxes[i:N, 4]))
        # swap only columns 0-4 (reference behavior; cols 5-6 stay put)
        if maxpos != i:
            tmp = boxes[i, 0:5].copy()
            boxes[i, 0:5] = boxes[maxpos, 0:5]
            boxes[maxpos, 0:5] = tmp
        # accumulators seeded from row i: coords are the max box's, the
        # ts/bs weights are the ORIGINAL row i's (reference quirk)
        mx1 = boxes[i, 0] * boxes[i, 5]
        my1 = boxes[i, 1] * boxes[i, 5]
        mx2 = boxes[i, 2] * boxes[i, 6]
        my2 = boxes[i, 3] * boxes[i, 6]
        mts, mbs = boxes[i, 5], boxes[i, 6]
        tx1, ty1, tx2, ty2 = boxes[i, 0], boxes[i, 1], boxes[i, 2], \
            boxes[i, 3]

        pos = i + 1
        while pos < N:
            x1, y1, x2, y2 = boxes[pos, 0], boxes[pos, 1], boxes[pos, 2], \
                boxes[pos, 3]
            area = (x2 - x1 + 1) * (y2 - y1 + 1)
            iw = min(tx2, x2) - max(tx1, x1) + 1
            if iw > 0:
                ih = min(ty2, y2) - max(ty1, y1) + 1
                if ih > 0:
                    ua = (tx2 - tx1 + 1) * (ty2 - ty1 + 1) + area - iw * ih
                    ov = iw * ih / ua
                    if method == 1:
                        weight = 1 - ov if ov > Nt else 1.0
                    elif method == 2:
                        weight = np.exp(-(ov * ov) / sigma)
                    else:
                        weight = 0.0 if ov > Nt else 1.0
                    mw = (1 - weight) ** weight_exp
                    mx1 += boxes[pos, 0] * boxes[pos, 5] * mw
                    my1 += boxes[pos, 1] * boxes[pos, 5] * mw
                    mx2 += boxes[pos, 2] * boxes[pos, 6] * mw
                    my2 += boxes[pos, 3] * boxes[pos, 6] * mw
                    mts += boxes[pos, 5] * mw
                    mbs += boxes[pos, 6] * mw
                    boxes[pos, 4] = weight * boxes[pos, 4]
                    if boxes[pos, 4] < threshold:
                        # tail-discard copies only columns 0-4 (quirk)
                        boxes[pos, 0:5] = boxes[N - 1, 0:5]
                        N -= 1
                        pos -= 1
            pos += 1
        boxes[i, 0] = mx1 / mts
        boxes[i, 1] = my1 / mts
        boxes[i, 2] = mx2 / mbs
        boxes[i, 3] = my2 / mbs
        i += 1
    return list(range(N))


def soft_nms_39(boxes, sigma=0.5, Nt=0.3, threshold=0.001, method=0):
    """39-column keypoint variant (reference nms.pyx:172-275): same score
    logic, rows carry bbox(4)+score+kps(34)."""
    native = _get_native()
    if native is not None and boxes.dtype == np.float32 \
            and boxes.flags["C_CONTIGUOUS"]:
        return native.soft_nms_39(boxes, sigma=float(sigma), Nt=float(Nt),
                                  threshold=float(threshold),
                                  method=int(method))
    return _soft_nms_39_numpy(boxes, sigma, Nt, threshold, method)


def _soft_nms_39_numpy(boxes, sigma=0.5, Nt=0.3, threshold=0.001, method=0):
    N = boxes.shape[0]
    i = 0
    while i < N:
        maxpos = i + int(np.argmax(boxes[i:N, 4]))
        if maxpos != i:
            boxes[[i, maxpos]] = boxes[[maxpos, i]].copy()
        tx1, ty1, tx2, ty2 = boxes[i, 0], boxes[i, 1], boxes[i, 2], boxes[i, 3]
        pos = i + 1
        while pos < N:
            x1, y1, x2, y2 = boxes[pos, 0], boxes[pos, 1], boxes[pos, 2], \
                boxes[pos, 3]
            area = (x2 - x1 + 1) * (y2 - y1 + 1)
            iw = min(tx2, x2) - max(tx1, x1) + 1
            if iw > 0:
                ih = min(ty2, y2) - max(ty1, y1) + 1
                if ih > 0:
                    ua = (tx2 - tx1 + 1) * (ty2 - ty1 + 1) + area - iw * ih
                    ov = iw * ih / ua
                    if method == 1:
                        weight = 1 - ov if ov > Nt else 1.0
                    elif method == 2:
                        weight = np.exp(-(ov * ov) / sigma)
                    else:
                        weight = 0.0 if ov > Nt else 1.0
                    boxes[pos, 4] = weight * boxes[pos, 4]
                    if boxes[pos, 4] < threshold:
                        boxes[pos] = boxes[N - 1].copy()
                        N -= 1
                        pos -= 1
            pos += 1
        i += 1
    return list(range(N))
