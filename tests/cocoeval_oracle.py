"""Differential oracle for codenet_tpu.eval.coco_eval: an independent,
structure-faithful transcription of the pycocotools COCOeval protocol
(github.com/cocodataset/cocoapi, pycocotools/cocoeval.py + the loadRes
result-annotation rules from pycocotools/coco.py and the bbIou crowd
semantics from common/maskApi.c).

pycocotools itself is not installable in this image (no egress), and the
reference's scoring authority IS pycocotools (reference
lib/datasets/dataset/coco.py:121-130), so this module re-derives the
protocol from the published algorithm as a second, independently-written
implementation: flat evalImgs list indexed [catIdx*A*I + areaIdx*I +
imgIdx], per-(img,cat) IoU tables computed once and re-indexed by the
ignore-sorted gt order, the exact greedy matcher (crowd re-match allowed,
break on first ignored gt after a real match), loadRes-computed det areas,
and the accumulate() envelope/searchsorted interpolation including its
silent try/except truncation.

Test-only code: the product implementation lives in
codenet_tpu/eval/coco_eval.py and must agree with this to float precision
(tests/test_coco_oracle.py).
"""

import copy

import numpy as np

KPT_OKS_SIGMAS = np.array([
    .26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62, 1.07, 1.07,
    .87, .87, .89, .89]) / 10.0


class OracleParams:
    def __init__(self, iouType="bbox"):
        self.iouThrs = np.linspace(
            .5, 0.95, int(np.round((0.95 - .5) / .05)) + 1, endpoint=True)
        self.recThrs = np.linspace(
            .0, 1.00, int(np.round((1.00 - .0) / .01)) + 1, endpoint=True)
        if iouType == "keypoints":
            self.maxDets = [20]
            self.areaRng = [[0 ** 2, 1e5 ** 2], [32 ** 2, 96 ** 2],
                            [96 ** 2, 1e5 ** 2]]
            self.areaRngLbl = ["all", "medium", "large"]
            self.kpt_oks_sigmas = KPT_OKS_SIGMAS
        else:
            self.maxDets = [1, 10, 100]
            self.areaRng = [[0 ** 2, 1e5 ** 2], [0 ** 2, 32 ** 2],
                            [32 ** 2, 96 ** 2], [96 ** 2, 1e5 ** 2]]
            self.areaRngLbl = ["all", "small", "medium", "large"]
        self.iouType = iouType


def load_res_anns(results, iouType):
    """pycocotools COCO.loadRes: assign ids 1..N and derive area (and, for
    keypoints, a bbox) for each result record."""
    anns = copy.deepcopy(results)
    for rid, ann in enumerate(anns):
        if iouType == "bbox":
            bb = ann["bbox"]
            ann["area"] = bb[2] * bb[3]
            ann["iscrowd"] = 0
        else:  # keypoints
            s = ann["keypoints"]
            x = s[0::3]
            y = s[1::3]
            x0, x1, y0, y1 = np.min(x), np.max(x), np.min(y), np.max(y)
            ann["area"] = (x1 - x0) * (y1 - y0)
            ann["bbox"] = [x0, y0, x1 - x0, y1 - y0]
        ann["id"] = rid + 1
    return anns


def bb_iou(d, g, iscrowd):
    """maskApi.c bbIou: xywh boxes; crowd gt -> intersection / det area."""
    D, G = len(d), len(g)
    ious = np.zeros((D, G))
    for gi in range(G):
        gx, gy, gw, gh = g[gi]
        ga = gw * gh
        for di in range(D):
            dx, dy, dw, dh = d[di]
            da = dw * dh
            w = min(dx + dw, gx + gw) - max(dx, gx)
            if w <= 0:
                continue
            h = min(dy + dh, gy + gh) - max(dy, gy)
            if h <= 0:
                continue
            i = w * h
            u = da if iscrowd[gi] else da + ga - i
            ious[di, gi] = i / u
    return ious


class OracleCOCOeval:
    """COCOeval transcription over plain dict lists (no COCO object)."""

    def __init__(self, gt_dataset, results, iouType="bbox"):
        self.p = OracleParams(iouType)
        self.imgIds = sorted({im["id"] for im in gt_dataset["images"]})
        self.catIds = sorted({c["id"] for c in gt_dataset["categories"]})
        gts = copy.deepcopy(gt_dataset["annotations"])
        dts = load_res_anns(results, iouType)
        for gt in gts:
            gt["ignore"] = gt["ignore"] if "ignore" in gt else 0
            gt["ignore"] = ("iscrowd" in gt and gt["iscrowd"]) \
                or gt["ignore"]
            if iouType == "keypoints":
                gt["ignore"] = (gt["num_keypoints"] == 0) or gt["ignore"]
        self._gts = {}
        self._dts = {}
        for gt in gts:
            self._gts.setdefault(
                (gt["image_id"], gt["category_id"]), []).append(gt)
        for dt in dts:
            self._dts.setdefault(
                (dt["image_id"], dt["category_id"]), []).append(dt)
        self.evalImgs = None
        self.eval = None

    def computeIoU(self, imgId, catId):
        p = self.p
        gt = self._gts.get((imgId, catId), [])
        dt = self._dts.get((imgId, catId), [])
        if len(gt) == 0 and len(dt) == 0:
            return []
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > p.maxDets[-1]:
            dt = dt[0:p.maxDets[-1]]
        if p.iouType == "keypoints":
            return self.computeOks(dt, gt)
        d = [d["bbox"] for d in dt]
        g = [g["bbox"] for g in gt]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        return bb_iou(d, g, iscrowd)

    def computeOks(self, dts, gts):
        p = self.p
        if len(gts) == 0 or len(dts) == 0:
            return []
        ious = np.zeros((len(dts), len(gts)))
        sigmas = p.kpt_oks_sigmas
        vars_ = (sigmas * 2) ** 2
        k = len(sigmas)
        for j, gt in enumerate(gts):
            g = np.array(gt["keypoints"])
            xg, yg, vg = g[0::3], g[1::3], g[2::3]
            k1 = np.count_nonzero(vg > 0)
            bb = gt["bbox"]
            x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
            y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
            for i, dt in enumerate(dts):
                d = np.array(dt["keypoints"])
                xd, yd = d[0::3], d[1::3]
                if k1 > 0:
                    dx = xd - xg
                    dy = yd - yg
                else:
                    z = np.zeros((k))
                    dx = np.max((z, x0 - xd), axis=0) \
                        + np.max((z, xd - x1), axis=0)
                    dy = np.max((z, y0 - yd), axis=0) \
                        + np.max((z, yd - y1), axis=0)
                e = (dx ** 2 + dy ** 2) / vars_ \
                    / (gt["area"] + np.spacing(1)) / 2
                if k1 > 0:
                    e = e[vg > 0]
                ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
        return ious

    def evaluateImg(self, imgId, catId, aRng, maxDet, ious_table):
        p = self.p
        gt = self._gts.get((imgId, catId), [])
        dt = self._dts.get((imgId, catId), [])
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            if g["ignore"] or (g["area"] < aRng[0] or g["area"] > aRng[1]):
                g["_ignore"] = 1
            else:
                g["_ignore"] = 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0:maxDet]]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        ious = ious_table[:, gtind] if len(ious_table) > 0 else ious_table

        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if not len(ious) == 0:
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array([d["area"] < aRng[0] or d["area"] > aRng[1]
                      for d in dt]).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(
            dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    def evaluate(self):
        p = self.p
        ious = {(imgId, catId): self.computeIoU(imgId, catId)
                for imgId in self.imgIds for catId in self.catIds}
        maxDet = p.maxDets[-1]
        self.evalImgs = [
            self.evaluateImg(imgId, catId, areaRng, maxDet,
                             ious[imgId, catId])
            for catId in self.catIds
            for areaRng in p.areaRng
            for imgId in self.imgIds]

    def accumulate(self):
        p = self.p
        T = len(p.iouThrs)
        R = len(p.recThrs)
        K = len(self.catIds)
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        I0 = len(self.imgIds)
        A0 = len(p.areaRng)
        for k in range(K):
            Nk = k * A0 * I0
            for a in range(A):
                Na = a * I0
                for m, maxDet in enumerate(p.maxDets):
                    E = [self.evalImgs[Nk + Na + i] for i in range(I0)]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate(
                        [e["dtScores"][0:maxDet] for e in E])
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    dtIg = np.concatenate(
                        [e["dtIgnore"][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(np.logical_not(dtm),
                                         np.logical_not(dtIg))
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        tp = np.array(tp)
                        fp = np.array(fp)
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        if nd:
                            recall[t, k, a, m] = rc[-1]
                        else:
                            recall[t, k, a, m] = 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, p.recThrs, side="left")
                        try:
                            for ri, pi in enumerate(inds):
                                q[ri] = pr[pi]
                        except Exception:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
        self.eval = {"precision": precision, "recall": recall}

    def _summarize(self, ap=1, iouThr=None, areaRng="all", maxDets=100):
        p = self.p
        aind = [i for i, lbl in enumerate(p.areaRngLbl) if lbl == areaRng]
        mind = [i for i, md in enumerate(p.maxDets) if md == maxDets]
        if ap == 1:
            s = self.eval["precision"]
            if iouThr is not None:
                t = np.where(iouThr == p.iouThrs)[0]
                s = s[t]
            s = s[:, :, :, aind, mind]
        else:
            s = self.eval["recall"]
            if iouThr is not None:
                t = np.where(iouThr == p.iouThrs)[0]
                s = s[t]
            s = s[:, :, aind, mind]
        if len(s[s > -1]) == 0:
            return -1.0
        return float(np.mean(s[s > -1]))

    def summarize(self):
        if self.eval is None:
            self.accumulate()
        if self.p.iouType == "keypoints":
            md = self.p.maxDets[0]
            keys = [("AP", 1, None, "all", md), ("AP50", 1, .5, "all", md),
                    ("AP75", 1, .75, "all", md),
                    ("APm", 1, None, "medium", md),
                    ("APl", 1, None, "large", md),
                    ("AR", 0, None, "all", md), ("AR50", 0, .5, "all", md),
                    ("AR75", 0, .75, "all", md),
                    ("ARm", 0, None, "medium", md),
                    ("ARl", 0, None, "large", md)]
        else:
            keys = [("AP", 1, None, "all", 100),
                    ("AP50", 1, .5, "all", 100),
                    ("AP75", 1, .75, "all", 100),
                    ("APs", 1, None, "small", 100),
                    ("APm", 1, None, "medium", 100),
                    ("APl", 1, None, "large", 100),
                    ("AR1", 0, None, "all", 1),
                    ("AR10", 0, None, "all", 10),
                    ("AR100", 0, None, "all", 100),
                    ("ARs", 0, None, "small", 100),
                    ("ARm", 0, None, "medium", 100),
                    ("ARl", 0, None, "large", 100)]
        return {name: self._summarize(ap, thr, area, md)
                for name, ap, thr, area, md in keys}
