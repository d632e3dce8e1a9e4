"""Differential validation of codenet_tpu.eval.coco_eval against an
independent transcription of the pycocotools protocol (VERDICT r3 #4).

pycocotools cannot be installed here (no egress), so the authority is
tests/cocoeval_oracle.py — a second, independently-structured
implementation transcribed from the published cocoapi algorithm (flat
evalImgs indexing, loadRes area derivation, greedy matcher quirks). The
product evaluator must agree with it to float precision on randomized
crowd/ignore/area/maxDet-heavy scenarios, bbox AND keypoints.
"""

import numpy as np
import pytest

from codenet_tpu.data.coco_io import CocoIndex
from codenet_tpu.eval.coco_eval import CocoDetEval

from cocoeval_oracle import OracleCOCOeval


def _make_bbox_scenario(seed, n_images=8, n_cats=4):
    """GT + results spanning small/medium/large areas, crowds, empty
    images, and >10 dets per (img,cat) so maxDets=1/10/100 all bind."""
    rng = np.random.RandomState(seed)
    images = [{"id": i + 1, "width": 640, "height": 480}
              for i in range(n_images)]
    categories = [{"id": c + 1, "name": f"c{c}"} for c in range(n_cats)]
    anns, results = [], []
    ann_id = 1
    for im in images:
        if im["id"] == n_images:  # last image: dets but no GT
            n_gt = 0
        else:
            n_gt = rng.randint(0, 7)
        gt_boxes = []
        for _ in range(n_gt):
            # size classes: tiny (<32^2), medium, large (>96^2)
            side_lo, side_hi = [(4, 30), (34, 90), (100, 200)][
                rng.randint(3)]
            w = rng.uniform(side_lo, side_hi)
            h = rng.uniform(side_lo, side_hi)
            x = rng.uniform(0, 640 - w)
            y = rng.uniform(0, 480 - h)
            cat = int(rng.randint(n_cats)) + 1
            crowd = int(rng.rand() < 0.15)
            anns.append({"id": ann_id, "image_id": im["id"],
                         "category_id": cat,
                         "bbox": [x, y, w, h], "area": w * h,
                         "iscrowd": crowd})
            gt_boxes.append((x, y, w, h, cat))
            ann_id += 1
        # jittered true positives (0-3 per GT)
        for (x, y, w, h, cat) in gt_boxes:
            for _ in range(rng.randint(0, 4)):
                jx = x + rng.randn() * w * 0.15
                jy = y + rng.randn() * h * 0.15
                jw = max(2.0, w * (1 + rng.randn() * 0.2))
                jh = max(2.0, h * (1 + rng.randn() * 0.2))
                results.append({"image_id": im["id"], "category_id": cat,
                                "bbox": [jx, jy, jw, jh],
                                "score": float(rng.rand())})
        # false positives, enough to exceed maxDet=10 on some (img,cat)
        for _ in range(rng.randint(5, 18)):
            w = rng.uniform(4, 150)
            h = rng.uniform(4, 150)
            results.append({"image_id": im["id"],
                            "category_id": int(rng.randint(n_cats)) + 1,
                            "bbox": [rng.uniform(0, 640 - w),
                                     rng.uniform(0, 480 - h), w, h],
                            "score": float(rng.rand())})
    gt = {"images": images, "annotations": anns, "categories": categories}
    return gt, results


def _make_kps_scenario(seed, n_images=6):
    rng = np.random.RandomState(seed)
    images = [{"id": i + 1, "width": 640, "height": 480}
              for i in range(n_images)]
    categories = [{"id": 1, "name": "person"}]
    anns, results = [], []
    ann_id = 1
    for im in images:
        for _ in range(rng.randint(0, 4)):
            w = rng.uniform(40, 250)
            h = rng.uniform(60, 300)
            x = rng.uniform(0, 640 - w)
            y = rng.uniform(0, 480 - h)
            v = rng.choice([0, 1, 2], size=17,
                           p=[0.25, 0.25, 0.5]).astype(float)
            if rng.rand() < 0.2:
                v[:] = 0  # num_keypoints == 0 -> ignored GT, k1==0 branch
            kx = x + rng.rand(17) * w
            ky = y + rng.rand(17) * h
            kps = np.stack([kx, ky, v], axis=1).reshape(-1).tolist()
            anns.append({"id": ann_id, "image_id": im["id"],
                         "category_id": 1, "bbox": [x, y, w, h],
                         "area": w * h, "iscrowd": 0,
                         "num_keypoints": int((v > 0).sum()),
                         "keypoints": kps})
            ann_id += 1
            for _ in range(rng.randint(0, 3)):  # jittered det
                dx = kx + rng.randn(17) * w * 0.05
                dy = ky + rng.randn(17) * h * 0.05
                dkps = np.stack(
                    [dx, dy, np.full(17, 1.0)], axis=1).reshape(-1)
                results.append({"image_id": im["id"], "category_id": 1,
                                "keypoints": dkps.tolist(),
                                "score": float(rng.rand())})
        for _ in range(rng.randint(2, 8)):  # random det
            dx = rng.uniform(0, 640, 17)
            dy = rng.uniform(0, 480, 17)
            dkps = np.stack(
                [dx, dy, np.full(17, 1.0)], axis=1).reshape(-1)
            results.append({"image_id": im["id"], "category_id": 1,
                            "keypoints": dkps.tolist(),
                            "score": float(rng.rand())})
    gt = {"images": images, "annotations": anns, "categories": categories}
    return gt, results


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_bbox_eval_matches_pycocotools_protocol(seed):
    gt, results = _make_bbox_scenario(seed)
    oracle = OracleCOCOeval(gt, results, "bbox")
    oracle.evaluate()
    oracle.accumulate()
    expect = oracle.summarize()

    ours = CocoDetEval(CocoIndex(gt), results, "bbox")
    ours.evaluate()
    ours.accumulate()
    got = ours.summarize()

    # full tensors, not just the 12-number summary
    np.testing.assert_allclose(ours.precision,
                               oracle.eval["precision"], atol=1e-10)
    np.testing.assert_allclose(ours.recall,
                               oracle.eval["recall"], atol=1e-10)
    assert set(got) == set(expect)
    for k in expect:
        np.testing.assert_allclose(got[k], expect[k], atol=1e-10,
                                   err_msg=k)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_keypoints_eval_matches_pycocotools_protocol(seed):
    gt, results = _make_kps_scenario(seed)
    oracle = OracleCOCOeval(gt, results, "keypoints")
    oracle.evaluate()
    oracle.accumulate()
    expect = oracle.summarize()

    ours = CocoDetEval(CocoIndex(gt), results, "keypoints")
    ours.evaluate()
    ours.accumulate()
    got = ours.summarize()

    np.testing.assert_allclose(ours.precision,
                               oracle.eval["precision"], atol=1e-10)
    np.testing.assert_allclose(ours.recall,
                               oracle.eval["recall"], atol=1e-10)
    for k in expect:
        np.testing.assert_allclose(got[k], expect[k], atol=1e-10,
                                   err_msg=k)


def test_bbox_eval_crowd_and_maxdet_binding():
    """Deterministic scenario pinning the crowd re-match and maxDets=1:
    one crowd GT absorbing two dets, one real GT, three dets."""
    gt = {"images": [{"id": 1, "width": 640, "height": 480}],
          "categories": [{"id": 1, "name": "c"}],
          "annotations": [
              {"id": 1, "image_id": 1, "category_id": 1,
               "bbox": [0, 0, 100, 100], "area": 10000.0, "iscrowd": 1},
              {"id": 2, "image_id": 1, "category_id": 1,
               "bbox": [300, 300, 50, 50], "area": 2500.0, "iscrowd": 0}]}
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [5, 5, 90, 90],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 80, 80],
         "score": 0.8},  # second det on the same crowd: also ignored
        {"image_id": 1, "category_id": 1, "bbox": [302, 301, 49, 51],
         "score": 0.7}]
    oracle = OracleCOCOeval(gt, results, "bbox")
    oracle.evaluate()
    oracle.accumulate()
    expect = oracle.summarize()
    ours = CocoDetEval(CocoIndex(gt), results, "bbox")
    ours.evaluate()
    ours.accumulate()
    got = ours.summarize()
    for k in expect:
        np.testing.assert_allclose(got[k], expect[k], atol=1e-10,
                                   err_msg=k)
    # crowd ignored, real GT matched at every threshold up to its IoU
    np.testing.assert_allclose(got["AP50"], 1.0, atol=1e-12)
    # maxDets=1 keeps only the crowd-ignored 0.9 det -> zero recall@1
    assert got["AR1"] == 0.0
