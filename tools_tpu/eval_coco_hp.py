#!/usr/bin/env python
"""Standalone COCO keypoint evaluation of a saved results.json
(reference tools/eval_coco_hp.py — which scores OKS keypoints and then
bbox on the same file). In-process numpy COCOeval; no pycocotools.

Usage: python tools_tpu/eval_coco_hp.py results.json \
    --gt .../person_keypoints_val2017.json
"""

import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("results")
    ap.add_argument("--gt",
                    default="data/coco/annotations/"
                            "person_keypoints_val2017.json")
    args = ap.parse_args(argv)

    from codenet_tpu.data.coco_io import CocoIndex
    from codenet_tpu.eval.coco_eval import CocoDetEval

    gt = CocoIndex(args.gt)
    stats = {}
    for iou_type in ("keypoints", "bbox"):
        ev = CocoDetEval(gt, args.results, iou_type=iou_type)
        ev.evaluate()
        stats[iou_type] = ev.summarize()
    return stats


if __name__ == "__main__":
    main()
