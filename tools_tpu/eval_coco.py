#!/usr/bin/env python
"""Standalone COCO bbox evaluation of a saved results.json
(reference tools/eval_coco.py).

Usage: python tools_tpu/eval_coco.py results.json --gt .../instances_val2017.json
"""

import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("results")
    ap.add_argument("--gt", default="data/coco/annotations/instances_val2017.json")
    ap.add_argument("--iou_type", default="bbox",
                    choices=["bbox", "keypoints"])
    args = ap.parse_args(argv)

    from codenet_tpu.data.coco_io import CocoIndex
    from codenet_tpu.eval.coco_eval import CocoDetEval
    ev = CocoDetEval(CocoIndex(args.gt), args.results,
                     iou_type=args.iou_type)
    ev.evaluate()
    return ev.summarize()


if __name__ == "__main__":
    main()
