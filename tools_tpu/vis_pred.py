#!/usr/bin/env python
"""Side-by-side prediction vs ground-truth viewer (reference tools/vis_pred.py).

Reads a Pascal-format results.json + the GT json, draws both on each image,
writes <out_dir>/<img>_pred.png and _gt.png (no GUI dependency).

Usage:
  python tools_tpu/vis_pred.py results.json --gt .../pascal_test2007.json \
      --img_dir data/voc/images --out_dir vis/ [--thresh 0.3]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    import cv2
    from codenet_tpu.data.coco_io import CocoIndex
    from codenet_tpu.utils.debugger import Debugger

    ap = argparse.ArgumentParser()
    ap.add_argument("results")
    ap.add_argument("--gt", required=True)
    ap.add_argument("--img_dir", required=True)
    ap.add_argument("--out_dir", default="vis")
    ap.add_argument("--thresh", type=float, default=0.3)
    ap.add_argument("--dataset", default="pascal")
    args = ap.parse_args(argv)

    with open(args.results) as f:
        dets = json.load(f)
    gt = CocoIndex(args.gt)
    img_ids = sorted(gt.getImgIds())
    os.makedirs(args.out_dir, exist_ok=True)

    dbg = Debugger(dataset=args.dataset)
    for i, img_id in enumerate(img_ids):
        info = gt.loadImgs(ids=[img_id])[0]
        img = cv2.imread(os.path.join(args.img_dir, info["file_name"]))
        if img is None:
            continue
        dbg.add_img(img, img_id="pred")
        for cls in range(1, len(dets)):
            for box in dets[cls][i]:
                if box[4] > args.thresh:
                    dbg.add_coco_bbox(box[:4], cls - 1, box[4],
                                      img_id="pred")
        dbg.add_img(img, img_id="gt")
        for ann in gt.loadAnns(gt.getAnnIds(imgIds=[img_id])):
            x, y, w, h = ann["bbox"]
            dbg.add_coco_bbox([x, y, x + w, y + h],
                              ann["category_id"] - 1, 1.0, img_id="gt")
        dbg.save_all_imgs(args.out_dir,
                          prefix=os.path.splitext(info["file_name"])[0]
                          + "_")
    print(f"wrote visualizations to {args.out_dir}")


if __name__ == "__main__":
    main()
