#!/usr/bin/env python
"""Convert KITTI label txts + calib to the COCO-format json the ddd task
reads (reference tools/convert_kitti_to_coco.py: images carry their 3x4
calibration; annotations carry alpha/depth/dim/rotation_y/truncation/
occlusion alongside the 2D bbox).

Usage:
  python tools_tpu/convert_kitti_to_coco.py --kitti_dir data/kitti \
      --split_file .../train.txt --out data/kitti/annotations/kitti_3dop_train.json
"""

import argparse
import json
import os

CATS = ["Pedestrian", "Car", "Cyclist"]
CAT_IDS = {"Pedestrian": 1, "Car": 2, "Cyclist": 3, "Van": 4,
           "Truck": 5, "Person_sitting": 6, "Tram": 7, "Misc": 8,
           "DontCare": 9}


def read_calib(path):
    with open(path) as f:
        for line in f:
            if line.startswith("P2:"):
                vals = [float(v) for v in line.split()[1:]]
                return [vals[0:4], vals[4:8], vals[8:12]]
    raise ValueError(f"no P2 in {path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--kitti_dir", default="data/kitti")
    ap.add_argument("--split_file", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--img_w", type=int, default=1242)
    ap.add_argument("--img_h", type=int, default=375)
    args = ap.parse_args(argv)

    with open(args.split_file) as f:
        ids = [line.strip() for line in f if line.strip()]

    images, annotations = [], []
    ann_id = 1
    label_dir = os.path.join(args.kitti_dir, "training", "label_2")
    calib_dir = os.path.join(args.kitti_dir, "training", "calib")
    for sid in ids:
        img_id = int(sid)
        calib = read_calib(os.path.join(calib_dir, sid + ".txt"))
        images.append({"id": img_id, "file_name": sid + ".png",
                       "width": args.img_w, "height": args.img_h,
                       "calib": calib})
        with open(os.path.join(label_dir, sid + ".txt")) as f:
            for line in f:
                p = line.strip().split(" ")
                if len(p) < 15 or p[0] not in CAT_IDS:
                    continue
                x1, y1, x2, y2 = map(float, p[4:8])
                annotations.append({
                    "id": ann_id, "image_id": img_id,
                    "category_id": CAT_IDS[p[0]],
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "iscrowd": 0,
                    "truncated": float(p[1]),
                    "occluded": int(float(p[2])),
                    "alpha": float(p[3]),
                    "dim": [float(p[8]), float(p[9]), float(p[10])],
                    "location": [float(p[11]), float(p[12]), float(p[13])],
                    "depth": float(p[13]),
                    "rotation_y": float(p[14]),
                })
                ann_id += 1

    categories = [{"id": i, "name": n} for n, i in CAT_IDS.items()]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    print(f"wrote {args.out}: {len(images)} images, "
          f"{len(annotations)} annotations")


if __name__ == "__main__":
    main()
