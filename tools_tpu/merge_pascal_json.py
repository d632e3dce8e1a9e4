#!/usr/bin/env python
"""Merge VOC2007+VOC2012 trainval COCO-format jsons into pascal_trainval0712
(reference tools/merge_pascal_json.py).

Usage: python tools_tpu/merge_pascal_json.py a.json b.json ... --out merged.json
"""

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    out = {"images": [], "annotations": [], "categories": None}
    img_offset = 0
    ann_offset = 0
    for path in args.inputs:
        with open(path) as f:
            db = json.load(f)
        if out["categories"] is None:
            out["categories"] = db["categories"]
        id_map = {}
        for img in db["images"]:
            new_id = img["id"] + img_offset
            id_map[img["id"]] = new_id
            img = dict(img)
            img["id"] = new_id
            out["images"].append(img)
        for ann in db["annotations"]:
            ann = dict(ann)
            ann["id"] = ann["id"] + ann_offset
            ann["image_id"] = id_map[ann["image_id"]]
            out["annotations"].append(ann)
        img_offset = max((i["id"] for i in out["images"]), default=0) + 1
        ann_offset = max((a["id"] for a in out["annotations"]), default=0) + 1
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out}: {len(out['images'])} images, "
          f"{len(out['annotations'])} annotations")


if __name__ == "__main__":
    main()
