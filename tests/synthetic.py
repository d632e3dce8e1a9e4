"""Synthetic VOC-format dataset fixture: colored rectangles on noise."""

import json
import os

import numpy as np

try:
    import cv2
except ImportError:
    cv2 = None

VOC_CLASSES = ["aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
               "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
               "motorbike", "person", "pottedplant", "sheep", "sofa",
               "train", "tvmonitor"]


def make_voc_dataset(root, num_images=4, img_w=128, img_h=96, seed=0):
    """Write <root>/voc/{images,annotations}/ with deterministic boxes."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "voc", "images")
    ann_dir = os.path.join(root, "voc", "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        img = (rng.rand(img_h, img_w, 3) * 60).astype(np.uint8)
        n_obj = rng.randint(1, 4)
        for _ in range(n_obj):
            w = rng.randint(16, img_w // 2)
            h = rng.randint(16, img_h // 2)
            x = rng.randint(0, img_w - w)
            y = rng.randint(0, img_h - h)
            cls = int(rng.randint(0, 20))
            color = [int(60 + cls * 9) % 255, 200, (cls * 37) % 255]
            img[y:y + h, x:x + w] = color
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": cls + 1,
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h), "iscrowd": 0, "difficult": 0,
            })
            ann_id += 1
        fname = "{:06d}.jpg".format(i + 1)
        cv2.imwrite(os.path.join(img_dir, fname), img)
        images.append({"id": i + 1, "file_name": fname,
                       "width": img_w, "height": img_h})

    categories = [{"id": j + 1, "name": n}
                  for j, n in enumerate(VOC_CLASSES)]
    db = {"images": images, "annotations": annotations,
          "categories": categories}
    for split in ("trainval0712", "test2007"):
        with open(os.path.join(ann_dir,
                               "pascal_{}.json".format(split)), "w") as f:
            json.dump(db, f)
    return os.path.join(root, "voc")
