"""Synthetic KITTI-format fixture for the ddd task (VERDICT r1 #8).

Writes the exact layout KITTI(BaseDataset) + kitti_eval expect:
  <root>/kitti/images/trainval/*.png
  <root>/kitti/annotations/kitti_3dop_{train,val}.json  (COCO-format with
      per-image `calib` and per-ann alpha/depth/dim, the fields the ddd
      sampler consumes — reference lib/datasets/sample/ddd.py)
  <root>/kitti/training/label_2/*.txt                   (GT labels for the
      offline evaluator — reference tools/kitti_eval)

Boxes are geometrically consistent: a 3D box (dim, location, rot_y) is
projected through the calibration to produce the 2D bbox, so the
decode -> ddd_post_process -> back-projection path round-trips sanely.
"""

import json
import os

import numpy as np

try:
    import cv2
except ImportError:
    cv2 = None

CLASS_NAMES = ["Pedestrian", "Car", "Cyclist"]
DIMS = {  # (h, w, l) class priors
    "Pedestrian": (1.76, 0.66, 0.84),
    "Car": (1.53, 1.63, 3.88),
    "Cyclist": (1.74, 0.60, 1.76),
}


def _project(pts_3d, calib):
    """(N, 3) camera coords -> (N, 2) pixels through P2 (3x4)."""
    pts = np.concatenate([pts_3d, np.ones((len(pts_3d), 1))], axis=1)
    proj = pts @ calib.T
    return proj[:, :2] / proj[:, 2:3]


def _box_3d_corners(dim, loc, ry):
    h, w, l = dim
    x = [l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2]
    y = [0, 0, 0, 0, -h, -h, -h, -h]
    z = [w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2]
    c, s = np.cos(ry), np.sin(ry)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    corners = (R @ np.array([x, y, z])).T + np.asarray(loc)
    return corners


def make_kitti_dataset(root, num_images=4, img_w=512, img_h=160, seed=0):
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "kitti", "images", "trainval")
    ann_dir = os.path.join(root, "kitti", "annotations")
    label_dir = os.path.join(root, "kitti", "training", "label_2")
    for d in (img_dir, ann_dir, label_dir):
        os.makedirs(d, exist_ok=True)

    f = 320.0
    calib = np.array([[f, 0, img_w / 2.0, 0],
                      [0, f, img_h / 2.0, 0],
                      [0, 0, 1, 0]], dtype=np.float64)

    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        img_id = i + 1
        img = (rng.rand(img_h, img_w, 3) * 50).astype(np.uint8)
        label_lines = []
        for _ in range(rng.randint(1, 3)):
            cls_ind = int(rng.randint(0, 3))
            name = CLASS_NAMES[cls_ind]
            dim = DIMS[name]
            z = rng.uniform(8.0, 25.0)
            x = rng.uniform(-0.25, 0.25) * z  # keep inside the frustum
            y = 1.6  # ground plane (camera ~1.6 m up)
            ry = rng.uniform(-np.pi, np.pi)
            corners = _box_3d_corners(dim, (x, y, z), ry)
            pix = _project(corners, calib)
            x1, y1 = pix.min(axis=0)
            x2, y2 = pix.max(axis=0)
            x1, y1 = max(x1, 0.0), max(y1, 0.0)
            x2 = min(x2, img_w - 1.0)
            y2 = min(y2, img_h - 1.0)
            if x2 - x1 < 8 or y2 - y1 < 8:
                continue
            alpha = ry - np.arctan2(x, z)
            alpha = (alpha + np.pi) % (2 * np.pi) - np.pi
            color = [int(80 + cls_ind * 60), 180, (cls_ind * 80 + 40) % 255]
            img[int(y1):int(y2), int(x1):int(x2)] = color
            annotations.append({
                "id": ann_id, "image_id": img_id,
                "category_id": cls_ind + 1,
                "bbox": [float(x1), float(y1),
                         float(x2 - x1), float(y2 - y1)],
                "area": float((x2 - x1) * (y2 - y1)), "iscrowd": 0,
                "alpha": float(alpha), "depth": float(z),
                "dim": [float(d) for d in dim],
                "rotation_y": float(ry),
                "location": [float(x), float(y), float(z)],
                "truncated": 0, "occluded": 0,
            })
            label_lines.append(
                "{} 0.00 0 {:.2f} {:.2f} {:.2f} {:.2f} {:.2f} "
                "{:.2f} {:.2f} {:.2f} {:.2f} {:.2f} {:.2f} {:.2f}".format(
                    name, alpha, x1, y1, x2, y2,
                    dim[0], dim[1], dim[2], x, y, z, ry))
            ann_id += 1
        fname = "{:06d}.png".format(img_id)
        cv2.imwrite(os.path.join(img_dir, fname), img)
        with open(os.path.join(label_dir,
                               "{:06d}.txt".format(img_id)), "w") as fh:
            fh.write("\n".join(label_lines) + "\n")
        images.append({"id": img_id, "file_name": fname,
                       "width": img_w, "height": img_h,
                       "calib": calib.tolist()})

    categories = [{"id": j + 1, "name": n}
                  for j, n in enumerate(CLASS_NAMES)]
    db = {"images": images, "annotations": annotations,
          "categories": categories}
    for split in ("train", "val"):
        with open(os.path.join(
                ann_dir, "kitti_3dop_{}.json".format(split)), "w") as fh:
            json.dump(db, fh)
    return os.path.join(root, "kitti")
