"""multi_pose (COCO keypoints) end-to-end slice: train -> detector ->
COCOeval OKS.

Closes the CLI-drive gap for the pose family: the sampler consumes real
keypoint annotations, the detector round-trips through
multi_pose_post_process (keypoint back-projection), and the in-process
COCOeval scores the results.json keypoints format (reference
coco_hp.py:90-120 semantics).
"""

import json
import os

import numpy as np
import pytest

from codenet_tpu import config as cfg

pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    import cv2
    root = str(tmp_path_factory.mktemp("cocohp"))
    rng = np.random.RandomState(5)
    coco_dir = os.path.join(root, "coco")
    for split in ("train2017", "val2017"):
        os.makedirs(os.path.join(coco_dir, split), exist_ok=True)
    os.makedirs(os.path.join(coco_dir, "annotations"), exist_ok=True)
    for split in ("train", "val"):
        images, anns = [], []
        for i in range(3):
            img = (rng.rand(96, 128, 3) * 80).astype(np.uint8)
            x, y, w, h = 30, 20, 50, 60
            img[y:y + h, x:x + w] = [180, 120, 200]
            fname = "%012d.jpg" % (i + 1)
            cv2.imwrite(os.path.join(coco_dir, split + "2017", fname), img)
            images.append({"id": i + 1, "file_name": fname, "width": 128,
                           "height": 96})
            kps = []
            for j in range(17):
                kps += [float(x + rng.randint(0, w)),
                        float(y + rng.randint(0, h)), 2]
            anns.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                         "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                         "num_keypoints": 17, "keypoints": kps})
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "person",
                                   "keypoints": ["k%d" % j
                                                 for j in range(17)],
                                   "skeleton": []}]},
                  open(os.path.join(
                      coco_dir, "annotations",
                      "person_keypoints_%s2017.json" % split), "w"))
    return root


@pytest.mark.slow
def test_multipose_train_and_eval(coco_root, tmp_path):
    args = ("multi_pose --dataset coco_hp --arch shufflenetv2 "
            "--input_res 64 --batch_size 2 --num_workers 1 "
            "--num_epochs 1 --num_iters 2 --val_intervals -1 "
            "--exp_id mp_e2e").split()
    opt = cfg.parse(args, root_dir=str(tmp_path))
    opt.data_dir = coco_root
    from codenet_tpu.cli.main import run_training
    run_training(opt)
    ckpt = os.path.join(opt.save_dir, "model_last.ckpt")
    assert os.path.exists(ckpt)

    eval_opt = cfg.parse(args + ["--load_model", ckpt],
                         root_dir=str(tmp_path))
    eval_opt.data_dir = coco_root
    from codenet_tpu.cli.test import prefetch_test
    stats = prefetch_test(eval_opt)
    # COCOeval keypoints summary dict: AP/AR values in [-1, 1]
    assert isinstance(stats, dict) and {"AP", "AP50", "AR"} <= stats.keys()
    for k, v in stats.items():
        assert -1.0 <= float(v) <= 1.0, (k, v)
    # results.json holds 51-float keypoints entries
    with open(os.path.join(eval_opt.save_dir, "results.json")) as f:
        dets = json.load(f)
    assert dets and len(dets[0]["keypoints"]) == 51
