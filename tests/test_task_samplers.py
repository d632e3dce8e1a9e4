"""multi_pose / exdet sampler + train-step smoke on synthetic COCO data."""

import json
import os

import numpy as np
import pytest

from codenet_tpu import config as cfg

pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    import cv2
    root = str(tmp_path_factory.mktemp("coco"))
    rng = np.random.RandomState(3)
    coco_dir = os.path.join(root, "coco")
    os.makedirs(os.path.join(coco_dir, "train2017"), exist_ok=True)
    os.makedirs(os.path.join(coco_dir, "annotations"), exist_ok=True)
    images, anns_kp, anns_ex = [], [], []
    aid = 1
    for i in range(4):
        img = (rng.rand(96, 128, 3) * 80).astype(np.uint8)
        x, y, w, h = 30, 20, 50, 60
        img[y:y + h, x:x + w] = [180, 120, 200]
        fname = "%012d.jpg" % (i + 1)
        cv2.imwrite(os.path.join(coco_dir, "train2017", fname), img)
        images.append({"id": i + 1, "file_name": fname, "width": 128,
                       "height": 96})
        kps = []
        for j in range(17):
            kps += [float(x + rng.randint(0, w)),
                    float(y + rng.randint(0, h)), 2]
        anns_kp.append({"id": aid, "image_id": i + 1, "category_id": 1,
                        "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                        "num_keypoints": 17, "keypoints": kps})
        anns_ex.append({"id": aid, "image_id": i + 1, "category_id": 1,
                        "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                        "extreme_points": [x + w // 2, y, x, y + h // 2,
                                           x + w // 2, y + h - 1,
                                           x + w - 1, y + h // 2]})
        aid += 1
    cats = [{"id": 1, "name": "person"}]
    cats80 = [{"id": c, "name": str(c)} for c in range(1, 91)]
    json.dump({"images": images, "annotations": anns_kp,
               "categories": cats},
              open(os.path.join(coco_dir, "annotations",
                                "person_keypoints_train2017.json"), "w"))
    json.dump({"images": images, "annotations": anns_ex,
               "categories": cats80},
              open(os.path.join(coco_dir, "annotations",
                                "instances_extreme_train2017.json"), "w"))
    return root


def test_multi_pose_sampler_and_train_step(coco_root):
    from codenet_tpu.data.datasets import get_dataset
    from codenet_tpu.data.loader import DataLoader
    from codenet_tpu.engine.trainer import Trainer
    opt = cfg.parse("multi_pose --dataset coco_hp --arch res_18 "
                    "--input_res 64 --batch_size 2 --num_workers 1 "
                    "--num_iters 1".split())
    opt.data_dir = coco_root
    opt = cfg.update_dataset_info_and_set_heads(
        opt, cfg.DATASET_SPECS["coco_hp"])
    Dataset = get_dataset("coco_hp", "multi_pose")
    ds = Dataset(opt, "train")
    s = ds.get_sample(0)
    assert s["hm"].shape == (16, 16, 1)
    assert s["hm_hp"].shape == (16, 16, 17)
    assert s["hps"].shape == (32, 34)
    assert s["hp_ind"].shape == (32 * 17,)
    loader = DataLoader(ds, 2, shuffle=True, num_workers=1, seed=0)
    tr = Trainer(opt)
    tr.init()
    stats = tr.train(1, loader)
    assert np.isfinite(stats["loss"])
    assert stats["hp_loss"] >= 0


@pytest.mark.slow
def test_exdet_sampler_and_train_step(coco_root):
    from codenet_tpu.data.datasets import get_dataset
    from codenet_tpu.data.loader import DataLoader
    from codenet_tpu.engine.trainer import Trainer
    opt = cfg.parse("exdet --dataset coco --arch shufflenetv2 "
                    "--input_res 64 --batch_size 2 --num_workers 1 "
                    "--num_iters 1".split())
    opt.data_dir = coco_root
    opt = cfg.update_dataset_info_and_set_heads(
        opt, cfg.DATASET_SPECS["coco"])
    # synthetic annotations use split 'train'; point at extreme json
    Dataset = get_dataset("coco", "exdet")
    ds = Dataset(opt, "train")
    s = ds.get_sample(0)
    assert s["hm_t"].shape == (16, 16, 80)
    assert s["hm_c"].shape == (16, 16, 80)
    assert s["reg_mask"].sum() >= 1
    loader = DataLoader(ds, 2, shuffle=True, num_workers=1, seed=0)
    tr = Trainer(opt)
    tr.init()
    stats = tr.train(1, loader)
    assert np.isfinite(stats["loss"])
