"""End-to-end slice: train steps run + detector -> results.json -> VOC AP.

This is the reference's de-facto integration test (README command lines,
SURVEY.md §4.4) shrunk to a synthetic 4-image VOC dataset at 64x64.
"""

import json
import os

import numpy as np
import pytest

from codenet_tpu import config as cfg
from synthetic import make_voc_dataset

pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_voc_dataset(str(root))
    return str(root)


def _opt(voc_root, extra=""):
    args = ("ctdet --dataset pascal --arch shufflenetv2 --input_res 64 "
            "--batch_size 2 --num_workers 1 --num_epochs 1 "
            "--num_iters 2 --val_intervals -1 --exp_id e2etest " + extra)
    opt = cfg.parse(args.split())
    opt.data_dir = voc_root.replace("/voc", "")
    opt = cfg.update_dataset_info_and_set_heads(
        opt, cfg.DATASET_SPECS["pascal"])
    return opt


def test_sampler_targets(voc_root):
    opt = _opt(voc_root)
    from codenet_tpu.data.datasets import get_dataset
    Dataset = get_dataset("pascal", "ctdet")
    ds = Dataset(opt, "train")
    sample = ds.get_sample(0)
    assert sample["input"].shape == (64, 64, 3)
    assert sample["hm"].shape == (16, 16, 20)
    assert sample["wh"].shape == (50, 2)
    assert sample["reg_mask"].sum() >= 1
    assert sample["hm"].max() == 1.0
    # ind consistency: hm peak location == ind
    k = int(np.argmax(sample["reg_mask"]))
    ind = int(sample["ind"][k])
    y, x = ind // 16, ind % 16
    assert sample["hm"][y, x].max() == 1.0


def test_train_steps_and_loss_finite(voc_root):
    opt = _opt(voc_root)
    from codenet_tpu.data.datasets import get_dataset
    from codenet_tpu.data.loader import DataLoader
    from codenet_tpu.engine.trainer import Trainer
    Dataset = get_dataset("pascal", "ctdet")
    loader = DataLoader(Dataset(opt, "train"), 2, shuffle=True,
                        num_workers=1, seed=0)
    trainer = Trainer(opt)
    trainer.init()
    stats = trainer.train(1, loader)
    assert np.isfinite(stats["loss"])
    assert stats["hm_loss"] > 0


def test_detector_eval_pipeline(voc_root, tmp_path):
    opt = _opt(voc_root)
    opt.save_dir = str(tmp_path)
    from codenet_tpu.cli.test import prefetch_test
    res = prefetch_test(opt)
    # random weights => AP ~ 0, but format and plumbing must hold
    assert "AP50" in res
    results_path = os.path.join(str(tmp_path), "results.json")
    assert os.path.exists(results_path)
    with open(results_path) as f:
        dets = json.load(f)
    assert len(dets) == 21  # background + 20 classes
    assert len(dets[1]) == 4  # 4 images
    row = None
    for cls in range(1, 21):
        for img in dets[cls]:
            if img:
                row = img[0]
                break
        if row:
            break
    assert row is not None and len(row) == 5


def test_quant_train_step_runs(voc_root):
    opt = _opt(voc_root)
    from codenet_tpu.data.datasets import get_dataset
    from codenet_tpu.data.loader import DataLoader
    from codenet_tpu.engine.trainer import Trainer
    from codenet_tpu.models.layers import QuantSpec
    Dataset = get_dataset("pascal", "ctdet")
    loader = DataLoader(Dataset(opt, "train"), 2, shuffle=True,
                        num_workers=1, seed=0)
    trainer = Trainer(opt, qspec=QuantSpec())
    trainer.init()
    stats = trainer.train(1, loader)
    assert np.isfinite(stats["loss"])
    # EMA ranges must have moved
    qs = trainer.variables["quant_stats"]
    assert float(qs["layer0_act"]["x_max"][0]) != 0.0
