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
    # device-normalize mode ships the warped uint8 image + aug state and
    # the sparse heatmap object list (rendered on device)
    assert sample["input_u8"].shape == (64, 64, 3)
    assert sample["input_u8"].dtype == np.uint8
    assert sample["aug_alphas"].shape == (3,)
    assert sample["hm_ct"].shape == (50, 2)
    assert sample["wh"].shape == (50, 2)
    assert sample["reg_mask"].sum() >= 1
    from codenet_tpu.data.device_aug import render_umich_hm
    hm = np.asarray(render_umich_hm(
        sample["hm_ct"][None], sample["hm_radius"][None],
        sample["hm_cls"][None], sample["reg_mask"][None], 16, 16, 20))[0]
    assert hm.shape == (16, 16, 20)
    assert hm.max() == 1.0
    # ind consistency: hm peak location == ind
    k = int(np.argmax(sample["reg_mask"]))
    ind = int(sample["ind"][k])
    y, x = ind // 16, ind % 16
    assert hm[y, x].max() == 1.0

    # --host_normalize restores the reference's f32 + dense-hm path, and
    # the host-drawn hm must equal the device render
    opt_host = _opt(voc_root, "--host_normalize")
    host_sample = get_dataset("pascal", "ctdet")(
        opt_host, "train").get_sample(0)
    assert host_sample["input"].shape == (64, 64, 3)
    assert host_sample["input"].dtype == np.float32
    assert host_sample["hm"].shape == (16, 16, 20)


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_device_vs_host_input_parity(voc_root):
    """Same seeds => the device-preprocessed input equals the host path's
    f32 'input' (the two modes share one random stream by construction)."""
    import random
    from codenet_tpu.data.datasets import get_dataset
    from codenet_tpu.data.device_aug import device_preprocess

    DS = get_dataset("pascal", "ctdet")
    random.seed(11)
    np.random.seed(11)
    host = DS(_opt(voc_root, "--host_normalize"), "train").get_sample(1)
    random.seed(11)
    np.random.seed(11)
    dev = DS(_opt(voc_root), "train").get_sample(1)
    from codenet_tpu import config as cfg
    spec = cfg.DATASET_SPECS["pascal"]
    out = device_preprocess(
        dev["input_u8"][None], np.array([dev["aug_perm"]], np.int32),
        dev["aug_alphas"][None], dev["aug_light"][None],
        np.asarray(spec["mean"]).reshape(3), np.asarray(spec["std"])
        .reshape(3))
    np.testing.assert_allclose(np.asarray(out[0]), host["input"],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_train_debug_renders_images(voc_root):
    """--debug 2 during training must dump pred-vs-GT renders (reference
    trains/ctdet.py:85-120 via base_trainer.py:93-94; VERDICT r2 next-#4)."""
    import glob
    from codenet_tpu.data.datasets import get_dataset
    from codenet_tpu.data.loader import DataLoader
    from codenet_tpu.engine.trainer import Trainer

    opt = _opt(voc_root, "--debug 2 --exp_id dbgtest")
    Dataset = get_dataset("pascal", "ctdet")
    loader = DataLoader(Dataset(opt, "train"), 2, shuffle=False,
                        num_workers=1)
    trainer = Trainer(opt)
    trainer.init()
    trainer.train(1, loader)
    imgs = glob.glob(os.path.join(opt.debug_dir, "*.png")) + \
        glob.glob(os.path.join(opt.debug_dir, "*.jpg"))
    names = [os.path.basename(p) for p in imgs]
    assert any("pred_hm" in n for n in names), names
    assert any("gt_hm" in n for n in names), names
    assert any("out_pred" in n for n in names), names


def test_val_returns_decoded_results_for_map(voc_root):
    """trainer.val returns (stats, results) and --test fills results with
    back-projected per-class detections the dataset evaluator accepts
    (reference main.py:51-54 + trains/ctdet.py:122-132)."""
    from codenet_tpu.data.datasets import get_dataset
    from codenet_tpu.data.loader import DataLoader
    from codenet_tpu.engine.trainer import Trainer

    opt = _opt(voc_root, "--test --exp_id valtest")
    Dataset = get_dataset("pascal", "ctdet")
    ds = Dataset(opt, "val")
    loader = DataLoader(ds, 1, shuffle=False, num_workers=1)
    trainer = Trainer(opt)
    trainer.init()
    stats, results = trainer.val(0, loader)
    assert "loss" in stats
    assert len(results) == len(ds)
    one = next(iter(results.values()))
    # per-class dict of (n, 5) box lists, 1-based class ids
    assert set(one.keys()) == set(range(1, 21))
    arr = np.asarray(one[1], dtype=np.float32).reshape(-1, 5)
    assert arr.shape[1] == 5
    # and the dataset evaluator accepts them end-to-end
    out = os.path.join(opt.save_dir, "valmap")
    os.makedirs(out, exist_ok=True)
    ds.run_eval(results, out)
    assert os.path.exists(os.path.join(out, "results.json"))


def test_eval_trace_capture(voc_root, tmp_path):
    """--trace captures a jax.profiler trace of the eval loop."""
    opt = _opt(voc_root, "--trace")
    opt.save_dir = str(tmp_path)
    opt.debug_dir = str(tmp_path)
    from codenet_tpu.cli.test import prefetch_test
    prefetch_test(opt)
    trace_dir = os.path.join(str(tmp_path), "trace")
    assert os.path.isdir(trace_dir)
    found = []
    for root, _, files in os.walk(trace_dir):
        found += files
    assert found, "no trace files written"


@pytest.mark.slow
def test_train_trace_capture(voc_root, tmp_path):
    """--trace also wraps the training loop (jax.profiler capture)."""
    from codenet_tpu.cli.main import run_training

    opt = _opt(voc_root, "--trace --exp_id tracetrain")
    opt.debug_dir = str(tmp_path)
    opt.save_dir = str(tmp_path)
    run_training(opt)
    trace_dir = os.path.join(str(tmp_path), "trace")
    assert os.path.isdir(trace_dir)
    found = []
    for root, _, files in os.walk(trace_dir):
        found += files
    assert found, "no trace files written"
