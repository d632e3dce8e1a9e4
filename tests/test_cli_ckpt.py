"""Checkpoint-writing semantics of the training CLI (reference
main.py:68-97): model_best is written ONLY on val-metric improvement,
--save_all writes model_<epoch> instead of rolling model_last."""

import os

import pytest

from codenet_tpu import config as cfg
from synthetic import make_voc_dataset

pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_voc_dataset(str(root))
    return str(root)


def _run(voc_root, tmp_path, monkeypatch, val_losses, extra=""):
    """Drive cli.main.run_training with stubbed train/val/ckpt IO and
    record every checkpoint write (path -> list of (epoch, val-state))."""
    from codenet_tpu.cli import main as cli_main
    from codenet_tpu.engine import checkpoint
    from codenet_tpu.engine.trainer import Trainer

    writes = []

    monkeypatch.setattr(Trainer, "init", lambda self, *a, **k: None)
    monkeypatch.setattr(Trainer, "train",
                        lambda self, epoch, loader, **k: {"loss": 1.0})
    it = iter(val_losses)
    monkeypatch.setattr(
        Trainer, "val",
        lambda self, epoch, loader, **k: ({"loss": next(it)}, {}))
    monkeypatch.setattr(
        checkpoint, "save_model",
        lambda path, epoch, variables, opt_state=None:
            writes.append((os.path.basename(path), epoch)))

    args = ("ctdet --dataset pascal --arch shufflenetv2 --input_res 64 "
            "--batch_size 2 --num_workers 1 --num_epochs 3 --num_iters 1 "
            "--val_intervals 1 --exp_id ckpttest " + extra)
    opt = cfg.parse(args.split())
    opt.data_dir = voc_root.replace("/voc", "")
    opt.save_dir = str(tmp_path)
    # stub the post-training eval (separate code path, covered elsewhere)
    monkeypatch.setattr("codenet_tpu.cli.test.prefetch_test",
                        lambda o: None)
    cli_main.run_training(opt)
    return writes


def test_model_best_only_on_improvement(voc_root, tmp_path, monkeypatch):
    # val loss improves at epoch 1, worsens at 2, improves at 3
    writes = _run(voc_root, tmp_path, monkeypatch, [5.0, 9.0, 2.0])
    best = [e for name, e in writes if name == "model_best.ckpt"]
    assert best == [1, 3]  # epoch 2 (worse val) must NOT clobber best
    last = [e for name, e in writes if name == "model_last.ckpt"]
    assert last == [1, 2, 3]


def test_save_all_writes_per_epoch(voc_root, tmp_path, monkeypatch):
    writes = _run(voc_root, tmp_path, monkeypatch, [5.0, 9.0, 2.0],
                  extra="--save_all")
    names = [name for name, _ in writes]
    assert "model_1.ckpt" in names and "model_2.ckpt" in names \
        and "model_3.ckpt" in names
    assert "model_last.ckpt" not in names
    assert [e for name, e in writes if name == "model_best.ckpt"] == [1, 3]
