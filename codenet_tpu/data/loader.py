"""Batched, prefetching data loader (host side).

Replaces torch DataLoader + worker processes (reference main.py:45-62,
test.py:57-63): a pool of `num_workers` threads maps the numpy samplers
(cv2 releases the GIL for the warp work, numpy for large copies), batches
into fixed-shape numpy dicts (static shapes => one XLA program), and
prefetches ahead of the device. Batch order is deterministic regardless of
worker count: workers pull batch indices from a shared queue and publish
results into per-batch slots that the consumer drains in order.

Determinism: each batch gets its own np.random.RandomState seeded from
(loader seed, epoch, batch index), passed into `get_sample` — augmentation
draws are independent of worker-thread scheduling at any worker count
(the reference's torch DataLoader got this from forked per-worker RNGs;
its single-process path had the same shared-stream caveat this replaces).
`deterministic=False` restores the legacy shared global np.random stream
(bit-exact with the reference's single-worker draws).
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def _stack_samples(samples):
    """Stack a list of sample dicts into one batch dict (meta excluded)."""
    out = {}
    for k in samples[0]:
        if k == "meta":
            out["meta"] = [s["meta"] for s in samples]
        else:
            out[k] = np.stack([s[k] for s in samples], axis=0)
    return out


class DataLoader:
    def __init__(self, dataset, batch_size, shuffle=False, num_workers=4,
                 drop_last=None, seed=0, prefetch=3, deterministic=True,
                 shard_ranges=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        # static shapes: always drop ragged last batch when training
        self.drop_last = shuffle if drop_last is None else drop_last
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch
        self.deterministic = deterministic
        self._epoch = 0
        # Sharded-cache routing (device_cache.py to_device(shard=True)):
        # shard_ranges = per-mesh-shard (lo, hi) dataset-index ranges.
        # Batch slot-block s (the rows GSPMD places on mesh device s) is
        # drawn only from range s, so the device-local row gather never
        # needs another shard's cache rows. This is a sampling deviation
        # from the reference's global shuffle: every batch is a fixed
        # stratified draw of batch/d images per shard, shuffling happens
        # WITHIN each contiguous shard, and each epoch truncates to the
        # smallest shard (larger shards drop proportionally more images,
        # so full coverage holds only in expectation across epochs).
        self.shard_ranges = shard_ranges
        if shard_ranges is not None:
            if batch_size % len(shard_ranges):
                raise ValueError(
                    "batch_size {} not divisible by {} cache shards"
                    .format(batch_size, len(shard_ranges)))
            bl = batch_size // len(shard_ranges)
            if min(hi - lo for lo, hi in shard_ranges) < bl:
                raise ValueError(
                    "a cache shard holds fewer images than its per-batch "
                    "slice ({}); use fewer devices or a smaller batch"
                    .format(bl))

    def __len__(self):
        if self.shard_ranges is not None:
            bl = self.batch_size // len(self.shard_ranges)
            return min(hi - lo for lo, hi in self.shard_ranges) // bl
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _shard_batches(self):
        """Per-shard orders -> slot-block-routed batches (see __init__)."""
        orders = [np.arange(lo, hi) for lo, hi in self.shard_ranges]
        if self.shuffle:
            for o in orders:
                self.rng.shuffle(o)
        bl = self.batch_size // len(orders)
        m = min(len(o) for o in orders) // bl
        return [np.concatenate([o[k * bl:(k + 1) * bl] for o in orders])
                for k in range(m)]

    def __iter__(self):
        if self.shard_ranges is not None:
            batches = self._shard_batches()
        else:
            order = np.arange(len(self.dataset))
            if self.shuffle:
                self.rng.shuffle(order)
            batches = []
            for i in range(0, len(order), self.batch_size):
                idx = order[i:i + self.batch_size]
                if len(idx) < self.batch_size and self.drop_last:
                    continue
                batches.append(idx)

        n_workers = min(self.num_workers, max(1, len(batches)))
        # Workers take batch numbers from `todo`; the consumer admits at most
        # prefetch+n_workers batches in flight (ordered delivery needs every
        # earlier batch buffered, so in-flight count bounds memory).
        todo = queue.Queue()
        done = {}  # batch number -> batch dict | Exception
        done_cv = threading.Condition()
        stop = threading.Event()
        max_inflight = self.prefetch + n_workers
        for b in range(min(max_inflight, len(batches))):
            todo.put(b)
        next_admit = min(max_inflight, len(batches))

        epoch = self._epoch
        self._epoch += 1
        # per-batch RNG only for samplers that accept it (task samplers do;
        # toy/prefetch datasets with no augmentation draws need not)
        import inspect
        try:
            takes_rng = "rng" in inspect.signature(
                self.dataset.get_sample).parameters
        except (TypeError, ValueError):  # pragma: no cover
            takes_rng = False
        deterministic = self.deterministic and takes_rng

        def worker():
            while not stop.is_set():
                try:
                    b = todo.get(timeout=0.1)
                except queue.Empty:
                    continue
                if b is None:
                    break
                try:
                    if deterministic:
                        # per-batch stream keyed by (seed, epoch, batch):
                        # draws don't depend on which thread runs when.
                        # SeedSequence hash-mixes the key — no collisions
                        # between (epoch, b) pairs at any epoch length
                        # (an additive mix collided past 8191 batches).
                        brng = np.random.RandomState(
                            np.random.SeedSequence(
                                (self.seed & 0xFFFFFFFF, epoch, b)
                            ).generate_state(1)[0])
                        samples = [self.dataset.get_sample(j, rng=brng)
                                   for j in batches[b]]
                    else:
                        samples = [self.dataset.get_sample(j)
                                   for j in batches[b]]
                    result = _stack_samples(samples)
                except Exception as e:  # surface to the consumer
                    result = e
                with done_cv:
                    done[b] = result
                    done_cv.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(n_workers)]
        for t in threads:
            t.start()
        try:
            for b in range(len(batches)):
                with done_cv:
                    while b not in done:
                        done_cv.wait(timeout=1.0)
                    item = done.pop(b)
                if isinstance(item, Exception):
                    raise item
                if next_admit < len(batches):
                    todo.put(next_admit)
                    next_admit += 1
                yield item
        finally:
            stop.set()
            for _ in threads:
                todo.put(None)
