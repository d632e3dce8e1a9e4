"""Batched, prefetching data loader (host side).

Replaces torch DataLoader + worker processes (reference main.py:45-62,
test.py:57-63): a thread pool maps the numpy samplers (cv2 releases the GIL
for the warp work), batches into fixed-shape numpy dicts (static shapes =>
one XLA program), and prefetches ahead of the device.
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
                 drop_last=None, seed=0, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        # static shapes: always drop ragged last batch when training
        self.drop_last = shuffle if drop_last is None else drop_last
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        batches = []
        for i in range(0, len(order), self.batch_size):
            idx = order[i:i + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                continue
            batches.append(idx)

        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for idx in batches:
                    if stop.is_set():
                        break
                    samples = [self.dataset.get_sample(j) for j in idx]
                    q.put(_stack_samples(samples))
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
