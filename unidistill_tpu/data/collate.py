"""Fixed-shape batch collation + a simple multiprocess prefetch loader.

ref collate_fn (nuscenes_multimodal.py:418-495) pads ragged points/GTs to the
batch max; here frames are ALREADY fixed-shape (dataset.py pads to the config
caps) so collation is a plain stack — batch shapes never change and the jitted
step never retraces. The loader replaces torch DataLoader(num_workers=10)
with a multiprocessing pool that prefetches whole batches.
"""
from __future__ import annotations

import multiprocessing as mp
from typing import Dict, Iterator, List, Optional

import numpy as np


def collate(frames: List[Dict]) -> Dict:
    out: Dict = {}
    keys = frames[0].keys()
    for k in keys:
        if k in ("meta", "gt_boxes_raw"):
            out[k] = [f[k] for f in frames]
        elif k == "mats":
            out[k] = {
                mk: np.stack([f[k][mk] for f in frames])
                for mk in frames[0][k]
            }
        else:
            out[k] = np.stack([f[k] for f in frames])
    return out


class _Worker:
    """Picklable top-level fetcher for the mp pool."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __call__(self, idx: int):
        return self.dataset[idx]


class DataLoader:
    """Batch iterator with optional multiprocessing prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if self.num_workers <= 0:
            for b in batches:
                frames = [self.dataset[int(i)] for i in b]
                yield collate(frames)
            return
        with mp.Pool(self.num_workers) as pool:
            fetch = _Worker(self.dataset)
            pending = []
            it = iter(batches)
            # keep 2 batches in flight
            for _ in range(2):
                b = next(it, None)
                if b is not None:
                    pending.append(pool.map_async(fetch, [int(i) for i in b]))
            while pending:
                res = pending.pop(0)
                b = next(it, None)
                if b is not None:
                    pending.append(pool.map_async(fetch, [int(i) for i in b]))
                yield collate(res.get())
