"""Input pipeline: shape-stable batches with background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(datasets/__init__.py:50-79). Per-host sharding: each JAX process
iterates its stride of the global index list (process_index::
process_count), so the global batch assembles across hosts via
jax.make_array_from_process_local_data in the caller.

A small thread pool prepares samples ahead (host-side numpy aug +
encode; voxelization happens on device) and a prefetch queue keeps the
accelerator fed — the double-buffering the BASELINE north-star asks
for happens naturally because batches are handed to jit while the next
batch is being built.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..registry import DATASETS


def build_dataset(dataset_cfg, class_names, root_path=None, training=True,
                  logger=None):
    cls = DATASETS.get(dataset_cfg["DATASET"])
    return cls(
        dataset_cfg=dataset_cfg,
        class_names=class_names,
        root_path=root_path,
        training=training,
        logger=logger,
    )


class DataLoader:
    """Iterable over collated fixed-shape batches."""

    def __init__(self, dataset, batch_size, shuffle, seed=0, drop_last=True,
                 num_workers=4, process_index=0, process_count=1,
                 prefetch=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self._epoch = 0

    def set_epoch(self, epoch):
        self._epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.process_count
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        # per-process stride shard (reference DistributedSampler analog)
        return order[self.process_index :: self.process_count]

    def _load_one(self, idx, rng_seed):
        rng = np.random.RandomState(rng_seed)
        # re-draw on empty-gt samples (reference dataset.py:152-154)
        for attempt in range(8):
            item = self.dataset.getitem_prepared(int(idx), rng)
            if item is not None:
                return item
            idx = rng.randint(len(self.dataset))
        raise RuntimeError("8 consecutive empty samples")

    def __iter__(self):
        indices = self._indices()
        nb = len(self)
        base_seed = (self.seed + self._epoch * 10007) % (1 << 31)

        def producer(out_q):
            try:
                self._produce(out_q)
            except BaseException as e:  # propagate to the consumer
                out_q.put(e)

        def _produce(out_q):
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = []
                for b in range(nb):
                    batch_idx = indices[
                        b * self.batch_size : (b + 1) * self.batch_size
                    ]
                    futs = [
                        pool.submit(self._load_one, i, base_seed + 7919 * int(i))
                        for i in batch_idx
                    ]
                    futures.append(futs)
                    # throttle: only keep `prefetch` batches in flight
                    while len(futures) > self.prefetch:
                        done = futures.pop(0)
                        out_q.put(
                            self.dataset.collate_batch(
                                [f.result() for f in done]
                            )
                        )
                for done in futures:
                    out_q.put(
                        self.dataset.collate_batch([f.result() for f in done])
                    )
            out_q.put(None)

        self._produce = _produce

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=producer, args=(q,), daemon=True)
        t.start()
        while True:
            batch = q.get()
            if isinstance(batch, BaseException):
                raise batch  # worker failures must not hang the loop
            if batch is None:
                break
            yield batch


def build_dataloader(dataset_cfg, class_names, batch_size, root_path=None,
                     training=True, seed=0, workers=4, logger=None,
                     process_index=0, process_count=1):
    dataset = build_dataset(
        dataset_cfg, class_names, root_path, training, logger
    )
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=training,
        seed=seed,
        drop_last=training,
        num_workers=workers,
        process_index=process_index,
        process_count=process_count,
    )
    return dataset, loader
