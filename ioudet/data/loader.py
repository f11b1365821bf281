"""Batched data loading (ref: mmdet/datasets/loader/build_loader.py
(build_dataloader) + sampler.py (GroupSampler, DistributedGroupSampler)).

TPU-native redesign:
  * samples are fixed-shape numpy pytrees -> collate is a plain stack;
  * GroupSampler's aspect-ratio batching survives as orientation bucketing
    (one static canvas per orientation -> at most two compiled programs);
  * multi-host sharding slices the index stream by ``jax.process_index()``
    (the DistributedGroupSampler analog — no torch.distributed);
  * a thread pool + bounded prefetch queue overlaps host preprocessing with
    device compute (the num_workers analog; threads suffice because PIL
    decode/resize release the GIL).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from .rng import clear_sample_rng, make_sample_rng, set_sample_rng


def collate(samples) -> dict:
    """Stack a list of fixed-shape sample dicts into one batch dict."""
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out


class GroupedBatchSampler:
    """Yields index lists of size ``batch_size``, all from one orientation
    group (ref: GroupSampler semantics: round each group up to a batch
    multiple, pad by re-sampling within the group, shuffle)."""

    def __init__(self, flags: np.ndarray, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 num_shards: int = 1, shard_index: int = 0,
                 drop_last: bool = False):
        self.flags = np.asarray(flags)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.drop_last = drop_last

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[list]:
        rng = np.random.default_rng(self.seed + self.epoch)
        batches = []
        for g in np.unique(self.flags):
            idxs = np.where(self.flags == g)[0]
            if self.shuffle:
                idxs = rng.permutation(idxs)
            pad = (-len(idxs)) % self.batch_size
            if pad and not self.drop_last:
                extra = rng.choice(idxs, pad) if self.shuffle else idxs[:pad]
                idxs = np.concatenate([idxs, extra])
            n_full = len(idxs) // self.batch_size
            for b in range(n_full):
                batches.append(idxs[b * self.batch_size:(b + 1) * self.batch_size].tolist())
        if self.shuffle:
            order = rng.permutation(len(batches))
            batches = [batches[i] for i in order]
        # Every SPMD process must execute the SAME number of jitted collective
        # steps or training deadlocks at the gradient AllReduce — pad the
        # batch list to a multiple of num_shards by re-sampling batches (the
        # DistributedGroupSampler recipe) before the round-robin split.
        if self.num_shards > 1 and len(batches) % self.num_shards:
            pad = (-len(batches)) % self.num_shards
            if batches:
                extra_ids = rng.integers(0, len(batches), pad) if self.shuffle \
                    else np.arange(pad) % len(batches)
                batches += [batches[int(i)] for i in extra_ids]
        for i, batch in enumerate(batches):
            if i % self.num_shards == self.shard_index:
                yield batch

    def _num_batches_total(self) -> int:
        total = 0
        for g in np.unique(self.flags):
            n = int((self.flags == g).sum())
            if self.drop_last:
                total += n // self.batch_size
            else:
                total += -(-n // self.batch_size)
        return total

    def __len__(self):
        # matches what every shard actually yields: padded-to-multiple split
        return -(-self._num_batches_total() // self.num_shards)


class DataLoader:
    """Prefetching loader over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = False,
                 num_shards: Optional[int] = None,
                 shard_index: Optional[int] = None,
                 prefetch: int = 4):
        if num_shards is None:
            try:
                import jax
                num_shards = jax.process_count()
                shard_index = jax.process_index()
            except Exception:
                num_shards, shard_index = 1, 0
        self.dataset = dataset
        self.batch_size = batch_size
        flags = getattr(dataset, "flag", np.zeros(len(dataset), np.uint8))
        self.sampler = GroupedBatchSampler(flags, batch_size, shuffle, seed,
                                           num_shards, shard_index or 0,
                                           drop_last)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch

    def set_epoch(self, epoch: int):
        self.sampler.set_epoch(epoch)

    def __len__(self):
        return len(self.sampler)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        seed, epoch = self.sampler.seed, self.sampler.epoch

        def fetch(idx):
            # Deterministic per-(seed, epoch, idx) augmentation stream —
            # independent of thread interleaving, worker count, and any
            # other live iterator (see ioudet/data/rng.py).
            set_sample_rng(make_sample_rng(seed, epoch, int(idx)))
            try:
                return self.dataset[int(idx)]
            finally:
                clear_sample_rng()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idxs in self.sampler:
                        if stop.is_set():
                            return
                        if not _put(collate(list(pool.map(fetch, batch_idxs)))):
                            return
            finally:
                _put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # Abandoned/closed iterators must not keep drawing samples (they
            # would waste host CPU and, pre-rng.py, perturbed global RNG).
            stop.set()


def build_dataloader(dataset, imgs_per_gpu: int, workers_per_gpu: int = 2,
                     num_gpus: int = 1, dist: bool = False, shuffle: bool = True,
                     seed: int = 0, **kwargs) -> DataLoader:
    """Signature kept close to the reference's build_dataloader.
    ``imgs_per_gpu * num_gpus`` = per-process batch (pjit shards it over the
    local mesh)."""
    kwargs.setdefault("drop_last", shuffle)  # train drops ragged tail batches
    return DataLoader(dataset, batch_size=imgs_per_gpu * num_gpus,
                      shuffle=shuffle, num_workers=workers_per_gpu * num_gpus,
                      seed=seed, **kwargs)
