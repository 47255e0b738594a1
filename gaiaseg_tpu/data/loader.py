"""Host-side batch loader feeding device-resident augmentation.

Replaces the reference's per-GPU DataLoader subprocess workers
(SURVEY.md §3.1 PROCESS BOUNDARY): records are fixed-shape, IO is the only
host work, and augmentation runs jitted on device, so a single prefetch
thread keeps the TPU fed.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np


class BatchLoader:
    """Batches a dataset of fixed-shape records into numpy stacks.

    ``shard_id``/``num_shards`` give per-process dataset sharding for
    multi-host training (replaces DistributedSampler).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = True,
                 shard_id: int = 0, num_shards: int = 1,
                 prefetch: int = 2, infinite: bool = False,
                 index_only: bool = False):
        self.dataset = dataset
        # index_only: yield {'idx'} batches without materializing pixels —
        # consumers that own a device-resident cache gather+augment in one
        # fused program (transforms.gather_augment_batch) instead of paying
        # a separate gather dispatch per step
        self.index_only = index_only
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.prefetch = prefetch
        self.infinite = infinite
        self._epoch = 0

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(idx)
        idx = idx[self.shard_id::self.num_shards]
        return idx

    def _stack(self, chunk, pad_count: int = 0) -> Dict[str, np.ndarray]:
        if self.index_only:
            batch = {"idx": np.ascontiguousarray(chunk, np.int32)}
            if pad_count:
                batch["pad_count"] = pad_count
            return batch
        fast = getattr(self.dataset, "read_batch", None)
        if fast is not None:
            # native gather path (PackedDataset / DeviceCachedDataset);
            # padded tails wrap indices in ``chunk`` already
            batch = fast(np.asarray(chunk))
            if pad_count:
                batch = dict(batch, pad_count=pad_count)
            return batch
        recs = [self.dataset[int(j)] for j in chunk]
        batch = {
            "img": np.stack([r["img"] for r in recs]),
            "gt": np.stack([r["gt"] for r in recs]),
            "idx": np.asarray([r.get("idx", int(j))
                               for r, j in zip(recs, chunk)]),
        }
        if pad_count:
            batch["pad_count"] = pad_count
        return batch

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        bs = self.batch_size
        if self.infinite:
            # continuous index stream straddling epoch boundaries (the
            # reference's InfiniteSampler semantics): a dataset or shard
            # smaller than the global batch still yields full batches
            # instead of dropping every epoch's tail (which livelocked
            # the prefetch worker when len(dataset) < global batch).
            if len(self._indices()) == 0:
                raise ValueError(
                    f"empty dataset shard {self.shard_id}/{self.num_shards}")
            buf: list = []
            while True:
                buf.extend(self._indices())
                self._epoch += 1
                while len(buf) >= bs:
                    yield self._stack(buf[:bs])
                    del buf[:bs]
            return
        idx = self._indices()
        end = len(idx) - (len(idx) % bs)  # full batches only; tail below
        for i in range(0, end, bs):
            yield self._stack(idx[i:i + bs])
        tail = len(idx) % bs
        if not self.drop_last and tail:
            # pad the final batch by wrapping; consumers mask via pad_count
            chunk = list(idx[end:]) + list(np.resize(idx, bs - tail))
            yield self._stack(chunk, pad_count=bs - tail)
        self._epoch += 1

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        yield from _pump(self._batches, self.prefetch)

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)


def _pump(make_items, maxsize: int):
    """Producer thread + bounded queue with a clean shutdown path.

    Yields the items of ``make_items()``. When the consumer stops early
    (``.close()`` / generator GC / exception), the producer is signalled
    and queued items are dropped so their references release — without
    this, an abandoned prefetch thread blocks forever on ``q.put`` holding
    ~maxsize prepped batches (device HBM, for ``device_prefetch``) for the
    life of the process; repeated ``train_segmentor`` calls in one process
    (fast-finetune sweeps, bench) would leak the chip dry. Producer
    exceptions re-raise at the consumer."""
    q: "queue.Queue" = queue.Queue(maxsize=max(int(maxsize), 1))
    stop = object()
    done = threading.Event()
    err: list = []

    def worker():
        try:
            for item in make_items():
                while not done.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        pass
                else:
                    return
                del item
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            while not done.is_set():
                try:
                    q.put(stop, timeout=0.2)
                    break
                except queue.Full:
                    pass

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is stop:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        done.set()
        try:
            while True:  # release refs the producer already queued
                q.get_nowait()
        except queue.Empty:
            pass


def device_prefetch(batches, prep, depth: int = 2):
    """Run ``prep(batch)`` (host->device upload + device-program dispatch)
    in a background thread ``depth`` items ahead of the consumer.

    On the relay, ``jnp.asarray`` blocks its calling thread for the whole
    transfer (~140MB/s, single-core serialization) — serial upload+compute
    loops are upload-bound. One prefetch thread overlaps the transfer with
    the consumer's device work; ``depth`` bounds resident device batches.
    Exceptions in ``prep``/the source iterator re-raise at the consumer.
    The prep thread is the ONLY consumer of ``batches`` and runs prep
    calls in order, so key-sequence determinism is preserved when prep
    closes over a PRNG stream. Closing the returned generator (it is
    closed by ``train_segmentor``'s finally) shuts the thread down and
    releases the staged device batches; abandoning it to the GC does the
    same via ``_pump``'s finally."""

    def gen():
        for b in batches:
            yield prep(b)

    yield from _pump(gen, depth)
