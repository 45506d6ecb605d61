"""Host input pipeline: multi-threaded batch assembly + device prefetch.

TPU-native replacement for the reference's DataLoader(num_workers=4,
pin_memory=True) host pipelining (train_ours_2D.py:274): a thread pool
assembles numpy batches ahead of the train loop, and ``prefetch_to_device``
keeps a configurable number of batches already resident on device (or laid out
across a mesh via a NamedSharding) so the TPU never waits on host IO.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, Optional

import jax
import numpy as np


class BatchLoader:
    """Iterate a dataset with a batch sampler on background threads.

    Yields dicts of stacked numpy arrays: image [B,H,W,1] (NHWC), label [B,H,W].
    """

    def __init__(self, dataset, batch_sampler: Iterable, num_workers: int = 4,
                 queue_depth: int = 4):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.queue_depth = queue_depth

    @staticmethod
    def _collate(samples) -> Dict[str, np.ndarray]:
        images = np.stack([s["image"] for s in samples]).astype(np.float32)
        if images.ndim == 3:  # [B,H,W] -> NHWC
            images = images[..., None]
        labels = np.stack([s["label"] for s in samples]).astype(np.int32)
        return {"image": images, "label": labels}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = list(self.batch_sampler)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.queue_depth)
        stop = threading.Event()

        def worker(batch_indices_list, slot_q):
            # fail LOUDLY: a raising dataset must surface in the consumer, not
            # silently kill the daemon thread and deadlock the ordered-emit
            # loop below (the reference's DataLoader propagates worker errors,
            # train_ours_2D.py:274)
            for bi, indices in batch_indices_list:
                if stop.is_set():
                    return
                try:
                    samples = [self.dataset[i] for i in indices]
                    slot_q.put((bi, self._collate(samples)))
                except BaseException as exc:  # noqa: BLE001
                    slot_q.put((bi, exc))
                    return

        # shard batches round-robin over workers but emit in order
        assignments = [[] for _ in range(self.num_workers)]
        for bi, idxs in enumerate(batches):
            assignments[bi % self.num_workers].append((bi, idxs))
        threads = [threading.Thread(target=worker, args=(a, out_q), daemon=True)
                   for a in assignments if a]
        for t in threads:
            t.start()
        try:
            pending: Dict[int, Dict[str, np.ndarray]] = {}
            next_bi = 0
            received = 0
            total = len(batches)
            while received < total:
                bi, batch = out_q.get()
                if isinstance(batch, BaseException):
                    raise RuntimeError(
                        f"BatchLoader worker failed on batch {bi}") from batch
                pending[bi] = batch
                received += 1
                while next_bi in pending:
                    yield pending.pop(next_bi)
                    next_bi += 1
            while next_bi in pending:
                yield pending.pop(next_bi)
                next_bi += 1
        finally:
            stop.set()


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding: Optional[Any] = None,
                       transform: Optional[Callable] = None) -> Iterator:
    """Double-buffered host->device transfer (the TPU idiom for pin_memory):
    keep `size` batches already on device while the step runs."""
    it = iter(iterator)

    def put(batch):
        if transform is not None:
            batch = transform(batch)
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    buf = []
    for batch in it:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)


def compact_batch(batch: dict, compute_dtype) -> dict:
    """Shrink the host->device training-batch payload (the scarce resource on
    tunnel-attached chips, ~30 MB/s): images ship in the model's COMPUTE
    dtype (exact for bf16 models — the first conv casts to it anyway; f32
    models ship f32 unchanged) and integer labels ship as uint8 (exact;
    num_classes < 256 always). Steps cast labels back to int32 on device.
    2.7x smaller payload for a bf16 2D CHAP batch (12.6 -> 4.7 MB)."""
    import numpy as np

    out = dict(batch)
    out["image"] = np.asarray(batch["image"]).astype(np.dtype(compute_dtype))
    label = np.asarray(batch["label"])
    if np.issubdtype(label.dtype, np.integer):
        out["label"] = label.astype(np.uint8)
    return out
