"""Host data loader: sampler-driven batching with threaded prefetch.

Replaces torch ``DataLoader`` + ``BatchCollator`` (reference
``antmmf/common/task_loader.py:104-130``, ``antmmf/common/batch_collator.py``).
Worker *threads* (not processes) fetch samples — decode is C-library-bound
(cv2/numpy release the GIL) — and assembled batches are prefetched a configurable
depth ahead so the accelerator never waits on the host (north-star requirement:
preprocessing must not stall the TPU; the trainer overlaps this queue with
device_put + the compiled step).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, Optional

from antmmf_tpu.structures.sample import SampleList


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler=None,
        collate_fn: Optional[Callable] = None,
        num_workers: int = 0,
        drop_last: bool = False,
        prefetch_batches: int = 2,
        pad_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.sampler = sampler
        self.collate_fn = collate_fn or getattr(
            dataset, "collate_fn", SampleList.from_samples
        )
        self.num_workers = int(num_workers)
        self.drop_last = bool(drop_last)
        # pad_last wrap-pads the final short batch to full batch_size (the
        # reference DistributedSampler's pad behavior) so eval batches always
        # satisfy the mesh data-axis divisibility; duplicated rows should be
        # deduped by corpus evaluators via sample ids
        self.pad_last = bool(pad_last)
        self.prefetch_batches = max(1, int(prefetch_batches))

    def __len__(self) -> int:
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self) -> Iterator[list]:
        indices = iter(self.sampler) if self.sampler is not None else iter(
            range(len(self.dataset))
        )
        batch: list = []
        for idx in indices:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            if self.pad_last and len(batch) < self.batch_size:
                wrap = batch * (-(-self.batch_size // len(batch)))
                batch = wrap[: self.batch_size]
            yield batch

    def _make_batch(self, idx_batch: list, pool: Optional[ThreadPoolExecutor]):
        if pool is not None:
            samples = list(pool.map(self.dataset.__getitem__, idx_batch))
        else:
            samples = [self.dataset[i] for i in idx_batch]
        return self.collate_fn(samples)

    def __iter__(self) -> Iterator[SampleList]:
        if self.num_workers <= 0:
            for idx_batch in self._index_batches():
                yield self._make_batch(idx_batch, None)
            return

        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        _SENTINEL = object()
        error_holder = []

        def producer() -> None:
            try:
                for idx_batch in self._index_batches():
                    out_q.put(self._make_batch(idx_batch, pool))
            except BaseException as e:  # propagate to consumer
                error_holder.append(e)
            finally:
                out_q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is _SENTINEL:
                    break
                yield item
            if error_holder:
                raise error_holder[0]
        finally:
            pool.shutdown(wait=False)


def prefetch_to_device(iterator, transfer, depth: int = 2):
    """Double-buffered host→HBM pipeline: keep ``depth`` batches in flight on
    the device while the consumer computes (classic flax prefetch — the
    north-star "preprocessing never stalls the accelerator" mechanism).

    ``transfer(batch) -> device_batch`` is the (async) device_put; JAX
    transfers are asynchronous, so enqueueing ahead overlaps H2D DMA and host
    collation with the running step."""
    import collections

    queue_: "collections.deque" = collections.deque()
    for item in iterator:
        queue_.append(transfer(item))
        if len(queue_) >= depth:
            yield queue_.popleft()
    while queue_:
        yield queue_.popleft()


def stack_windows(arrays_iter, window: int, budget=None):
    """Group consecutive same-shape batches into ``[window, ...]`` stacks for
    multi-step dispatch (``training_parameters.steps_per_dispatch``): the
    trainer runs one ``lax.scan`` over the stack inside a single jit, so the
    host syncs once per *window* instead of once per step — the training
    analog of the serving engine's decode windows (the reference dispatches
    every step from Python, ``antmmf/trainers/base_trainer.py:545-675``).

    Yields ``(stacked_dict, count)``. Consecutive batches whose field
    keys/shapes/dtypes differ (multi-dataset chains with different padding
    maxima) flush the current group early, so a stack is always homogeneous;
    ``budget`` bounds the total number of batches consumed (max_iterations).
    """
    import numpy as np

    group: list = []
    sig = None

    def flush():
        nonlocal group, sig
        if not group:
            return None
        out = {f: np.stack([g[f] for g in group]) for f in group[0]}
        n = len(group)
        group, sig = [], None
        return out, n

    seen = 0
    for arrays in arrays_iter:
        if budget is not None and seen >= budget:
            break
        arrays = {f: np.asarray(v) for f, v in arrays.items()}
        s = tuple(sorted(
            (f, v.shape, str(v.dtype)) for f, v in arrays.items()))
        if sig is not None and s != sig:
            item = flush()
            if item:
                yield item
        sig = s
        group.append(arrays)
        seen += 1
        if len(group) == window:
            item = flush()
            if item:
                yield item
    item = flush()
    if item:
        yield item
