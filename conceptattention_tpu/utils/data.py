"""Host-side input pipeline: threaded prefetch + device transfer overlap.

The reference loads one PIL image at a time inside its eval loops (e.g.
`run_experiment.py:137`, SURVEY.md §3.3) — the accelerator idles during every
decode. This module is the TPU-native replacement: a background thread pool
maps the user's load function over the index stream while the device computes,
and an optional device-put stage keeps the NEXT batch already transferred when
the current step finishes (the standard JAX double-buffering recipe).

Works with any indexable dataset (evals/imagenet_data.ImageNetFolder,
evals/datasets.ImagenetSegmentation, ...) or any iterator of host batches.
"""

from __future__ import annotations

import collections
import threading
from typing import Any, Callable, Iterable, Iterator, Optional, Sequence

import jax

_STOP = object()


class PrefetchIterator:
    """Background-thread prefetch over `fn(item)` for items of `source`.

    Results arrive in order; at most `buffer_size` are in flight, so memory
    stays bounded. Exceptions in workers re-raise at the consuming site.
    """

    def __init__(
        self,
        source: Iterable[Any],
        fn: Callable[[Any], Any] = lambda x: x,
        buffer_size: int = 4,
        num_threads: int = 2,
    ):
        # Backpressure: workers acquire a slot before pulling from the
        # source, the consumer releases it on emit — at most buffer_size
        # results (computed or in flight) ever exist, so memory is bounded
        # no matter how slow the consumer is.
        self._slots = threading.Semaphore(max(1, buffer_size))
        self._src = iter(source)
        self._fn = fn
        self._lock = threading.Lock()  # serializes pulls from the source
        self._seq = 0
        self._emit = 0
        self._pending: dict = {}
        self._cv = threading.Condition()
        self._done = False
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, num_threads))
        ]
        for t in self._threads:
            t.start()

    def _worker(self):
        while True:
            self._slots.acquire()
            with self._lock:
                if self._done:
                    self._slots.release()
                    return
                try:
                    item = next(self._src)
                except StopIteration:
                    self._done = True
                    self._slots.release()
                    with self._cv:
                        self._cv.notify_all()
                    return
                seq = self._seq
                self._seq += 1
            try:
                result = (seq, self._fn(item), None)
            except Exception as e:  # surface at the consumer
                result = (seq, None, e)
            with self._cv:
                self._pending[seq] = result
                self._cv.notify_all()

    def __iter__(self) -> Iterator[Any]:
        return self

    def __next__(self):
        with self._cv:
            while self._emit not in self._pending:
                if self._done and self._emit >= self._seq:
                    raise StopIteration
                self._cv.wait(timeout=0.1)
            seq, value, err = self._pending.pop(self._emit)
            self._emit += 1
        self._slots.release()  # free the buffer slot for the next load
        if err is not None:
            raise err
        return value

    def close(self):
        with self._lock:
            self._done = True
        # Workers park on _slots.acquire() when the buffer is full; one
        # release wakes one of them, and its own pre-return release (the
        # `_done` branch in _worker) cascades the wakeup to the rest —
        # without this, close() leaks every blocked worker thread.
        self._slots.release()
        with self._cv:
            self._cv.notify_all()


def prefetch_to_device(
    batches: Iterable[Any],
    size: int = 2,
    device: Optional[Any] = None,
) -> Iterator[Any]:
    """Keep `size` batches device_put ahead of the consumer (double
    buffering): transfer of batch i+1 overlaps compute on batch i. Pytrees
    pass through jax.device_put leaf-wise."""
    buf: "collections.deque" = collections.deque()
    dev = device or jax.devices()[0]
    it = iter(batches)

    def put(x):
        return jax.tree.map(lambda a: jax.device_put(a, dev), x)

    try:
        for _ in range(max(1, size)):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def batched_indices(n: int, batch_size: int, drop_remainder: bool = False):
    """[0..n) -> lists of indices of length batch_size."""
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        if drop_remainder and len(idx) < batch_size:
            return
        yield idx


def make_loader(
    dataset,
    batch_size: int,
    collate: Callable[[Sequence[Any]], Any],
    buffer_size: int = 4,
    num_threads: int = 2,
    device_prefetch: int = 0,
) -> Iterator[Any]:
    """Indexable dataset -> iterator of collated batches with background
    loading (and optional device prefetch when device_prefetch > 0)."""
    def load(idx):
        return collate([dataset[i] for i in idx])

    it: Iterator[Any] = PrefetchIterator(
        batched_indices(len(dataset), batch_size), load,
        buffer_size=buffer_size, num_threads=num_threads,
    )
    if device_prefetch > 0:
        it = prefetch_to_device(it, size=device_prefetch)
    return it
