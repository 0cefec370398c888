"""Host-side input pipeline: ordered threaded prefetch, error propagation,
device double-buffering, and the dataset->batch loader."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from conceptattention_tpu.utils.data import (
    PrefetchIterator,
    batched_indices,
    make_loader,
    prefetch_to_device,
)


class TestPrefetchIterator:
    def test_ordered_results(self):
        out = list(PrefetchIterator(range(20), lambda x: x * x, num_threads=4))
        assert out == [i * i for i in range(20)]

    def test_overlaps_slow_loads(self):
        def slow(x):
            time.sleep(0.05)
            return x

        t0 = time.perf_counter()
        out = list(PrefetchIterator(range(8), slow, buffer_size=8, num_threads=4))
        dt = time.perf_counter() - t0
        assert out == list(range(8))
        assert dt < 8 * 0.05  # parallel, not serial

    def test_exception_propagates(self):
        def boom(x):
            if x == 3:
                raise ValueError("bad sample")
            return x

        it = PrefetchIterator(range(5), boom, num_threads=2)
        got = []
        with pytest.raises(ValueError, match="bad sample"):
            for v in it:
                got.append(v)
        assert got == [0, 1, 2]

    def test_empty_source(self):
        assert list(PrefetchIterator([], num_threads=2)) == []


class TestDevicePrefetch:
    def test_roundtrip_values(self):
        batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
        out = list(prefetch_to_device(iter(batches), size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b["x"]), i)
            assert isinstance(b["x"], jnp.ndarray)


class TestLoader:
    def test_batched_indices(self):
        assert list(batched_indices(5, 2)) == [[0, 1], [2, 3], [4]]
        assert list(batched_indices(5, 2, drop_remainder=True)) == [[0, 1], [2, 3]]

    def test_make_loader_over_imagenet_folder(self, tmp_path):
        import os

        from PIL import Image

        from conceptattention_tpu.evals.imagenet_data import ImageNetFolder

        rng = np.random.default_rng(0)
        for c in range(2):
            d = tmp_path / f"n{c}"
            os.makedirs(d)
            for i in range(3):
                Image.fromarray(
                    rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
                ).save(d / f"{i}.png")
        ds = ImageNetFolder(str(tmp_path))

        def collate(samples):
            imgs, labels = zip(*samples)
            return np.stack(imgs), np.asarray(labels)

        batches = list(make_loader(ds, 4, collate, device_prefetch=1))
        assert [b[0].shape[0] for b in batches] == [4, 2]
        assert np.asarray(batches[0][1]).tolist() == [0, 0, 0, 1]


def test_backpressure_bounds_buffer():
    """buffer_size is a hard bound: a stalled consumer stops the workers
    after buffer_size loads (memory stays bounded on huge datasets)."""
    import threading

    from conceptattention_tpu.utils.data import PrefetchIterator

    calls = []
    lock = threading.Lock()

    def fn(x):
        with lock:
            calls.append(x)
        return x

    it = PrefetchIterator(range(100), fn, buffer_size=3, num_threads=4)
    time.sleep(0.3)  # consumer stalls; workers must park after 3 loads
    assert len(calls) <= 3
    assert next(it) == 0
    time.sleep(0.2)  # one slot freed -> exactly one more load
    assert len(calls) <= 4
    it.close()


def test_close_unblocks_parked_workers():
    """close() must wake workers parked on the buffer-slot semaphore; a
    consumer that stops early otherwise leaks every worker thread for the
    process lifetime."""
    it = PrefetchIterator(range(1000), lambda x: x, buffer_size=2,
                          num_threads=3)
    assert next(it) == 0  # workers are now saturated against the 2 slots
    it.close()
    for t in it._threads:
        t.join(timeout=5)
    assert not any(t.is_alive() for t in it._threads)
