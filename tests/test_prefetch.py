"""DevicePrefetcher: ordering, exhaustion, and error propagation."""

import time

import numpy as np
import pytest

from multi_modal_foundation_model_tpu.data.prefetch import DevicePrefetcher


def test_order_and_exhaustion():
    items = list(range(20))
    out = list(DevicePrefetcher(iter(items), lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in items]


def test_overlaps_consumer():
    # placement sleeps; a depth-2 pipeline must run it concurrently with
    # the (slow) consumer instead of serializing
    def place(x):
        time.sleep(0.05)
        return x

    t0 = time.perf_counter()
    for _ in DevicePrefetcher(iter(range(10)), place, depth=2):
        time.sleep(0.05)  # consumer work
    elapsed = time.perf_counter() - t0
    assert elapsed < 0.85  # serialized would be ~1.0s


def test_producer_error_propagates():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom")

    it = DevicePrefetcher(gen(), lambda x: x, depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_placement_error_propagates():
    def place(x):
        if x == 3:
            raise ValueError("bad batch")
        return x

    it = DevicePrefetcher(iter(range(5)), place, depth=1)
    seen = []
    with pytest.raises(ValueError, match="bad batch"):
        for x in it:
            seen.append(x)
    assert seen == [0, 1, 2]


def test_abandoned_iterator_releases_producer():
    import threading

    started = threading.Event()

    def gen():
        for i in range(100):
            started.set()
            yield i

    it = DevicePrefetcher(gen(), lambda x: x, depth=1)
    assert next(it) == 0
    started.wait(1.0)
    it.close()                    # consumer abandons mid-stream
    it._thread.join(2.0)
    assert not it._thread.is_alive()
    with pytest.raises(StopIteration):
        next(it)                  # post-close next raises, never blocks


def test_next_after_exhaustion_raises():
    it = DevicePrefetcher(iter([1]), lambda x: x, depth=1)
    assert next(it) == 1
    with pytest.raises(StopIteration):
        next(it)
    with pytest.raises(StopIteration):
        next(it)                  # second call must not block


def test_trainer_epoch_uses_prefetch(tmp_path):
    # end-to-end: the host path still trains correctly with the pipeline
    from multi_modal_foundation_model_tpu.train import (
        MultiModalTrainer, OptimizerConfig, TrainerConfig)
    from test_trainer import tiny_loaders, tiny_model

    train, val, _ = tiny_loaders(batch_size=16)
    tr = MultiModalTrainer(
        tiny_model(), train, val, OptimizerConfig(lr=1e-3),
        TrainerConfig(num_epochs=1, log_dir=str(tmp_path), seed=0,
                      prefetch_depth=2))
    res = tr.train_epoch(0)
    assert np.isfinite(res["train_loss"])
