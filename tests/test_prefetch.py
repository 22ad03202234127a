"""Prefetcher: ordering, exhaustion, exception propagation."""

import time

import pytest

from ps_slm_tpu.data.prefetch import prefetch


def test_order_preserved():
    assert list(prefetch(range(50), depth=4)) == list(range(50))


def test_empty():
    assert list(prefetch([], depth=2)) == []


def test_exception_propagates():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_overlap():
    """Producer sleeps overlap with consumer sleeps."""
    def slow():
        for i in range(5):
            time.sleep(0.05)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(slow(), depth=2):
        time.sleep(0.05)
    dt = time.perf_counter() - t0
    assert dt < 0.45  # serial would be ~0.5s
