"""Device-prefetch stage: drain, early-exit teardown, producer failure.

Round-3 advice flagged two shutdown edges in data/prefetch.py: a producer
exception while the queue is full could block forever (leaked thread), and
early consumer exit relied on GC to run the generator's finally. These tests
pin the fixed behavior host-side (no device needed).
"""

import threading
import time

from tpu_speech.data.prefetch import threaded_prefetch


def _live_prefetch_threads():
    return [t for t in threading.enumerate() if t.name == "device-prefetch"]


def test_full_drain_order():
    out = list(threaded_prefetch(lambda: iter(range(7)), depth=2))
    assert out == list(range(7))


def test_early_exit_stops_producer():
    started = threading.Event()

    def gen():
        started.set()
        for i in range(1000):
            yield i

    it = threaded_prefetch(gen, depth=2)
    assert next(it) == 0
    it.close()  # explicit close must tear down deterministically
    started.wait(1.0)
    deadline = time.monotonic() + 5.0
    while _live_prefetch_threads() and time.monotonic() < deadline:
        time.sleep(0.01)
    assert not _live_prefetch_threads(), "producer thread leaked after close"


def test_producer_exception_on_full_queue_does_not_deadlock():
    """Producer raises after filling the queue; consumer leaves early.

    Pre-fix, the q.put(exc) blocked forever on the full queue."""

    def gen():
        yield 1
        yield 2
        yield 3  # fills depth-2 queue while consumer holds item 1
        raise RuntimeError("boom")

    it = threaded_prefetch(gen, depth=2)
    assert next(it) == 1
    it.close()
    deadline = time.monotonic() + 5.0
    while _live_prefetch_threads() and time.monotonic() < deadline:
        time.sleep(0.01)
    assert not _live_prefetch_threads(), "producer thread leaked after error"


def test_producer_exception_propagates_when_drained():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = threaded_prefetch(gen, depth=2)
    assert next(it) == 1
    try:
        next(it)
    except RuntimeError as e:
        assert "boom" in str(e)
    else:
        raise AssertionError("producer exception not surfaced")
