"""Device-prefetch stage: overlap host batch prep and host->device transfer
with device compute.

The loader's thread pool (data/loader.py) overlaps wav IO + collate, but the
remaining per-step host work — augmentation masks, micro-batch stacking, and
above all the `jax.device_put` of ~50 MB of waveform data — ran synchronously
in the training loop. On TPU the transfer contends with in-flight execution,
so a 90 ms device step was gated behind >1 s of serialized host work (the
role the reference hides inside torch DataLoader worker processes +
pin_memory/non_blocking H2D, SPIRAL st2vec_pretrain.py:225-233).

`threaded_prefetch` runs an arbitrary batch-producing generator in a daemon
thread with a bounded queue of batches: while the device runs step i, the
background thread is already augmenting + issuing the transfer of batch
i+1/i+2 (jax.device_put is thread-safe and async).

What this stage can and cannot hide (measured, round 4): it OVERLAPS the
producer's host work (wav read + collate + augment + device_put issue,
~50-90 ms/batch at SPIRAL-base shapes) with device compute — the role the
reference fills with DataLoader worker processes. It cannot make the
host->device link faster: if per-step payload / step-time exceeds the H2D
bandwidth (as on the tunneled dev harness: 48 MB / 91 ms needs ~530 MB/s
against a measured ~47 MB/s link), the pipeline is link-bound no matter the
prefetch depth; on real TPU hosts PCIe provides GB/s and depth 2 suffices.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def threaded_prefetch(make_gen: Callable[[], Iterator[T]],
                      depth: int = 2) -> Iterator[T]:
    """Iterate `make_gen()` in a background thread, `depth` items ahead.

    make_gen: zero-arg callable returning the generator to drain (called in
      the producer thread, so any per-epoch setup it does happens there too).
    depth: max device-ready batches queued ahead of the consumer. 2 is
      enough to hide prep+transfer behind compute without pinning extra HBM.

    Exceptions in the producer propagate to the consumer at the point of the
    failed item. If the consumer stops early (break / GC), the producer is
    told to stop at its next yield.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()

    def _put(item) -> bool:
        """put that never deadlocks against a departed consumer: poll the
        stop flag while waiting for queue space (round-3 advice: a producer
        exception on a full queue leaked the thread forever)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in make_gen():
                if stop.is_set():
                    return
                if not _put(item):
                    return
        except BaseException as e:  # surface to the consumer
            _put(e)
            return
        _put(_SENTINEL)

    thread = threading.Thread(
        target=producer, daemon=True, name="device-prefetch"
    )
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # deterministic teardown on ANY exit (break, exception, exhaustion):
        # signal the producer, then drain queued device batches so up to
        # `depth` batches of HBM are released now, not at GC time.
        stop.set()
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
        thread.join(timeout=5.0)
        if thread.is_alive():
            # producer stuck inside make_gen I/O — its in-flight batch (and
            # anything it still enqueues) stays alive until GC; make the
            # leak visible instead of silent
            import logging

            logging.getLogger(__name__).warning(
                "device-prefetch producer did not exit within 5s; "
                "up to one device batch may be released only at GC"
            )
        else:
            # a producer blocked in _put's q.put(timeout=0.1) can slip one
            # final batch in after the first drain but before observing
            # stop — drain again now that the thread is gone
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
