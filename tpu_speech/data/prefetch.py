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
thread with a bounded queue of DEVICE-READY batches: while the device runs
step i, the background thread is already augmenting + transferring batch
i+1/i+2. Transfers are issued from the producer thread (jax.device_put is
thread-safe and async), so by the time the consumer dispatches the step its
operands are resident.
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

    def producer():
        try:
            for item in make_gen():
                if stop.is_set():
                    return
                q.put(item)
                if stop.is_set():
                    return
        except BaseException as e:  # surface to the consumer
            q.put(e)
            return
        q.put(_SENTINEL)

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
        stop.set()
        # unblock a producer stuck on q.put so the thread can exit
        try:
            q.get_nowait()
        except queue.Empty:
            pass
