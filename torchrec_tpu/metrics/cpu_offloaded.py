"""CPU-offloaded metrics: update on a host thread, off the device path.

Capability parity with the reference CPUOffloadedRecMetricModule
(torchrec/metrics/cpu_offloaded_metric_module.py:233 — ``update()``
enqueues cloned model outputs to a background thread; metric state lives
on CPU; ``compute()`` synchronizes the queue first).

TPU-native shape: metric states here are already functional pytrees, so
offloading = fetch the (small) per-batch outputs to host and fold them
into a host-resident state on a worker thread, pinned to the CPU backend
when one is present. The device step never blocks on metric math; the
only sync point is ``compute()``.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np

from torchrec_tpu.metrics.metric_module import RecMetricModule

__all__ = ["CPUOffloadedMetricModule"]


class CPUOffloadedMetricModule:
    """Stateful wrapper owning a host-side metric state.

    ``update(predictions, labels, weights)`` is non-blocking (bounded
    queue, default 128 pending batches — a full queue applies backpressure
    exactly like the reference's sync-point cap). ``compute()`` drains the
    queue and returns the metric dict.
    """

    def __init__(self, module: RecMetricModule, max_pending: int = 128):
        self._module = module
        self._state = None
        try:
            self._cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            self._cpu = None
        self._q: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._started = False
        self._stop = object()  # sentinel

    # ------------------------------------------------------------ lifecycle
    def init(self) -> "CPUOffloadedMetricModule":
        state = self._module.init_state()
        # state stays jnp (metric updates use .at[]) but on the CPU backend
        self._state = (
            jax.device_put(state, self._cpu)
            if self._cpu is not None
            else state
        )
        self._started = True
        self._thread.start()
        return self

    def _loop(self):
        while True:
            item = self._q.get()
            try:
                if item is self._stop:
                    return
                preds, labels, weights = item
                ctx = (
                    jax.default_device(self._cpu)
                    if self._cpu is not None
                    else _null_ctx()
                )
                with ctx:
                    self._state = self._module.update(
                        self._state, preds, labels, weights
                    )
            except BaseException as e:  # surfaced at the next sync point
                self._err = e
            finally:
                self._q.task_done()

    # ------------------------------------------------------------------ api
    def update(self, predictions, labels, weights=None) -> None:
        """Enqueue one batch; device arrays are fetched to host here (the
        transfer overlaps the caller's next step)."""
        if self._err is not None:
            raise RuntimeError("metric worker failed") from self._err
        item = (
            np.asarray(predictions),
            np.asarray(labels),
            None if weights is None else np.asarray(weights),
        )
        self._q.put(item)

    def compute(self) -> Dict[str, float]:
        """Sync point: wait for every pending update, then compute."""
        self._q.join()
        if self._err is not None:
            raise RuntimeError("metric worker failed") from self._err
        return self._module.compute(self._state)

    @property
    def state(self) -> Any:
        self._q.join()
        return self._state

    def stop(self) -> None:
        if self._started:
            self._q.put(self._stop)
            self._thread.join(timeout=5)
            self._started = False


class _null_ctx:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
