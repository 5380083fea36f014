"""Train pipelines: overlap host input work / H2D transfer / device compute.

Capability parity with torchrec/distributed/train_pipeline/
(TrainPipelineBase:260 — 2-stage H2D overlap; TrainPipelineSparseDist:530 —
3-batch in-flight with input-dist overlap; StagedTrainPipeline:2579 —
user-defined stages).

TPU-native shape: there are no CUDA streams to juggle —
  * JAX dispatch is async: calling the jitted step returns immediately and
    the device queue provides compute/compute overlap across steps;
  * ``jax.device_put`` is async: prefetching n batches overlaps H2D with
    compute (the reference's memcpy stream);
  * the input_dist/output_dist collectives live INSIDE the jitted step
    where XLA's latency-hiding scheduler overlaps them with dense compute
    (what the reference needs PipelinedForward model rewriting for,
    train_pipeline/utils.py:426).

So the pipeline's job reduces to: keep ``prefetch_depth`` batches in flight
on the device, run host-side stages (augmentation, id remapping, metric
host work) while the device is busy, and bound the in-flight window so
donated buffers don't pile up.
"""

from __future__ import annotations

import collections
from typing import Any, Callable, Deque, Iterator, List, Optional, Sequence, Tuple

import jax

__all__ = [
    "TrainPipelineBase",
    "TrainPipelineSparseDist",
    "StagedTrainPipeline",
    "PipelineStage",
]


class TrainPipelineBase:
    """2-stage pipeline: H2D copy of batch i+1 overlaps compute of batch i
    (reference train_pipelines.py:260)."""

    prefetch_depth = 1

    def __init__(
        self,
        step_fn: Callable[[Any, Any], Tuple[Any, Any]],
        state: Any,
        device: Optional[jax.Device] = None,
        sharding: Optional[jax.sharding.Sharding] = None,
        batch_preproc: Optional[Callable[[Any], Any]] = None,
    ):
        self._step = step_fn
        self._state = state
        self._device = device
        self._sharding = sharding
        self._preproc = batch_preproc
        self._inflight: Deque[Any] = collections.deque()
        self._exhausted = False
        self._steps = 0

    @property
    def state(self) -> Any:
        return self._state

    @property
    def steps(self) -> int:
        return self._steps

    def _put(self, batch: Any) -> Any:
        if self._preproc is not None:
            batch = self._preproc(batch)
        target = self._sharding or self._device
        if target is not None:
            batch = jax.device_put(batch, target)  # async H2D
        return batch

    def _fill(self, it: Iterator[Any]) -> None:
        while not self._exhausted and len(self._inflight) <= self.prefetch_depth:
            try:
                self._inflight.append(self._put(next(it)))
            except StopIteration:
                self._exhausted = True

    def progress(self, it: Iterator[Any]) -> Optional[Any]:
        """Run one step; returns its aux output (still on device, possibly
        not yet computed — async), or None when the iterator is exhausted."""
        self._fill(it)
        if not self._inflight:
            return None
        batch = self._inflight.popleft()
        self._state, aux = self._step(self._state, batch)
        self._steps += 1
        self._fill(it)  # enqueue next H2D while the device computes
        return aux


class TrainPipelineSparseDist(TrainPipelineBase):
    """3 batches in flight (reference train_pipelines.py:530). The
    input-dist overlap the reference implements with a data_dist stream +
    forward rewriting happens inside our jitted SPMD step (XLA schedules
    the id all-gather/psum_scatter around dense compute); the extra
    prefetch depth keeps the device queue from draining between steps."""

    prefetch_depth = 2


class PipelineStage:
    """One named host-side stage (reference pipeline_stage.py:74)."""

    def __init__(self, name: str, runnable: Callable[[Any], Any]):
        self.name = name
        self.runnable = runnable


class StagedTrainPipeline:
    """User-defined host stages executed pipelined in front of the device
    step (reference StagedTrainPipeline:2579). Stage i processes batch
    b-i while the device runs the step on the oldest fully-staged batch."""

    def __init__(
        self,
        pipeline_stages: Sequence[PipelineStage],
        step_fn: Callable[[Any, Any], Tuple[Any, Any]],
        state: Any,
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        self._stages = list(pipeline_stages)
        self._pipe: List[Optional[Any]] = [None] * (len(self._stages) + 1)
        self._step = step_fn
        self._state = state
        self._sharding = sharding
        self._exhausted = False
        self._steps = 0

    @property
    def state(self) -> Any:
        return self._state

    def progress(self, it: Iterator[Any]) -> Optional[Any]:
        # advance the stage pipe: last slot -> device step
        ready = self._pipe[-1]
        # shift batches through stages (run stages back-to-front)
        for i in range(len(self._stages), 0, -1):
            upstream = self._pipe[i - 1]
            self._pipe[i] = (
                self._stages[i - 1].runnable(upstream)
                if upstream is not None
                else None
            )
        if self._exhausted:
            self._pipe[0] = None
        else:
            try:
                self._pipe[0] = next(it)
            except StopIteration:
                self._exhausted = True
                self._pipe[0] = None
        if ready is None:
            if self._exhausted and all(p is None for p in self._pipe):
                return None
            return self.progress(it)  # pipeline still filling
        if self._sharding is not None:
            ready = jax.device_put(ready, self._sharding)
        self._state, aux = self._step(self._state, ready)
        self._steps += 1
        return aux


class PrefetchTrainPipeline(TrainPipelineBase):
    """Prefetch pipeline for cache-tier models
    (PrefetchTrainPipelineSparseDist analog, reference
    train_pipelines.py:1967): the host-side cache transform of batch i+1
    (KV-tier id remap + HBM cache fill, the UVM prefetch role) runs while
    the device computes batch i.

    ``prefetch_fn(batch) -> batch'`` is the host transform (e.g.
    KeyValueEmbeddingBagCollection.transform bound over params refs).
    """

    def __init__(self, step_fn, state, prefetch_fn, **kwargs):
        super().__init__(step_fn, state, batch_preproc=prefetch_fn, **kwargs)
        self.prefetch_depth = 2
