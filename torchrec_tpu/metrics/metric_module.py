"""RecMetricModule: config-driven collection of streaming metrics.

Capability parity with torchrec/metrics/metric_module.py:197
(RecMetricModule: RecMetrics + ThroughputMetric, compute every
``compute_interval_steps``, local vs cross-rank compute) and
metrics_config.py:145 (MetricsConfig -> generate_metric_module).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from torchrec_tpu.metrics.metrics import (
    AccuracyMetric,
    AUCMetric,
    AUPRCMetric,
    CalibrationMetric,
    CTRMetric,
    LogLossMetric,
    MAEMetric,
    MSEMetric,
    NDCGMetric,
    NEMetric,
    NMSEMetric,
    PrecisionMetric,
    RecallMetric,
    WeightedAvgMetric,
)
from torchrec_tpu.metrics.rec_metric import RecMetric, RecTaskInfo
from torchrec_tpu.metrics.throughput import ThroughputMetric

__all__ = [
    "RecMetricEnum",
    "MetricsConfig",
    "RecMetricModule",
    "NoOpMetricModule",
    "StepAuxCounters",
    "generate_metric_module",
]


class StepAuxCounters:
    """Accumulates scalar health counters from the train step's aux dict.

    The sparse paths emit per-step drop counters ("emb_grad_overflow" from
    the max_unique_gradient_rows window, "a2a_dropped" from the bucketized
    input dist's static capacity) that signal SILENT training corruption
    when nonzero. This folds them into the metric state so they reach the
    same reporting sink as model-quality metrics (the reference routes
    such health signals through its state-metrics/throughput family,
    torchrec/metrics/metric_module.py:197 + fbgemm bounds-check counters).

    jit-safe: ``update(state, aux)`` adds any present keys; missing keys
    pass through untouched.
    """

    def __init__(
        self, keys: Sequence[str] = ("emb_grad_overflow", "a2a_dropped")
    ):
        self.keys = tuple(keys)

    def init_state(self) -> Dict[str, jnp.ndarray]:
        return {k: jnp.zeros((), jnp.float32) for k in self.keys}

    def update(
        self, state: Dict[str, jnp.ndarray], aux: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        return {
            k: (
                state[k] + aux[k].astype(jnp.float32)
                if k in aux
                else state[k]
            )
            for k in self.keys
        }

    def compute(self, state: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        return {f"counter-{k}|lifetime": state[k] for k in self.keys}

    def sync(self, state, axis_name: str):
        return {
            k: jax.lax.psum(v, axis_name) for k, v in state.items()
        }


class RecMetricEnum(enum.Enum):
    """Metric registry names (reference metrics_config.py:21-61)."""

    NE = "ne"
    NE_POSITIVE = "ne_positive"
    UNWEIGHTED_NE = "unweighted_ne"
    RECALIBRATED_NE = "recalibrated_ne"
    RECALIBRATED_CALIBRATION = "recalibrated_calibration"
    SEGMENTED_NE = "segmented_ne"
    SERVING_NE = "serving_ne"
    SERVING_CALIBRATION = "serving_calibration"
    SERVING_AE_LOSS = "serving_ae_loss"
    CALI_FREE_NE = "cali_free_ne"
    RAUC = "rauc"
    XAUC = "xauc"
    GAUC = "gauc"
    MULTICLASS_RECALL = "multiclass_recall"
    MULTI_LABEL_PRECISION = "multi_label_precision"
    RECALL_SESSION_LEVEL = "recall_session_level"
    PRECISION_SESSION_LEVEL = "precision_session_level"
    HINDSIGHT_TARGET_PR = "hindsight_target_pr"
    SCALAR = "scalar"
    AVERAGE = "average"
    OUTPUT = "output"
    TENSOR_WEIGHTED_AVG = "tensor_weighted_avg"
    NUM_POSITIVE_SAMPLES = "num_positive_samples"
    SUM_WEIGHTS = "sum_weights"
    NUM_MISSING_LABELS = "num_missing_labels"
    WEIGHTED_SUM_PREDICTIONS = "weighted_sum_predictions"
    LOG_LOSS = "log_loss"
    AUC = "auc"
    AUPRC = "auprc"
    CALIBRATION = "calibration"
    CTR = "ctr"
    MSE = "mse"
    MAE = "mae"
    NMSE = "nmse"
    ACCURACY = "accuracy"
    PRECISION = "precision"
    RECALL = "recall"
    WEIGHTED_AVG = "weighted_avg"
    NDCG = "ndcg"


from torchrec_tpu.metrics.metrics_extra import (
    AverageMetric,
    CaliFreeNEMetric,
    GAUCMetric,
    HindsightTargetPRMetric,
    MultiLabelPrecisionMetric,
    MulticlassRecallMetric,
    NEPositiveMetric,
    NumMissingLabelsMetric,
    NumPositiveSamplesMetric,
    OutputMetric,
    PrecisionSessionLevelMetric,
    RAUCMetric,
    RecalibratedCalibrationMetric,
    RecalibratedNEMetric,
    RecallSessionLevelMetric,
    ScalarMetric,
    SegmentedNEMetric,
    ServingAELossMetric,
    ServingCalibrationMetric,
    ServingNEMetric,
    SumWeightsMetric,
    TensorWeightedAvgMetric,
    UnweightedNEMetric,
    WeightedSumPredictionsMetric,
    XAUCMetric,
)

_FACTORY = {
    RecMetricEnum.NE: NEMetric,
    RecMetricEnum.NE_POSITIVE: NEPositiveMetric,
    RecMetricEnum.UNWEIGHTED_NE: UnweightedNEMetric,
    RecMetricEnum.RECALIBRATED_NE: RecalibratedNEMetric,
    RecMetricEnum.RECALIBRATED_CALIBRATION: RecalibratedCalibrationMetric,
    RecMetricEnum.SEGMENTED_NE: SegmentedNEMetric,
    RecMetricEnum.SERVING_NE: ServingNEMetric,
    RecMetricEnum.SERVING_CALIBRATION: ServingCalibrationMetric,
    RecMetricEnum.SERVING_AE_LOSS: ServingAELossMetric,
    RecMetricEnum.CALI_FREE_NE: CaliFreeNEMetric,
    RecMetricEnum.RAUC: RAUCMetric,
    RecMetricEnum.XAUC: XAUCMetric,
    RecMetricEnum.GAUC: GAUCMetric,
    RecMetricEnum.MULTICLASS_RECALL: MulticlassRecallMetric,
    RecMetricEnum.MULTI_LABEL_PRECISION: MultiLabelPrecisionMetric,
    RecMetricEnum.RECALL_SESSION_LEVEL: RecallSessionLevelMetric,
    RecMetricEnum.PRECISION_SESSION_LEVEL: PrecisionSessionLevelMetric,
    RecMetricEnum.HINDSIGHT_TARGET_PR: HindsightTargetPRMetric,
    RecMetricEnum.SCALAR: ScalarMetric,
    RecMetricEnum.AVERAGE: AverageMetric,
    RecMetricEnum.OUTPUT: OutputMetric,
    RecMetricEnum.TENSOR_WEIGHTED_AVG: TensorWeightedAvgMetric,
    RecMetricEnum.NUM_POSITIVE_SAMPLES: NumPositiveSamplesMetric,
    RecMetricEnum.SUM_WEIGHTS: SumWeightsMetric,
    RecMetricEnum.NUM_MISSING_LABELS: NumMissingLabelsMetric,
    RecMetricEnum.WEIGHTED_SUM_PREDICTIONS: WeightedSumPredictionsMetric,
    RecMetricEnum.LOG_LOSS: LogLossMetric,
    RecMetricEnum.AUC: AUCMetric,
    RecMetricEnum.AUPRC: AUPRCMetric,
    RecMetricEnum.CALIBRATION: CalibrationMetric,
    RecMetricEnum.CTR: CTRMetric,
    RecMetricEnum.MSE: MSEMetric,
    RecMetricEnum.MAE: MAEMetric,
    RecMetricEnum.NMSE: NMSEMetric,
    RecMetricEnum.ACCURACY: AccuracyMetric,
    RecMetricEnum.PRECISION: PrecisionMetric,
    RecMetricEnum.RECALL: RecallMetric,
    RecMetricEnum.WEIGHTED_AVG: WeightedAvgMetric,
    RecMetricEnum.NDCG: NDCGMetric,
}


@dataclasses.dataclass
class MetricsConfig:
    """Reference metrics_config.py:145."""

    rec_metrics: Sequence[RecMetricEnum] = (RecMetricEnum.NE, RecMetricEnum.AUC)
    rec_tasks: Sequence[RecTaskInfo] = (RecTaskInfo(),)
    compute_interval_steps: int = 100
    auc_window: int = 65536


class RecMetricModule:
    """Holds metric objects + one functional state pytree.

    Usage inside a train loop:
        state = mm.init_state()
        state = mm.update(state, preds, labels, weights)  # jit-safe
        mm.tick()                                         # HOST side, 1/step
        if mm.should_compute(step): metrics = mm.compute(state)

    ``update`` touches only traced state and may live inside the jitted
    step; the throughput heartbeat reads the wall clock, so it is a
    separate host-side ``tick()`` — calling it from traced code would
    count compilations, not steps.
    """

    def __init__(
        self,
        metrics: Sequence[RecMetric],
        throughput: Optional[ThroughputMetric] = None,
        compute_interval_steps: int = 100,
        aux_counters: Optional[StepAuxCounters] = None,
    ):
        self.metrics = list(metrics)
        names = [m.metric_name for m in self.metrics]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate metric names: {names}")
        self.throughput = throughput
        self.compute_interval_steps = compute_interval_steps
        self.aux_counters = aux_counters

    def init_state(self) -> Dict[str, dict]:
        state = {m.metric_name: m.init_state() for m in self.metrics}
        if self.aux_counters is not None:
            state["_aux_counters"] = self.aux_counters.init_state()
        return state

    def tick(self, steps: int = 1) -> None:
        """Host-side per-step throughput heartbeat (wall clock). Call once
        per executed step OUTSIDE jit — e.g. next to ``should_compute``."""
        if self.throughput is not None:
            for _ in range(steps):
                self.throughput.update()

    def update(self, state, predictions, labels, weights=None, aux=None):
        new = {
            m.metric_name: m.update(
                state[m.metric_name], predictions, labels, weights
            )
            for m in self.metrics
        }
        if self.aux_counters is not None:
            new["_aux_counters"] = self.aux_counters.update(
                state["_aux_counters"], aux or {}
            )
        return new

    def should_compute(self, step: int) -> bool:
        return step > 0 and step % self.compute_interval_steps == 0

    def compute(self, state) -> Dict[str, float]:
        """Local compute (host): returns python floats."""
        out: Dict[str, float] = {}
        for m in self.metrics:
            for k, v in m.compute(state[m.metric_name]).items():
                out[k] = float(v)
        if self.aux_counters is not None:
            for k, v in self.aux_counters.compute(
                state["_aux_counters"]
            ).items():
                out[k] = float(v)
        if self.throughput is not None:
            out.update(self.throughput.compute())
        return out

    def sync_and_compute(self, state, axis_name: str):
        """Cross-rank compute (inside shard_map): sync each metric's state
        then compute; returns a dict of traced scalars (replicated)."""
        out = {}
        for m in self.metrics:
            synced = m.sync(state[m.metric_name], axis_name)
            out.update(m.compute(synced))
        if self.aux_counters is not None:
            out.update(
                self.aux_counters.compute(
                    self.aux_counters.sync(state["_aux_counters"], axis_name)
                )
            )
        return out

    def state_snapshot(self, state) -> Dict[str, dict]:
        """Checkpointable host copy of the metric state (reference
        metric_state_snapshot.py:24 MetricStateSnapshot.from_metrics —
        there it must collect distributed buffers off each RecMetric; here
        metric state is already ONE explicit pytree, so a snapshot is just
        that pytree pulled to host numpy)."""
        import numpy as np

        return jax.tree.map(np.asarray, state)

    def load_state_snapshot(self, snapshot) -> Dict[str, dict]:
        """Inverse of :meth:`state_snapshot`: validates the snapshot's
        structure against a fresh ``init_state`` and returns it as device
        arrays (reference metric_state_snapshot.py:87
        _load_into_reduced_states)."""
        ref = self.init_state()
        if jax.tree.structure(snapshot) != jax.tree.structure(ref):
            raise ValueError(
                "snapshot structure does not match this metric module's "
                "configuration"
            )
        return jax.tree.map(
            lambda s, r: jnp.asarray(s, r.dtype), snapshot, ref
        )


class NoOpMetricModule(RecMetricModule):
    """Metrics disabled (reference noop_metric_module.py:20): same
    interface, empty state, never computes."""

    def __init__(self) -> None:
        super().__init__(metrics=[], throughput=None)

    def update(self, state, predictions, labels, weights=None, aux=None):
        return state

    def should_compute(self, step: int) -> bool:
        return False


def generate_metric_module(
    config: MetricsConfig,
    batch_size: int = 0,
    world_size: int = 1,
) -> RecMetricModule:
    """Reference metric_module.py generate_metric_module."""
    metrics: List[RecMetric] = []
    for e in config.rec_metrics:
        cls = _FACTORY[e]
        if e in (RecMetricEnum.AUC, RecMetricEnum.AUPRC):
            metrics.append(cls(tasks=config.rec_tasks, window=config.auc_window))
        else:
            metrics.append(cls(tasks=config.rec_tasks))
    throughput = (
        ThroughputMetric(batch_size=batch_size, world_size=world_size)
        if batch_size
        else None
    )
    return RecMetricModule(
        metrics,
        throughput=throughput,
        compute_interval_steps=config.compute_interval_steps,
    )
