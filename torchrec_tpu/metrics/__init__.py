"""Training metrics (reference torchrec/metrics/__init__.py)."""
from torchrec_tpu.metrics.metric_module import (
    MetricsConfig,
    NoOpMetricModule,
    RecMetricEnum,
    RecMetricModule,
    StepAuxCounters,
    generate_metric_module,
)
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
    "MetricsConfig",
    "RecMetricEnum",
    "RecMetricModule",
    "NoOpMetricModule",
    "StepAuxCounters",
    "generate_metric_module",
    "AccuracyMetric",
    "AUCMetric",
    "AUPRCMetric",
    "CalibrationMetric",
    "CTRMetric",
    "LogLossMetric",
    "MAEMetric",
    "MSEMetric",
    "NDCGMetric",
    "NEMetric",
    "NMSEMetric",
    "PrecisionMetric",
    "RecallMetric",
    "WeightedAvgMetric",
    "RecMetric",
    "RecTaskInfo",
    "ThroughputMetric",
]

from torchrec_tpu.metrics import metrics_extra as _extra
from torchrec_tpu.metrics.metrics_extra import *  # noqa: F401,F403
from torchrec_tpu.metrics.metrics_extra import TowerQPSMetric  # noqa: F401
__all__ = list(__all__) + list(_extra.__all__)


def __getattr__(name):
    if name == "CPUOffloadedMetricModule":
        from torchrec_tpu.metrics.cpu_offloaded import CPUOffloadedMetricModule

        return CPUOffloadedMetricModule
    raise AttributeError(name)


__all__ = list(__all__) + ["CPUOffloadedMetricModule"]
