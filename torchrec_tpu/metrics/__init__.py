from torchrec_tpu.metrics.metric_module import (
    MetricsConfig,
    RecMetricEnum,
    RecMetricModule,
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
