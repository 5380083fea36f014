"""Extended metric set — fills the reference's RecMetricEnum
(torchrec/metrics/metrics_config.py:21-61) beyond the core set in
metrics.py: NE variants, serving metrics, segmented/grouped metrics,
pairwise ranking metrics, multiclass/multilabel, session-level PR,
hindsight-target PR, scalar/output/bookkeeping metrics, tower QPS.

All follow the functional RecMetric contract (fixed-shape state pytrees,
psum/gather sync) so they run inside the jitted train step.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from torchrec_tpu.metrics.metrics import (
    AUCMetric,
    CalibrationMetric,
    NEMetric,
    _SumStateMetric,
    _bce,
)
from torchrec_tpu.metrics.rec_metric import (
    RecMetric,
    RecTaskInfo,
    ring_buffer_init,
    ring_buffer_push,
)

_EPS = 1e-7  # f32-safe (see metrics.py)

__all__ = [
    "NEPositiveMetric",
    "UnweightedNEMetric",
    "RecalibratedNEMetric",
    "RecalibratedCalibrationMetric",
    "ServingNEMetric",
    "ServingCalibrationMetric",
    "ServingAELossMetric",
    "CaliFreeNEMetric",
    "SegmentedNEMetric",
    "RAUCMetric",
    "XAUCMetric",
    "GAUCMetric",
    "MulticlassRecallMetric",
    "MultiLabelPrecisionMetric",
    "RecallSessionLevelMetric",
    "PrecisionSessionLevelMetric",
    "HindsightTargetPRMetric",
    "ScalarMetric",
    "AverageMetric",
    "OutputMetric",
    "TensorWeightedAvgMetric",
    "NumPositiveSamplesMetric",
    "SumWeightsMetric",
    "NumMissingLabelsMetric",
    "WeightedSumPredictionsMetric",
    "TowerQPSMetric",
]


# ------------------------------------------------------------- NE variants
class NEPositiveMetric(NEMetric):
    """NE restricted to positive-label examples (reference ne_positive)."""

    metric_name = "ne_positive"

    def _accumulate(self, p, l, w):
        return super()._accumulate(p, l, w * (l > 0))

    def _values(self, s):
        return {"ne_positive": super()._values(s)["ne"]}


class UnweightedNEMetric(NEMetric):
    """NE with all weights forced to 1 (reference unweighted_ne)."""

    metric_name = "unweighted_ne"

    def _accumulate(self, p, l, w):
        return super()._accumulate(p, l, jnp.ones_like(w))

    def _values(self, s):
        return {"unweighted_ne": super()._values(s)["ne"]}


def _recalibrate(p, alpha: float):
    """Downsampling recalibration p' = p / (p + (1-p)/alpha) (reference
    recalibration_module)."""
    return p / jnp.maximum(p + (1.0 - p) / alpha, _EPS)


class RecalibratedNEMetric(NEMetric):
    """NE after probability recalibration (reference torchrec/metrics/recalibrated_ne.py)."""

    metric_name = "recalibrated_ne"

    def __init__(self, tasks=None, recalibration_coefficient: float = 1.0,
                 **window_kw):
        super().__init__(tasks, **window_kw)
        self.alpha = recalibration_coefficient

    def _accumulate(self, p, l, w):
        return super()._accumulate(_recalibrate(p, self.alpha), l, w)

    def _values(self, s):
        return {"recalibrated_ne": super()._values(s)["ne"]}


class RecalibratedCalibrationMetric(CalibrationMetric):
    """Calibration after recalibration (reference torchrec/metrics/recalibrated_calibration.py)."""

    metric_name = "recalibrated_calibration"

    def __init__(self, tasks=None, recalibration_coefficient: float = 1.0,
                 **window_kw):
        super().__init__(tasks, **window_kw)
        self.alpha = recalibration_coefficient

    def _accumulate(self, p, l, w):
        return super()._accumulate(_recalibrate(p, self.alpha), l, w)

    def _values(self, s):
        return {"recalibrated_calibration": super()._values(s)["calibration"]}


class ServingNEMetric(NEMetric):
    """NE under serving example weights (reference serving_ne: same math,
    distinct weight stream — pass serving weights as ``weights``)."""

    metric_name = "serving_ne"

    def _values(self, s):
        return {"serving_ne": super()._values(s)["ne"]}


class ServingCalibrationMetric(CalibrationMetric):
    """Serving-side calibration (reference torchrec/metrics/serving_calibration.py)."""

    metric_name = "serving_calibration"

    def _values(self, s):
        return {"serving_calibration": super()._values(s)["calibration"]}


class ServingAELossMetric(_SumStateMetric):
    """Weighted absolute-error loss (reference serving_ae_loss)."""

    metric_name = "serving_ae_loss"
    fields = ("ae_sum", "weight_sum")

    def _accumulate(self, p, l, w):
        return {"ae_sum": jnp.sum(w * jnp.abs(p - l)), "weight_sum": jnp.sum(w)}

    def _values(self, s):
        return {"serving_ae_loss": s["ae_sum"] / jnp.maximum(s["weight_sum"], _EPS)}


class CaliFreeNEMetric(AUCMetric):
    """Calibration-free NE: NE of predictions rescaled so their weighted
    mean matches the label mean (reference cali_free_ne). Exact over the
    example window (the rescale is nonlinear in the sums, so this is a
    windowed metric here)."""

    metric_name = "cali_free_ne"

    def _compute(self, s):
        buf = s["buf"]
        valid = buf[:, 3]
        p = jnp.clip(buf[:, 0], _EPS, 1 - _EPS)
        l = buf[:, 1]
        w = buf[:, 2] * valid
        coef = jnp.sum(w * l) / jnp.maximum(jnp.sum(w * p), _EPS)
        p_cal = jnp.clip(p * coef, _EPS, 1 - _EPS)
        ce = jnp.sum(w * _bce(p_cal, l)) / jnp.maximum(jnp.sum(w), _EPS)
        ctr = jnp.clip(
            jnp.sum(w * l) / jnp.maximum(jnp.sum(w), _EPS), _EPS, 1 - _EPS
        )
        baseline = -(ctr * jnp.log(ctr) + (1 - ctr) * jnp.log(1 - ctr))
        return {"window_cali_free_ne": ce / jnp.maximum(baseline, _EPS)}


class SegmentedNEMetric(_SumStateMetric):
    """Per-segment NE (reference segmented_ne: grouping key per example).
    ``update`` takes an extra ``segments`` [B] int array."""

    metric_name = "segmented_ne"
    fields = ("ce_sum", "weight_sum", "pos_sum")

    def __init__(self, tasks=None, num_segments: int = 2, **window_kw):
        super().__init__(tasks, **window_kw)
        self.num_segments = num_segments

    def _zeros(self):
        z = jnp.zeros((self.num_segments,), jnp.float32)
        return {k: z for k in self.fields}

    def update(self, state, predictions, labels, weights=None, segments=None):
        if segments is None:
            raise ValueError("segmented_ne needs segments=[B] ints")
        new = {}
        for t in self._tasks:
            p = predictions[t.name] if isinstance(predictions, dict) else predictions
            l = labels[t.name] if isinstance(labels, dict) else labels
            w = jnp.ones_like(p) if weights is None else weights
            seg = jnp.clip(segments, 0, self.num_segments - 1)
            z = jnp.zeros((self.num_segments,), jnp.float32)
            acc = {
                "ce_sum": z.at[seg].add(w * _bce(p, l)),
                "weight_sum": z.at[seg].add(w),
                "pos_sum": z.at[seg].add(w * l),
            }
            new[t.name] = self._push(state[t.name], acc)
        return new

    def _values(self, s):
        ctr = jnp.clip(
            s["pos_sum"] / jnp.maximum(s["weight_sum"], _EPS), _EPS, 1 - _EPS
        )
        baseline = -(ctr * jnp.log(ctr) + (1 - ctr) * jnp.log(1 - ctr))
        ne = (s["ce_sum"] / jnp.maximum(s["weight_sum"], _EPS)) / jnp.maximum(
            baseline, _EPS
        )
        return {
            f"segmented_ne_{i}": ne[i] for i in range(self.num_segments)
        }


# --------------------------------------------------------- pairwise ranking
class RAUCMetric(AUCMetric):
    """Regression AUC: probability a random (higher-label, lower-label)
    pair is ordered correctly by the prediction (reference rauc.py) —
    O(n log n) over the window via rank statistics on label-distinct
    pairs is approximated by quantized-label concordance."""

    metric_name = "rauc"

    def _compute(self, s):
        buf = s["buf"]
        valid = buf[:, 3] > 0
        p = buf[:, 0]
        l = buf[:, 1]
        n = buf.shape[0]
        # O(n^2)-free concordance: count pairs (i, j) with l_i > l_j and
        # p_i > p_j using double argsort ranks over a subsample cap
        # (window buffers are bounded, direct O(n^2) on <=4096 is fine;
        # larger windows compare against a shifted sample)
        cap = 2048
        idx = jnp.arange(n) % cap
        mask = (jnp.arange(n) < cap) & valid
        pm = jnp.where(mask, p, 0.0)[:cap]
        lm = jnp.where(mask, l, 0.0)[:cap]
        vm = mask[:cap]
        dl = lm[:, None] - lm[None, :]
        dp = pm[:, None] - pm[None, :]
        pair_valid = vm[:, None] & vm[None, :] & (dl > 0)
        concordant = jnp.sum(pair_valid & (dp > 0)) + 0.5 * jnp.sum(
            pair_valid & (dp == 0)
        )
        total = jnp.maximum(jnp.sum(pair_valid), 1)
        return {"window_rauc": concordant / total}


class XAUCMetric(RAUCMetric):
    """XAUC (reference xauc.py): pairwise concordance weighted by |label
    difference| — emphasizes pairs that differ more."""

    metric_name = "xauc"

    def _compute(self, s):
        buf = s["buf"]
        valid = buf[:, 3] > 0
        cap = 2048
        mask = (jnp.arange(buf.shape[0]) < cap) & valid
        pm = jnp.where(mask, buf[:, 0], 0.0)[:cap]
        lm = jnp.where(mask, buf[:, 1], 0.0)[:cap]
        vm = mask[:cap]
        dl = lm[:, None] - lm[None, :]
        dp = pm[:, None] - pm[None, :]
        wpair = jnp.where(vm[:, None] & vm[None, :] & (dl > 0), dl, 0.0)
        good = jnp.sum(wpair * (dp > 0)) + 0.5 * jnp.sum(wpair * (dp == 0))
        total = jnp.maximum(jnp.sum(wpair), _EPS)
        return {"window_xauc": good / total}


class GAUCMetric(RecMetric):
    """Grouped AUC: mean per-group AUC (reference gauc.py — per-user AUC).
    ``update`` takes ``groups`` [B] ints; window-buffered."""

    metric_name = "gauc"

    def __init__(self, tasks=None, window: int = 8192, num_groups: int = 64):
        super().__init__(tasks or [RecTaskInfo()])
        self.window = window
        self.num_groups = num_groups

    def _init(self):
        return ring_buffer_init(self.window, 4)

    def update(self, state, predictions, labels, weights=None, groups=None):
        if groups is None:
            raise ValueError("gauc needs groups=[B] ints")
        new = {}
        for t in self._tasks:
            p = predictions[t.name] if isinstance(predictions, dict) else predictions
            l = labels[t.name] if isinstance(labels, dict) else labels
            g = jnp.clip(groups, 0, self.num_groups - 1).astype(jnp.float32)
            rows = jnp.stack([p, l, g, jnp.ones_like(p)], axis=1)
            new[t.name] = ring_buffer_push(state[t.name], rows)
        return new

    def _compute(self, s):
        buf = s["buf"]
        valid = buf[:, 3] > 0
        p, l, g = buf[:, 0], buf[:, 1], buf[:, 2].astype(jnp.int32)
        cap = min(2048, buf.shape[0])
        vm = valid[:cap]
        pm, lm, gm = p[:cap], l[:cap], g[:cap]
        same = (gm[:, None] == gm[None, :]) & vm[:, None] & vm[None, :]
        pos_neg = same & (lm[:, None] > lm[None, :])
        conc = (pm[:, None] > pm[None, :]).astype(jnp.float32) + 0.5 * (
            pm[:, None] == pm[None, :]
        )
        # per-group mean concordance, then mean over groups with pairs
        grp = jnp.clip(gm, 0, self.num_groups - 1)
        pair_w = pos_neg.astype(jnp.float32)
        num = jnp.zeros((self.num_groups,)).at[grp].add(
            jnp.sum(pair_w * conc, axis=1)
        )
        den = jnp.zeros((self.num_groups,)).at[grp].add(jnp.sum(pair_w, axis=1))
        has = den > 0
        gauc = jnp.where(has, num / jnp.maximum(den, _EPS), 0.0)
        return {
            "window_gauc": jnp.sum(gauc) / jnp.maximum(jnp.sum(has), _EPS)
        }

    sync = AUCMetric.sync


# ------------------------------------------------------ multiclass / label
class MulticlassRecallMetric(_SumStateMetric):
    """Per-class recall averaged over classes (reference
    multiclass_recall.py). ``predictions`` are [B, C] scores, labels [B]
    ints."""

    metric_name = "multiclass_recall"
    fields = ("tp", "support")

    def __init__(self, tasks=None, number_of_classes: int = 2, **window_kw):
        super().__init__(tasks, **window_kw)
        self.n_classes = number_of_classes

    def _zeros(self):
        z = jnp.zeros((self.n_classes,), jnp.float32)
        return {k: z for k in self.fields}

    def update(self, state, predictions, labels, weights=None):
        new = {}
        for t in self._tasks:
            p = predictions[t.name] if isinstance(predictions, dict) else predictions
            l = labels[t.name] if isinstance(labels, dict) else labels
            w = jnp.ones(p.shape[0]) if weights is None else weights
            pred_cls = jnp.argmax(p, axis=1)
            lab = jnp.clip(l.astype(jnp.int32), 0, self.n_classes - 1)
            hit = (pred_cls == lab).astype(jnp.float32) * w
            z = jnp.zeros((self.n_classes,), jnp.float32)
            acc = {"tp": z.at[lab].add(hit), "support": z.at[lab].add(w)}
            new[t.name] = self._push(state[t.name], acc)
        return new

    def _values(self, s):
        has = s["support"] > 0
        recall = jnp.where(has, s["tp"] / jnp.maximum(s["support"], _EPS), 0.0)
        return {
            "multiclass_recall": jnp.sum(recall)
            / jnp.maximum(jnp.sum(has), _EPS)
        }


class MultiLabelPrecisionMetric(_SumStateMetric):
    """Micro precision over [B, C] multi-label predictions at 0.5
    (reference multi_label_precision)."""

    metric_name = "multi_label_precision"
    fields = ("tp", "pp")

    def update(self, state, predictions, labels, weights=None):
        new = {}
        for t in self._tasks:
            p = predictions[t.name] if isinstance(predictions, dict) else predictions
            l = labels[t.name] if isinstance(labels, dict) else labels
            hard = (p > 0.5).astype(jnp.float32)
            acc = {"tp": jnp.sum(hard * l), "pp": jnp.sum(hard)}
            new[t.name] = self._push(state[t.name], acc)
        return new

    def _values(self, s):
        return {"multi_label_precision": s["tp"] / jnp.maximum(s["pp"], _EPS)}


# ----------------------------------------------------------- session level
class _SessionPRBase(_SumStateMetric):
    """Session-level P/R (reference recall_session_level.py): an example is
    positive if label >= threshold; a SESSION counts as hit if any of its
    examples is a predicted-and-true positive. ``update`` takes
    ``sessions`` [B] ints; sessions must not span update calls."""

    threshold: float = 0.5
    max_sessions_per_batch: int = 512
    fields = ("hit", "pred_sessions", "true_sessions")

    def update(self, state, predictions, labels, weights=None, sessions=None):
        if sessions is None:
            raise ValueError("session metrics need sessions=[B] ints")
        new = {}
        m = self.max_sessions_per_batch
        for t in self._tasks:
            p = predictions[t.name] if isinstance(predictions, dict) else predictions
            l = labels[t.name] if isinstance(labels, dict) else labels
            sid = jnp.clip(sessions, 0, m - 1)
            pred_pos = (p > self.threshold).astype(jnp.float32)
            true_pos = (l > self.threshold).astype(jnp.float32)
            present = jnp.zeros((m,)).at[sid].add(1.0) > 0
            s_pred = jnp.zeros((m,)).at[sid].add(pred_pos) > 0
            s_true = jnp.zeros((m,)).at[sid].add(true_pos) > 0
            s_hit = jnp.zeros((m,)).at[sid].add(pred_pos * true_pos) > 0
            acc = {
                "hit": jnp.sum(s_hit & present).astype(jnp.float32),
                "pred_sessions": jnp.sum(s_pred & present).astype(jnp.float32),
                "true_sessions": jnp.sum(s_true & present).astype(jnp.float32),
            }
            new[t.name] = self._push(state[t.name], acc)
        return new


class RecallSessionLevelMetric(_SessionPRBase):
    """Session-level recall (reference torchrec/metrics/recall_session.py)."""

    metric_name = "recall_session_level"

    def _values(self, s):
        return {
            "recall_session_level": s["hit"]
            / jnp.maximum(s["true_sessions"], _EPS)
        }


class PrecisionSessionLevelMetric(_SessionPRBase):
    """Session-level precision (reference torchrec/metrics/precision_session.py)."""

    metric_name = "precision_session_level"

    def _values(self, s):
        return {
            "precision_session_level": s["hit"]
            / jnp.maximum(s["pred_sessions"], _EPS)
        }


class HindsightTargetPRMetric(AUCMetric):
    """Hindsight-target precision/recall (reference hindsight_target_pr):
    the recall at the score threshold that would have achieved
    ``target_precision`` over the window, and vice versa."""

    metric_name = "hindsight_target_pr"

    def __init__(self, tasks=None, window: int = 65536,
                 target_precision: float = 0.5, target_recall: float = 0.5):
        super().__init__(tasks, window)
        self.target_precision = target_precision
        self.target_recall = target_recall

    def _compute(self, s):
        tps, fps = self._curve_sums(s)
        pos = jnp.maximum(tps[-1], _EPS)
        precision = tps / jnp.maximum(tps + fps, _EPS)
        recall = tps / pos
        ok_p = precision >= self.target_precision
        best_recall = jnp.max(jnp.where(ok_p, recall, 0.0))
        ok_r = recall >= self.target_recall
        best_precision = jnp.max(jnp.where(ok_r, precision, 0.0))
        return {
            f"window_recall_at_precision_{self.target_precision}": best_recall,
            f"window_precision_at_recall_{self.target_recall}": best_precision,
        }


# -------------------------------------------------------------- bookkeeping
class ScalarMetric(_SumStateMetric):
    """Average of a reported scalar stream (reference scalar.py)."""

    metric_name = "scalar"
    fields = ("value_sum", "count")

    def _accumulate(self, p, l, w):
        return {"value_sum": jnp.sum(w * p), "count": jnp.sum(w)}

    def _values(self, s):
        return {"scalar": s["value_sum"] / jnp.maximum(s["count"], _EPS)}


class AverageMetric(ScalarMetric):
    """Weighted average of a value stream (reference torchrec/metrics/weighted_avg.py)."""

    metric_name = "average"

    def _values(self, s):
        return {"average": s["value_sum"] / jnp.maximum(s["count"], _EPS)}


class OutputMetric(RecMetric):
    """Latest raw output passthrough (reference output.py)."""

    metric_name = "output"

    def _init(self):
        return {"last": jnp.zeros((), jnp.float32)}

    def _update(self, state, p, l, w):
        return {"last": jnp.mean(p)}

    def _compute(self, s):
        return {"output": s["last"]}

    def sync(self, state, axis_name):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, axis_name), state
        )


class TensorWeightedAvgMetric(_SumStateMetric):
    """Weighted average of an arbitrary [B, D] tensor (reference
    tensor_weighted_avg). ``predictions`` carry the tensor."""

    metric_name = "tensor_weighted_avg"
    fields = ("sum", "weight")

    def __init__(self, tasks=None, dim: int = 1, **window_kw):
        super().__init__(tasks, **window_kw)
        self.dim = dim

    def _zeros(self):
        return {
            "sum": jnp.zeros((self.dim,), jnp.float32),
            "weight": jnp.zeros((), jnp.float32),
        }

    def update(self, state, predictions, labels, weights=None):
        new = {}
        for t in self._tasks:
            x = predictions[t.name] if isinstance(predictions, dict) else predictions
            w = jnp.ones(x.shape[0]) if weights is None else weights
            acc = {
                "sum": jnp.sum(x * w[:, None], axis=0),
                "weight": jnp.sum(w),
            }
            new[t.name] = self._push(state[t.name], acc)
        return new

    def _values(self, s):
        avg = s["sum"] / jnp.maximum(s["weight"], _EPS)
        return {"tensor_weighted_avg": jnp.mean(avg)}


class NumPositiveSamplesMetric(_SumStateMetric):
    """Bookkeeping: positive-sample count (reference torchrec/metrics/scalar.py family)."""

    metric_name = "num_positive_samples"
    fields = ("count",)

    def _accumulate(self, p, l, w):
        return {"count": jnp.sum((l > 0).astype(jnp.float32))}

    def _values(self, s):
        return {"num_positive_samples": s["count"]}


class SumWeightsMetric(_SumStateMetric):
    """Bookkeeping: sum of example weights (reference torchrec/metrics/scalar.py family)."""

    metric_name = "sum_weights"
    fields = ("weight_sum",)

    def _accumulate(self, p, l, w):
        return {"weight_sum": jnp.sum(w)}

    def _values(self, s):
        return {"sum_weights": s["weight_sum"]}


class NumMissingLabelsMetric(_SumStateMetric):
    """Count of NaN labels (reference num_missing_labels)."""

    metric_name = "num_missing_labels"
    fields = ("count",)

    def _accumulate(self, p, l, w):
        return {"count": jnp.sum(jnp.isnan(l).astype(jnp.float32))}

    def _values(self, s):
        return {"num_missing_labels": s["count"]}


class WeightedSumPredictionsMetric(_SumStateMetric):
    """Bookkeeping: weighted sum of predictions (reference torchrec/metrics/scalar.py family)."""

    metric_name = "weighted_sum_predictions"
    fields = ("pred_sum",)

    def _accumulate(self, p, l, w):
        return {"pred_sum": jnp.sum(w * p)}

    def _values(self, s):
        return {"weighted_sum_predictions": s["pred_sum"]}


class TowerQPSMetric:
    """Per-tower examples/sec (reference tower_qps.py): host-side like
    ThroughputMetric, one counter per tower."""

    def __init__(self, towers: Sequence[str], warmup_steps: int = 2):
        self._towers = list(towers)
        self._counts = {t: 0 for t in towers}
        self._steps = 0
        self._warmup_steps = warmup_steps
        self._t0: Optional[float] = None

    def update(self, counts: Dict[str, int]) -> None:
        self._steps += 1
        if self._steps == self._warmup_steps:
            self._t0 = time.monotonic()
            self._counts = {t: 0 for t in self._towers}
            return
        for t, n in counts.items():
            self._counts[t] = self._counts.get(t, 0) + n

    def compute(self) -> Dict[str, float]:
        out = {}
        if self._t0 is not None:
            dt = max(time.monotonic() - self._t0, 1e-9)
            for t in self._towers:
                out[f"tower_qps-{t}|lifetime_qps"] = self._counts[t] / dt
        return out
