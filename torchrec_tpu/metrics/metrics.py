"""Core recommendation metrics.

Capability parity with the reference's torchrec/metrics/*.py
implementations (full enum at metrics_config.py:21-61). Lifetime +
windowed variants follow the reference's ``|lifetime_`` / ``|window_``
naming. All math is jit-compatible; windowed AUC/AUPRC keep an example
ring buffer and sort at compute time (reference auc.py:169's
sorted-threshold trapezoid).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from torchrec_tpu.metrics.rec_metric import (
    RecMetric,
    RecTaskInfo,
    ring_buffer_init,
    ring_buffer_push,
)

__all__ = [
    "NEMetric",
    "LogLossMetric",
    "AUCMetric",
    "AUPRCMetric",
    "CalibrationMetric",
    "CTRMetric",
    "MSEMetric",
    "MAEMetric",
    "NMSEMetric",
    "AccuracyMetric",
    "PrecisionMetric",
    "RecallMetric",
    "WeightedAvgMetric",
    "NDCGMetric",
]

# f32-safe: 1 - 1e-12 rounds to 1.0 in float32 and log(1-p) blows up; 1e-7
# is representable on both sides
_EPS = 1e-7


def _bce(p, l):
    p = jnp.clip(p, _EPS, 1.0 - _EPS)
    return -(l * jnp.log(p) + (1.0 - l) * jnp.log(1.0 - p))


class _SumStateMetric(RecMetric):
    """Base for metrics whose state is a dict of weighted sums (additive
    across batches AND ranks — psum-able)."""

    fields = ()

    def _init(self):
        return {k: jnp.zeros((), jnp.float32) for k in self.fields}

    def _accumulate(self, p, l, w) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def _update(self, state, p, l, w):
        acc = self._accumulate(p, l, w)
        return {k: state[k] + acc[k] for k in self.fields}


class NEMetric(_SumStateMetric):
    """Normalized Entropy: cross-entropy / entropy of the base rate
    (reference metrics/ne.py)."""

    metric_name = "ne"
    fields = ("ce_sum", "weight_sum", "pos_sum")

    def _accumulate(self, p, l, w):
        return {
            "ce_sum": jnp.sum(w * _bce(p, l)),
            "weight_sum": jnp.sum(w),
            "pos_sum": jnp.sum(w * l),
        }

    def _compute(self, s):
        ctr = s["pos_sum"] / jnp.maximum(s["weight_sum"], _EPS)
        ctr = jnp.clip(ctr, _EPS, 1.0 - _EPS)
        baseline = -(ctr * jnp.log(ctr) + (1 - ctr) * jnp.log(1 - ctr))
        ne = (s["ce_sum"] / jnp.maximum(s["weight_sum"], _EPS)) / jnp.maximum(
            baseline, _EPS
        )
        return {"lifetime_ne": ne}


class LogLossMetric(_SumStateMetric):
    """Windowed binary log-loss (reference torchrec/metrics/ne.py building blocks)."""

    metric_name = "logloss"
    fields = ("ce_sum", "weight_sum")

    def _accumulate(self, p, l, w):
        return {"ce_sum": jnp.sum(w * _bce(p, l)), "weight_sum": jnp.sum(w)}

    def _compute(self, s):
        return {
            "lifetime_logloss": s["ce_sum"] / jnp.maximum(s["weight_sum"], _EPS)
        }


class CalibrationMetric(_SumStateMetric):
    """sum(pred) / sum(label) (reference metrics/calibration.py)."""

    metric_name = "calibration"
    fields = ("pred_sum", "label_sum")

    def _accumulate(self, p, l, w):
        return {"pred_sum": jnp.sum(w * p), "label_sum": jnp.sum(w * l)}

    def _compute(self, s):
        return {
            "lifetime_calibration": s["pred_sum"]
            / jnp.maximum(s["label_sum"], _EPS)
        }


class CTRMetric(_SumStateMetric):
    """Predicted/label click-through rate (reference torchrec/metrics/ctr.py)."""

    metric_name = "ctr"
    fields = ("label_sum", "weight_sum")

    def _accumulate(self, p, l, w):
        return {"label_sum": jnp.sum(w * l), "weight_sum": jnp.sum(w)}

    def _compute(self, s):
        return {
            "lifetime_ctr": s["label_sum"] / jnp.maximum(s["weight_sum"], _EPS)
        }


class MSEMetric(_SumStateMetric):
    """MSE + RMSE (reference metrics/mse.py)."""

    metric_name = "mse"
    fields = ("se_sum", "weight_sum")

    def _accumulate(self, p, l, w):
        return {"se_sum": jnp.sum(w * (p - l) ** 2), "weight_sum": jnp.sum(w)}

    def _compute(self, s):
        mse = s["se_sum"] / jnp.maximum(s["weight_sum"], _EPS)
        return {"lifetime_mse": mse, "lifetime_rmse": jnp.sqrt(mse)}


class NMSEMetric(_SumStateMetric):
    """MSE normalized by label variance proxy (reference metrics/nmse)."""

    metric_name = "nmse"
    fields = ("se_sum", "weight_sum", "label_sum", "label_sq_sum")

    def _accumulate(self, p, l, w):
        return {
            "se_sum": jnp.sum(w * (p - l) ** 2),
            "weight_sum": jnp.sum(w),
            "label_sum": jnp.sum(w * l),
            "label_sq_sum": jnp.sum(w * l * l),
        }

    def _compute(self, s):
        wsum = jnp.maximum(s["weight_sum"], _EPS)
        mse = s["se_sum"] / wsum
        mean = s["label_sum"] / wsum
        var = jnp.maximum(s["label_sq_sum"] / wsum - mean * mean, _EPS)
        return {"lifetime_nmse": mse / var}


class MAEMetric(_SumStateMetric):
    """Mean absolute error (reference torchrec/metrics/mae.py)."""

    metric_name = "mae"
    fields = ("ae_sum", "weight_sum")

    def _accumulate(self, p, l, w):
        return {"ae_sum": jnp.sum(w * jnp.abs(p - l)), "weight_sum": jnp.sum(w)}

    def _compute(self, s):
        return {"lifetime_mae": s["ae_sum"] / jnp.maximum(s["weight_sum"], _EPS)}


class _ThresholdMetric(_SumStateMetric):
    threshold: float = 0.5
    fields = ("tp", "fp", "fn", "tn")

    def __init__(self, tasks=None, threshold: float = 0.5):
        super().__init__(tasks or [RecTaskInfo()])
        self.threshold = threshold

    def _accumulate(self, p, l, w):
        pred = (p >= self.threshold).astype(jnp.float32)
        return {
            "tp": jnp.sum(w * pred * l),
            "fp": jnp.sum(w * pred * (1 - l)),
            "fn": jnp.sum(w * (1 - pred) * l),
            "tn": jnp.sum(w * (1 - pred) * (1 - l)),
        }


class AccuracyMetric(_ThresholdMetric):
    """Thresholded accuracy (reference torchrec/metrics/accuracy.py)."""

    metric_name = "accuracy"

    def _compute(self, s):
        total = s["tp"] + s["fp"] + s["fn"] + s["tn"]
        return {
            "lifetime_accuracy": (s["tp"] + s["tn"]) / jnp.maximum(total, _EPS)
        }


class PrecisionMetric(_ThresholdMetric):
    """Thresholded precision (reference torchrec/metrics/precision.py)."""

    metric_name = "precision"

    def _compute(self, s):
        return {
            "lifetime_precision": s["tp"] / jnp.maximum(s["tp"] + s["fp"], _EPS)
        }


class RecallMetric(_ThresholdMetric):
    """Thresholded recall (reference torchrec/metrics/recall.py)."""

    metric_name = "recall"

    def _compute(self, s):
        return {
            "lifetime_recall": s["tp"] / jnp.maximum(s["tp"] + s["fn"], _EPS)
        }


class WeightedAvgMetric(_SumStateMetric):
    """Weighted average of the prediction (reference weighted_avg.py)."""

    metric_name = "weighted_avg"
    fields = ("pred_sum", "weight_sum")

    def _accumulate(self, p, l, w):
        return {"pred_sum": jnp.sum(w * p), "weight_sum": jnp.sum(w)}

    def _compute(self, s):
        return {
            "lifetime_weighted_avg": s["pred_sum"]
            / jnp.maximum(s["weight_sum"], _EPS)
        }


class AUCMetric(RecMetric):
    """Windowed exact AUC: ring buffer of (pred, label, weight); compute
    sorts by prediction and integrates (reference metrics/auc.py:169 keeps
    window predictions and does a sorted-threshold trapezoid)."""

    metric_name = "auc"

    def __init__(self, tasks=None, window: int = 65536):
        super().__init__(tasks or [RecTaskInfo()])
        self.window = window

    def _init(self):
        # columns: prediction, label, weight, valid (explicit validity so
        # cross-rank gathered buffers need no positional bookkeeping)
        return ring_buffer_init(self.window, 4)

    def _update(self, state, p, l, w):
        return ring_buffer_push(
            state, jnp.stack([p, l, w, jnp.ones_like(p)], axis=1)
        )

    def _curve_sums(self, s):
        buf = s["buf"]
        valid = buf[:, 3]
        p = jnp.where(valid > 0, buf[:, 0], -jnp.inf)
        l = buf[:, 1] * valid
        w = buf[:, 2] * valid
        order = jnp.argsort(-p)  # descending prediction
        l_s = jnp.take(l, order)
        w_s = jnp.take(w, order)
        tps = jnp.cumsum(w_s * l_s)
        fps = jnp.cumsum(w_s * (1 - l_s))
        return tps, fps

    def _compute(self, s):
        tps, fps = self._curve_sums(s)
        pos = tps[-1]
        neg = fps[-1]
        tpr = tps / jnp.maximum(pos, _EPS)
        fpr = fps / jnp.maximum(neg, _EPS)
        auc = jnp.trapezoid(tpr, fpr)
        auc = jnp.where((pos > 0) & (neg > 0), auc, 0.5)
        return {"window_auc": auc}

    def sync(self, state, axis_name: str):
        """Gather buffers across ranks (buffers aren't additive). NOTE: the
        synced state is compute-only — its buffer grows by the world size,
        so don't carry it back as the running state (the reference also
        syncs at compute time only)."""
        out = {}
        for task, s in state.items():
            bufs = jax.lax.all_gather(s["buf"], axis_name)  # [W, window, 4]
            filled = jax.lax.all_gather(s["filled"], axis_name)
            w, n, c = bufs.shape
            out[task] = {
                "buf": bufs.reshape(w * n, c),  # valid column travels along
                "cursor": jnp.zeros((), jnp.int32),
                "filled": jnp.sum(filled),
            }
        return out


class AUPRCMetric(AUCMetric):
    """Windowed area under precision-recall (reference metrics/auprc.py)."""

    metric_name = "auprc"

    def _compute(self, s):
        tps, fps = self._curve_sums(s)
        pos = tps[-1]
        precision = tps / jnp.maximum(tps + fps, _EPS)
        recall = tps / jnp.maximum(pos, _EPS)
        auprc = jnp.trapezoid(precision, recall)
        return {"window_auprc": jnp.where(pos > 0, auprc, 0.0)}


class NDCGMetric(RecMetric):
    """Session-free NDCG@k over fixed-size candidate slates:
    update takes [B, K] scores + [B, K] relevance (reference metrics/ndcg.py
    is session-keyed; the slate form is its TPU-friendly equivalent)."""

    metric_name = "ndcg"

    def __init__(self, tasks=None, k: int = 10):
        super().__init__(tasks or [RecTaskInfo()])
        self.k = k

    def _init(self):
        return {
            "ndcg_sum": jnp.zeros((), jnp.float32),
            "count": jnp.zeros((), jnp.float32),
        }

    def _update(self, state, p, l, w):
        # p/l: [B, K] slates
        k = min(self.k, p.shape[1])
        order = jnp.argsort(-p, axis=1)[:, :k]
        rel = jnp.take_along_axis(l, order, axis=1)
        discounts = 1.0 / jnp.log2(jnp.arange(k, dtype=jnp.float32) + 2.0)
        dcg = jnp.sum(rel * discounts[None, :], axis=1)
        ideal = jnp.take_along_axis(l, jnp.argsort(-l, axis=1)[:, :k], axis=1)
        idcg = jnp.sum(ideal * discounts[None, :], axis=1)
        ndcg = jnp.where(idcg > 0, dcg / jnp.maximum(idcg, _EPS), 0.0)
        has = (idcg > 0).astype(jnp.float32)
        return {
            "ndcg_sum": state["ndcg_sum"] + jnp.sum(ndcg),
            "count": state["count"] + jnp.sum(has),
        }

    def _compute(self, s):
        return {
            f"lifetime_ndcg@{self.k}": s["ndcg_sum"]
            / jnp.maximum(s["count"], _EPS)
        }

    def update(self, state, predictions, labels, weights=None):
        # slates are 2D; bypass the 1D coercion of the base class
        new = {}
        for t in self._tasks:
            p = predictions[t.name] if isinstance(predictions, dict) else predictions
            l = labels[t.name] if isinstance(labels, dict) else labels
            new[t.name] = self._update(
                state[t.name], p.astype(jnp.float32), l.astype(jnp.float32), None
            )
        return new
