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
    across batches AND ranks — psum-able).

    Every sum-state metric reports BOTH ``lifetime_*`` (all history) and
    ``window_*`` (recent history) values, mirroring the reference's
    WindowBuffer (torchrec/metrics/rec_metric.py:119) which keeps lifetime
    and window states for every metric. The window is a ring of
    ``window_buckets`` per-field partial sums; each bucket accumulates
    ``batches_per_bucket`` update calls and starting a new bucket evicts
    the oldest, so the window spans between ``(K-1)*B+1`` and ``K*B`` most
    recent update calls — jit-compatible fixed-shape state, unlike the
    reference's Python deque. Subclasses implement ``_accumulate``
    (per-batch partial sums) and ``_values`` (the final formula over sums,
    un-prefixed names); the base derives both variants from one formula.
    """

    fields = ()
    window_buckets = 32
    batches_per_bucket = 8

    def __init__(self, tasks=None, window_buckets=None, batches_per_bucket=None):
        super().__init__(tasks or [RecTaskInfo()])
        if window_buckets is not None:
            self.window_buckets = int(window_buckets)
        if batches_per_bucket is not None:
            self.batches_per_bucket = int(batches_per_bucket)

    def _zeros(self) -> Dict[str, jnp.ndarray]:
        """Per-field zero templates; override for non-scalar field state."""
        return {k: jnp.zeros((), jnp.float32) for k in self.fields}

    def _init(self):
        z = self._zeros()
        st = dict(z)
        st["win"] = {
            k: jnp.zeros((self.window_buckets,) + v.shape, v.dtype)
            for k, v in z.items()
        }
        st["win_step"] = jnp.zeros((), jnp.int32)
        return st

    def _accumulate(self, p, l, w) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def _push(self, state, acc):
        """Fold one batch's partial sums into lifetime + window state."""
        new = {k: state[k] + acc[k] for k in acc}
        step = state["win_step"]
        bucket = (step // self.batches_per_bucket) % self.window_buckets
        fresh = (step % self.batches_per_bucket) == 0
        win = {}
        for k, a in acc.items():
            cur = state["win"][k][bucket]
            cur = jnp.where(fresh, jnp.zeros_like(cur), cur)
            win[k] = state["win"][k].at[bucket].set(cur + a)
        new["win"] = win
        new["win_step"] = step + 1
        return new

    def _update(self, state, p, l, w):
        return self._push(state, self._accumulate(p, l, w))

    def _values(self, s) -> Dict[str, jnp.ndarray]:
        """Final metric values from a dict of (lifetime OR window) sums."""
        raise NotImplementedError

    def _compute(self, s):
        names = self._zeros().keys()
        life = self._values({k: s[k] for k in names})
        win = self._values({k: jnp.sum(s["win"][k], axis=0) for k in names})
        out = {f"lifetime_{n}": v for n, v in life.items()}
        out.update({f"window_{n}": v for n, v in win.items()})
        return out


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

    def _values(self, s):
        ctr = s["pos_sum"] / jnp.maximum(s["weight_sum"], _EPS)
        ctr = jnp.clip(ctr, _EPS, 1.0 - _EPS)
        baseline = -(ctr * jnp.log(ctr) + (1 - ctr) * jnp.log(1 - ctr))
        ne = (s["ce_sum"] / jnp.maximum(s["weight_sum"], _EPS)) / jnp.maximum(
            baseline, _EPS
        )
        return {"ne": ne}


class LogLossMetric(_SumStateMetric):
    """Windowed binary log-loss (reference torchrec/metrics/ne.py building blocks)."""

    metric_name = "logloss"
    fields = ("ce_sum", "weight_sum")

    def _accumulate(self, p, l, w):
        return {"ce_sum": jnp.sum(w * _bce(p, l)), "weight_sum": jnp.sum(w)}

    def _values(self, s):
        return {"logloss": s["ce_sum"] / jnp.maximum(s["weight_sum"], _EPS)}


class CalibrationMetric(_SumStateMetric):
    """sum(pred) / sum(label) (reference metrics/calibration.py)."""

    metric_name = "calibration"
    fields = ("pred_sum", "label_sum")

    def _accumulate(self, p, l, w):
        return {"pred_sum": jnp.sum(w * p), "label_sum": jnp.sum(w * l)}

    def _values(self, s):
        return {"calibration": s["pred_sum"] / jnp.maximum(s["label_sum"], _EPS)}


class CTRMetric(_SumStateMetric):
    """Predicted/label click-through rate (reference torchrec/metrics/ctr.py)."""

    metric_name = "ctr"
    fields = ("label_sum", "weight_sum")

    def _accumulate(self, p, l, w):
        return {"label_sum": jnp.sum(w * l), "weight_sum": jnp.sum(w)}

    def _values(self, s):
        return {"ctr": s["label_sum"] / jnp.maximum(s["weight_sum"], _EPS)}


class MSEMetric(_SumStateMetric):
    """MSE + RMSE (reference metrics/mse.py)."""

    metric_name = "mse"
    fields = ("se_sum", "weight_sum")

    def _accumulate(self, p, l, w):
        return {"se_sum": jnp.sum(w * (p - l) ** 2), "weight_sum": jnp.sum(w)}

    def _values(self, s):
        mse = s["se_sum"] / jnp.maximum(s["weight_sum"], _EPS)
        return {"mse": mse, "rmse": jnp.sqrt(mse)}


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

    def _values(self, s):
        wsum = jnp.maximum(s["weight_sum"], _EPS)
        mse = s["se_sum"] / wsum
        mean = s["label_sum"] / wsum
        var = jnp.maximum(s["label_sq_sum"] / wsum - mean * mean, _EPS)
        return {"nmse": mse / var}


class MAEMetric(_SumStateMetric):
    """Mean absolute error (reference torchrec/metrics/mae.py)."""

    metric_name = "mae"
    fields = ("ae_sum", "weight_sum")

    def _accumulate(self, p, l, w):
        return {"ae_sum": jnp.sum(w * jnp.abs(p - l)), "weight_sum": jnp.sum(w)}

    def _values(self, s):
        return {"mae": s["ae_sum"] / jnp.maximum(s["weight_sum"], _EPS)}


class _ThresholdMetric(_SumStateMetric):
    threshold: float = 0.5
    fields = ("tp", "fp", "fn", "tn")

    def __init__(self, tasks=None, threshold: float = 0.5, **window_kw):
        super().__init__(tasks, **window_kw)
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

    def _values(self, s):
        total = s["tp"] + s["fp"] + s["fn"] + s["tn"]
        return {"accuracy": (s["tp"] + s["tn"]) / jnp.maximum(total, _EPS)}


class PrecisionMetric(_ThresholdMetric):
    """Thresholded precision (reference torchrec/metrics/precision.py)."""

    metric_name = "precision"

    def _values(self, s):
        return {"precision": s["tp"] / jnp.maximum(s["tp"] + s["fp"], _EPS)}


class RecallMetric(_ThresholdMetric):
    """Thresholded recall (reference torchrec/metrics/recall.py)."""

    metric_name = "recall"

    def _values(self, s):
        return {"recall": s["tp"] / jnp.maximum(s["tp"] + s["fn"], _EPS)}


class WeightedAvgMetric(_SumStateMetric):
    """Weighted average of the prediction (reference weighted_avg.py)."""

    metric_name = "weighted_avg"
    fields = ("pred_sum", "weight_sum")

    def _accumulate(self, p, l, w):
        return {"pred_sum": jnp.sum(w * p), "weight_sum": jnp.sum(w)}

    def _values(self, s):
        return {"weighted_avg": s["pred_sum"] / jnp.maximum(s["weight_sum"], _EPS)}


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


class NDCGMetric(_SumStateMetric):
    """Session-free NDCG@k over fixed-size candidate slates:
    update takes [B, K] scores + [B, K] relevance (reference metrics/ndcg.py
    is session-keyed; the slate form is its TPU-friendly equivalent)."""

    metric_name = "ndcg"
    fields = ("ndcg_sum", "count")

    def __init__(self, tasks=None, k: int = 10, **window_kw):
        super().__init__(tasks, **window_kw)
        self.k = k

    def _accumulate(self, p, l, w):
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
        return {"ndcg_sum": jnp.sum(ndcg), "count": jnp.sum(has)}

    def _values(self, s):
        return {
            f"ndcg@{self.k}": s["ndcg_sum"] / jnp.maximum(s["count"], _EPS)
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
