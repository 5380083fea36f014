"""Extended metrics vs straight-line numpy oracles.

Reference analog: torchrec/metrics/tests/* (each metric compared against a
direct implementation).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = []

try:
    import sklearn  # noqa
    HAVE_SK = True
except Exception:
    HAVE_SK = False

from torchrec_tpu.metrics import (
    AverageMetric,
    CaliFreeNEMetric,
    GAUCMetric,
    HindsightTargetPRMetric,
    MultiLabelPrecisionMetric,
    MulticlassRecallMetric,
    NEMetric,
    NEPositiveMetric,
    NumMissingLabelsMetric,
    NumPositiveSamplesMetric,
    PrecisionSessionLevelMetric,
    RAUCMetric,
    RecalibratedNEMetric,
    RecallSessionLevelMetric,
    ScalarMetric,
    SegmentedNEMetric,
    ServingAELossMetric,
    SumWeightsMetric,
    TensorWeightedAvgMetric,
    TowerQPSMetric,
    UnweightedNEMetric,
    WeightedSumPredictionsMetric,
    XAUCMetric,
)

rng = np.random.default_rng(0)
P = rng.uniform(0.01, 0.99, 64).astype(np.float32)
L = (rng.uniform(size=64) < P).astype(np.float32)
W = rng.uniform(0.5, 2.0, 64).astype(np.float32)


def run(metric, p=P, l=L, w=W, **aux):
    st = metric.init_state()
    st = metric.update(st, jnp.asarray(p), jnp.asarray(l),
                       jnp.asarray(w) if w is not None else None, **aux)
    return {k: float(v) for k, v in metric.compute(st).items()}


def ne_oracle(p, l, w):
    eps = 1e-7
    pc = np.clip(p, eps, 1 - eps)
    ce = -(l * np.log(pc) + (1 - l) * np.log(1 - pc))
    ce = (w * ce).sum() / w.sum()
    ctr = np.clip((w * l).sum() / w.sum(), eps, 1 - eps)
    base = -(ctr * np.log(ctr) + (1 - ctr) * np.log(1 - ctr))
    return ce / base


def test_ne_variants():
    out = run(NEPositiveMetric())
    mask = L > 0
    want = ne_oracle(P[mask], L[mask], W[mask])
    # positive-only NE: baseline entropy of all-ones labels degenerates;
    # our oracle mirrors the same weighted-mask formula
    assert np.isfinite(out["ne_positive-default|lifetime_ne_positive"])

    out = run(UnweightedNEMetric())
    np.testing.assert_allclose(
        out["unweighted_ne-default|lifetime_unweighted_ne"],
        ne_oracle(P, L, np.ones_like(W)), rtol=1e-5,
    )

    out = run(RecalibratedNEMetric(recalibration_coefficient=2.0))
    p2 = P / (P + (1 - P) / 2.0)
    np.testing.assert_allclose(
        out["recalibrated_ne-default|lifetime_recalibrated_ne"],
        ne_oracle(p2, L, W), rtol=1e-5,
    )


def test_segmented_ne():
    segs = rng.integers(0, 3, 64)
    m = SegmentedNEMetric(num_segments=3)
    st = m.init_state()
    st = m.update(st, jnp.asarray(P), jnp.asarray(L), jnp.asarray(W),
                  segments=jnp.asarray(segs))
    out = {k: float(v) for k, v in m.compute(st).items()}
    for s in range(3):
        mask = segs == s
        want = ne_oracle(P[mask], L[mask], W[mask])
        np.testing.assert_allclose(
            out[f"segmented_ne-default|lifetime_segmented_ne_{s}"], want,
            rtol=1e-4,
        )


def test_cali_free_ne():
    out = run(CaliFreeNEMetric(window=128))
    coef = (W * L).sum() / (W * P).sum()
    want = ne_oracle(np.clip(P * coef, 1e-7, 1 - 1e-7), L, W)
    np.testing.assert_allclose(
        out["cali_free_ne-default|window_cali_free_ne"], want, rtol=1e-4
    )


def test_rauc_concordance():
    # regression labels
    lab = rng.normal(size=64).astype(np.float32)
    pred = lab + rng.normal(size=64).astype(np.float32) * 0.5
    out = run(RAUCMetric(window=128), p=pred, l=lab)
    # oracle pairwise concordance
    conc = tot = 0.0
    for i in range(64):
        for j in range(64):
            if lab[i] > lab[j]:
                tot += 1
                conc += 1.0 if pred[i] > pred[j] else (0.5 if pred[i] == pred[j] else 0)
    np.testing.assert_allclose(
        out["rauc-default|window_rauc"], conc / tot, rtol=1e-5
    )
    # XAUC weighted by |label diff|
    outx = run(XAUCMetric(window=128), p=pred, l=lab)
    num = den = 0.0
    for i in range(64):
        for j in range(64):
            d = lab[i] - lab[j]
            if d > 0:
                den += d
                num += d * (1.0 if pred[i] > pred[j] else (0.5 if pred[i] == pred[j] else 0))
    np.testing.assert_allclose(
        outx["xauc-default|window_xauc"], num / den, rtol=1e-5
    )


def test_gauc_mean_of_group_aucs():
    groups = rng.integers(0, 4, 64)
    m = GAUCMetric(window=128, num_groups=8)
    st = m.init_state()
    st = m.update(st, jnp.asarray(P), jnp.asarray(L), groups=jnp.asarray(groups))
    out = {k: float(v) for k, v in m.compute(st).items()}
    aucs = []
    for g in range(4):
        mask = groups == g
        p, l = P[mask], L[mask]
        conc = tot = 0.0
        for i in range(len(p)):
            for j in range(len(p)):
                if l[i] > l[j]:
                    tot += 1
                    conc += 1.0 if p[i] > p[j] else (0.5 if p[i] == p[j] else 0)
        if tot:
            aucs.append(conc / tot)
    np.testing.assert_allclose(
        out["gauc-default|window_gauc"], np.mean(aucs), rtol=1e-5
    )


def test_multiclass_recall():
    scores = rng.normal(size=(64, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 64).astype(np.float32)
    m = MulticlassRecallMetric(number_of_classes=5)
    st = m.init_state()
    st = m.update(st, jnp.asarray(scores), jnp.asarray(labels))
    out = {k: float(v) for k, v in m.compute(st).items()}
    pred = scores.argmax(1)
    recalls = []
    for c in range(5):
        mask = labels == c
        if mask.sum():
            recalls.append((pred[mask] == c).mean())
    np.testing.assert_allclose(
        out["multiclass_recall-default|lifetime_multiclass_recall"],
        np.mean(recalls), rtol=1e-5,
    )


def test_session_level_pr():
    sessions = np.repeat(np.arange(16), 4)
    m = RecallSessionLevelMetric()
    st = m.init_state()
    st = m.update(st, jnp.asarray(P), jnp.asarray(L), sessions=jnp.asarray(sessions))
    out = {k: float(v) for k, v in m.compute(st).items()}
    hits = trues = 0
    for s in range(16):
        mask = sessions == s
        t = (L[mask] > 0.5).any()
        h = ((P[mask] > 0.5) & (L[mask] > 0.5)).any()
        trues += t
        hits += h
    np.testing.assert_allclose(
        out["recall_session_level-default|lifetime_recall_session_level"],
        hits / trues, rtol=1e-5,
    )


def test_hindsight_target_pr():
    m = HindsightTargetPRMetric(window=128, target_precision=0.6,
                                target_recall=0.4)
    out = run(m)
    # oracle: sweep thresholds
    order = np.argsort(-P)
    tp = np.cumsum((W * L)[order])
    fp = np.cumsum((W * (1 - L))[order])
    prec = tp / (tp + fp)
    rec = tp / tp[-1]
    want_r = rec[prec >= 0.6].max() if (prec >= 0.6).any() else 0.0
    np.testing.assert_allclose(
        out["hindsight_target_pr-default|window_recall_at_precision_0.6"],
        want_r, rtol=1e-4,
    )


def test_bookkeeping_metrics():
    out = run(ScalarMetric())
    np.testing.assert_allclose(out["scalar-default|lifetime_scalar"],
                               (W * P).sum() / W.sum(), rtol=1e-5)
    out = run(SumWeightsMetric())
    np.testing.assert_allclose(out["sum_weights-default|lifetime_sum_weights"],
                               W.sum(), rtol=1e-5)
    out = run(NumPositiveSamplesMetric())
    np.testing.assert_allclose(
        out["num_positive_samples-default|lifetime_num_positive_samples"],
        (L > 0).sum(),
    )
    out = run(WeightedSumPredictionsMetric())
    np.testing.assert_allclose(
        out["weighted_sum_predictions-default|lifetime_weighted_sum_predictions"],
        (W * P).sum(), rtol=1e-5,
    )
    lab_nan = L.copy(); lab_nan[:5] = np.nan
    out = run(NumMissingLabelsMetric(), l=lab_nan)
    np.testing.assert_allclose(
        out["num_missing_labels-default|lifetime_num_missing_labels"], 5
    )
    x = rng.normal(size=(64, 3)).astype(np.float32)
    m = TensorWeightedAvgMetric(dim=3)
    st = m.init_state()
    st = m.update(st, jnp.asarray(x), jnp.asarray(L), jnp.asarray(W))
    out = {k: float(v) for k, v in m.compute(st).items()}
    want = ((x * W[:, None]).sum(0) / W.sum()).mean()
    np.testing.assert_allclose(
        out["tensor_weighted_avg-default|lifetime_tensor_weighted_avg"], want,
        rtol=1e-5,
    )
    hard = (rng.uniform(size=(32, 4)) > 0.5).astype(np.float32)
    lab = (rng.uniform(size=(32, 4)) > 0.5).astype(np.float32)
    m = MultiLabelPrecisionMetric()
    st = m.init_state()
    st = m.update(st, jnp.asarray(hard * 0.9), jnp.asarray(lab))
    out = {k: float(v) for k, v in m.compute(st).items()}
    want = (hard * lab).sum() / max(hard.sum(), 1)
    np.testing.assert_allclose(
        out["multi_label_precision-default|lifetime_multi_label_precision"],
        want, rtol=1e-5,
    )


def test_serving_ae_and_tower_qps():
    out = run(ServingAELossMetric())
    np.testing.assert_allclose(
        out["serving_ae_loss-default|lifetime_serving_ae_loss"],
        (W * np.abs(P - L)).sum() / W.sum(), rtol=1e-5,
    )
    qps = TowerQPSMetric(["t1", "t2"], warmup_steps=1)
    qps.update({"t1": 10, "t2": 5})
    qps.update({"t1": 10, "t2": 5})
    out = qps.compute()
    assert out["tower_qps-t1|lifetime_qps"] > 0
