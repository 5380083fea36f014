"""Metric tests vs straight-line numpy oracles + cross-rank sync.

Reference analog: torchrec/metrics/tests/* (47 files comparing RecMetric
outputs against reference implementations across ranks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.metrics import (
    AccuracyMetric,
    AUCMetric,
    AUPRCMetric,
    CalibrationMetric,
    CTRMetric,
    LogLossMetric,
    MAEMetric,
    MetricsConfig,
    MSEMetric,
    NDCGMetric,
    NEMetric,
    PrecisionMetric,
    RecallMetric,
    RecMetricEnum,
    RecTaskInfo,
    generate_metric_module,
)


def data(n=200, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.uniform(0.01, 0.99, n).astype(np.float32)
    l = (rng.uniform(size=n) < p).astype(np.float32)  # calibrated-ish labels
    w = rng.uniform(0.5, 2.0, n).astype(np.float32)
    return p, l, w


def run_metric(metric, p, l, w, batches=4):
    state = metric.init_state()
    for chunk in np.array_split(np.arange(len(p)), batches):
        state = metric.update(
            state, jnp.asarray(p[chunk]), jnp.asarray(l[chunk]),
            jnp.asarray(w[chunk]),
        )
    return metric.compute(state)


def auc_oracle(p, l, w):
    """Weighted pairwise AUC."""
    pos = np.where(l > 0.5)[0]
    neg = np.where(l <= 0.5)[0]
    num = den = 0.0
    for i in pos:
        for j in neg:
            pair_w = w[i] * w[j]
            den += pair_w
            if p[i] > p[j]:
                num += pair_w
            elif p[i] == p[j]:
                num += 0.5 * pair_w
    return num / den


class TestPointwiseMetrics:
    def test_ne(self):
        p, l, w = data()
        out = run_metric(NEMetric(), p, l, w)
        ce = -(w * (l * np.log(p) + (1 - l) * np.log(1 - p))).sum() / w.sum()
        ctr = (w * l).sum() / w.sum()
        base = -(ctr * np.log(ctr) + (1 - ctr) * np.log(1 - ctr))
        np.testing.assert_allclose(
            out["ne-default|lifetime_ne"], ce / base, rtol=1e-4
        )

    def test_logloss_mse_mae(self):
        p, l, w = data()
        out = run_metric(LogLossMetric(), p, l, w)
        ce = -(w * (l * np.log(p) + (1 - l) * np.log(1 - p))).sum() / w.sum()
        np.testing.assert_allclose(
            out["logloss-default|lifetime_logloss"], ce, rtol=1e-4
        )
        out = run_metric(MSEMetric(), p, l, w)
        np.testing.assert_allclose(
            out["mse-default|lifetime_mse"],
            (w * (p - l) ** 2).sum() / w.sum(), rtol=1e-4,
        )
        out = run_metric(MAEMetric(), p, l, w)
        np.testing.assert_allclose(
            out["mae-default|lifetime_mae"],
            (w * np.abs(p - l)).sum() / w.sum(), rtol=1e-4,
        )

    def test_calibration_ctr(self):
        p, l, w = data()
        out = run_metric(CalibrationMetric(), p, l, w)
        np.testing.assert_allclose(
            out["calibration-default|lifetime_calibration"],
            (w * p).sum() / (w * l).sum(), rtol=1e-4,
        )
        out = run_metric(CTRMetric(), p, l, w)
        np.testing.assert_allclose(
            out["ctr-default|lifetime_ctr"], (w * l).sum() / w.sum(), rtol=1e-4
        )

    def test_threshold_metrics(self):
        p, l, w = data()
        pred = (p >= 0.5).astype(np.float32)
        tp = (w * pred * l).sum()
        fp = (w * pred * (1 - l)).sum()
        fn = (w * (1 - pred) * l).sum()
        tn = (w * (1 - pred) * (1 - l)).sum()
        out = run_metric(AccuracyMetric(), p, l, w)
        np.testing.assert_allclose(
            out["accuracy-default|lifetime_accuracy"],
            (tp + tn) / (tp + fp + fn + tn), rtol=1e-4,
        )
        out = run_metric(PrecisionMetric(), p, l, w)
        np.testing.assert_allclose(
            out["precision-default|lifetime_precision"], tp / (tp + fp),
            rtol=1e-4,
        )
        out = run_metric(RecallMetric(), p, l, w)
        np.testing.assert_allclose(
            out["recall-default|lifetime_recall"], tp / (tp + fn), rtol=1e-4
        )


class TestAUC:
    def test_matches_pairwise_oracle(self):
        p, l, w = data(n=150, seed=3)
        out = run_metric(AUCMetric(window=256), p, l, w)
        np.testing.assert_allclose(
            out["auc-default|window_auc"], auc_oracle(p, l, w), rtol=1e-3
        )

    def test_window_evicts_oldest(self):
        m = AUCMetric(window=100)
        state = m.init_state()
        # first batch: perfectly WRONG predictions; then 100 perfect ones
        state = m.update(
            state, jnp.linspace(0, 1, 50), jnp.asarray((np.linspace(0, 1, 50) < 0.5).astype(np.float32)),
        )
        p2 = np.linspace(0, 1, 100).astype(np.float32)
        state = m.update(state, jnp.asarray(p2), jnp.asarray((p2 > 0.5).astype(np.float32)))
        out = m.compute(state)
        np.testing.assert_allclose(out["auc-default|window_auc"], 1.0, atol=1e-5)

    def test_degenerate_single_class(self):
        m = AUCMetric(window=64)
        state = m.init_state()
        state = m.update(state, jnp.ones(8) * 0.7, jnp.ones(8))
        out = m.compute(state)
        np.testing.assert_allclose(out["auc-default|window_auc"], 0.5)

    def test_auprc_range(self):
        p, l, w = data(n=100, seed=4)
        out = run_metric(AUPRCMetric(window=128), p, l, w)
        v = out["auprc-default|window_auprc"]
        assert 0.0 <= v <= 1.0


class TestNDCG:
    def test_perfect_and_reversed(self):
        m = NDCGMetric(k=3)
        state = m.init_state()
        scores = jnp.asarray([[3.0, 2.0, 1.0]])
        rel = jnp.asarray([[1.0, 0.0, 0.0]])
        state = m.update(state, scores, rel)
        out = m.compute(state)
        np.testing.assert_allclose(out["ndcg-default|lifetime_ndcg@3"], 1.0)
        # reversed: relevant item ranked last of 3 -> dcg = 1/log2(4)
        m2 = NDCGMetric(k=3)
        s2 = m2.update(m2.init_state(), jnp.asarray([[3.0, 2.0, 1.0]]),
                       jnp.asarray([[0.0, 0.0, 1.0]]))
        out2 = m2.compute(s2)
        np.testing.assert_allclose(
            out2["ndcg-default|lifetime_ndcg@3"], 1 / np.log2(4), rtol=1e-5
        )


class TestModule:
    def test_generate_and_run(self):
        mm = generate_metric_module(
            MetricsConfig(
                rec_metrics=[RecMetricEnum.NE, RecMetricEnum.AUC,
                             RecMetricEnum.CALIBRATION],
                auc_window=128,
                compute_interval_steps=2,
            ),
            batch_size=16,
        )
        state = mm.init_state()
        p, l, w = data(n=64, seed=5)
        state = mm.update(state, jnp.asarray(p[:32]), jnp.asarray(l[:32]),
                          jnp.asarray(w[:32]))
        state = mm.update(state, jnp.asarray(p[32:]), jnp.asarray(l[32:]),
                          jnp.asarray(w[32:]))
        mm.tick(steps=2)  # host-side heartbeat (update() is jit-safe only)
        assert mm.should_compute(2) and not mm.should_compute(1)
        out = mm.compute(state)
        assert "ne-default|lifetime_ne" in out
        assert "auc-default|window_auc" in out
        assert "throughput|total_examples" in out

    def test_update_inside_jit(self):
        m = NEMetric()
        state = m.init_state()

        @jax.jit
        def step(state, p, l):
            return m.update(state, p, l)

        p, l, w = data(n=32)
        state = step(state, jnp.asarray(p), jnp.asarray(l))
        out = m.compute(state)
        assert np.isfinite(out["ne-default|lifetime_ne"])

    def test_multi_task(self):
        tasks = [RecTaskInfo(name="click"), RecTaskInfo(name="buy")]
        m = NEMetric(tasks=tasks)
        state = m.init_state()
        p, l, w = data(n=32)
        state = m.update(
            state,
            {"click": jnp.asarray(p), "buy": jnp.asarray(p)},
            {"click": jnp.asarray(l), "buy": jnp.asarray(1 - l)},
        )
        out = m.compute(state)
        assert "ne-click|lifetime_ne" in out and "ne-buy|lifetime_ne" in out


class TestCrossRankSync:
    def test_psum_sync_matches_global(self):
        """Per-rank partial updates + sync == single global update
        (the reference's cross-rank reduction contract)."""
        from jax import shard_map

        mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("x",))
        P = jax.sharding.PartitionSpec
        p, l, w = data(n=8 * 25, seed=7)
        m = NEMetric()

        def local(p, l, w):
            state = m.init_state()
            state = m.update(state, p, l, w)
            synced = m.sync(state, "x")
            return m.compute(synced)["ne-default|lifetime_ne"]

        fn = shard_map(
            local, mesh=mesh, in_specs=(P("x"), P("x"), P("x")),
            out_specs=P(), check_vma=False,
        )
        got = jax.jit(fn)(jnp.asarray(p), jnp.asarray(l), jnp.asarray(w))
        expected = run_metric(NEMetric(), p, l, w, batches=1)[
            "ne-default|lifetime_ne"
        ]
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_auc_gather_sync(self):
        from jax import shard_map

        mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("x",))
        P = jax.sharding.PartitionSpec
        p, l, w = data(n=8 * 16, seed=8)
        m = AUCMetric(window=32)

        def local(p, l, w):
            state = m.init_state()
            state = m.update(state, p, l, w)
            synced = m.sync(state, "x")
            return m.compute(synced)["auc-default|window_auc"]

        fn = shard_map(
            local, mesh=mesh, in_specs=(P("x"), P("x"), P("x")),
            out_specs=P(), check_vma=False,
        )
        got = jax.jit(fn)(jnp.asarray(p), jnp.asarray(l), jnp.asarray(w))
        np.testing.assert_allclose(got, auc_oracle(p, l, w), rtol=1e-3)


class TestSnapshotAndNoOp:
    def test_state_snapshot_roundtrip(self):
        """Snapshot -> restore resumes metric accumulation exactly
        (reference metric_state_snapshot.py:24)."""
        mm = generate_metric_module(
            MetricsConfig(
                rec_metrics=[RecMetricEnum.NE, RecMetricEnum.AUC],
                auc_window=128,
            ),
            batch_size=16,
        )
        p, l, w = data(n=64, seed=9)
        state = mm.update(mm.init_state(), jnp.asarray(p[:32]),
                          jnp.asarray(l[:32]), jnp.asarray(w[:32]))
        snap = mm.state_snapshot(state)
        assert all(isinstance(x, np.ndarray) for x in jax.tree.leaves(snap))
        restored = mm.load_state_snapshot(snap)
        state = mm.update(state, jnp.asarray(p[32:]), jnp.asarray(l[32:]),
                          jnp.asarray(w[32:]))
        restored = mm.update(restored, jnp.asarray(p[32:]),
                             jnp.asarray(l[32:]), jnp.asarray(w[32:]))
        a, b = mm.compute(state), mm.compute(restored)
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6)

    def test_load_snapshot_structure_mismatch(self):
        mm = generate_metric_module(
            MetricsConfig(rec_metrics=[RecMetricEnum.NE]), batch_size=4
        )
        other = generate_metric_module(
            MetricsConfig(rec_metrics=[RecMetricEnum.MSE]), batch_size=4
        )
        snap = mm.state_snapshot(mm.init_state())
        with pytest.raises(ValueError):
            other.load_state_snapshot(snap)

    def test_noop_module(self):
        from torchrec_tpu.metrics import NoOpMetricModule

        mm = NoOpMetricModule()
        state = mm.init_state()
        state = mm.update(state, jnp.ones((4,)), jnp.ones((4,)))
        assert not mm.should_compute(100)
        assert mm.compute(state) == {}


# ------------------------------------------------------- window states (r3)
class TestWindowStates:
    """Every sum-state metric reports window_* next to lifetime_* (reference
    rec_metric.py:119 WindowBuffer keeps lifetime AND window for every
    metric). Oracle: with batches_per_bucket=1 and K buckets, window_* must
    equal the metric recomputed from ONLY the last K batches."""

    def _stream(self, metric, name, oracle, n_batches=12, bsz=16, k=4,
                seed=3):
        rng = np.random.default_rng(seed)
        batches = []
        state = metric.init_state()
        for _ in range(n_batches):
            p = rng.uniform(0.01, 0.99, bsz).astype(np.float32)
            l = (rng.uniform(size=bsz) < 0.4).astype(np.float32)
            w = rng.uniform(0.5, 2.0, bsz).astype(np.float32)
            batches.append((p, l, w))
            state = metric.update(
                state, jnp.asarray(p), jnp.asarray(l), jnp.asarray(w)
            )
        out = metric.compute(state)
        tail = batches[-k:]
        pw = np.concatenate([b[0] for b in tail])
        lw = np.concatenate([b[1] for b in tail])
        ww = np.concatenate([b[2] for b in tail])
        full = np.concatenate([b[0] for b in batches]), np.concatenate(
            [b[1] for b in batches]
        ), np.concatenate([b[2] for b in batches])
        np.testing.assert_allclose(
            out[f"{metric.metric_name}-default|window_{name}"],
            oracle(pw, lw, ww), rtol=1e-4,
        )
        np.testing.assert_allclose(
            out[f"{metric.metric_name}-default|lifetime_{name}"],
            oracle(*full), rtol=1e-4,
        )

    def _win_metric(self, cls, k=4, **kw):
        return cls(window_buckets=k, batches_per_bucket=1, **kw)

    def test_window_ne(self):
        def ne(p, l, w):
            eps = 1e-7
            pc = np.clip(p, eps, 1 - eps)
            ce = -(l * np.log(pc) + (1 - l) * np.log(1 - pc))
            ctr = np.clip((w * l).sum() / w.sum(), eps, 1 - eps)
            base = -(ctr * np.log(ctr) + (1 - ctr) * np.log(1 - ctr))
            return (w * ce).sum() / w.sum() / base

        self._stream(self._win_metric(NEMetric), "ne", ne)

    def test_window_calibration(self):
        self._stream(
            self._win_metric(CalibrationMetric), "calibration",
            lambda p, l, w: (w * p).sum() / (w * l).sum(),
        )

    def test_window_ctr(self):
        self._stream(
            self._win_metric(CTRMetric), "ctr",
            lambda p, l, w: (w * l).sum() / w.sum(),
        )

    def test_window_mse_mae(self):
        self._stream(
            self._win_metric(MSEMetric), "mse",
            lambda p, l, w: (w * (p - l) ** 2).sum() / w.sum(),
        )
        self._stream(
            self._win_metric(MAEMetric), "mae",
            lambda p, l, w: (w * np.abs(p - l)).sum() / w.sum(),
        )

    def test_window_threshold_family(self):
        def acc(p, l, w):
            pred = (p >= 0.5).astype(np.float32)
            return (w * (pred == l)).sum() / w.sum()

        def prec(p, l, w):
            pred = (p >= 0.5).astype(np.float32)
            return (w * pred * l).sum() / (w * pred).sum()

        def rec(p, l, w):
            pred = (p >= 0.5).astype(np.float32)
            return (w * pred * l).sum() / (w * l).sum()

        self._stream(self._win_metric(AccuracyMetric), "accuracy", acc)
        self._stream(self._win_metric(PrecisionMetric), "precision", prec)
        self._stream(self._win_metric(RecallMetric), "recall", rec)

    def test_window_weighted_avg(self):
        from torchrec_tpu.metrics import WeightedAvgMetric

        self._stream(
            self._win_metric(WeightedAvgMetric), "weighted_avg",
            lambda p, l, w: (w * p).sum() / w.sum(),
        )

    def test_bucketed_window_bounds(self):
        """With batches_per_bucket=B>1 the window spans (K-1)*B+1..K*B most
        recent batches: feed a step change and check the window tracks the
        new regime once the old buckets rotate out."""
        m = NEMetric(window_buckets=2, batches_per_bucket=2)
        state = m.init_state()
        rng = np.random.default_rng(0)

        def push(bias, n=1):
            nonlocal state
            for _ in range(n):
                p = np.full(32, bias, np.float32)
                l = (rng.uniform(size=32) < 0.5).astype(np.float32)
                state = m.update(state, jnp.asarray(p), jnp.asarray(l))

        push(0.9, n=4)  # terrible predictions
        bad = float(m.compute(state)["ne-default|window_ne"])
        push(0.5, n=4)  # now the window holds only p=0.5 batches
        mid = float(m.compute(state)["ne-default|window_ne"])
        assert mid < bad  # old regime rotated out
        lifetime = float(m.compute(state)["ne-default|lifetime_ne"])
        assert lifetime > mid  # lifetime still remembers the bad half

    def test_window_sync_psum(self):
        """window_* after a cross-rank psum equals the metric over ALL
        ranks' last-K batches (sum-state windows stay psum-able)."""
        devs = jax.devices()[:4]
        mesh = jax.sharding.Mesh(np.array(devs), ("d",))
        m = self._win_metric(NEMetric, k=2)

        rng = np.random.default_rng(1)
        p = rng.uniform(0.01, 0.99, (4, 6, 16)).astype(np.float32)  # [rank, batch, B]
        l = (rng.uniform(size=(4, 6, 16)) < 0.4).astype(np.float32)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        @jax.jit
        def run(p, l):
            def body(p, l):
                state = m.init_state()
                for i in range(6):
                    state = m.update(state, p[0, i], l[0, i])
                synced = m.sync(state, "d")
                return m.compute(synced)["ne-default|window_ne"].reshape(1)

            return shard_map(
                body, mesh=mesh, in_specs=(P("d"), P("d")),
                out_specs=P("d"),
            )(p, l)

        got = np.asarray(run(p, l))[0]
        # oracle over the last 2 batches of EVERY rank
        pw = p[:, -2:, :].ravel()
        lw = l[:, -2:, :].ravel()
        eps = 1e-7
        pc = np.clip(pw, eps, 1 - eps)
        ce = -(lw * np.log(pc) + (1 - lw) * np.log(1 - pc))
        ctr = np.clip(lw.mean(), eps, 1 - eps)
        base = -(ctr * np.log(ctr) + (1 - ctr) * np.log(1 - ctr))
        np.testing.assert_allclose(got, ce.mean() / base, rtol=1e-4)
