"""Memory stashing, CPU-offloaded metrics, percentile logger, dim bucketer.

Reference analogs: distributed/memory_stashing.py:154,
metrics/cpu_offloaded_metric_module.py:233, utils/percentile_logger.py,
distributed/embedding_dim_bucketer.py:32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestMemoryStashing:
    def test_roundtrip_pytree(self):
        from torchrec_tpu.distributed.memory_stashing import (
            restore_to_device,
            stash_to_host,
        )

        tree = {"a": jnp.arange(8.0), "b": {"c": jnp.ones((4, 4))}}
        host = stash_to_host(tree)
        kinds = jax.tree.map(lambda x: x.sharding.memory_kind, host)
        assert set(jax.tree.leaves(kinds)) <= {"pinned_host", "device"}
        back = restore_to_device(host)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            tree, back,
        )
        assert all(
            x.sharding.memory_kind == "device"
            for x in jax.tree.leaves(back)
        )

    def test_manager_slots_and_scope(self):
        from torchrec_tpu.distributed.memory_stashing import (
            MemoryStashingManager,
        )

        m = MemoryStashingManager()
        state = {"s": jnp.full((16,), 3.0)}
        m.stash("opt", state)
        assert "opt" in m
        host = m.peek_host("opt")
        np.testing.assert_array_equal(np.asarray(host["s"]), np.full(16, 3.0))
        back = m.restore("opt")
        assert "opt" not in m
        np.testing.assert_array_equal(np.asarray(back["s"]), np.full(16, 3.0))

        with m.stashed(state) as h:
            assert h.value is None
        np.testing.assert_array_equal(
            np.asarray(h.value["s"]), np.full(16, 3.0)
        )


class TestCPUOffloadedMetrics:
    def test_matches_inline_module(self):
        from torchrec_tpu.metrics import NEMetric, RecMetricModule
        from torchrec_tpu.metrics.cpu_offloaded import CPUOffloadedMetricModule

        rng = np.random.default_rng(0)
        module = RecMetricModule(metrics=[NEMetric()])
        inline_state = module.init_state()
        off = CPUOffloadedMetricModule(module).init()
        for _ in range(5):
            preds = jnp.asarray(rng.random(64).astype(np.float32))
            labels = jnp.asarray(
                rng.integers(0, 2, 64).astype(np.float32)
            )
            inline_state = module.update(inline_state, preds, labels)
            off.update(preds, labels)
        want = module.compute(inline_state)
        got = off.compute()
        off.stop()
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-5)

    def test_worker_error_surfaces(self):
        from torchrec_tpu.metrics import NEMetric, RecMetricModule
        from torchrec_tpu.metrics.cpu_offloaded import CPUOffloadedMetricModule

        off = CPUOffloadedMetricModule(
            RecMetricModule(metrics=[NEMetric()])
        ).init()
        off.update(jnp.ones((4,)), jnp.ones((3,)))  # shape mismatch
        with pytest.raises(RuntimeError):
            off.compute()
        off.stop()


class TestPercentileLogger:
    def test_p2_close_to_numpy(self):
        from torchrec_tpu.utils.percentile_logger import P2Quantile

        rng = np.random.default_rng(1)
        xs = rng.lognormal(0.0, 1.0, size=20_000)
        for q in (0.5, 0.9, 0.99):
            est = P2Quantile(q)
            for x in xs:
                est.update(float(x))
            want = float(np.quantile(xs, q))
            assert abs(est.value - want) / want < 0.08, (q, est.value, want)

    def test_small_counts(self):
        from torchrec_tpu.utils.percentile_logger import (
            P2Quantile,
            PercentileLogger,
        )

        est = P2Quantile(0.5)
        assert np.isnan(est.value)
        for x in [3.0, 1.0, 2.0]:
            est.update(x)
        assert est.value in (1.0, 2.0, 3.0)
        pl = PercentileLogger("lat_ms", log_every=0)
        for x in range(100):
            pl.add(float(x))
        snap = pl.snapshot()
        assert 40 < snap["p50"] < 60 and snap["p99"] > 90


class TestEmbDimBucketer:
    def test_policies(self):
        from torchrec_tpu.distributed.embedding_dim_bucketer import (
            EmbDimBucketer,
            EmbDimBucketerPolicy,
        )
        from torchrec_tpu.types import DataType

        dims = [
            (8, DataType.FP32), (64, DataType.FP32), (64, DataType.FP16),
            (128, DataType.FP32), (512, DataType.FP32),
        ]
        single = EmbDimBucketer(dims, EmbDimBucketerPolicy.SINGLE_BUCKET)
        assert single.bucket_count == 1
        per_dim = EmbDimBucketer(dims, EmbDimBucketerPolicy.ALL_BUCKETS)
        assert per_dim.bucket_count == 5
        cl = EmbDimBucketer(dims, EmbDimBucketerPolicy.CACHELINE_BUCKETS)
        # 8*4B and 64*2B both round to one 128B tile -> shared bucket;
        # 64*4B = 2 tiles; 128*4B = 4; 512*4B = 16
        assert cl.bucket(8, DataType.FP32) == cl.bucket(64, DataType.FP16)
        assert cl.bucket_count == 4
        assert cl.bucket(64, DataType.FP32) != cl.bucket(128, DataType.FP32)
