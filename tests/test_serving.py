"""C++ serving front-end: batching, result split, admission, end-to-end
with a jitted quantized predictor.

Reference analogs: inference_legacy/tests/BatchingQueueTest.cpp,
ResultSplitTest.cpp, SingleGPUExecutorTest.cpp.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.inference.serving import BatchingQueue, PredictionService


def make_queue(**kw):
    defaults = dict(
        max_batch_size=4, num_dense=2, num_sparse=2, out_dim=1,
        ids_capacity=64, batching_timeout_us=50_000, max_in_flight=8,
    )
    defaults.update(kw)
    return BatchingQueue(**defaults)


def test_batch_assembly_feature_major():
    q = make_queue()
    t1 = q.submit(np.array([1.0, 2.0]), np.array([10, 11, 20]), np.array([2, 1]))
    t2 = q.submit(np.array([3.0, 4.0]), np.array([12, 21, 22]), np.array([1, 2]))
    assert t1 > 0 and t2 > 0
    n, dense, ids, lengths, tickets = q.get_batch()
    assert n == 2
    np.testing.assert_allclose(dense[:2], [[1, 2], [3, 4]])
    # feature-major: f0 of ex0 (10, 11), f0 of ex1 (12), f1 of ex0 (20)...
    np.testing.assert_array_equal(ids[:6], [10, 11, 12, 20, 21, 22])
    np.testing.assert_array_equal(lengths[:, :2], [[2, 1], [1, 2]])
    q.stop()


def test_result_split_and_wait():
    q = make_queue()
    results = {}

    def client(i):
        t = q.submit(np.array([float(i), 0.0]), np.array([i], np.int64),
                     np.array([1, 0], np.int32))
        results[i] = q.wait_result(t)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    time.sleep(0.05)
    n, dense, ids, lengths, tickets = q.get_batch()
    assert n == 3
    out = dense[:n, :1] * 10.0  # per-request output from its own dense
    q.put_results(tickets[:n], out)
    for t in threads:
        t.join(timeout=5)
    for i in range(3):
        np.testing.assert_allclose(results[i], [i * 10.0])
    q.stop()


def test_admission_control_rejects_over_limit():
    q = make_queue(max_in_flight=2)
    assert q.submit(np.zeros(2), np.zeros(0, np.int64), np.zeros(2, np.int32)) > 0
    assert q.submit(np.zeros(2), np.zeros(0, np.int64), np.zeros(2, np.int32)) > 0
    # third rejected (ResourceManager behavior)
    assert q.submit(np.zeros(2), np.zeros(0, np.int64), np.zeros(2, np.int32)) == 0
    assert q.in_flight == 2
    q.stop()


def test_end_to_end_with_jitted_predictor():
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig

    ebc = EmbeddingBagCollection([
        EmbeddingBagConfig(name="t", num_embeddings=50, embedding_dim=8,
                           feature_names=["f0", "f1"]),
    ])
    params = ebc.init(jax.random.key(0))
    B, CAP = 4, 64

    from torchrec_tpu.sparse import KeyedJaggedTensor

    @jax.jit
    def fwd(dense, ids, lengths):
        kjt = KeyedJaggedTensor(keys=["f0", "f1"], values=ids, lengths=lengths)
        kt = ebc.apply(params, kjt)
        return jnp.sum(kt.values(), axis=1, keepdims=True) + dense[:, :1]

    def predict(dense, ids, lengths):
        return np.asarray(fwd(jnp.asarray(dense), jnp.asarray(ids),
                              jnp.asarray(lengths)))

    q = make_queue(ids_capacity=CAP)
    svc = PredictionService(q, predict).start()
    try:
        t1 = q.submit(np.array([5.0, 0.0]), np.array([1, 2, 3], np.int64),
                      np.array([2, 1], np.int32))
        r = q.wait_result(t1)
        # oracle
        table = np.asarray(ebc.table_slice(params, "t"))
        want = table[1].sum() + table[2].sum() + table[3].sum() + 5.0
        np.testing.assert_allclose(r[0], want, rtol=1e-5)
    finally:
        svc.stop()


def test_observer_stats():
    """Observer counters (reference Observer.h: qps/latency/batch-size)."""
    q = make_queue(max_in_flight=2)
    svc_results = []

    t1 = q.submit(np.array([1.0, 0.0]), np.array([1], np.int64),
                  np.array([1, 0], np.int32))
    t2 = q.submit(np.array([2.0, 0.0]), np.array([2], np.int64),
                  np.array([1, 0], np.int32))
    t3 = q.submit(np.array([3.0, 0.0]), np.array([3], np.int64),
                  np.array([1, 0], np.int32))  # admission reject
    assert t1 > 0 and t2 > 0 and t3 == 0

    n, dense, ids, lengths, tickets = q.get_batch()
    assert n == 2
    q.put_results(tickets[:n], np.zeros((n, 1), np.float32))
    q.wait_result(t1)
    q.wait_result(t2)
    s = q.stats()
    assert s["submitted"] == 2
    assert s["rejected"] == 1
    assert s["completed"] == 2
    assert s["timeouts"] == 0
    assert s["batches"] == 1 and s["avg_batch_size"] == 2.0
    assert s["mean_latency_ms"] >= 0.0
    assert "p99_latency_ms" in s
    q.stop()
