"""gRPC transport over the C++ batching queue.

Reference analogs: torchrec/inference/server.cpp (PredictorServiceHandler),
torchrec/inference/client.py, protos/predictor.proto.
"""

import threading

import numpy as np
import pytest

pytest.importorskip("grpc")

from torchrec_tpu.inference.grpc_server import (
    PredictorClient,
    PredictorServer,
    load_predictor_pb2,
)
from torchrec_tpu.inference.serving import BatchingQueue, PredictionService


def _echo_service(**kw):
    """Queue + executor whose output row i is [sum(dense_i), n_ids_i]."""
    defaults = dict(
        max_batch_size=8, num_dense=3, num_sparse=2, out_dim=2,
        ids_capacity=256, batching_timeout_us=20_000, max_in_flight=64,
    )
    defaults.update(kw)
    q = BatchingQueue(**defaults)

    def predict(dense, ids, lengths):
        n = dense.shape[0]
        out = np.zeros((q.max_batch_size, q.out_dim), np.float32)
        out[:n, 0] = dense[:n].sum(axis=1)
        out[:n, 1] = lengths[:, :n].sum(axis=0)
        return out

    svc = PredictionService(q, predict).start()
    return q, svc


def test_proto_roundtrip():
    pb2 = load_predictor_pb2()
    req = pb2.PredictionRequest(
        batch_size=2,
        float_features=pb2.FloatFeatures(
            num_features=3,
            values=np.arange(6, dtype=np.float32).tobytes(),
        ),
    )
    back = pb2.PredictionRequest.FromString(req.SerializeToString())
    assert back.batch_size == 2
    np.testing.assert_array_equal(
        np.frombuffer(back.float_features.values, np.float32), np.arange(6)
    )


def test_end_to_end_predict():
    q, svc = _echo_service()
    server = PredictorServer(q, task_names=("score", "count"))
    port = server.start()
    try:
        client = PredictorClient(f"127.0.0.1:{port}")
        dense = np.array([[1, 2, 3], [4, 5, 6]], np.float32)
        lengths = np.array([[2, 0], [1, 3]], np.int32)  # [T=2, B=2]
        # feature-major jagged: f0 runs then f1 runs
        values = np.array([10, 11, 20, 30, 31, 32], np.int64)
        out = client.predict(dense, lengths, values)
        np.testing.assert_allclose(out["score"], [6.0, 15.0])
        np.testing.assert_allclose(out["count"], [3.0, 3.0])
        client.close()
    finally:
        server.stop()
        svc.stop()


def test_concurrent_requests_share_batches():
    q, svc = _echo_service()
    server = PredictorServer(q, task_names=("score", "count"))
    port = server.start()
    outs = {}
    try:
        def one(i):
            c = PredictorClient(f"127.0.0.1:{port}")
            dense = np.full((1, 3), float(i), np.float32)
            lengths = np.array([[i % 3], [1]], np.int32)
            values = np.arange(i % 3 + 1, dtype=np.int64)
            outs[i] = c.predict(dense, lengths, values)
            c.close()

        threads = [threading.Thread(target=one, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        for i in range(6):
            np.testing.assert_allclose(outs[i]["score"], [3.0 * i])
            np.testing.assert_allclose(outs[i]["count"], [i % 3 + 1.0])
    finally:
        server.stop()
        svc.stop()


def test_bad_request_rejected():
    import grpc

    q, svc = _echo_service()
    server = PredictorServer(q, task_names=("score", "count"))
    port = server.start()
    try:
        client = PredictorClient(f"127.0.0.1:{port}")
        with pytest.raises(grpc.RpcError) as ei:
            # lengths say 5 ids but only 1 provided
            client.predict(
                np.zeros((1, 3), np.float32),
                np.array([[2], [3]], np.int32),
                np.array([7], np.int64),
            )
        assert ei.value.code() == grpc.StatusCode.INVALID_ARGUMENT
        client.close()
    finally:
        server.stop()
        svc.stop()


def test_single_task_full_row():
    q, svc = _echo_service()
    server = PredictorServer(q)  # one task name -> whole [B, out_dim] row
    port = server.start()
    try:
        client = PredictorClient(f"127.0.0.1:{port}")
        out = client.predict(
            np.ones((2, 3), np.float32),
            np.zeros((2, 2), np.int32),
            np.zeros((0,), np.int64),
        )
        np.testing.assert_allclose(
            out["default"], [3.0, 0.0, 3.0, 0.0]
        )
        client.close()
    finally:
        server.stop()
        svc.stop()
