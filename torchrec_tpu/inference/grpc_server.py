"""gRPC transport for the serving front-end.

Capability parity with the reference's C++ gRPC server
(torchrec/inference/server.cpp: PredictorServiceHandler.Predict decoding a
PredictionRequest into dense/sparse tensors, running the model, returning a
task->FloatVec map; proto at torchrec/inference/protos/predictor.proto) and
its python client (torchrec/inference/client.py).

TPU-native shape: the unary ``Predict`` handler does NOT own a model — it
decodes the request and feeds every example into the C++ ``BatchingQueue``
(cpp/inference/serving.cc), where cross-REQUEST batches are assembled for
the executor thread that drives the compiled JAX predictor. Concurrent RPCs
therefore share device dispatches, which is the entire point of the
reference's BatchingQueue design — here the RPC layer and the batcher
compose instead of being fused into one binary.

Message classes are generated lazily from ``protos/predictor.proto`` with
the system ``protoc`` (no grpc_tools in this image); the service is wired
with :func:`grpc.method_handlers_generic_handler`, which needs no generated
service stubs.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
from concurrent import futures
from typing import Callable, Dict, Optional

import numpy as np

__all__ = [
    "load_predictor_pb2",
    "PredictorServer",
    "PredictorClient",
    "METHOD_PREDICT",
]

METHOD_PREDICT = "/torchrec_tpu.predictor.Predictor/Predict"
_SERVICE = "torchrec_tpu.predictor.Predictor"

_PB2 = None
_PB2_LOCK = threading.Lock()


def load_predictor_pb2():
    """Generate (once, lazily) and import ``predictor_pb2``.

    Mirrors the repo's lazy g++ sidecar builds: the generated module lives
    next to the .proto and is rebuilt whenever the .proto is newer.
    """
    global _PB2
    if _PB2 is not None:
        return _PB2
    with _PB2_LOCK:
        if _PB2 is not None:
            return _PB2
        here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "protos")
        src = os.path.join(here, "predictor.proto")
        gen = os.path.join(here, "predictor_pb2.py")
        if not os.path.exists(gen) or os.path.getmtime(gen) < os.path.getmtime(src):
            subprocess.run(
                ["protoc", f"--python_out={here}", f"--proto_path={here}",
                 "predictor.proto"],
                check=True,
            )
        if here not in sys.path:
            sys.path.insert(0, here)
        import predictor_pb2  # noqa: PLC0415

        _PB2 = predictor_pb2
        return _PB2


def _require_grpc():
    try:
        import grpc  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - image always has grpcio
        raise ImportError(
            "grpcio is required for the gRPC transport; use "
            "torchrec_tpu.inference.serving.BatchingQueue directly otherwise"
        ) from e
    return grpc


class PredictorServer:
    """Unary Predict service over a :class:`~.serving.BatchingQueue`.

    ``queue`` + ``service`` are the existing serving core
    (:class:`~.serving.BatchingQueue`, :class:`~.serving.PredictionService`);
    this class only adds the wire transport. ``task_names`` name the output
    columns: the executor's ``[B, out_dim]`` result is split column-wise
    into the response's per-task FloatVecs (reference ResultSplit analog for
    the RPC boundary; out_dim must equal len(task_names) or task_names must
    be a single name taking the whole row).
    """

    def __init__(
        self,
        queue,
        task_names=("default",),
        *,
        max_workers: int = 16,
        wait_timeout_us: int = 10_000_000,
    ):
        self._grpc = _require_grpc()
        self._pb2 = load_predictor_pb2()
        self._q = queue
        self._tasks = tuple(task_names)
        self._wait_us = int(wait_timeout_us)
        if len(self._tasks) > 1 and len(self._tasks) != queue.out_dim:
            raise ValueError(
                f"{len(self._tasks)} task names need out_dim "
                f"{len(self._tasks)}, queue has {queue.out_dim}"
            )
        handler = self._grpc.method_handlers_generic_handler(
            _SERVICE,
            {
                "Predict": self._grpc.unary_unary_rpc_method_handler(
                    self._predict,
                    request_deserializer=self._pb2.PredictionRequest.FromString,
                    response_serializer=(
                        self._pb2.PredictionResponse.SerializeToString
                    ),
                )
            },
        )
        self._server = self._grpc.server(
            futures.ThreadPoolExecutor(max_workers=max_workers)
        )
        self._server.add_generic_rpc_handlers((handler,))
        self._port: Optional[int] = None

    # ------------------------------------------------------------ lifecycle
    def start(self, address: str = "127.0.0.1:0") -> int:
        """Bind + start; returns the bound port."""
        self._port = self._server.add_insecure_port(address)
        if self._port == 0:
            raise RuntimeError(f"could not bind {address}")
        self._server.start()
        return self._port

    def stop(self, grace: float = 1.0) -> None:
        self._server.stop(grace).wait()

    @property
    def port(self) -> Optional[int]:
        return self._port

    # -------------------------------------------------------------- handler
    def _predict(self, req, ctx):
        grpc = self._grpc
        b = int(req.batch_size)
        if b <= 0:
            ctx.abort(grpc.StatusCode.INVALID_ARGUMENT, "batch_size must be > 0")
        nd, nf = self._q.num_dense, self._q.num_sparse
        dense = np.frombuffer(req.float_features.values, np.float32)
        if dense.size != b * nd:
            ctx.abort(
                grpc.StatusCode.INVALID_ARGUMENT,
                f"float_features: got {dense.size} values, want {b}x{nd}",
            )
        dense = dense.reshape(b, nd)
        sf = req.id_list_features
        lengths = np.frombuffer(sf.lengths, np.int32)
        if lengths.size != nf * b:
            ctx.abort(
                grpc.StatusCode.INVALID_ARGUMENT,
                f"id_list_features: got {lengths.size} lengths, want {nf}x{b}",
            )
        lengths = lengths.reshape(nf, b)
        values = np.frombuffer(sf.values, np.int64)
        if values.size != int(lengths.sum()):
            ctx.abort(
                grpc.StatusCode.INVALID_ARGUMENT,
                f"id_list_features: {values.size} ids vs lengths sum "
                f"{int(lengths.sum())}",
            )
        # jagged [T x B] -> per-example id lists: example i owns, for each
        # feature t, the i-th segment of feature t's run.
        offs = np.zeros(nf * b + 1, np.int64)
        np.cumsum(lengths.reshape(-1), out=offs[1:])
        tickets = []
        for i in range(b):
            ex_ids = np.concatenate(
                [
                    values[offs[t * b + i]: offs[t * b + i] + lengths[t, i]]
                    for t in range(nf)
                ]
            ) if nf else np.zeros((0,), np.int64)
            t = self._q.submit(dense[i], ex_ids, lengths[:, i].copy())
            if t == 0:
                ctx.abort(
                    grpc.StatusCode.RESOURCE_EXHAUSTED,
                    "admission control rejected the request",
                )
            tickets.append(t)
        out = np.zeros((b, self._q.out_dim), np.float32)
        try:
            for i, t in enumerate(tickets):
                out[i] = self._q.wait_result(t, self._wait_us)
        except TimeoutError:
            ctx.abort(grpc.StatusCode.DEADLINE_EXCEEDED, "executor timed out")
        resp = self._pb2.PredictionResponse()
        if len(self._tasks) == 1:
            resp.predictions[self._tasks[0]].data.extend(out.reshape(-1).tolist())
        else:
            for j, name in enumerate(self._tasks):
                resp.predictions[name].data.extend(out[:, j].tolist())
        return resp


class PredictorClient:
    """Thin client mirroring the reference's inference/client.py loop."""

    def __init__(self, address: str):
        self._grpc = _require_grpc()
        self._pb2 = load_predictor_pb2()
        self._channel = self._grpc.insecure_channel(address)
        self._call = self._channel.unary_unary(
            METHOD_PREDICT,
            request_serializer=self._pb2.PredictionRequest.SerializeToString,
            response_deserializer=self._pb2.PredictionResponse.FromString,
        )

    def predict(
        self,
        dense: np.ndarray,
        lengths: np.ndarray,
        values: np.ndarray,
        weights: Optional[np.ndarray] = None,
        timeout: float = 30.0,
    ) -> Dict[str, np.ndarray]:
        """dense [B, D] f32, lengths [T, B] i32, values jagged i64."""
        dense = np.ascontiguousarray(dense, np.float32)
        lengths = np.ascontiguousarray(lengths, np.int32)
        values = np.ascontiguousarray(values, np.int64)
        b = dense.shape[0]
        req = self._pb2.PredictionRequest(
            batch_size=b,
            float_features=self._pb2.FloatFeatures(
                num_features=dense.shape[1], values=dense.tobytes()
            ),
            id_list_features=self._pb2.SparseFeatures(
                num_features=lengths.shape[0],
                lengths=lengths.tobytes(),
                values=values.tobytes(),
                weights=(
                    b""
                    if weights is None
                    else np.ascontiguousarray(weights, np.float32).tobytes()
                ),
            ),
        )
        resp = self._call(req, timeout=timeout)
        return {
            k: np.asarray(v.data, np.float32) for k, v in resp.predictions.items()
        }

    def close(self):
        self._channel.close()
