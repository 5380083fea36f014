"""Serving front-end: C++ batching queue + Python executor thread driving a
compiled predictor.

Capability parity with the reference serving stack
(torchrec/inference/inference_legacy/: BatchingQueue.h:40 cross-request
combine, GPUExecutor.h:39 executor, ResultSplit.h:16 un-batching,
ResourceManager.h:29 admission control; and the current gRPC server.cpp
Predict loop). The C++ core (cpp/inference/serving.cc) owns queueing,
fixed-size batch assembly, admission, and result splitting; the executor
here is a host thread running the jitted/AOT-compiled JAX predictor on the
assembled batch — the TPU analog of the GPUExecutor's device loop.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

__all__ = ["BatchingQueue", "PredictionService"]

_LIB = None


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    src = os.path.join(root, "cpp", "inference", "serving.cc")
    so = os.path.join(root, "cpp", "inference", "libserving.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             "-o", so, src],
            check=True,
        )
    lib = ctypes.CDLL(so)
    i64, i32 = ctypes.c_int64, ctypes.c_int32
    pf = ctypes.POINTER(ctypes.c_float)
    p64 = ctypes.POINTER(i64)
    p32 = ctypes.POINTER(i32)
    lib.bq_create.restype = ctypes.c_void_p
    lib.bq_create.argtypes = [i64] * 6
    lib.bq_destroy.argtypes = [ctypes.c_void_p]
    lib.bq_submit.restype = i64
    lib.bq_submit.argtypes = [ctypes.c_void_p, pf, p64, p32]
    lib.bq_get_batch.restype = i64
    lib.bq_get_batch.argtypes = [ctypes.c_void_p, pf, p64, p32, p64, i64]
    lib.bq_put_results.argtypes = [ctypes.c_void_p, p64, pf, i64]
    lib.bq_wait_result.restype = i64
    lib.bq_wait_result.argtypes = [ctypes.c_void_p, i64, pf, i64]
    lib.bq_stop.argtypes = [ctypes.c_void_p]
    lib.bq_in_flight.restype = i64
    lib.bq_in_flight.argtypes = [ctypes.c_void_p]
    lib.bq_stats.argtypes = [ctypes.c_void_p, p64]
    _LIB = lib
    return lib


def _pf(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _p64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _p32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class BatchingQueue:
    """ctypes facade over the C++ queue."""

    def __init__(
        self,
        max_batch_size: int,
        num_dense: int,
        num_sparse: int,
        out_dim: int,
        ids_capacity: int,
        batching_timeout_us: int = 2000,
        max_in_flight: int = 1024,
    ):
        self._lib = _lib()
        self._h = self._lib.bq_create(
            max_batch_size, batching_timeout_us, max_in_flight,
            num_dense, num_sparse, out_dim,
        )
        self.max_batch_size = max_batch_size
        self.num_dense = num_dense
        self.num_sparse = num_sparse
        self.out_dim = out_dim
        self.ids_capacity = ids_capacity

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.bq_destroy(self._h)
            self._h = None

    def submit(self, dense: np.ndarray, ids: np.ndarray, lengths: np.ndarray) -> int:
        """Returns ticket (>0) or 0 when rejected by admission control."""
        d = np.ascontiguousarray(dense, np.float32)
        i = np.ascontiguousarray(ids, np.int64)
        l = np.ascontiguousarray(lengths, np.int32)
        assert d.shape == (self.num_dense,) and l.shape == (self.num_sparse,)
        return int(self._lib.bq_submit(self._h, _pf(d), _p64(i), _p32(l)))

    def get_batch(self):
        """Executor: (n, dense [B, D], ids [cap], lengths [F, B], tickets);
        n = 0 on timeout, -1 after stop."""
        dense = np.zeros((self.max_batch_size, self.num_dense), np.float32)
        ids = np.zeros((self.ids_capacity,), np.int64)
        lengths = np.zeros((self.num_sparse, self.max_batch_size), np.int32)
        tickets = np.zeros((self.max_batch_size,), np.int64)
        n = int(
            self._lib.bq_get_batch(
                self._h, _pf(dense), _p64(ids), _p32(lengths), _p64(tickets),
                self.ids_capacity,
            )
        )
        return n, dense, ids, lengths, tickets

    def put_results(self, tickets: np.ndarray, out: np.ndarray) -> None:
        t = np.ascontiguousarray(tickets, np.int64)
        o = np.ascontiguousarray(out, np.float32)
        self._lib.bq_put_results(self._h, _p64(t), _pf(o), len(t))

    def wait_result(self, ticket: int, timeout_us: int = 10_000_000):
        out = np.zeros((self.out_dim,), np.float32)
        rc = int(self._lib.bq_wait_result(self._h, ticket, _pf(out), timeout_us))
        if rc == 1:
            return out
        if rc == 0:
            raise TimeoutError(f"ticket {ticket} timed out")
        raise KeyError(f"unknown ticket {ticket}")

    def stop(self) -> None:
        self._lib.bq_stop(self._h)

    @property
    def in_flight(self) -> int:
        return int(self._lib.bq_in_flight(self._h))

    def stats(self) -> dict:
        """Observer counters (reference Observer.h QPS/latency observers):
        totals, mean batch size, mean latency, and p50/p90/p99 estimated
        from the log2-bucketed end-to-end latency histogram."""
        raw = np.zeros((39,), np.int64)
        self._lib.bq_stats(self._h, _p64(raw))
        hist = raw[7:]
        completed = int(raw[2])
        out = {
            "submitted": int(raw[0]),
            "rejected": int(raw[1]),
            "completed": completed,
            "timeouts": int(raw[3]),
            "batches": int(raw[4]),
            "avg_batch_size": (
                float(raw[5]) / raw[4] if raw[4] else 0.0
            ),
            "mean_latency_ms": (
                float(raw[6]) / completed / 1e3 if completed else 0.0
            ),
        }
        if completed:
            cum = np.cumsum(hist)
            for q in (0.5, 0.9, 0.99):
                k = int(np.searchsorted(cum, q * completed))
                # bucket k spans [2^k, 2^(k+1)) us; report the midpoint
                out[f"p{int(q * 100)}_latency_ms"] = (1.5 * (1 << k)) / 1e3
        return out


class PredictionService:
    """Executor thread pulling batches and running ``predict_fn`` —
    the GPUExecutor loop with the TPU predictor in its place.

    ``predict_fn(dense [B, D], ids [cap] int32, lengths [F, B]) ->
    [B, out_dim]`` (typically a jitted quantized-model forward).
    """

    def __init__(self, queue: BatchingQueue, predict_fn: Callable):
        self._q = queue
        self._fn = predict_fn
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._started = False

    def start(self) -> "PredictionService":
        self._started = True
        self._thread.start()
        return self

    def _loop(self):
        while True:
            n, dense, ids, lengths, tickets = self._q.get_batch()
            if n < 0:
                return
            if n == 0:
                continue
            out = np.asarray(
                self._fn(dense, ids.astype(np.int32), lengths), np.float32
            )
            self._q.put_results(tickets[:n], out[:n])

    def stop(self):
        self._q.stop()
        if self._started:
            self._thread.join(timeout=5)
