"""Benchmark harness: timing + result reporting.

Capability parity with torchrec/distributed/benchmark/base.py
(benchmark_func:1443, BenchmarkResult:143 with qps/memory stats).

Timing methodology for the axon-tunneled TPU: a single fetch round-trip
costs ~40ms, so every benchmark runs K iterations chained inside one
jitted lax.scan and syncs once (see bench.py at the repo root).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BenchmarkResult", "benchmark_func", "benchmark_scanned"]


@dataclasses.dataclass
class BenchmarkResult:
    name: str
    ms_per_iter: float
    iters: int
    qps: Optional[float] = None  # examples/sec when batch size given
    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def json_line(self) -> str:
        d = dataclasses.asdict(self)
        return json.dumps(d)


def benchmark_scanned(
    name: str,
    step: Callable,  # (carry, data) -> carry
    carry0,
    data,
    iters: int = 100,
    batch_size: Optional[int] = None,
) -> BenchmarkResult:
    """Device-throughput timing: K chained iterations in one jit, one sync."""

    @jax.jit
    def run(carry, d):
        c, _ = jax.lax.scan(
            lambda c, _: (step(c, d), None), carry, None, length=iters
        )
        return c

    def sync(x):
        return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))

    c = run(carry0, data)
    sync(c)  # compile + warm
    # measure the fixed dispatch+fetch overhead (≈40ms through the axon
    # tunnel, ~0 on local backends) with a null round-trip
    t0 = time.perf_counter()
    sync(run(carry0, data) if iters == 0 else c)
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    c = run(carry0, data)
    sync(c)
    total = time.perf_counter() - t0
    ms = max(total - overhead, 1e-9) / iters * 1e3
    return BenchmarkResult(
        name=name,
        ms_per_iter=ms,
        iters=iters,
        qps=(batch_size / (ms / 1e3)) if batch_size else None,
    )


def benchmark_func(
    name: str, fn: Callable, iters: int = 20, warmup: int = 3
) -> BenchmarkResult:
    """Host-loop timing for non-jittable paths (serving, host transforms)."""
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    ms = (time.perf_counter() - t0) / iters * 1e3
    return BenchmarkResult(name=name, ms_per_iter=ms, iters=iters)
