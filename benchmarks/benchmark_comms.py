"""Collective benchmarks (reference distributed/benchmark/benchmark_comms.py):
psum_scatter / all_gather / psum payload sweep over the device mesh."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map

from benchmarks.base import benchmark_scanned


def main():
    devices = jax.devices()
    mesh = jax.sharding.Mesh(np.array(devices), ("x",))
    P = jax.sharding.PartitionSpec
    w = len(devices)

    for mb in [1, 4, 16]:
        n = mb * 1024 * 1024 // 4
        x = jnp.ones((w, n // w), jnp.float32)

        def step_ps(c, d):
            def local(v):
                return jax.lax.psum(v, "x") * 1e-9 + v
            return shard_map(local, mesh=mesh, in_specs=P("x"), out_specs=P("x"))(c)

        r = benchmark_scanned(f"psum_{mb}MiB", step_ps, x, None, iters=50)
        bw = mb / (r.ms_per_iter / 1e3) / 1024  # GiB/s algorithmic
        r.extra["algbw_GiBps"] = round(bw, 2)
        print(r.json_line())


if __name__ == "__main__":
    main()
