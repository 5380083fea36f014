"""DEV: write-kernel store-path variants (round-2 perf item #2).

Standalone A/B of row_scatter_write against issue-cost-reduced variants:
  v0: current kernel (per-row bounds branch, per-row wait)
  v1: per-row bounds branch on start, ONE aggregated semaphore wait per
      chunk (valid byte count passed per chunk from XLA)
  v2: branch-free starts (requires sentinel-safe pad rows in the table)
      + ONE static aggregated wait per chunk

Run: python benchmarks/dev_write_kernel.py  (real TPU)
Methodology per CLAUDE.md: >=500 chained iters in one scan, table as
donated carry, one sync, RTT-corrected.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 1_370_757  # stacked large-table rows at the div128 headline shapes
D = 128
U = 20544  # window size (max_unique bound)
N_VALID = 20300  # ~real unique rows per step
ITERS = 500

_CHUNK = 1024
_GROUP = 32
_NGRP = 16


# ------------------------------------------------------------------ v1b
def _wk_v1b_kernel(rows_ref, vals_ref, t_in, t_out, sem, dummy, *,
                   num_rows, chunk, group):
    n_groups = chunk // group

    def start_writes(gi):
        for r in range(group):
            i = gi * group + r

            @pl.when(rows_ref[i].astype(jnp.uint32) < num_rows)
            def _(i=i):
                pltpu.make_async_copy(
                    vals_ref.at[pl.ds(i, 1), :],
                    t_out.at[pl.ds(rows_ref[i], 1), :],
                    sem.at[0],
                ).start()

            @pl.when(rows_ref[i].astype(jnp.uint32) >= num_rows)
            def _(i=i):
                pltpu.make_async_copy(
                    vals_ref.at[pl.ds(i, 1), :],
                    dummy.at[pl.ds(0, 1), :],
                    sem.at[0],
                ).start()

    for gi in range(n_groups):
        start_writes(gi)
    # aggregated wait: a copy object of the full chunk's size, never
    # started — .wait() just decrements the sem by its byte count
    pltpu.make_async_copy(vals_ref, vals_ref, sem.at[0]).wait()


@functools.partial(jax.jit, donate_argnums=(0,))
def row_scatter_write_v1b(table, rows, values):
    num_rows, d = table.shape
    n_chunks = rows.shape[0] // _CHUNK
    kernel = functools.partial(
        _wk_v1b_kernel, num_rows=num_rows, chunk=_CHUNK, group=_GROUP,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((_CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((_CHUNK, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.VMEM((1, D), jnp.float32),
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rows, values.astype(table.dtype), table)


# ------------------------------------------------------------------ v2
def _wk_v2_kernel(rows_ref, vals_ref, t_in, t_out, sem, *, chunk, group):
    n_groups = chunk // group

    def start_writes(gi):
        for r in range(group):
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(gi * group + r, 1), :],
                t_out.at[pl.ds(rows_ref[gi * group + r], 1), :],
                sem.at[0],
            ).start()

    for gi in range(n_groups):
        start_writes(gi)
    pltpu.make_async_copy(vals_ref, vals_ref, sem.at[0]).wait()


@functools.partial(jax.jit, donate_argnums=(0,))
def row_scatter_write_v2(table, rows, values):
    num_rows, d = table.shape
    n_chunks = rows.shape[0] // _CHUNK
    kernel = functools.partial(_wk_v2_kernel, chunk=_CHUNK, group=_GROUP)
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((_CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((_CHUNK, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((1,))],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rows, values.astype(table.dtype), table)


def bench(name, fn, table, *args, iters=ITERS):
    """scan-chained timing; table is the carry (kernel aliases it)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(table, args):
        def body(t, _):
            return fn(t, *args), 0.0
        t, _ = jax.lax.scan(body, table, None, length=iters)
        return t

    def sync(x):
        return float(np.asarray(x.ravel()[0]))

    t = run(table, args)
    sync(t)
    t0 = time.perf_counter()
    sync(t)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    t = run(t, args)
    sync(t)
    total = time.perf_counter() - t0 - rtt
    per = total / iters * 1e3
    print(f"{name:>28}: {per:8.3f} ms/iter  ({per * 1e6 / U:6.1f} ns/row)")
    return t


def main():
    from torchrec_tpu.ops.tbe_pallas import row_scatter_write

    rng = np.random.default_rng(0)
    # position-layout-like id stream: N_VALID distinct real rows at random
    # positions, distinct sentinels >= R elsewhere
    perm = rng.permutation(R)[:N_VALID].astype(np.int32)
    ids = np.arange(U, dtype=np.int32) + R  # sentinels R..R+U
    pos = np.sort(rng.permutation(U)[:N_VALID])
    ids[pos] = perm
    vals = rng.standard_normal((U, D)).astype(np.float32)

    pad = (-U) % _CHUNK
    ids_p = np.concatenate([ids, np.full(pad, R, np.int32)])
    vals_p = np.concatenate([vals, np.zeros((pad, D), np.float32)])
    counts = (
        (ids_p < R).reshape(-1, _CHUNK).sum(axis=1).astype(np.int32)
    )

    ids_j = jnp.asarray(ids)
    vals_j = jnp.asarray(vals)
    ids_pj = jnp.asarray(ids_p)
    vals_pj = jnp.asarray(vals_p)
    counts_j = jnp.asarray(counts)

    table = jnp.zeros((R, D), jnp.float32)
    bench("v0 row_scatter_write", row_scatter_write, table, ids_j, vals_j)

    table = jnp.zeros((R, D), jnp.float32)
    bench("v1b branch+agg-wait", row_scatter_write_v1b, table, ids_pj,
          vals_pj)

    # v2: sentinels remapped into pad rows (branch-free)
    ids_bf = np.where(ids_p < R, ids_p, ids_p % np.int32(_CHUNK) + R)
    # make pad-row targets distinct per slot to avoid same-address races
    sent = ids_p >= R
    ids_bf = ids_p.copy()
    ids_bf[sent] = R + np.arange(sent.sum(), dtype=np.int32) % (U + pad)
    table_pad = jnp.zeros((R + U + pad, D), jnp.float32)
    bench("v2 branch-free+agg-wait", row_scatter_write_v2, table_pad,
          jnp.asarray(ids_bf), vals_pj)


if __name__ == "__main__":
    main()
