"""Pallas TPU kernels for the table-batched-embedding hot paths.

The role FBGEMM's CUDA kernels play in the reference
(torchrec/distributed/batched_embedding_kernel.py:3725 wraps
SplitTableBatchedEmbeddingBagsCodegen) is played here by XLA for the
bandwidth-friendly pieces (gather, sorted segment-sum) and by these Pallas
kernels for the piece XLA handles badly on TPU: **sparse row updates into a
large table**. XLA lowers ``table.at[rows].add(deltas)`` to a full-table
streaming pass — cost proportional to table size (measured ~2.2 ms for a
1.4M x 128 fp32 table on v5e regardless of how few rows change). The kernel
here instead issues pipelined per-row DMAs: read row, add delta, write row —
cost proportional to the number of TOUCHED rows.

Contract notes
--------------
* ``rows`` must be **all-distinct** (duplicates would race in the DMA
  pipeline); out-of-range rows (>= table rows) are skipped — exactly the
  sentinel convention of :func:`torchrec_tpu.ops.lookup.dedup_rows`.
* The table is updated in place (input/output aliased); wrap calls in
  ``jax.jit`` with donated table buffers.
* Row width must be a multiple of 128 lanes (pad tables to lane width —
  the module layer guarantees this for all production dims).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["row_scatter_add", "supports_row_scatter_add", "fused_sorted_sgd_apply"]

# ids per grid step; deltas chunk = CHUNK * D * 4B in VMEM (double-buffered
# by the pipeline) — 1024 * 128 * 4 = 512 KiB per buffer at D=128. Must be a
# multiple of 1024: XLA lays out int32 scalars with T(1024) SMEM tiling and
# Mosaic requires the block shape to match.
_CHUNK = 1024
# rows per group (one aligned (G, lanes) vector add per group)
_GROUP = 32
# in-flight groups (NGRP * GROUP rows of write DMAs in flight); swept
# in-context on the headline bench on v5e (post position-layout dedup):
# (32, 16) 1.62 ms/step; (16, 32) 1.65; (16, 64)/(32, 32)/(64, 8-16)
# within 1.64; (8, 64) 1.90
_NGRP = 16


def _row_scatter_add_kernel(
    rows_ref,  # SMEM [CHUNK] int32: target row of each delta (OOB = skip)
    deltas_ref,  # VMEM [CHUNK, D]
    table_in,  # ANY [R, D] (aliased with table_out)
    table_out,  # ANY [R, D]
    scratch,  # VMEM [NGRP, G, D] row staging
    read_sems,  # DMA sems [NGRP]
    write_sems,  # DMA sems [NGRP]
    *,
    num_rows: int,
    chunk: int,
    group: int,
    ngrp: int,
):
    """8-row-group pipeline: scattered rows are DMA'd per row, but the
    delta-add runs as one aligned (G, 128*k) vector op per group and DMA
    completions are consumed group-at-a-time — the scalar core spends its
    cycles issuing DMAs, not on per-row vector ops."""
    n_groups = chunk // group

    def row_of(gi, r):
        return rows_ref[gi * group + r]

    def start_reads(slot, gi):
        for r in range(group):

            @pl.when(row_of(gi, r).astype(jnp.uint32) < num_rows)
            def _(r=r):
                pltpu.make_async_copy(
                    table_out.at[pl.ds(row_of(gi, r), 1), :],
                    scratch.at[slot, pl.ds(r, 1), :],
                    read_sems.at[slot],
                ).start()

    def wait_group(sems, slot, gi):
        # each per-row copy signals the group's sem; consume them in the
        # same deterministic order they were started
        for r in range(group):

            @pl.when(row_of(gi, r).astype(jnp.uint32) < num_rows)
            def _(r=r):
                pltpu.make_async_copy(
                    table_out.at[pl.ds(row_of(gi, r), 1), :],
                    scratch.at[slot, pl.ds(r, 1), :],
                    sems.at[slot],
                ).wait()

    def start_writes(slot, gi):
        for r in range(group):

            @pl.when(row_of(gi, r).astype(jnp.uint32) < num_rows)
            def _(r=r):
                pltpu.make_async_copy(
                    scratch.at[slot, pl.ds(r, 1), :],
                    table_out.at[pl.ds(row_of(gi, r), 1), :],
                    write_sems.at[slot],
                ).start()

    # warm-up: fill the pipeline with reads
    for gi in range(min(ngrp, n_groups)):
        start_reads(gi % ngrp, gi)

    def body(gi, _):
        slot = gi % ngrp
        wait_group(read_sems, slot, gi)
        g0 = pl.multiple_of(gi * group, group)
        scratch[slot] = scratch[slot] + deltas_ref[
            pl.ds(g0, group), :
        ].astype(scratch.dtype)
        start_writes(slot, gi)
        nxt = gi + ngrp

        @pl.when(nxt < n_groups)
        def _():
            wait_group(write_sems, slot, gi)
            start_reads(slot, nxt)

        return 0

    jax.lax.fori_loop(0, n_groups, body, 0)

    # drain writes of the last ngrp groups
    def drain(gi, _):
        wait_group(write_sems, gi % ngrp, gi)
        return 0

    jax.lax.fori_loop(max(n_groups - ngrp, 0), n_groups, drain, 0)


@functools.partial(
    jax.jit, static_argnames=("interpret", "_chunk"), donate_argnums=(0,)
)
def row_scatter_add(
    table: jnp.ndarray,
    rows: jnp.ndarray,
    deltas: jnp.ndarray,
    *,
    interpret: bool = False,
    _chunk: int = 0,
) -> jnp.ndarray:
    """``table[rows] += deltas`` for DISTINCT rows, in place, cost O(|rows|).

    rows: [U] int32, all-distinct; entries >= table.shape[0] are skipped.
    deltas: [U, D] (cast to the table dtype on add).
    """
    num_rows, d = table.shape
    u = rows.shape[0]
    if d != 128:
        raise ValueError(
            f"row width {d}: Mosaic DMA slicing only supports 128-lane "
            "rows (see the slice-rule note) — wider dims use the XLA "
            "fallback or a restructured storage layout"
        )
    # pad U to a chunk multiple with OOB sentinels (skipped in-kernel).
    # _chunk: interpret-mode test knob ONLY (emulated-DMA count scales with
    # the padded U); real lowering needs the T(1024) SMEM-tiled _CHUNK.
    chunk = _chunk or _CHUNK
    pad = (-u) % chunk
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.full((pad,), num_rows, rows.dtype)]
        )
        deltas = jnp.concatenate(
            [deltas, jnp.zeros((pad, d), deltas.dtype)]
        )
    n_chunks = rows.shape[0] // chunk

    kernel = functools.partial(
        _row_scatter_add_kernel,
        num_rows=num_rows,
        chunk=chunk,
        group=_GROUP,
        ngrp=_NGRP,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        scratch_shapes=[
            pltpu.VMEM((_NGRP, _GROUP, d), table.dtype),
            pltpu.SemaphoreType.DMA((_NGRP,)),
            pltpu.SemaphoreType.DMA((_NGRP,)),
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(rows, deltas, table)


def supports_row_scatter_add(table: jnp.ndarray) -> bool:
    """True when the Pallas row-RMW/write kernels apply (TPU, EXACTLY
    128 lanes, >=32-bit dtype). Mosaic's DMA slicing only compiles
    full-minor [n, 128] slices (see the slice-rule note above), so both
    sub-32-bit rows AND dims > 128 take other paths — bf16 the
    pair-granular segscan, everything else the XLA scatter fallback."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at trace time
        on_tpu = False
    return (
        on_tpu
        and table.ndim == 2
        and table.shape[1] == 128
        and jnp.dtype(table.dtype).itemsize >= 4
    )


# --------------------------------------------------------------------------
# Fused sorted-apply: run accumulation + SGD row RMW in ONE kernel.
# Replaces the large-table backward tail after the argsort: the gradient
# gather from the pooled cotangent, the run segment-sum, the unique-id
# reconstruction AND the row_scatter_add pass.
#
# STATUS: correct (interpret + device) but MEASURED SLOWER in-context than
# the XLA chain + row_scatter_add (6.7 vs 3.3 ms/step on the headline
# bench): the per-slot (1,128) dynamic VMEM reads of the cotangent and the
# per-slot semaphore traffic cost more than the XLA ops they replace
# (which run as wide fused vector passes). Kept as groundwork — the
# round-2 direction is batching the run accumulation into (8,128) tiles
# before entering the DMA pipeline.
# --------------------------------------------------------------------------

_FSA_NSLOT = 32


def _fused_sorted_sgd_kernel(
    ids_ref,     # scalar-prefetch [U] sorted row ids (>= num_rows = skip)
    nxt_ref,     # scalar-prefetch [U] ids shifted by one (OOB tail)
    seg_ref,     # scalar-prefetch [U] pooled-grad row per slot
    lr_ref,      # scalar-prefetch [1] f32 learning rate
    pooled_ref,  # VMEM [S+1, D] cotangent rows (row S = zeros)
    table_in,    # ANY (aliased with table_out)
    table_out,   # ANY
    acc,         # VMEM [8, D] run accumulator (row 0)
    rowbuf,      # VMEM [NSLOT, 8, D] staged table rows
    wrow,        # SMEM [NSLOT] row of this slot's pending write (-1 = none)
    read_sems,   # DMA [NSLOT]
    write_sems,  # DMA [NSLOT]
    *,
    num_rows: int,
    u: int,
    nslot: int,
):
    d = acc.shape[-1]

    def read_dma(slot, row):
        return pltpu.make_async_copy(
            table_out.at[pl.ds(row, 1), :],
            rowbuf.at[slot, pl.ds(0, 1), :],
            read_sems.at[slot],
        )

    def write_dma(slot, row):
        return pltpu.make_async_copy(
            rowbuf.at[slot, pl.ds(0, 1), :],
            table_out.at[pl.ds(row, 1), :],
            write_sems.at[slot],
        )

    # init guards + accumulator; warm the read pipeline
    for k in range(nslot):
        wrow[k] = -1
    acc[pl.ds(0, 1), :] = jnp.zeros((1, d), acc.dtype)
    for j in range(min(nslot, u)):

        @pl.when(ids_ref[j] < num_rows)
        def _(j=j):
            read_dma(j % nslot, ids_ref[j]).start()

    def body(j, _):
        slot = jax.lax.rem(j, nslot)
        rid = ids_ref[j]
        valid = rid < num_rows

        @pl.when(valid)
        def _():
            # accumulate this slot's gradient row from the VMEM cotangent
            g = pooled_ref[pl.ds(seg_ref[j], 1), :]
            acc[pl.ds(0, 1), :] = acc[pl.ds(0, 1), :] - lr_ref[0] * g
            # every valid slot's read was started; consume it
            read_dma(slot, rid).wait()

            @pl.when(nxt_ref[j] != rid)
            def _():
                # run boundary: apply the accumulated delta to the staged
                # row and write it back
                rowbuf[slot, pl.ds(0, 1), :] = (
                    rowbuf[slot, pl.ds(0, 1), :] + acc[pl.ds(0, 1), :]
                )
                write_dma(slot, rid).start()
                wrow[slot] = rid
                acc[pl.ds(0, 1), :] = jnp.zeros((1, d), acc.dtype)

        # keep the read pipeline full; drain this slot's pending write
        # before its buffer is reused
        nxt_j = j + nslot

        @pl.when(nxt_j < u)
        def _():
            @pl.when(ids_ref[nxt_j] < num_rows)
            def _():
                pending = wrow[slot]

                @pl.when(pending >= 0)
                def _():
                    write_dma(slot, pending).wait()
                    wrow[slot] = -1

                read_dma(slot, ids_ref[nxt_j]).start()

        return 0

    jax.lax.fori_loop(0, u, body, 0)

    # drain remaining pending writes
    def drain(k, _):
        pending = wrow[k]

        @pl.when(pending >= 0)
        def _():
            write_dma(k, pending).wait()
            wrow[k] = -1

        return 0

    jax.lax.fori_loop(0, nslot, drain, 0)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def fused_sorted_sgd_apply(
    table: jnp.ndarray,
    sorted_ids: jnp.ndarray,
    sorted_seg: jnp.ndarray,
    pooled_grad: jnp.ndarray,
    lr,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """In-place SGD over a SORTED slot stream: for each run of equal ids r,
    ``table[r] -= lr * sum(pooled_grad[seg])`` over the run's slots.

    sorted_ids: [U] ascending; >= table rows = padding (skipped).
    sorted_seg: [U] rows into pooled_grad; OOB clamps to the zero row.
    Cost is O(U) VMEM accumulation + 2 DMAs per UNIQUE row.
    """
    num_rows, d = table.shape
    if d != 128:
        raise ValueError(
            f"row width {d}: Mosaic DMA slicing only supports 128-lane "
            "rows (see the slice-rule note) — wider dims use the XLA "
            "fallback or a restructured storage layout"
        )
    u = sorted_ids.shape[0]
    s = pooled_grad.shape[0]
    padded = jnp.concatenate(
        [pooled_grad.astype(table.dtype), jnp.zeros((1, d), table.dtype)]
    )
    nxt = jnp.concatenate(
        [sorted_ids[1:], jnp.full((1,), num_rows, sorted_ids.dtype)]
    )
    seg_c = jnp.minimum(sorted_seg, s).astype(jnp.int32)
    nslot = min(_FSA_NSLOT, max(u, 1))
    kernel = functools.partial(
        _fused_sorted_sgd_kernel, num_rows=num_rows, u=u, nslot=nslot
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pooled (padded)
            pl.BlockSpec(memory_space=pl.ANY),  # table
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, d), table.dtype),
            pltpu.VMEM((nslot, 8, d), table.dtype),
            pltpu.SMEM((nslot,), jnp.int32),
            pltpu.SemaphoreType.DMA((nslot,)),
            pltpu.SemaphoreType.DMA((nslot,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        sorted_ids.astype(jnp.int32),
        nxt.astype(jnp.int32),
        seg_c,
        jnp.asarray([lr], jnp.float32),
        padded,
        table,
    )


# --------------------------------------------------------------------------
# Write-only row scatter: XLA's row GATHER is fast (~13 ns/row), so the
# read half of the RMW can run as `jnp.take` + add in XLA, leaving the
# kernel a single write DMA per row (half the DMA issue cost of the RMW
# form).
# --------------------------------------------------------------------------


# MOSAIC DMA SLICE RULE (probed on v5e, r4): the only row-granular
# slices that compile are FULL-MINOR slices of 128-lane refs — [n, 128]
# at any dynamic dim-0 offset/size. [1, 256] fails ("aligned to tiling
# (8)") in EVERY memory space, as do lane-offset [1, 128] windows of
# wider refs and slices of memref_reshape results. Hence every row
# kernel here requires EXACTLY 128 lanes; wider logical rows must change
# STORAGE layout (the interleaved colocated blob and the bf16 pair
# blob are both instances: extra data rides extra 128-lane ROWS, moved
# by multi-row [k, 128] slices). dim > 128 tables currently take the
# XLA fallback paths (supports_* gates below).


def _row_copy(src_ref, i, dst_ref, r, sem, d: int):
    """Issue the DMA copying one row (d == 128 only — see the slice-rule
    note above)."""
    assert d == 128, "row kernels require 128-lane rows"
    pltpu.make_async_copy(
        src_ref.at[pl.ds(i, 1), :],
        dst_ref.at[pl.ds(r, 1), :],
        sem,
    ).start()


def _rows_wait(ref, sem, n, d: int):
    """Aggregated byte-count wait for the issued copies: a dummy
    self-copy of the same total bytes (never started)."""
    pltpu.make_async_copy(
        ref.at[pl.ds(0, n), :], ref.at[pl.ds(0, n), :], sem
    ).wait()


def _row_scatter_write_bf_kernel(
    rows_ref,   # SMEM [CHUNK] target rows — ALL in-bounds and distinct
    vals_ref,   # VMEM [CHUNK, D] replacement rows
    table_in,   # ANY (aliased)
    table_out,  # ANY
    sem,        # DMA [1]
    *,
    chunk: int,
    group: int,
    rem: int = 0,
    n_chunks: int = 1,
):
    """Branch-free write scatter: every row id is a valid distinct target
    (the module layer parks dedup sentinels in a scratch tail of the table),
    so the scalar core issues one unconditional DMA per row and consumes ONE
    aggregated semaphore wait per chunk — measured 8.0 ns/row vs 23 ns/row
    for the bounds-branched per-row-wait form on v5e (20.5k rows into
    1.4M x 128).

    ``rem``: when the row count is not a chunk multiple, the LAST grid step
    issues only the first ``rem`` rows (statically unrolled) — handling the
    tail in-kernel instead of padding the inputs, whose 10.5 MB values
    concatenate cost ~4.7 ns/row (12.7 vs 8.0) at the headline shapes."""

    d = vals_ref.shape[1]

    def issue(i):
        _row_copy(vals_ref, i, table_out, rows_ref[i], sem.at[0], d)

    def run(n):
        for i in range(n):
            issue(i)
        # aggregated wait: copy objects of the issued byte count, never
        # started — .wait() just decrements the semaphore by those bytes
        _rows_wait(vals_ref, sem.at[0], n, d)

    if rem == 0:
        run(chunk)
    else:
        last = pl.program_id(0) == n_chunks - 1

        @pl.when(jnp.logical_not(last))
        def _():
            run(chunk)

        @pl.when(last)
        def _():
            run(rem)


def _row_scatter_write_kernel(
    rows_ref,   # SMEM [CHUNK] target rows (OOB = skip)
    vals_ref,   # VMEM [CHUNK, D] replacement rows
    table_in,   # ANY (aliased)
    table_out,  # ANY
    write_sems,  # DMA [NGRP]
    *,
    num_rows: int,
    chunk: int,
    group: int,
    ngrp: int,
):
    n_groups = chunk // group

    def row_of(gi, r):
        return rows_ref[gi * group + r]

    def start_writes(slot, gi):
        for r in range(group):

            @pl.when(row_of(gi, r).astype(jnp.uint32) < num_rows)
            def _(r=r):
                pltpu.make_async_copy(
                    vals_ref.at[pl.ds(gi * group + r, 1), :],
                    table_out.at[pl.ds(row_of(gi, r), 1), :],
                    write_sems.at[slot],
                ).start()

    def wait_writes(slot, gi):
        for r in range(group):

            @pl.when(row_of(gi, r).astype(jnp.uint32) < num_rows)
            def _(r=r):
                pltpu.make_async_copy(
                    vals_ref.at[pl.ds(gi * group + r, 1), :],
                    table_out.at[pl.ds(row_of(gi, r), 1), :],
                    write_sems.at[slot],
                ).wait()

    for gi in range(min(ngrp, n_groups)):
        start_writes(gi % ngrp, gi)

    def body(gi, _):
        slot = gi % ngrp
        wait_writes(slot, gi)
        nxt = gi + ngrp

        @pl.when(nxt < n_groups)
        def _():
            start_writes(slot, nxt)

        return 0

    jax.lax.fori_loop(0, min(ngrp, n_groups) and n_groups, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "in_bounds", "_chunk"),
    donate_argnums=(0,),
)
def row_scatter_write(
    table: jnp.ndarray,
    rows: jnp.ndarray,
    values: jnp.ndarray,
    *,
    in_bounds: bool = False,
    interpret: bool = False,
    _chunk: int = 0,
) -> jnp.ndarray:
    """``table[rows] = values`` for DISTINCT rows, in place; OOB skipped.

    ``in_bounds=True`` selects the branch-free kernel (2.8x faster issue
    rate). CONTRACT: every entry of ``rows`` must be a distinct row strictly
    below ``table.shape[0]`` (no padding headroom needed — a partial tail
    chunk is handled in-kernel by a static ``rem`` unroll, not by padding
    the inputs). Callers that park dedup sentinels at real addresses
    allocate group blobs with a scratch tail of ``round_up(max_unique,
    _CHUNK)`` rows (TableGroup.scratch_rows imports the same ``_CHUNK``
    constant so the two sides cannot drift) — that is the module layer's
    sentinel-parking convention, not a requirement of this kernel.
    """
    num_rows, d = table.shape
    if d != 128:
        raise ValueError(
            f"row width {d}: Mosaic DMA slicing only supports 128-lane "
            "rows (see the slice-rule note) — wider dims use the XLA "
            "fallback or a restructured storage layout"
        )
    if jnp.dtype(table.dtype).itemsize < 4:
        # Mosaic DMA granularity is 512 bytes (128 32-bit lanes): a 256-
        # byte bf16 row cannot be sliced in ANY layout (dim-0 slices of a
        # bf16 ref need 8-row alignment; 64-lane u32 views violate lane
        # tiling). bf16 row writes go through the PAIR-granular segscan
        # kernels (row_scatter_write_segscan* in half-pair mode); this
        # generic kernel rejects sub-32-bit tables.
        raise ValueError(
            "row_scatter_write requires a >=32-bit table dtype; bf16 "
            "tables use the pair-granular segscan kernels or the XLA "
            "scatter fallback"
        )
    u = rows.shape[0]
    if u == 0:
        # static empty window: no-op. Without this, _pad_window would pad
        # to one full chunk with rem=0, which the branch-free kernel reads
        # as "full chunk" — CHUNK unconditional DMAs all targeting padded
        # row 0, clobbering it (advisor r4 finding).
        return table
    # _chunk: interpret-mode test knob ONLY (see row_scatter_add)
    chunk = _chunk or _CHUNK
    if in_bounds and chunk > _CHUNK:
        # The module layer sizes scratch tails with _CHUNK; a larger test
        # chunk would park pad targets outside the reserved sentinel range.
        raise ValueError(f"_chunk={chunk} > _CHUNK={_CHUNK} with in_bounds")
    if in_bounds:
        # No input padding at production sizes: the branch-free kernel
        # handles a partial tail chunk with a static rem unroll on the
        # last grid step (padding here costs a full 10.5 MB values
        # concatenate per call — ~4.7 ns/row, 12.7 vs 8.0 measured at
        # the headline shapes). Sub-chunk windows DO pad (tiny arrays,
        # XLA SMEM layout mismatch otherwise — see _pad_window).
        rows, values, rem = _pad_window(u, chunk, rows, values)
        n_chunks = max((u + chunk - 1) // chunk, 1)
        kernel = functools.partial(
            _row_scatter_write_bf_kernel, chunk=chunk, group=_GROUP,
            rem=rem, n_chunks=n_chunks,
        )
        sems = [pltpu.SemaphoreType.DMA((1,))]
    else:
        pad = (-u) % chunk
        if pad:
            rows = jnp.concatenate(
                [rows, jnp.full((pad,), num_rows, rows.dtype)]
            )
            values = jnp.concatenate(
                [values, jnp.zeros((pad, d), values.dtype)]
            )
        n_chunks = rows.shape[0] // chunk
        kernel = functools.partial(
            _row_scatter_write_kernel,
            num_rows=num_rows, chunk=chunk, group=_GROUP, ngrp=_NGRP,
        )
        sems = [pltpu.SemaphoreType.DMA((_NGRP,))]
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        scratch_shapes=sems,
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(rows, values.astype(table.dtype), table)


# --------------------------------------------------------------------------
# Fused backward tail: segmented run-sum + optimizer + write in ONE pass.
#
# The position-layout dedup (lookup.dedup_rows_from_sorted) spends ~156 us
# at the headline shapes in XLA's sorted segment-sum — a full extra
# 20.5k-row pass between the (cheap, ~8 us) gradient expand gather and the
# write kernel. Here the run accumulation rides INSIDE the write kernel as
# a vectorized Hillis-Steele segmented prefix scan over the streamed
# [CHUNK, D] gradient block (log2(CHUNK) wide VPU steps, no per-slot VMEM
# reads — the failure mode of the round-1 fused_sorted_sgd_apply), with a
# [1, D] carry for runs crossing chunk boundaries. Run sums land at run-END
# positions (forward grid order), so targets use run-END layout: the real
# id at each run's last slot, distinct scratch-tail sentinels elsewhere —
# the same branch-free parking contract as row_scatter_write(in_bounds).
# --------------------------------------------------------------------------


def _pad_window(u: int, chunk: int, rows, *blocks):
    """Pad a sub-chunk slot window up to one full chunk. XLA lays out
    int32 SMEM scalars shorter than a chunk with T(128) tiling, which
    fails Mosaic's T(1024) operand check on device — and the kernels'
    static ``rem`` unroll never issues the padding anyway (pad targets
    are unread, pad block rows are computed but not written). Returns
    (padded_rows, padded_blocks..., rem) with rem = u. Callers MUST
    early-return on u == 0 first: rem would come back 0, which the
    kernels read as "full last chunk" and would issue CHUNK DMAs all
    aimed at padded row 0."""
    if u >= chunk:
        return (rows, *blocks, u % chunk)
    pad = chunk - u
    rows = jnp.pad(rows, (0, pad))
    blocks = tuple(
        jnp.pad(b, ((0, pad),) + ((0, 0),) * (b.ndim - 1))
        for b in blocks
    )
    return (rows, *blocks, u)


def _segscan_vals(heads, vals, carry_ref, chunk: int):
    """Value-input segmented inclusive prefix scan (see :func:`_segscan_v`
    — this form takes the per-slot values as an ARRAY so callers can mask
    or derive them in-kernel)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    v = vals
    b = 1.0 - heads
    d = 1
    while d < chunk:
        v = v + b * jnp.concatenate(
            [jnp.zeros((d, v.shape[1]), v.dtype), v[:-d]], axis=0
        )
        b = b * jnp.concatenate(
            [jnp.ones((d, 1), b.dtype), b[:-d]], axis=0
        )
        d *= 2
    v = v + b * carry_ref[...]
    carry_ref[...] = v[chunk - 1 : chunk, :]
    return v


def _segscan_v(heads_ref, grads_ref, carry_ref, chunk: int):
    """Shared segmented inclusive prefix scan: v[i] = sum of grads over
    this run's slots <= i, with the cross-chunk carry updated in place.
    b[i] ("open") = 1 iff no run head at any position <= i, i.e. position
    i still absorbs the carry from the previous chunk."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    v = grads_ref[...]
    b = 1.0 - heads_ref[...]
    d = 1
    while d < chunk:
        # v pads with zeros (out-of-chunk grads arrive via the carry);
        # b pads with ONES (positions before the chunk hold no in-chunk
        # head, so b[i<d] must keep reporting "still open to the carry")
        v = v + b * jnp.concatenate(
            [jnp.zeros((d, v.shape[1]), v.dtype), v[:-d]], axis=0
        )
        b = b * jnp.concatenate(
            [jnp.ones((d, 1), b.dtype), b[:-d]], axis=0
        )
        d *= 2
    v = v + b * carry_ref[...]
    carry_ref[...] = v[chunk - 1 : chunk, :]
    return v


def _bf16_patterns(x, seed, salt: int, chunk: int):
    """f32 -> bf16 bit patterns (u32 arrays, pattern in the LOW 16 bits).
    ``seed`` None: round-to-nearest-even (astype semantics). ``seed``
    given: stochastic rounding — the same add-random-low-bits-and-
    truncate as fused_optim.stochastic_round_bf16, with bits from a
    murmur3-finalizer hash of the global element counter (pure VPU ops:
    works compiled AND in interpret mode, zero HBM traffic). ``salt``
    decorrelates multiple pattern streams within one kernel."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    if seed is None:
        r = (u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))) >> 16
    else:
        d = x.shape[1]
        idx = (
            jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) * d
            + jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            + (2 * pl.program_id(0) + salt) * (chunk * d)
        ).astype(jnp.uint32)
        # decorrelate steps by a golden-ratio stride before the finalizer
        h = idx ^ (seed * jnp.uint32(0x9E3779B9))
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x85EBCA6B)
        h = h ^ (h >> 13)
        h = h * jnp.uint32(0xC2B2AE35)
        h = h ^ (h >> 16)
        r = (u + (h & jnp.uint32(0xFFFF))) >> 16
    # non-finite passes through untouched (NaN payload bits preserved)
    return jnp.where(jnp.isfinite(x), r, u >> 16)


def _unpack_pair_half(w):
    """u32 pair words [n, d2] -> f32 rows [n, 2*d2] in HALF-LAYOUT (col
    j < d2 = original lane 2j from the LOW 16 bits — XLA bitcast packs
    index 0 into the low bits on TPU — col d2+j = lane 2j+1)."""
    lo = jax.lax.bitcast_convert_type(w << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(w & jnp.uint32(0xFFFF0000), jnp.float32)
    return jnp.concatenate([lo, hi], axis=1)


def _pack_pair_half(x, seed, salt: int, chunk: int):
    """f32 rows [n, 2*d2] in HALF-LAYOUT -> u32 pair words [n, d2] with
    bf16 rounding (see _bf16_patterns)."""
    p = _bf16_patterns(x, seed, salt, chunk)
    d2 = x.shape[1] // 2
    return p[:, :d2] | (p[:, d2:] << 16)


# -- pair-packed bf16 storage (module-layer format) --------------------------
#
# bf16 group blobs are STORED as u32 [R/2, D] "pair-packed" arrays (rows
# 2p, 2p+1 share pair row p; u32 lane j of each half = bf16 lanes
# 2j | 2j+1 << 16 — the linear byte image, numpy
# ``blob.view(uint32).reshape(R//2, D)``). This is the same convention as
# the packed int4/int2 quant storage (types.py "packed at a higher
# layer"): XLA-level bf16<->u32 views are NOT free on TPU (any [.., 2]-
# minor reshape re-tiles with 64x padding; tiled-layout reshapes copy the
# whole table), so the packed form IS the format, with the converters
# below at the boundaries.


def pack_pairs_host(arr) -> "np.ndarray":
    """HOST-side exact pack: 16-bit [R (even), D] -> u32 [R/2, D]."""
    import numpy as np

    a = np.ascontiguousarray(np.asarray(arr))
    r, d = a.shape
    return a.view(np.uint32).reshape(r // 2, d)


def unpack_pairs_host(blob, dtype) -> "np.ndarray":
    """HOST-side exact unpack: u32 [P, D] -> 16-bit dtype [2P, D]."""
    import numpy as np

    b = np.ascontiguousarray(np.asarray(blob))
    p, d = b.shape
    return b.view(np.dtype(dtype)).reshape(2 * p, d)


def _half_inv_perm(d: int):
    """Static perm taking HALF-LAYOUT columns back to logical lanes:
    logical[:, 2j] = half[:, j], logical[:, 2j+1] = half[:, d/2 + j]."""
    import numpy as np

    inv = np.empty(d, np.int32)
    inv[0::2] = np.arange(d // 2)
    inv[1::2] = d // 2 + np.arange(d // 2)
    return inv


def _half_fwd_perm(d: int):
    """Inverse of :func:`_half_inv_perm`: logical -> HALF-LAYOUT columns
    (half[:, j] = logical[:, 2j] for j < d/2; half[:, d/2+j] =
    logical[:, 2j+1])."""
    import numpy as np

    fwd = np.empty(d, np.int32)
    fwd[: d // 2] = 2 * np.arange(d // 2)
    fwd[d // 2 :] = 2 * np.arange(d // 2) + 1
    return fwd


def pack_pair_half_exact(x: jnp.ndarray) -> jnp.ndarray:
    """bf16-valued rows [n, D] in HALF-LAYOUT -> u32 pair words [n, D/2]
    (exact bits; contiguous-half selects only — no strided lane access)."""
    d2 = x.shape[1] // 2
    u = jax.lax.bitcast_convert_type(
        x.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return u[:, :d2] | (u[:, d2:] << 16)


def unpack_pair_blob(blob: jnp.ndarray) -> jnp.ndarray:
    """u32 pair-packed [P, D] -> f32 logical [2P, D] (XLA, poison-free:
    only 2-D ops). Fallback-path converter — cost is a few full passes
    over the blob; the fast paths consume pair words directly."""
    p, d = blob.shape
    d2 = d // 2
    inv = jnp.asarray(_half_inv_perm(d))
    e = jnp.take(_unpack_pair_half(blob[:, :d2]), inv, axis=1)
    o = jnp.take(_unpack_pair_half(blob[:, d2:]), inv, axis=1)
    return jnp.concatenate([e, o], axis=1).reshape(2 * p, d)


def pack_pair_blob(x: jnp.ndarray) -> jnp.ndarray:
    """16-bit (or f32, rounded RN-even) logical [2P, D] -> u32 pair-packed
    [P, D] (XLA, poison-free)."""
    r, d = x.shape
    u16 = jax.lax.bitcast_convert_type(
        x.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    w = u16[:, 0::2] | (u16[:, 1::2] << 16)
    return w.reshape(r // 2, d)


def _segscan_write(
    issue, sem_waits, chunk: int, rem: int, n_chunks: int,
    rows_per_issue: int = 1,
):
    """Shared branch-free write tail: issue per-row DMAs, one aggregated
    wait per (semaphore, row-size) via same-size dummy self-copies.
    ``rows_per_issue``: scratch rows each issue() moves (2 for the
    interleaved colocated kernel's [2, D] pair DMAs)."""
    def run(n):
        for i in range(n):
            issue(i)
        for ref, sem in sem_waits:
            _rows_wait(ref, sem, n * rows_per_issue, ref.shape[1])

    if rem == 0:
        run(chunk)
    else:
        last = pl.program_id(0) == n_chunks - 1

        @pl.when(jnp.logical_not(last))
        def _():
            run(chunk)

        @pl.when(last)
        def _():
            run(rem)


def _row_scatter_write_segscan_kernel(
    scal_ref,   # SMEM [2] f32: (lr, weight_decay)
    rows_ref,   # SMEM [CHUNK] run-END targets — ALL in-bounds and distinct
    heads_ref,  # VMEM [CHUNK, 1] f32: 1.0 at run starts (global layout)
    ends_ref,   # VMEM [CHUNK, 1] f32: 1.0 at run ENDS (real-row targets)
    grads_ref,  # VMEM [CHUNK, D] f32 per-slot gradient rows (slot order)
    old_ref,    # VMEM [CHUNK, D] f32 table rows at slot positions
    table_in,   # ANY (aliased)
    table_out,  # ANY
    vals_ref,   # VMEM scratch [CHUNK * NT, 128]: replacement rows in
                # tile-row form (logical row i at scratch rows i*nt..)
    carry_ref,  # VMEM scratch [1, D]: boundary-crossing run prefix sum
    sem,        # DMA [1]
    *,
    chunk: int,
    rem: int = 0,
    n_chunks: int = 1,
    nt: int = 1,
):
    v = _segscan_v(heads_ref, grads_ref, carry_ref, chunk)
    lr = scal_ref[0]
    wd = scal_ref[1]
    # SGD with decoupled-into-gradient weight decay (fused_optim.SGD):
    # new = old - lr * (run_sum + wd * old) = (1 - lr*wd) * old - lr * sum.
    # Non-run-end positions write to scratch-tail sentinel rows; zero them
    # (ends mask, via where — a multiply would keep NaN garbage: NaN*0=NaN)
    # so the tail stays finite instead of accumulating garbage copies of
    # old rows (NaN-free checkpoints / whole-tensor inspection).
    new32 = jnp.where(
        ends_ref[...] > 0.0,
        old_ref[...] * (1.0 - lr * wd) - lr * v,
        0.0,
    )
    # D = nt*128 lanes split into nt 128-lane TILE ROWS (the only DMA-
    # sliceable granularity — see the Mosaic slice-rule note); nt == 1
    # is the plain [chunk, 128] form
    vals_ref[...] = new32.reshape(chunk * nt, 128)

    def issue(i):
        pltpu.make_async_copy(
            vals_ref.at[pl.ds(i * nt, nt), :],
            table_out.at[pl.ds(rows_ref[i] * nt, nt), :],
            sem.at[0],
        ).start()

    _segscan_write(
        issue, [(vals_ref, sem.at[0])], chunk, rem, n_chunks,
        rows_per_issue=nt,
    )


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "_chunk"),
    donate_argnums=(0,),
)
def row_scatter_write_segscan(
    table: jnp.ndarray,
    rows_end: jnp.ndarray,
    heads: jnp.ndarray,
    ends: jnp.ndarray,
    grads: jnp.ndarray,
    old_rows: jnp.ndarray,
    scal: jnp.ndarray,
    *,
    interpret: bool = False,
    _chunk: int = 0,
) -> jnp.ndarray:
    """Fused SGD backward tail over an id-sorted slot window, in place:

    for each run of equal ids: ``table[id] = (1 - lr*wd) * table[id]
    - lr * sum(grads over the run)`` — the run segment-sum, the optimizer
    math, and the scattered row write in ONE streamed pass (saves the
    ~156 us position-layout segment-sum the XLA path pays at the headline
    shapes).

    Args (u = slot-window length, D = row width, multiple of 128):
      rows_end: [u] int32 — the run's id at its LAST slot position;
        every other position a DISTINCT in-bounds scratch-tail sentinel
        (same contract as ``row_scatter_write(in_bounds=True)``: all
        entries < ``table.shape[0]``, module scratch tail sized by _CHUNK).
      heads:    [u, 1] f32 — 1.0 where a new run starts, else 0.0
        (position 0 is always a head).
      ends:     [u, 1] f32 — 1.0 where a run ends AND targets a real row
        (i.e. exactly where ``rows_end`` is not a sentinel). Non-end
        positions write ZERO rows to their scratch-tail sentinels, keeping
        the tail finite across steps.
      grads:    [u, D] f32 — per-slot gradient rows (zero rows for
        invalid/padding slots).
      old_rows: [u, D] f32 — current table rows at slot positions (the
        forward's window gather; values at sentinel positions arbitrary).
      scal:     [2] f32 — (lr, weight_decay).

    D > 128 uses TILE-ROW storage: ``table`` is ``[R * nt, 128]`` with
    logical row r at physical rows ``r*nt .. r*nt + nt - 1`` (nt =
    D // 128 inferred from ``grads``) — Mosaic DMA slicing only permits
    full-minor [n, 128] slices, so wide rows move as one [nt, 128] DMA
    of consecutive tile rows. fp32 tables only — bf16 takes
    :func:`row_scatter_write_segscan_pair`.
    """
    num_rows, dt = table.shape
    d = grads.shape[1]
    nt = d // 128
    if dt != 128 or d % 128 or nt < 1:
        raise ValueError(
            f"table must be tile-row [R*nt, 128] with grads [u, nt*128]; "
            f"got table {table.shape}, grads {grads.shape}"
        )
    if jnp.dtype(table.dtype).itemsize < 4:
        raise ValueError(
            "row_scatter_write_segscan requires a >=32-bit table dtype; "
            "use row_scatter_write_segscan_pair for bf16 tables"
        )
    u = rows_end.shape[0]
    if u == 0:  # static empty window — see row_scatter_write's u==0 note
        return table
    chunk = _chunk or _CHUNK
    if chunk > _CHUNK:
        raise ValueError(f"_chunk={chunk} > _CHUNK={_CHUNK} with in_bounds")
    rows_end, heads, ends, grads, old_rows, rem = _pad_window(
        u, chunk, rows_end, heads, ends, grads, old_rows
    )
    n_chunks = max((u + chunk - 1) // chunk, 1)
    kernel = functools.partial(
        _row_scatter_write_segscan_kernel,
        chunk=chunk, rem=rem, n_chunks=n_chunks, nt=nt,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((2,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        scratch_shapes=[
            pltpu.VMEM((chunk * nt, 128), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        scal.astype(jnp.float32),
        rows_end.astype(jnp.int32),
        heads.astype(jnp.float32),
        ends.astype(jnp.float32),
        grads.astype(jnp.float32),
        old_rows.astype(jnp.float32),
        table,
    )


def _row_scatter_write_segscan_rowwise_kernel(
    scal_ref,   # SMEM [3] f32: (lr, weight_decay, eps)
    rows_ref,   # SMEM [CHUNK] run-END targets — ALL in-bounds and distinct
    heads_ref,  # VMEM [CHUNK, 1] f32
    ends_ref,   # VMEM [CHUNK, 1] f32: 1.0 at run ENDS (real-row targets)
    grads_ref,  # VMEM [CHUNK, D] f32
    old_ref,    # VMEM [CHUNK, D] f32 table rows at slot positions
    mom_ref,    # VMEM [CHUNK, 1] f32 momentum at run-end rows (slot order)
    table_in,   # ANY (aliased)
    table_out,  # ANY
    mvals_ref,  # VMEM OUTPUT block [CHUNK, 1]: updated accumulator values
                # (scalars cannot be DMA-scattered — minor-dim tiling is
                # 128 — so the caller scatters them with XLA's cheap
                # scalar-target set)
    vals_ref,   # VMEM scratch [CHUNK * NT, 128] (tile-row form)
    carry_ref,  # VMEM scratch [1, D]
    sem,        # DMA [1]
    *,
    chunk: int,
    rem: int = 0,
    n_chunks: int = 1,
    nt: int = 1,
):
    v = _segscan_v(heads_ref, grads_ref, carry_ref, chunk)
    lr = scal_ref[0]
    wd = scal_ref[1]
    eps = scal_ref[2]
    # EXACT_ROWWISE_ADAGRAD (fused_optim.RowWiseAdagrad.update):
    #   g = run_sum + wd * old; s += mean(g^2); new = old - lr*g/(sqrt(s)+eps)
    # Non-end positions hold garbage old/mom values (their writes park in
    # the scratch tail; their mvals are dropped by the caller's mode="drop"
    # scatter) — select them to zero (where, not multiply: NaN*0=NaN) so no
    # NaN (sqrt of negative garbage) lands in the tail and mvals stay
    # finite.
    ends = ends_ref[...] > 0.0
    g = v + wd * old_ref[...]
    m_new = mom_ref[...] + jnp.mean(g * g, axis=1, keepdims=True)
    mvals_ref[...] = jnp.where(ends, m_new, 0.0)
    new32 = jnp.where(
        ends,
        old_ref[...] - (lr * g) / (jnp.sqrt(jnp.abs(m_new)) + eps),
        0.0,
    )
    vals_ref[...] = new32.reshape(chunk * nt, 128)

    def issue(i):
        pltpu.make_async_copy(
            vals_ref.at[pl.ds(i * nt, nt), :],
            table_out.at[pl.ds(rows_ref[i] * nt, nt), :],
            sem.at[0],
        ).start()

    _segscan_write(
        issue, [(vals_ref, sem.at[0])], chunk, rem, n_chunks,
        rows_per_issue=nt,
    )


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "_chunk"),
    donate_argnums=(0,),
)
def row_scatter_write_segscan_rowwise(
    table: jnp.ndarray,
    rows_end: jnp.ndarray,
    heads: jnp.ndarray,
    ends: jnp.ndarray,
    grads: jnp.ndarray,
    old_rows: jnp.ndarray,
    mom_rows: jnp.ndarray,
    scal: jnp.ndarray,
    *,
    interpret: bool = False,
    _chunk: int = 0,
) -> tuple:
    """Fused EXACT_ROWWISE_ADAGRAD backward tail (the RowWiseAdagrad
    sibling of :func:`row_scatter_write_segscan` — same run-END layout,
    ``ends`` mask, and scratch-tail parking contract):

    for each run: ``g = sum(grads) + wd * table[id];
    m_new = mom[id] + mean(g²); table[id] -= lr * g / (sqrt(m_new) +
    eps)`` — rows are written in place; the updated accumulator values
    come back as a BLOCKED ``[u, 1]`` output for the caller to scatter
    (``mom.at[rows_end].set``, a cheap scalar-target XLA scatter —
    per-element DMA scatters are impossible: minor-dim tiling is 128).
    Non-end positions write zero rows/mvals (kept finite by the ends
    mask).

    Extra args: ``mom_rows`` [u] f32 — the accumulator gathered at
    ``min(rows_end, R-1)`` (garbage at sentinel positions is masked to
    zero in-kernel); ``scal`` [3] f32 — (lr, weight_decay, eps);
    Returns ``(new_table, m_new [u, 1])``. fp32 tables only (see
    :func:`row_scatter_write_segscan_pair_rowwise` for bf16); D > 128
    uses tile-row storage (see :func:`row_scatter_write_segscan`).
    """
    num_rows, dt = table.shape
    d = grads.shape[1]
    nt = d // 128
    if dt != 128 or d % 128 or nt < 1:
        raise ValueError(
            f"table must be tile-row [R*nt, 128] with grads [u, nt*128]; "
            f"got table {table.shape}, grads {grads.shape}"
        )
    if jnp.dtype(table.dtype).itemsize < 4:
        raise ValueError(
            "row_scatter_write_segscan_rowwise requires a >=32-bit table "
            "dtype; use row_scatter_write_segscan_pair_rowwise for bf16"
        )
    u = rows_end.shape[0]
    if u == 0:  # static empty window — see row_scatter_write's u==0 note
        return table, jnp.zeros((0, 1), jnp.float32)
    chunk = _chunk or _CHUNK
    if chunk > _CHUNK:
        raise ValueError(f"_chunk={chunk} > _CHUNK={_CHUNK} with in_bounds")
    (
        rows_end, heads, ends, grads, old_rows, mom_rows, rem
    ) = _pad_window(
        u, chunk, rows_end, heads, ends, grads, old_rows,
        mom_rows.reshape(u),
    )
    n_chunks = max((u + chunk - 1) // chunk, 1)
    kernel = functools.partial(
        _row_scatter_write_segscan_rowwise_kernel,
        chunk=chunk, rem=rem, n_chunks=n_chunks, nt=nt,
    )
    new_table, m_new = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((3,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(table.shape, table.dtype),
            jax.ShapeDtypeStruct((n_chunks * chunk, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk * nt, 128), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        scal.astype(jnp.float32),
        rows_end.astype(jnp.int32),
        heads.astype(jnp.float32),
        ends.astype(jnp.float32),
        grads.astype(jnp.float32),
        old_rows.astype(jnp.float32),
        mom_rows.astype(jnp.float32).reshape(-1, 1),
        table,
    )
    return new_table, m_new[:u]


def _row_scatter_write_segscan_rowwise_colo_kernel(
    scal_ref,   # SMEM [4] f32: (lr, weight_decay, eps, initial_acc)
    rows_ref,   # SMEM [CHUNK] run-END targets — ALL in-bounds and distinct
    heads_ref,  # VMEM [CHUNK, 1] f32
    ends_ref,   # VMEM [CHUNK, 1] f32
    grads_ref,  # VMEM [CHUNK, D] f32 per-slot gradient rows
    old_ref,    # VMEM [CHUNK, 2*D] f32: interleaved (weight row, state
                # row) pairs value-reshaped to one row per slot —
                # [:, :D] = weights, [:, D] = accumulator delta
    table_in,   # ANY [2R, D] (aliased) — INTERLEAVED storage: logical
                # row r = physical rows (2r: weights, 2r+1: state)
    table_out,  # ANY
    vals_ref,   # VMEM scratch [2*CHUNK, D]: interleaved replacement pairs
    carry_ref,  # VMEM scratch [1, D]
    sem,        # DMA [1]
    *,
    chunk: int,
    d: int,
    rem: int = 0,
    n_chunks: int = 1,
):
    v = _segscan_v(heads_ref, grads_ref, carry_ref, chunk)
    lr = scal_ref[0]
    wd = scal_ref[1]
    eps = scal_ref[2]
    iav = scal_ref[3]
    old = old_ref[:, :d]
    # stored accumulator is the DELTA from initial_accumulator_value
    # (blob state rows init to zero before the optimizer exists)
    m_eff = old_ref[:, d:d + 1] + iav
    ends = ends_ref[...] > 0.0
    g = v + wd * old
    m_new = m_eff + jnp.mean(g * g, axis=1, keepdims=True)
    new = old - (lr * g) / (jnp.sqrt(jnp.abs(m_new)) + eps)
    lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, d), 1)
    state_row = jnp.where(
        lane == 0, jnp.broadcast_to(m_new - iav, (chunk, d)), 0.0
    )
    inter = jnp.where(
        ends, jnp.concatenate([new, state_row], axis=1), 0.0
    )
    # value-reshape interleaves: scratch rows (2i, 2i+1) = (new_i, state_i)
    vals_ref[...] = inter.reshape(2 * chunk, d)

    def issue(i):
        # ONE [2, D] DMA writes the (weights, state) pair at the
        # PHYSICAL pair-base row rows_ref[i] (caller maps logical large
        # rows r -> small + 2*(r - small) in its flat-small +
        # interleaved-large layout)
        pltpu.make_async_copy(
            vals_ref.at[pl.ds(2 * i, 2), :],
            table_out.at[pl.ds(rows_ref[i], 2), :],
            sem.at[0],
        ).start()

    _segscan_write(
        issue, [(vals_ref, sem.at[0])], chunk, rem, n_chunks,
        rows_per_issue=2,
    )


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "_chunk"),
    donate_argnums=(0,),
)
def row_scatter_write_segscan_rowwise_colocated(
    table: jnp.ndarray,
    rows_end: jnp.ndarray,
    heads: jnp.ndarray,
    ends: jnp.ndarray,
    grads: jnp.ndarray,
    old_rows: jnp.ndarray,
    scal: jnp.ndarray,
    *,
    interpret: bool = False,
    _chunk: int = 0,
) -> jnp.ndarray:
    """Fused EXACT_ROWWISE_ADAGRAD backward tail with the accumulator
    CO-LOCATED in interleaved (weight row, state row) pairs: each
    touched row lives at a PHYSICAL pair-base row (``pairs_end`` carries
    those directly; the EBC layout keeps the dense-path small region
    flat and interleaves only large rows at ``small + 2*(r - small)``),
    with the accumulator — stored as a delta from
    ``initial_accumulator_value`` — in lane 0 of the state row. The pair
    writes as ONE ``[2, D]`` DMA, so the updated accumulator rides the
    weight write and the [u]-scalar gather + scatter passes (XLA
    issue-rate bound, ~0.26 ms at the headline shapes) disappear —
    FBGEMM's momentum1 co-location, traded on TPU for 512 B/row of HBM
    since Mosaic's DMA slicing permits nothing narrower (only
    full-minor [n, 128] slices compile).

    Same run-END layout / ``ends`` mask / scratch-tail contract as
    :func:`row_scatter_write_segscan`, with ``rows_end`` in PHYSICAL
    pair-base rows (sentinels too); ``old_rows`` is ``[u, 2*D]`` (the
    forward's pair gather — CSE-shared; ``[:, :D]`` weights, ``[:, D]``
    accumulator delta); ``grads`` is ``[u, D]``; ``scal`` is ``[4]``
    (lr, weight_decay, eps, initial_accumulator_value).
    """
    num_rows2, d = table.shape
    if d != 128:
        raise ValueError(
            f"colocated table rows must be 128-lane, got {table.shape}"
        )
    if jnp.dtype(table.dtype).itemsize < 4:
        raise ValueError("colocated kernel is fp32-only")
    u = rows_end.shape[0]
    if u == 0:  # static empty window — see row_scatter_write's u==0 note
        return table
    chunk = _chunk or _CHUNK
    if chunk > _CHUNK:
        raise ValueError(f"_chunk={chunk} > _CHUNK={_CHUNK} with in_bounds")
    rows_end, heads, ends, grads, old_rows, rem = _pad_window(
        u, chunk, rows_end, heads, ends, grads, old_rows
    )
    n_chunks = max((u + chunk - 1) // chunk, 1)
    kernel = functools.partial(
        _row_scatter_write_segscan_rowwise_colo_kernel,
        chunk=chunk, d=d, rem=rem, n_chunks=n_chunks,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((4,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, 2 * d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * chunk, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        scal.astype(jnp.float32),
        rows_end.astype(jnp.int32),
        heads.astype(jnp.float32),
        ends.astype(jnp.float32),
        grads.astype(jnp.float32),
        old_rows.astype(jnp.float32),
        table,
    )


# --------------------------------------------------------------------------
# Pair-granular segscan kernels for bf16 tables.
#
# Mosaic's DMA slice granularity is 512 bytes (128 32-bit lanes): a single
# 256-byte bf16 row cannot be addressed in ANY layout (dim-0 slices of a
# bf16 ref need 8-row alignment; a 64-lane u32 view violates lane tiling).
# So bf16 sparse writes operate on ROW PAIRS: the table is viewed as
# u32[R/2, D] (pair p = rows 2p, 2p+1; u32 lane j of a half = bf16 lanes
# 2j | 2j+1 << 16, little-endian), runs are keyed by PAIR id (the id-sorted
# stream is pair-sorted for free), and the kernel computes BOTH rows of
# every touched pair — an untouched sibling has a zero gradient sum and a
# zero touched-count, so its half is rewritten with its exact current
# bits. Per-slot f32 work happens in HALF-LAYOUT (column j < D/2 = lane
# 2j, column D/2+j = lane 2j+1), which makes the final u32 pack a pure
# lane-contiguous shift-or.
# --------------------------------------------------------------------------


def _row_scatter_write_segscan_pair_kernel(
    scal_ref,   # SMEM [2] f32: (lr, weight_decay)
    seed_ref,   # SMEM [1] u32: stochastic-rounding step counter
    rows_ref,   # SMEM [CHUNK] pair-run-END targets (PAIR indices) — ALL
                # in-bounds and distinct
    heads_ref,  # VMEM [CHUNK, 1] f32: 1.0 at PAIR-run starts
    ends_ref,   # VMEM [CHUNK, 1] f32: 1.0 at pair-run ENDS (real pairs)
    par_ref,    # VMEM [CHUNK, 1] f32: 1.0 where the slot's row id is ODD
    grads_ref,  # VMEM [CHUNK, D] f32 per-slot gradients in HALF-LAYOUT
    old_ref,    # VMEM [CHUNK, D] u32 pair words at slot positions
    table_in,   # ANY u32 [R/2, D] pair view (aliased)
    table_out,  # ANY
    vals_ref,   # VMEM scratch [CHUNK, D] u32: computed pair words
    carry_e,    # VMEM scratch [1, D] f32
    carry_o,    # VMEM scratch [1, D] f32
    carry_c,    # VMEM scratch [1, 2] f32
    sem,        # DMA [1]
    *,
    chunk: int,
    rem: int = 0,
    n_chunks: int = 1,
    sr: bool = False,
):
    heads = heads_ref[...]
    par = par_ref[...]
    g = grads_ref[...]
    ve = _segscan_vals(heads, g * (1.0 - par), carry_e, chunk)
    vo = _segscan_vals(heads, g * par, carry_o, chunk)
    cnt = _segscan_vals(
        heads, jnp.concatenate([1.0 - par, par], axis=1), carry_c, chunk
    )
    lr = scal_ref[0]
    wd = scal_ref[1]
    d2 = g.shape[1] // 2
    old_e = _unpack_pair_half(old_ref[:, :d2])
    old_o = _unpack_pair_half(old_ref[:, d2:])
    # untouched halves (zero slots of that parity in the run) must keep
    # their EXACT bits: no decay, and both RN and SR rounding are exact on
    # already-representable values
    new_e = jnp.where(
        cnt[:, 0:1] > 0.0, old_e * (1.0 - lr * wd) - lr * ve, old_e
    )
    new_o = jnp.where(
        cnt[:, 1:2] > 0.0, old_o * (1.0 - lr * wd) - lr * vo, old_o
    )
    seed = seed_ref[0] if sr else None
    vals_ref[...] = jnp.where(
        ends_ref[...] > 0.0,
        jnp.concatenate(
            [
                _pack_pair_half(new_e, seed, 0, chunk),
                _pack_pair_half(new_o, seed, 1, chunk),
            ],
            axis=1,
        ),
        jnp.uint32(0),
    )

    def issue(i):
        _row_copy(
            vals_ref, i, table_out, rows_ref[i], sem.at[0],
            vals_ref.shape[1],
        )

    _segscan_write(issue, [(vals_ref, sem.at[0])], chunk, rem, n_chunks)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "_chunk"),
    donate_argnums=(0,),
)
def row_scatter_write_segscan_pair(
    table: jnp.ndarray,
    pairs_end: jnp.ndarray,
    heads: jnp.ndarray,
    ends: jnp.ndarray,
    parity: jnp.ndarray,
    grads: jnp.ndarray,
    old_pairs: jnp.ndarray,
    scal: jnp.ndarray,
    sr_seed: jnp.ndarray | None = None,
    *,
    interpret: bool = False,
    _chunk: int = 0,
) -> jnp.ndarray:
    """Fused SGD backward tail for bf16 tables, PAIR-granular (see the
    section comment above): for each run of equal PAIR ids, both rows of
    the pair are recomputed (touched rows get ``(1 - lr*wd) * old -
    lr * sum(grads)``, rounded to bf16 — stochastically when ``sr_seed``
    is given; untouched siblings keep their exact bits) and the 512-byte
    pair row is written in place.

    Args (u = slot-window length, D = row width, multiple of 128):
      table:     u32 [R/2, D] PAIR-PACKED storage of a bf16 [R, D] table
        (pair row p = bf16 rows 2p || 2p+1; u32 lane j of each half =
        that row's bf16 lanes 2j | 2j+1 << 16 — numpy
        ``blob.view(uint32).reshape(R//2, D)``). XLA-level bf16<->u32
        pair views are NOT free on TPU (re-tiling materializes the whole
        table), so packed storage IS the table format for bf16 groups.
      pairs_end: [u] int32 — the run's PAIR id (row >> 1) at its LAST
        slot; distinct in-bounds scratch-tail PAIR sentinels elsewhere
        (all < R // 2).
      heads/ends: [u, 1] f32 — pair-run starts / real-pair run ends.
      parity:    [u, 1] f32 — 1.0 where the slot's row id is odd.
      grads:     [u, D] f32 — per-slot gradients in HALF-LAYOUT (col
        j < D/2 = lane 2j, col D/2+j = lane 2j+1; zero rows for invalid
        slots).
      old_pairs: [u, D] u32 — pair words at slot positions (gather of
        the u32 pair view at ``min(pair_id, R//2 - 1)``).
      scal:      [2] f32 — (lr, weight_decay).
      sr_seed:   [1] u32 or None — stochastic-rounding step counter.
    """
    n_pairs, d = table.shape
    if d != 128:
        raise ValueError(
            f"row width {d}: Mosaic DMA slicing only supports 128-lane "
            "rows (see the slice-rule note) — wider dims use the XLA "
            "fallback or a restructured storage layout"
        )
    if table.dtype != jnp.uint32:
        raise ValueError("pair kernel takes u32 pair-packed storage")
    u = pairs_end.shape[0]
    if u == 0:  # static empty window — see row_scatter_write's u==0 note
        return table
    chunk = _chunk or _CHUNK
    if chunk > _CHUNK:
        raise ValueError(f"_chunk={chunk} > _CHUNK={_CHUNK} with in_bounds")
    pairs_end, heads, ends, parity, grads, old_pairs, rem = _pad_window(
        u, chunk, pairs_end, heads, ends, parity, grads, old_pairs
    )
    n_chunks = max((u + chunk - 1) // chunk, 1)
    kernel = functools.partial(
        _row_scatter_write_segscan_pair_kernel,
        chunk=chunk, rem=rem, n_chunks=n_chunks, sr=sr_seed is not None,
    )
    if sr_seed is None:
        sr_seed = jnp.zeros((1,), jnp.uint32)
    pairs = table
    out = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((2,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(pairs.shape, jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((chunk, d), jnp.uint32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, 2), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        input_output_aliases={8: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        scal.astype(jnp.float32),
        sr_seed.astype(jnp.uint32).reshape(1),
        pairs_end.astype(jnp.int32),
        heads.astype(jnp.float32),
        ends.astype(jnp.float32),
        parity.astype(jnp.float32),
        grads.astype(jnp.float32),
        old_pairs,
        pairs,
    )
    return out


def _row_scatter_write_segscan_pair_rowwise_kernel(
    scal_ref,   # SMEM [3] f32: (lr, weight_decay, eps)
    seed_ref,   # SMEM [1] u32
    rows_ref,   # SMEM [CHUNK] pair targets
    heads_ref,  # VMEM [CHUNK, 1] f32
    ends_ref,   # VMEM [CHUNK, 1] f32
    par_ref,    # VMEM [CHUNK, 1] f32
    grads_ref,  # VMEM [CHUNK, D] f32 HALF-LAYOUT
    old_ref,    # VMEM [CHUNK, D] u32 pair words
    mom_ref,    # VMEM [CHUNK, 2] f32: (even, odd) row accumulators at
                # pair-end positions (garbage elsewhere)
    table_in,   # ANY u32 pair view (aliased)
    table_out,  # ANY
    mvals_ref,  # VMEM OUTPUT [CHUNK, 2]: updated accumulators
    vals_ref,   # VMEM scratch [CHUNK, D] u32
    carry_e,    # VMEM scratch [1, D] f32
    carry_o,    # VMEM scratch [1, D] f32
    carry_c,    # VMEM scratch [1, 2] f32
    sem,        # DMA [1]
    *,
    chunk: int,
    rem: int = 0,
    n_chunks: int = 1,
    sr: bool = False,
):
    heads = heads_ref[...]
    par = par_ref[...]
    g = grads_ref[...]
    ve = _segscan_vals(heads, g * (1.0 - par), carry_e, chunk)
    vo = _segscan_vals(heads, g * par, carry_o, chunk)
    cnt = _segscan_vals(
        heads, jnp.concatenate([1.0 - par, par], axis=1), carry_c, chunk
    )
    lr = scal_ref[0]
    wd = scal_ref[1]
    eps = scal_ref[2]
    d2 = g.shape[1] // 2
    old_e = _unpack_pair_half(old_ref[:, :d2])
    old_o = _unpack_pair_half(old_ref[:, d2:])
    ends = ends_ref[...] > 0.0
    te = cnt[:, 0:1] > 0.0
    to = cnt[:, 1:2] > 0.0
    ge = ve + wd * old_e
    go = vo + wd * old_o
    m_e = mom_ref[:, 0:1]
    m_o = mom_ref[:, 1:2]
    m_new_e = jnp.where(te, m_e + jnp.mean(ge * ge, axis=1, keepdims=True),
                        m_e)
    m_new_o = jnp.where(to, m_o + jnp.mean(go * go, axis=1, keepdims=True),
                        m_o)
    mvals_ref[...] = jnp.where(
        ends, jnp.concatenate([m_new_e, m_new_o], axis=1), 0.0
    )
    new_e = jnp.where(
        te, old_e - (lr * ge) / (jnp.sqrt(jnp.abs(m_new_e)) + eps), old_e
    )
    new_o = jnp.where(
        to, old_o - (lr * go) / (jnp.sqrt(jnp.abs(m_new_o)) + eps), old_o
    )
    seed = seed_ref[0] if sr else None
    vals_ref[...] = jnp.where(
        ends,
        jnp.concatenate(
            [
                _pack_pair_half(new_e, seed, 0, chunk),
                _pack_pair_half(new_o, seed, 1, chunk),
            ],
            axis=1,
        ),
        jnp.uint32(0),
    )

    def issue(i):
        _row_copy(
            vals_ref, i, table_out, rows_ref[i], sem.at[0],
            vals_ref.shape[1],
        )

    _segscan_write(issue, [(vals_ref, sem.at[0])], chunk, rem, n_chunks)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "_chunk"),
    donate_argnums=(0,),
)
def row_scatter_write_segscan_pair_rowwise(
    table: jnp.ndarray,
    pairs_end: jnp.ndarray,
    heads: jnp.ndarray,
    ends: jnp.ndarray,
    parity: jnp.ndarray,
    grads: jnp.ndarray,
    old_pairs: jnp.ndarray,
    mom_pairs: jnp.ndarray,
    scal: jnp.ndarray,
    sr_seed: jnp.ndarray | None = None,
    *,
    interpret: bool = False,
    _chunk: int = 0,
) -> tuple:
    """Fused EXACT_ROWWISE_ADAGRAD backward tail for bf16 tables (the
    RowWiseAdagrad sibling of :func:`row_scatter_write_segscan_pair` —
    same pair-granular layout/contract). Extra args: ``mom_pairs``
    [u, 2] f32 — (even, odd) row accumulators gathered at the pair ids;
    ``scal`` [3] f32 — (lr, weight_decay, eps). Returns ``(new_table,
    m_new [u, 2])`` — the caller scatters m_new to the accumulator's pair
    view at real pair ends (untouched siblings return their unchanged
    value)."""
    n_pairs, d = table.shape
    if d != 128:
        raise ValueError(
            f"row width {d}: Mosaic DMA slicing only supports 128-lane "
            "rows (see the slice-rule note) — wider dims use the XLA "
            "fallback or a restructured storage layout"
        )
    if table.dtype != jnp.uint32:
        raise ValueError("pair kernel takes u32 pair-packed storage")
    u = pairs_end.shape[0]
    if u == 0:  # static empty window — see row_scatter_write's u==0 note
        return table, jnp.zeros((0, 2), jnp.float32)
    chunk = _chunk or _CHUNK
    if chunk > _CHUNK:
        raise ValueError(f"_chunk={chunk} > _CHUNK={_CHUNK} with in_bounds")
    (
        pairs_end, heads, ends, parity, grads, old_pairs, mom_pairs, rem
    ) = _pad_window(
        u, chunk, pairs_end, heads, ends, parity, grads, old_pairs,
        mom_pairs.astype(jnp.float32).reshape(u, 2),
    )
    n_chunks = max((u + chunk - 1) // chunk, 1)
    kernel = functools.partial(
        _row_scatter_write_segscan_pair_rowwise_kernel,
        chunk=chunk, rem=rem, n_chunks=n_chunks, sr=sr_seed is not None,
    )
    if sr_seed is None:
        sr_seed = jnp.zeros((1,), jnp.uint32)
    pairs = table
    out, m_new = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((3,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunk, 2), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (chunk, 2), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(pairs.shape, jnp.uint32),
            jax.ShapeDtypeStruct((n_chunks * chunk, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk, d), jnp.uint32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, 2), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        input_output_aliases={9: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        scal.astype(jnp.float32),
        sr_seed.astype(jnp.uint32).reshape(1),
        pairs_end.astype(jnp.int32),
        heads.astype(jnp.float32),
        ends.astype(jnp.float32),
        parity.astype(jnp.float32),
        grads.astype(jnp.float32),
        old_pairs,
        mom_pairs,
        pairs,
    )
    return out, m_new[:u]


# --------------------------------------------------------------------------
# Sorted count-matmul: build the small-table count matrix C[small_rows, KB]
# (C[r, c] = sum of w over slots with id r and column c) from an id-SORTED
# slot stream with ZERO scatters. XLA's scatter build is issue-rate bound
# (~7 ns per slot -> 0.77 ms at the DLRM headline shapes); here each
# 512-row block only compares the slots that sorting proved belong to it
# (block-diagonal one-hots generated in VMEM) and reduces them with one MXU
# matmul — compute-bound at ~bf16 speed instead of scatter-issue bound.
#
# Reference analog: the histogram/"counts" passes FBGEMM's TBE backward
# performs per table before its segmented reduction
# (torchrec/distributed/batched_embedding_kernel.py:3725 wraps them).
# --------------------------------------------------------------------------

# rows per grid block (C block = RB x KB f32) and slots per chunk: one
# (RB, CK) one-hot compare + (RB, CK) @ (CK, KB) matmul per chunk.
# Swept on v5e at the DLRM headline shapes (86k small slots, 19.4k rows,
# KB=64): (512, 2048) ~ 114 us; (256/1024 x 1024/4096) within 25%.
_CM_RB = 512
_CM_CK = 2048


def _sorted_count_body(
    c_lo_ref,  # SMEM [NB] int32: first slot-chunk of block j
    c_hi_ref,  # SMEM [NB] int32: one past last slot-chunk of block j
    ids_ref,  # VMEM [NC, CK] int32 sorted ids (pad sentinel >= NB*RB)
    col_ref,  # VMEM [NC, CK] int32 column of each slot
    w_ref,  # VMEM [NC, CK] f32 per-slot weight (or None)
    out_ref,  # VMEM [RB, KB] f32: C block j
    *,
    rb: int,
    ck: int,
    kb: int,
):
    j = pl.program_id(0)
    row0 = j * rb
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rb, ck), 0) + row0
    if w_ref is None:
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (ck, kb), 1)
    else:
        # weighted: two-limb bf16 split keeps ~fp32 weight precision at
        # MXU bf16 speed (w = hi + lo exactly captures the top ~16
        # mantissa bits). The limbs are PACKED side by side into one
        # [CK, 2*kb] operand so both ride ONE MXU pass — at kb <= 64 the
        # second limb fills lanes the kb-wide matmul left idle, making
        # weighted ~the same MXU cost as unweighted.
        col2 = jax.lax.broadcasted_iota(jnp.int32, (ck, 2 * kb), 1)
        col_iota = col2 % kb
        limb_hi = col2 < kb

    def chunk(c, acc):
        ids = ids_ref[c]  # [CK]
        cols = col_ref[c]
        # block-diagonal one-hot: slots of OTHER row blocks (or padding /
        # large-table / invalid slots) match no row and contribute zero
        oh = (row_iota == ids[None, :]).astype(jnp.bfloat16)
        if w_ref is None:
            a = (cols[:, None] == col_iota).astype(jnp.bfloat16)
            return acc + jax.lax.dot(
                oh, a, preferred_element_type=jnp.float32
            )
        # (minor-dim inserts must be 32-bit for Mosaic: limb math in f32,
        # one cast to bf16 at the end — bf16(hi32) == hi exactly and
        # bf16(w - hi32) is the exact lo limb)
        w32 = w_ref[c][:, None]  # f32 [CK, 1]
        w_hi32 = w32.astype(jnp.bfloat16).astype(jnp.float32)
        wsel = jnp.where(limb_hi, w_hi32, w32 - w_hi32)
        a = jnp.where(
            cols[:, None] == col_iota, wsel, 0.0
        ).astype(jnp.bfloat16)
        out = jax.lax.dot(oh, a, preferred_element_type=jnp.float32)
        return acc + out[:, :kb] + out[:, kb:]

    acc = jnp.zeros((rb, kb), jnp.float32)
    out_ref[...] = jax.lax.fori_loop(c_lo_ref[j], c_hi_ref[j], chunk, acc)


def _sorted_count_kernel_nw(c_lo, c_hi, ids, col, out, *, rb, ck, kb):
    _sorted_count_body(c_lo, c_hi, ids, col, None, out, rb=rb, ck=ck, kb=kb)


def _sorted_count_kernel_w(c_lo, c_hi, ids, col, w, out, *, rb, ck, kb):
    _sorted_count_body(c_lo, c_hi, ids, col, w, out, rb=rb, ck=ck, kb=kb)


@functools.partial(
    jax.jit, static_argnames=("small_rows", "kb", "interpret", "pad_rows")
)
def sorted_count_matrix(
    sorted_ids: jnp.ndarray,
    sorted_col: jnp.ndarray,
    small_rows: int,
    kb: int,
    sorted_w: jnp.ndarray | None = None,
    *,
    interpret: bool = False,
    pad_rows: bool = False,
) -> jnp.ndarray:
    """C[small_rows, kb] from an ascending-sorted slot stream.

    ``sorted_ids``: [N] int32, ascending; entries >= ``small_rows`` (large
    tables / padding sentinels, which sort to the back) are ignored.
    ``sorted_col``: [N] int32 target column per slot (junk allowed wherever
    ids >= small_rows). ``sorted_w``: optional [N] f32 per-slot weights
    (1.0 semantics when omitted). Weighted sums run as a two-limb bf16
    split (hi + lo matmuls), capturing the top ~24 mantissa bits of each
    weight — agreement with the fp32 scatter path is ~1e-7 relative, not
    bit-exact; counts (w=1) are exact.
    """
    n = sorted_ids.shape[0]
    if n == 0:  # zero-capacity stream (empty batch)
        rows = (
            max(-(-small_rows // _CM_RB), 1) * _CM_RB
            if pad_rows else small_rows
        )
        return jnp.zeros((rows, kb), jnp.float32)
    rb, ck = _CM_RB, _CM_CK
    nb = max(-(-small_rows // rb), 1)
    small_pad = nb * rb
    pad = (-n) % ck
    if pad:
        sorted_ids = jnp.concatenate(
            [sorted_ids, jnp.full((pad,), small_pad, sorted_ids.dtype)]
        )
        sorted_col = jnp.concatenate(
            [sorted_col, jnp.zeros((pad,), sorted_col.dtype)]
        )
        if sorted_w is not None:
            sorted_w = jnp.concatenate(
                [sorted_w, jnp.zeros((pad,), sorted_w.dtype)]
            )
    nc = sorted_ids.shape[0] // ck
    # ids >= small_pad can never match a row; clamp so the searchsorted
    # boundaries below stay within the sorted prefix
    ids2d = sorted_ids.reshape(nc, ck)
    col2d = sorted_col.reshape(nc, ck)
    # block j's slots live in [searchsorted(j*RB), searchsorted((j+1)*RB));
    # widen to whole chunks — neighbours' slots auto-mask in the compare
    bounds = jnp.searchsorted(
        sorted_ids, jnp.arange(nb + 1, dtype=sorted_ids.dtype) * rb
    ).astype(jnp.int32)
    c_lo = bounds[:-1] // ck
    c_hi = jnp.minimum(-(-bounds[1:] // ck), nc)
    c_lo = jnp.minimum(c_lo, c_hi)

    kernel = functools.partial(
        _sorted_count_kernel_w if sorted_w is not None
        else _sorted_count_kernel_nw,
        rb=rb, ck=ck, kb=kb,
    )
    operands = [ids2d, col2d]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if sorted_w is not None:
        operands.append(sorted_w.reshape(nc, ck).astype(jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, kb), lambda j, c_lo, c_hi: (j, 0)),
    )
    c = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((small_pad, kb), jnp.float32),
        interpret=interpret,
    )(c_lo, c_hi, *operands)
    # pad_rows=True keeps the block-padded [nb*RB, kb] layout the fused
    # small-path matmul kernels below consume directly
    return c if pad_rows else c[:small_rows]


# -- fused small-table pool / accumulate (block-diagonal matmuls) -----------
#
# The v3 small-table path multiplies the count matrix C [small, B] against
# the small region of the table blob (forward pooling: pooled_f = C_f^T @
# T_f per table f) and against the pooled-output cotangent (backward:
# acc_f = C_f @ G_f). Looping those per table costs ~6 XLA ops per small
# table per direction — ~150 tiny dispatches per step at the DLRM headline
# (21 small tables), each paying µs-level launch overhead for a matmul the
# MXU finishes in ~1 µs. These two kernels run the WHOLE direction in ONE
# launch over 512-row blocks of the small region: per block, a static list
# of (feature, row-range) entries (scalar-prefetched) masks C to one
# table's rows and feeds one [RB, B] x ... MXU contraction; table
# boundaries inside a block are resolved by the mask, so the blob layout
# needs no block alignment.


def _small_pool_kernel(
    feat_ref,  # SMEM [NB, S] int32: group-feature pos per block entry (-1 pad)
    lo_ref,  # SMEM [NB, S] int32: entry row range start, block-local
    hi_ref,  # SMEM [NB, S] int32: entry row range end, block-local
    c_ref,  # VMEM [RB, B] f32: count block j
    t_ref,  # VMEM [RB, W] table block j (storage dtype)
    out_ref,  # VMEM [n_gf, B, W] f32: pooled contributions (all blocks)
    *,
    rb: int,
    s_max: int,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
    t_blk = t_ref[...].astype(jnp.float32)
    for s in range(s_max):
        p = feat_ref[j, s]

        @pl.when(p >= 0)
        def _(s=s, p=p):
            mask = (rows >= lo_ref[j, s]) & (rows < hi_ref[j, s])
            cm = jnp.where(mask, c_ref[...], 0.0)
            contrib = jax.lax.dot_general(
                cm, t_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, W]
            out_ref[pl.ds(p, 1)] = out_ref[pl.ds(p, 1)] + contrib[None]


def _halves_from_pair_block(w_half):
    """u32 pair words [n, d2] -> f32 [n, 2*d2] HALF-LAYOUT rows (VPU bit
    math; the in-kernel sibling of _unpack_pair_half)."""
    lo = jax.lax.bitcast_convert_type(w_half << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        w_half & jnp.uint32(0xFFFF0000), jnp.float32
    )
    return jnp.concatenate([lo, hi], axis=1)


def _parity_split_counts(cm, rb: int):
    """Masked count block [RB, B] -> (cm_e, cm_o) [RB/2, B]: rows of even
    / odd logical parity, selected by one-hot MXU matmuls (in-kernel
    sublane-strided selects don't lower; the MXU does this in ~us)."""
    rb2 = rb // 2
    pair_i = jax.lax.broadcasted_iota(jnp.int32, (rb2, rb), 0)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rb2, rb), 1)
    sel_e = (row_i == 2 * pair_i).astype(jnp.bfloat16)
    sel_o = (row_i == 2 * pair_i + 1).astype(jnp.bfloat16)
    cmb = cm.astype(jnp.bfloat16)
    cm_e = jax.lax.dot_general(
        sel_e, cmb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cm_o = jax.lax.dot_general(
        sel_o, cmb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return cm_e, cm_o


def _small_pool_kernel_packed(
    feat_ref,  # SMEM [NB, S] int32
    lo_ref,  # SMEM [NB, S]
    hi_ref,  # SMEM [NB, S]
    c_ref,  # VMEM [RB, B] f32 count block j (logical rows)
    t_ref,  # VMEM [RB/2, W] u32 PAIR block j
    out_ref,  # VMEM [n_gf, B, W] f32 pooled (HALF lanes)
    *,
    rb: int,
    s_max: int,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    w_pair = t_ref[...]
    d2 = w_pair.shape[1] // 2
    e_half = _halves_from_pair_block(w_pair[:, :d2])  # [RB/2, W] even rows
    o_half = _halves_from_pair_block(w_pair[:, d2:])  # odd rows
    # parity-split ONCE per block; per-entry table masks apply in pair
    # space (row masks commute with the row-selecting one-hot matmul)
    cm_e_full, cm_o_full = _parity_split_counts(c_ref[...], rb)
    prow = jax.lax.broadcasted_iota(jnp.int32, (rb // 2, 1), 0)
    for s in range(s_max):
        p = feat_ref[j, s]

        @pl.when(p >= 0)
        def _(s=s, p=p):
            lo, hi = lo_ref[j, s], hi_ref[j, s]
            m_e = (2 * prow >= lo) & (2 * prow < hi)
            m_o = (2 * prow + 1 >= lo) & (2 * prow + 1 < hi)
            contrib = jax.lax.dot_general(
                jnp.where(m_e, cm_e_full, 0.0), e_half,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                jnp.where(m_o, cm_o_full, 0.0), o_half,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, W] half lanes
            out_ref[pl.ds(p, 1)] = out_ref[pl.ds(p, 1)] + contrib[None]


def small_pool_from_counts_packed(
    c_pad: jnp.ndarray,  # [NB*RB, B] f32 block-padded count matrix
    pair_blob: jnp.ndarray,  # u32 [pairs, W] pair-packed blob
    block_feat: jnp.ndarray,
    block_lo: jnp.ndarray,
    block_hi: jnp.ndarray,
    n_gf: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """ONE-launch forward small-table pooling for PAIR-PACKED bf16 blobs
    (the packed sibling of :func:`small_pool_from_counts`): the kernel
    unpacks pair words in VMEM (VPU bit math), parity-splits the count
    block with one-hot MXU matmuls, and writes logical-lane pooled
    contributions [n_gf * B, W] — no unpacked copy of the small region
    ever exists."""
    nb, s_max = block_feat.shape
    rb = c_pad.shape[0] // nb
    b = c_pad.shape[1]
    w = pair_blob.shape[1]
    rb2 = rb // 2
    if pair_blob.shape[0] < nb * rb2:
        pair_blob = jnp.pad(
            pair_blob, ((0, nb * rb2 - pair_blob.shape[0]), (0, 0))
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((rb, b), lambda j, *_: (j, 0)),
            pl.BlockSpec((rb2, w), lambda j, *_: (j, 0)),
        ],
        out_specs=pl.BlockSpec((n_gf, b, w), lambda j, *_: (0, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_small_pool_kernel_packed, rb=rb, s_max=s_max),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_gf, b, w), jnp.float32),
        interpret=interpret,
    )(block_feat, block_lo, block_hi, c_pad, pair_blob)
    # half -> logical lanes on the TINY pooled output
    return jnp.take(
        out.reshape(n_gf * b, w), jnp.asarray(_half_inv_perm(w)), axis=1
    )


def _small_acc_kernel_packed(
    feat_ref,  # SMEM [NB, S]
    lo_ref,
    hi_ref,
    c_ref,  # VMEM [RB, B] f32
    g_ref,  # VMEM [n_gf, B, W] f32 pooled grad in HALF lanes
    acc_e_ref,  # VMEM [RB/2, W] f32 (block j) — even-row accumulators
    acc_o_ref,  # VMEM [RB/2, W] f32 — odd rows
    *,
    rb: int,
    s_max: int,
):
    j = pl.program_id(0)
    acc_e_ref[...] = jnp.zeros_like(acc_e_ref)
    acc_o_ref[...] = jnp.zeros_like(acc_o_ref)
    cm_e_full, cm_o_full = _parity_split_counts(c_ref[...], rb)
    prow = jax.lax.broadcasted_iota(jnp.int32, (rb // 2, 1), 0)
    for s in range(s_max):
        p = feat_ref[j, s]

        @pl.when(p >= 0)
        def _(s=s, p=p):
            lo, hi = lo_ref[j, s], hi_ref[j, s]
            m_e = (2 * prow >= lo) & (2 * prow < hi)
            m_o = (2 * prow + 1 >= lo) & (2 * prow + 1 < hi)
            gp = g_ref[p]  # [B, W] half lanes
            acc_e_ref[...] += jax.lax.dot_general(
                jnp.where(m_e, cm_e_full, 0.0), gp,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_o_ref[...] += jax.lax.dot_general(
                jnp.where(m_o, cm_o_full, 0.0), gp,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _dense_pair_rowwise_kernel(
    scal_ref,  # SMEM [2] f32: (lr, eps)
    seed_ref,  # SMEM [1] u32: SR step counter
    blob_ref,  # VMEM [RB2, W] u32 pair block
    acc_e_ref,  # VMEM [RB2, W] f32 (half lanes)
    acc_o_ref,  # VMEM [RB2, W] f32
    mom_ref,  # VMEM [RB2, 2] f32: (even, odd) row accumulators
    out_ref,  # VMEM [RB2, W] u32
    m_new_ref,  # VMEM [RB2, 2] f32
    *,
    chunk: int,
    sr: bool,
):
    lr, eps = scal_ref[0], scal_ref[1]
    w_pair = blob_ref[...]
    d2 = w_pair.shape[1] // 2
    g_e = acc_e_ref[...]
    g_o = acc_o_ref[...]
    m_e = mom_ref[:, 0:1] + jnp.mean(g_e * g_e, axis=1, keepdims=True)
    m_o = mom_ref[:, 1:2] + jnp.mean(g_o * g_o, axis=1, keepdims=True)
    e = _unpack_pair_half(w_pair[:, :d2]) - lr * g_e / (
        jnp.sqrt(m_e) + eps
    )
    o = _unpack_pair_half(w_pair[:, d2:]) - lr * g_o / (
        jnp.sqrt(m_o) + eps
    )
    seed = seed_ref[0] if sr else None
    pe = _pack_pair_half(e, seed, 0, chunk)
    po = _pack_pair_half(o, seed, 1, chunk)
    out_ref[...] = jnp.concatenate([pe, po], axis=1)
    m_new_ref[...] = jnp.concatenate([m_e, m_o], axis=1)


def dense_pair_rowwise_update(
    blob_small: jnp.ndarray,  # u32 [P, W]
    acc_e: jnp.ndarray,  # [P_pad >= P, W] f32 (HALF lanes)
    acc_o: jnp.ndarray,
    mom_pairs: jnp.ndarray,  # [P_pad, 2] f32 (even, odd) accumulators
    lr,
    eps,
    sr_seed: jnp.ndarray | None = None,
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RowWiseAdagrad sibling of :func:`dense_pair_sgd_update` (same
    one-VMEM-pass contract; momentum rides a [P, 2] operand like the
    pair-rowwise segscan kernel). Zero-acc rows keep exact weight bits
    AND unchanged accumulators, so no touched mask; wd == 0 gate.
    Returns ``(new_blob [P, W], m_new [P_pad, 2])``."""
    p_rows, w = blob_small.shape
    rb2 = _CM_RB // 2
    nb = acc_e.shape[0] // rb2
    if p_rows < nb * rb2:
        blob_small = jnp.pad(
            blob_small, ((0, nb * rb2 - p_rows), (0, 0))
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((rb2, w), lambda j, *_: (j, 0)),
            pl.BlockSpec((rb2, w), lambda j, *_: (j, 0)),
            pl.BlockSpec((rb2, w), lambda j, *_: (j, 0)),
            pl.BlockSpec((rb2, 2), lambda j, *_: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rb2, w), lambda j, *_: (j, 0)),
            pl.BlockSpec((rb2, 2), lambda j, *_: (j, 0)),
        ],
    )
    out, m_new = pl.pallas_call(
        functools.partial(
            _dense_pair_rowwise_kernel, chunk=rb2, sr=sr_seed is not None
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb * rb2, w), jnp.uint32),
            jax.ShapeDtypeStruct((nb * rb2, 2), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.stack(
            [jnp.asarray(lr, jnp.float32), jnp.asarray(eps, jnp.float32)]
        ),
        (
            jnp.zeros((1,), jnp.uint32)
            if sr_seed is None else sr_seed.reshape(1)
        ),
        blob_small, acc_e, acc_o, mom_pairs.astype(jnp.float32),
    )
    return out[:p_rows], m_new


def small_acc_from_counts_packed(
    c_pad: jnp.ndarray,  # [NB*RB, B] f32
    pooled_grad: jnp.ndarray,  # [n_gf * B, W] f32 LOGICAL lanes
    block_feat: jnp.ndarray,
    block_lo: jnp.ndarray,
    block_hi: jnp.ndarray,
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ONE-launch backward accumulation for PAIR-PACKED groups: returns
    ``(acc_e, acc_o)`` — per-PAIR even/odd row accumulators
    ``[NB*RB/2, W]`` in HALF lanes, the exact layout
    _packed_small_dense_update_half consumes (the pooled grad is permuted
    to half lanes once, outside)."""
    nb, s_max = block_feat.shape
    rb = c_pad.shape[0] // nb
    b = c_pad.shape[1]
    w = pooled_grad.shape[1]
    n_gf = pooled_grad.shape[0] // b
    pg_h = jnp.take(pooled_grad, jnp.asarray(_half_fwd_perm(w)), axis=1)
    rb2 = rb // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((rb, b), lambda j, *_: (j, 0)),
            pl.BlockSpec((n_gf, b, w), lambda j, *_: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rb2, w), lambda j, *_: (j, 0)),
            pl.BlockSpec((rb2, w), lambda j, *_: (j, 0)),
        ],
    )
    acc_e, acc_o = pl.pallas_call(
        functools.partial(_small_acc_kernel_packed, rb=rb, s_max=s_max),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb * rb2, w), jnp.float32),
            jax.ShapeDtypeStruct((nb * rb2, w), jnp.float32),
        ],
        interpret=interpret,
    )(
        block_feat, block_lo, block_hi, c_pad,
        pg_h.reshape(n_gf, b, w).astype(jnp.float32),
    )
    return acc_e, acc_o


def _dense_pair_sgd_kernel(
    scal_ref,  # SMEM [1] f32: lr
    seed_ref,  # SMEM [1] u32: SR step counter
    blob_ref,  # VMEM [RB2, W] u32 pair block
    acc_e_ref,  # VMEM [RB2, W] f32 (half lanes)
    acc_o_ref,  # VMEM [RB2, W] f32
    out_ref,  # VMEM [RB2, W] u32
    *,
    chunk: int,
    sr: bool,
):
    lr = scal_ref[0]
    w_pair = blob_ref[...]
    d2 = w_pair.shape[1] // 2
    e = _unpack_pair_half(w_pair[:, :d2]) - lr * acc_e_ref[...]
    o = _unpack_pair_half(w_pair[:, d2:]) - lr * acc_o_ref[...]
    seed = seed_ref[0] if sr else None
    pe = _pack_pair_half(e, seed, 0, chunk)
    po = _pack_pair_half(o, seed, 1, chunk)
    out_ref[...] = jnp.concatenate([pe, po], axis=1)


def dense_pair_sgd_update(
    blob_small: jnp.ndarray,  # u32 [P, W] pair rows covering the region
    acc_e: jnp.ndarray,  # [P_pad >= P, W] f32 even-row acc (HALF lanes)
    acc_o: jnp.ndarray,
    lr,
    sr_seed: jnp.ndarray | None = None,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """ONE-pass SGD dense update of a pair-packed small region:
    ``new = round_bf16(old - lr * acc)`` for BOTH rows of every pair —
    unpack, update, round (RN-even or SR), repack, all inside VMEM
    blocks. Replaces the XLA unpack -> dense_update -> repack chain
    (~86 us/step of materialized f32 intermediates at the headline
    shapes). Rows whose acc is zero keep their exact bits (SR of a
    bf16-exact value is exact), so no touched mask is needed;
    weight-decay is NOT applied — callers gate on wd == 0."""
    p_rows, w = blob_small.shape
    nb = acc_e.shape[0] // ( _CM_RB // 2)
    rb2 = _CM_RB // 2
    if p_rows < nb * rb2:
        blob_small = jnp.pad(
            blob_small, ((0, nb * rb2 - p_rows), (0, 0))
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((rb2, w), lambda j, *_: (j, 0)),
            pl.BlockSpec((rb2, w), lambda j, *_: (j, 0)),
            pl.BlockSpec((rb2, w), lambda j, *_: (j, 0)),
        ],
        out_specs=pl.BlockSpec((rb2, w), lambda j, *_: (j, 0)),
    )
    out = pl.pallas_call(
        functools.partial(
            _dense_pair_sgd_kernel, chunk=rb2, sr=sr_seed is not None
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * rb2, w), jnp.uint32),
        interpret=interpret,
    )(
        jnp.asarray(lr, jnp.float32).reshape(1),
        (
            jnp.zeros((1,), jnp.uint32)
            if sr_seed is None else sr_seed.reshape(1)
        ),
        blob_small, acc_e, acc_o,
    )
    return out[:p_rows]


def _small_acc_kernel(
    feat_ref,  # SMEM [NB, S] int32
    lo_ref,  # SMEM [NB, S] int32
    hi_ref,  # SMEM [NB, S] int32
    c_ref,  # VMEM [RB, B] f32
    g_ref,  # VMEM [n_gf, B, W] f32: pooled-output cotangent
    out_ref,  # VMEM [RB, W] f32: gradient accumulator block j
    *,
    rb: int,
    s_max: int,
):
    j = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
    # each grid step owns a fresh output block: zero it, then accumulate
    out_ref[...] = jnp.zeros_like(out_ref)
    for s in range(s_max):
        p = feat_ref[j, s]

        @pl.when(p >= 0)
        def _(s=s, p=p):
            mask = (rows >= lo_ref[j, s]) & (rows < hi_ref[j, s])
            cm = jnp.where(mask, c_ref[...], 0.0)
            g_p = g_ref[pl.ds(p, 1)][0]  # [B, W]
            out_ref[...] += jax.lax.dot_general(
                cm, g_p, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


@functools.partial(
    jax.jit, static_argnames=("n_gf", "interpret")
)
def small_pool_from_counts(
    c_pad: jnp.ndarray,  # [NB*RB, B] f32 block-padded count matrix
    table: jnp.ndarray,  # [rows >= NB*RB, W] blob (storage dtype)
    block_feat: jnp.ndarray,  # [NB, S] int32 (-1 pad)
    block_lo: jnp.ndarray,  # [NB, S] int32 block-local
    block_hi: jnp.ndarray,  # [NB, S] int32 block-local
    n_gf: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """ONE-launch forward small-table pooling: [n_gf * B, W] contributions
    (zero rows for features whose table is not small)."""
    nb, s_max = block_feat.shape
    rb = c_pad.shape[0] // nb
    b = c_pad.shape[1]
    w = table.shape[1]
    if table.shape[0] < nb * rb:
        table = jnp.pad(table, ((0, nb * rb - table.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((rb, b), lambda j, *_: (j, 0)),
            pl.BlockSpec((rb, w), lambda j, *_: (j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (n_gf, b, w), lambda j, *_: (0, 0, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_small_pool_kernel, rb=rb, s_max=s_max),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_gf, b, w), jnp.float32),
        interpret=interpret,
    )(block_feat, block_lo, block_hi, c_pad, table)
    return out.reshape(n_gf * b, w)


@functools.partial(jax.jit, static_argnames=("interpret",))
def small_acc_from_counts(
    c_pad: jnp.ndarray,  # [NB*RB, B] f32
    pooled_grad: jnp.ndarray,  # [n_gf * B, W] f32
    block_feat: jnp.ndarray,  # [NB, S] int32
    block_lo: jnp.ndarray,
    block_hi: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """ONE-launch backward small-table gradient accumulation:
    [NB*RB, W] (block-padded; slice to small_rows)."""
    nb, s_max = block_feat.shape
    rb = c_pad.shape[0] // nb
    b = c_pad.shape[1]
    w = pooled_grad.shape[1]
    n_gf = pooled_grad.shape[0] // b
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((rb, b), lambda j, *_: (j, 0)),
            pl.BlockSpec((n_gf, b, w), lambda j, *_: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, w), lambda j, *_: (j, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_small_acc_kernel, rb=rb, s_max=s_max),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * rb, w), jnp.float32),
        interpret=interpret,
    )(block_feat, block_lo, block_hi, c_pad,
      pooled_grad.reshape(n_gf, b, w).astype(jnp.float32))
    return out
