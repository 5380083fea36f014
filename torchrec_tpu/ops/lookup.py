"""Table-batched embedding lookup + pooling (the FBGEMM-TBE role).

Reference contract: torchrec/distributed/batched_embedding_kernel.py:3725
(BatchedFusedEmbeddingBag over SplitTableBatchedEmbeddingBagsCodegen) — a
group of same-dim tables stacked into one buffer, looked up by a single
table-batched kernel with pooled (sum/mean) output.

TPU-first design:
  * Inputs are flat, static-shape arrays: ``ids [N]`` (already offset into
    the stacked-table row space), ``segment_ids [N]`` (destination pooled
    segment, out-of-range for padding), optional ``weights [N]``.
  * Forward = one XLA gather + one segment-sum (fused by XLA into a
    scatter-add over gathered rows). A Pallas double-buffered DMA kernel
    (ops/tbe_pallas.py) is a drop-in for the gather+pool when profitable.
  * No dense table gradient EVER exists: the backward is an explicit
    sparse update (:func:`grad_rows` + optimizer in ops/fused_optim.py),
    mirroring TBE's fused-optimizer-in-backward.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "pooled_lookup",
    "sequence_lookup",
    "grad_rows",
    "dedup_rows",
    "dedup_rows_from_pooled",
    "sorted_window",
    "dedup_rows_from_sorted",
    "accumulate_dense",
]


def pooled_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    weights: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Sum-pool embedding rows into segments.

    out[s, :] = sum_{i : segment_ids[i] == s} weights[i] * table[ids[i], :]

    Padding slots carry ``segment_ids >= num_segments`` and are dropped by
    the scatter. MEAN pooling is a post-divide by lengths at the module
    layer (matching the reference's mean-pooling divisor callback,
    embeddingbag.py:1845).
    """
    rows = jnp.take(table, ids, axis=0, mode="clip")  # clip: pad ids may be 0 anyway
    if weights is not None:
        rows = rows * weights[:, None].astype(rows.dtype)
    return jax.ops.segment_sum(
        rows,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def sequence_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Unpooled per-id embeddings [N, D] (EmbeddingCollection path).

    Padding slots (``valid == False``) produce zero rows so downstream
    length-agnostic reductions stay correct.
    """
    rows = jnp.take(table, ids, axis=0, mode="clip")
    if valid is not None:
        rows = jnp.where(valid[:, None], rows, jnp.zeros_like(rows))
    return rows


def grad_rows(
    pooled_grad: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-value-slot gradient rows: the transpose of :func:`pooled_lookup`.

    g[i, :] = weights[i] * pooled_grad[segment_ids[i], :]; zero for padding.
    """
    seg = jnp.minimum(segment_ids, num_segments)  # pad -> sentinel row
    padded = jnp.concatenate(
        [pooled_grad, jnp.zeros((1, pooled_grad.shape[1]), pooled_grad.dtype)]
    )
    g = jnp.take(padded, seg, axis=0)
    if weights is not None:
        g = g * weights[:, None].astype(g.dtype)
    return g


def dedup_rows(
    ids: jnp.ndarray,
    grads: jnp.ndarray,
    valid: jnp.ndarray,
    num_rows: int,
    unique_bound: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Combine duplicate-row gradients: argsort ids, segment-sum runs.

    Returns ``(unique_ids [U], unique_grads [U, D])``, U = unique_bound or N.
    ``unique_ids`` is **sorted ascending and all-distinct**: real rows come
    first, then *distinct* out-of-range sentinels ``num_rows + k`` (dropped
    by ``mode='drop'`` scatters) — distinctness lets downstream scatters
    legally claim ``unique_indices=True, indices_are_sorted=True``, the XLA
    fast path that makes big-table updates ~2x faster on TPU.

    Only the int keys are permuted; gradient rows are combined with ONE
    unsorted segment-sum through the inverse permutation (no [N, D] row
    shuffle — that shuffle was ~15% of a training step).

    This is what makes the row-wise optimizer EXACT (one state update per
    touched row, however many times it appeared in the batch — the
    reference's EXACT_ROWWISE_ADAGRAD semantics).
    """
    n = ids.shape[0]
    key = jnp.where(valid, ids, num_rows)  # padding sorts to the end
    order = jnp.argsort(key)
    sorted_ids = jnp.take(key, order)
    # run boundaries -> dense segment numbering
    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)]
    )
    seg_sorted = jnp.cumsum(is_new) - 1  # [N], 0..n_unique-1
    u = n if unique_bound is None or unique_bound >= n else unique_bound
    # dedup segment of each ORIGINAL slot (inverse permutation)
    seg_of_slot = jnp.zeros((n,), jnp.int32).at[order].set(
        seg_sorted, unique_indices=True
    )
    # bounded target: segments >= u (only possible if the caller's bound was
    # dishonest) are dropped, consistent with the documented hint contract
    uniq_grads = jax.ops.segment_sum(grads, seg_of_slot, num_segments=u)
    # representative id per segment; distinct sorted sentinels elsewhere
    sentinels = num_rows + jnp.arange(u, dtype=sorted_ids.dtype)
    uniq_ids = sentinels.at[jnp.minimum(seg_sorted, u - 1)].min(
        jnp.where(seg_sorted < u, sorted_ids, jnp.int32(2**31 - 1)),
        indices_are_sorted=True,
    )
    return uniq_ids, uniq_grads


def compact_stream(
    valid: jnp.ndarray,
    bound: int,
    ids: jnp.ndarray,
    sentinel_id: int,
    *arrays: jnp.ndarray,
) -> Tuple[jnp.ndarray, ...]:
    """Compact the valid slots of a padded stream into a ``[bound]`` prefix
    via cumsum-rank scatter, preserving relative order (use when order
    matters; when it doesn't, argsort-and-slice is faster on TPU — XLA's
    sort is ~40 us at 106k int32 while this compaction is ~0.5 ms). The
    tail pads with ``sentinel_id`` (ids) / zeros (arrays); slots beyond
    ``bound`` valid entries are dropped."""
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    tgt = jnp.where(valid & (rank < bound), rank, bound)
    ids_c = jnp.full((bound,), sentinel_id, ids.dtype).at[tgt].set(
        ids, mode="drop"
    )
    outs = [ids_c]
    for a in arrays:
        pad = jnp.zeros((bound,) + a.shape[1:], a.dtype)
        outs.append(pad.at[tgt].set(a, mode="drop"))
    return tuple(outs)


def sorted_window(
    ids: jnp.ndarray,
    seg: jnp.ndarray,
    valid: jnp.ndarray,
    num_rows: int,
    num_segments: int,
    unique_bound: Optional[int] = None,
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Sort the slot stream by id (invalid -> num_rows sentinel, sorts to
    the back) and slice the leading ``unique_bound`` window. Packs (id,
    seg) into ONE u32 sort operand when they fit (~25 us/step cheaper than
    a second payload at headline shapes). Shared by the forward compact
    gather and the backward dedup so XLA CSEs the sort across the step.
    Returns (sorted_ids, sorted_seg, sorted_weights)."""
    n = ids.shape[0]
    u = n if unique_bound is None or unique_bound >= n else unique_bound
    key = jnp.where(valid, ids, num_rows)
    seg_m = jnp.where(valid, jnp.minimum(seg, num_segments), num_segments)
    seg_bits = max((num_segments + 1).bit_length(), 1)
    if (num_rows + 1) < (1 << (32 - seg_bits)):
        packed = (
            key.astype(jnp.uint32) << seg_bits
        ) | seg_m.astype(jnp.uint32)
        # is_stable=False everywhere: stable sorts lower with an extra
        # iota tie-breaker payload; all consumers are order-invariant
        # within equal keys (payloads stay paired with their key)
        if weights is None:
            (sp,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
            w_sorted = None
        else:
            sp, sw = jax.lax.sort(
                (packed, weights), num_keys=1, is_stable=False
            )
            w_sorted = sw[:u]
        sp = sp[:u]
        return (
            (sp >> seg_bits).astype(jnp.int32),
            (sp & jnp.uint32((1 << seg_bits) - 1)).astype(jnp.int32),
            w_sorted,
        )
    if weights is None:
        sk, ss = jax.lax.sort((key, seg_m), num_keys=1, is_stable=False)
        return sk[:u], ss[:u], None
    sk, ss, sw = jax.lax.sort(
        (key, seg_m, weights), num_keys=1, is_stable=False
    )
    return sk[:u], ss[:u], sw[:u]


def dedup_rows_from_pooled(
    ids: jnp.ndarray,
    seg: jnp.ndarray,
    pooled_grad: jnp.ndarray,  # [num_segments, D] upstream cotangent
    valid: jnp.ndarray,
    num_rows: int,
    unique_bound: Optional[int] = None,
    weights: Optional[jnp.ndarray] = None,
    compact: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused grad-expansion + dedup, never materializing slot-order rows.

    Semantically ``dedup_rows(ids, grad_rows(pooled_grad, seg, S, weights),
    valid, num_rows)`` but restructured for TPU memory behavior: the naive
    form expands ``[N, D]`` gradient rows in slot order and then combines
    them through the inverse sort permutation — an *unsorted* scatter-add,
    which XLA lowers to a serialized update stream (~3x slower than the
    sorted form on v5e). Here only int32 keys are permuted; gradient rows
    are gathered **in sorted order directly from the small pooled-grad
    buffer** (``pooled_grad[seg[order]]``), so the single segment-sum runs
    with ``indices_are_sorted=True`` — the fast path.

    ``compact=True`` (default): same contract as :func:`dedup_rows` —
    sorted all-distinct ``unique_ids`` with out-of-range sentinels.
    ``compact=False``: skip the rank-compaction scatter-min entirely
    (~180 us at the headline shapes) and return the POSITION layout of
    :func:`dedup_rows_from_sorted` — all-distinct but NOT ascending; pass
    ``ids_sorted=False`` to the optimizer update.
    """
    n = ids.shape[0]
    s = pooled_grad.shape[0]
    if n == 0:  # zero-capacity stream (empty batch)
        return (
            jnp.zeros((0,), ids.dtype),
            jnp.zeros((0, pooled_grad.shape[1]), pooled_grad.dtype),
        )
    u = n if unique_bound is None or unique_bound >= n else unique_bound
    # SORT then slice: valid slots sort to the front (invalid -> num_rows
    # sentinel), so everything past the slot bound is padding and all
    # row-width work below runs on [u] instead of [N]; the shared helper
    # keeps the expression identical to the forward's sort for CSE
    sorted_ids, sorted_seg, w_sorted = sorted_window(
        ids, seg, valid, num_rows, s, unique_bound, weights
    )
    if not compact:
        return dedup_rows_from_sorted(
            sorted_ids, sorted_seg, pooled_grad, num_rows,
            w_sorted=w_sorted,
        )
    padded = jnp.concatenate(
        [pooled_grad, jnp.zeros((1, pooled_grad.shape[1]), pooled_grad.dtype)]
    )
    # padding slots must contribute zero
    sorted_seg = jnp.where(sorted_ids < num_rows, sorted_seg, s)
    g_sorted = jnp.take(padded, sorted_seg, axis=0)  # gather from SMALL src
    if w_sorted is not None:
        g_sorted = g_sorted * w_sorted[:, None].astype(g_sorted.dtype)
    # run boundaries -> dense segment numbering (sorted, non-decreasing)
    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)]
    )
    run_id = jnp.cumsum(is_new) - 1  # [u], 0..n_unique-1, non-decreasing
    uniq_grads = jax.ops.segment_sum(
        g_sorted, run_id, num_segments=u, indices_are_sorted=True
    )
    sentinels = num_rows + jnp.arange(u, dtype=sorted_ids.dtype)
    uniq_ids = sentinels.at[jnp.minimum(run_id, u - 1)].min(
        jnp.where(run_id < u, sorted_ids, jnp.int32(2**31 - 1)),
        indices_are_sorted=True,
    )
    return uniq_ids, uniq_grads


def dedup_rows_from_sorted(
    sorted_ids: jnp.ndarray,
    sorted_seg: jnp.ndarray,
    pooled_grad: jnp.ndarray,
    num_rows: int,
    lo_row: int = 0,
    w_sorted: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The post-sort tail of :func:`dedup_rows_from_pooled` for callers
    that already hold an id-ascending window of the slot stream (the
    shared-sort count-matmul path: ONE group-wide sort feeds the small-table
    count kernel, the compact forward, and this backward). Slots with ids
    outside ``[lo_row, num_rows)`` (small-table slots at the window head,
    padding sentinels at the tail) contribute nothing; their positions still
    occupy unique-slot capacity, matching the ``max_unique_gradient_rows``
    contract.

    Unlike :func:`dedup_rows_from_pooled`, the result is in POSITION layout:
    all-distinct but NOT ascending (each run's id sits at its first slot
    position, every other position holds a distinct OOB sentinel). Pass
    ``ids_sorted=False`` to the optimizer update.
    """
    u = sorted_ids.shape[0]
    s = pooled_grad.shape[0]
    if u == 0:  # zero-capacity stream (empty batch)
        return (
            jnp.zeros((0,), sorted_ids.dtype),
            jnp.zeros((0, pooled_grad.shape[1]), pooled_grad.dtype),
        )
    in_range = (sorted_ids >= lo_row) & (sorted_ids < num_rows)
    ids_m = jnp.where(in_range, sorted_ids, num_rows)
    seg_m = jnp.where(in_range, jnp.minimum(sorted_seg, s), s)
    padded = jnp.concatenate(
        [pooled_grad, jnp.zeros((1, pooled_grad.shape[1]), pooled_grad.dtype)]
    )
    g_sorted = jnp.take(padded, seg_m, axis=0)
    if w_sorted is not None:
        g_sorted = g_sorted * w_sorted[:, None].astype(g_sorted.dtype)
    # POSITION layout, zero extra scatters: each run's gradient sum lands at
    # its FIRST slot position (segment target = cummax of run starts); every
    # other slot carries a distinct OOB sentinel and a zero-garbage grad the
    # consumer drops. Rank-compacting instead costs a ~150-180 us scatter
    # (scalar scatter-min or limb segment-sum — both issue-rate bound) for
    # no benefit: the update path skips OOB rows either way. The ids are NOT
    # ascending (real ids interleave with sentinels), so consumers must pass
    # ids_sorted=False to the optimizer.
    pos = jnp.arange(u, dtype=jnp.int32)
    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), ids_m[1:] != ids_m[:-1]]
    )
    start_pos = jax.lax.cummax(jnp.where(is_new, pos, 0))
    uniq_grads = jax.ops.segment_sum(
        g_sorted, start_pos, num_segments=u, indices_are_sorted=True
    )
    uniq_ids = jnp.where(
        is_new & (ids_m < num_rows), ids_m, num_rows + pos
    )
    return uniq_ids, uniq_grads


def accumulate_dense(
    ids: jnp.ndarray,
    grads: jnp.ndarray,
    valid: jnp.ndarray,
    num_rows: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort-free gradient combine for SMALL tables: scatter-add straight
    into a dense ``[num_rows, D]`` accumulator (cheap when num_rows is a few
    tens of thousands — scatters into small targets run ~5x faster than into
    multi-million-row tables on TPU) plus a touched-row mask.

    Feeds :meth:`EmbeddingOptimizer.dense_update` — no sort, no dedup, no
    big-table scatter, still EXACT per-row semantics.
    """
    tgt = jnp.where(valid, ids, num_rows)
    acc = jax.ops.segment_sum(grads, tgt, num_segments=num_rows)
    counts = jax.ops.segment_sum(
        valid.astype(jnp.int32), tgt, num_segments=num_rows
    )
    return acc, counts > 0


def roll_rows(x: jnp.ndarray, shift) -> jnp.ndarray:
    """Cyclic roll of the leading axis by a (possibly traced) ``shift`` —
    ``jnp.roll`` with a dynamic shift, lowered as one gather. Shared by the
    MC/ITEP/quant remap paths (cursor-relative circular buffers)."""
    n = x.shape[0]
    idx = (jnp.arange(n, dtype=jnp.int32) + jnp.asarray(shift, jnp.int32)) % n
    return jnp.take(x, idx, axis=0)
