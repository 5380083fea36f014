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
]


def pooled_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    weights: Optional[jnp.ndarray] = None,
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
    return jax.ops.segment_sum(rows, segment_ids, num_segments=num_segments)


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
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Combine duplicate-row gradients: sort by id, segment-sum runs.

    Returns ``(unique_ids [N], unique_grads [N, D])`` where only the first
    ``n_unique`` slots are real; the rest carry the sentinel id
    ``num_rows`` (dropped by ``.at[].add(mode='drop')``).

    This is what makes the row-wise optimizer EXACT (one state update per
    touched row, however many times it appeared in the batch — the
    reference's EXACT_ROWWISE_ADAGRAD semantics), and it is also the shape
    the Pallas scatter-update kernel wants (race-free unique rows).
    """
    n = ids.shape[0]
    key = jnp.where(valid, ids, num_rows)  # padding sorts to the end
    order = jnp.argsort(key)
    sorted_ids = jnp.take(key, order)
    sorted_grads = jnp.take(grads, order, axis=0)
    # run boundaries -> dense segment numbering
    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(is_new) - 1  # [N], 0..n_unique-1
    uniq_grads = jax.ops.segment_sum(sorted_grads, seg, num_segments=n)
    # representative id per segment (first occurrence)
    uniq_ids = jnp.full((n,), num_rows, dtype=sorted_ids.dtype)
    uniq_ids = uniq_ids.at[seg].min(sorted_ids, mode="drop")
    # re-mark padding runs (they sorted last and carry sentinel already)
    return uniq_ids, uniq_grads
