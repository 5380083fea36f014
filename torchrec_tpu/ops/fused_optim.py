"""Fused sparse-embedding optimizers: update only the touched rows.

Reference: FBGEMM's fused-in-backward optimizers wrapped by
torchrec/distributed/batched_embedding_kernel.py (OptimType enum at
torchrec/distributed/embedding_types.py:67 — EXACT_SGD,
EXACT_ROWWISE_ADAGRAD, ADAM, PARTIAL_ROWWISE_ADAM, LAMB,
PARTIAL_ROWWISE_LAMB) and the eager reference torchrec/optim/
rowwise_adagrad.py:22.

TPU-first design: a pure function ``(table, state, unique_ids,
unique_grads) -> (table, state)`` built from XLA one-hot-free scatters with
``mode='drop'`` sentinels. Under ``jit`` with donated buffers the update is
in-place in HBM — no dense gradient, no optimizer-step materialization,
which is exactly the property that makes FBGEMM's fused path 13-23x faster
than eager nn.EmbeddingBag (reference benchmarks/README.md:44).

``unique_ids/unique_grads`` come from :func:`torchrec_tpu.ops.lookup.dedup_rows`
(duplicates pre-combined), so every optimizer here is EXACT: one state
update per touched row per step. ``unique_ids`` MUST be sorted ascending and
all-distinct (dedup_rows guarantees this, with distinct out-of-range
sentinels for padding) — updates claim the XLA
``unique_indices/indices_are_sorted`` scatter fast path.

``dense_update`` is the sort-free path for SMALL tables: a full
``[rows, dim]`` gradient accumulator + touched mask
(:func:`torchrec_tpu.ops.lookup.accumulate_dense`) updates every touched row
without any big-table scatter.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "EmbeddingOptimizer",
    "RowWiseAdagrad",
    "Adagrad",
    "SGD",
    "LarsSGD",
    "Adam",
    "PartialRowWiseAdam",
    "LAMB",
    "PartialRowWiseLAMB",
    "make_optimizer",
    "stochastic_round_bf16",
]

Params = Dict[str, jnp.ndarray]


def stochastic_round_bf16(x: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """fp32 -> bf16 with stochastic rounding (FBGEMM's fused-optimizer
    behavior for low-precision tables: add random low bits, truncate).
    ``bits``: uint32 random bits of the same shape. E[result] == x, which
    keeps tiny gradient steps from being swallowed by round-to-nearest."""
    x = x.astype(jnp.float32)
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    y = (xi + (bits & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    out = jax.lax.bitcast_convert_type(y, jnp.float32).astype(jnp.bfloat16)
    return jnp.where(jnp.isfinite(x), out, x.astype(jnp.bfloat16))


def _scatter_add_rows(
    table: jnp.ndarray, unique_ids: jnp.ndarray, deltas: jnp.ndarray,
    ids_sorted: bool = True, sr_bits: jnp.ndarray | None = None,
    ids_in_bounds: bool = False, old_rows: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """table[unique_ids] += deltas for sorted all-distinct ids (OOB
    sentinels dropped). On TPU with lane-aligned rows this dispatches to the
    Pallas row-RMW kernel (ops/tbe_pallas.py) whose cost is O(touched rows);
    XLA's scatter lowering streams the WHOLE table (cost O(table), measured
    2.3x slower at 20k rows into 1.4M x 128 on v5e).

    ``old_rows`` (optional): caller-provided ``table[unique_ids]`` values.
    Positions whose id is an OOB sentinel may hold ARBITRARY values (the
    write is dropped / lands in the scratch tail); real-id positions must
    hold the row's exact current value (an fp32 upcast of a low-precision
    row is fine — the round-trip back to storage dtype is exact). Passing
    the forward pass's already-gathered rows here lets XLA CSE away the
    update's own gather (~0.09 ms at the 20.5k-row headline shapes)."""
    from torchrec_tpu.ops.tbe_pallas import (
        row_scatter_write,
        supports_row_scatter_add,
    )

    if supports_row_scatter_add(table) or sr_bits is not None:
        # XLA's row gather is issue-cheap (~13 ns/row); reading the old
        # rows in XLA and handing the kernel a WRITE-ONLY pass halves the
        # kernel's DMA issue cost vs the read-modify-write form
        # (0.55 vs 1.00 ms at 20.5k rows into 1.4M x 128 on v5e).
        # Stochastic rounding needs the gather+write form too: the sum is
        # computed fp32 and randomly rounded ONCE at the store.
        if old_rows is not None:
            old_rows = old_rows.astype(table.dtype)
        else:
            old_rows = jnp.take(
                table, unique_ids, axis=0, mode="fill", fill_value=0.0,
                indices_are_sorted=ids_sorted,
            )
        if sr_bits is not None:
            new_rows = stochastic_round_bf16(
                old_rows.astype(jnp.float32) + deltas.astype(jnp.float32),
                sr_bits,
            ).astype(table.dtype)
        else:
            new_rows = old_rows + deltas.astype(table.dtype)
        if supports_row_scatter_add(table):
            return row_scatter_write(
                table, unique_ids, new_rows, in_bounds=ids_in_bounds
            )
        return table.at[unique_ids].set(
            new_rows, mode="drop", unique_indices=True,
            indices_are_sorted=ids_sorted,
        )
    return table.at[unique_ids].add(
        deltas.astype(table.dtype),
        mode="drop",
        unique_indices=True,
        indices_are_sorted=ids_sorted,
    )


@dataclasses.dataclass(frozen=True)
class EmbeddingOptimizer:
    """Base: stateless config; state lives in an explicit pytree.

    ``stochastic_rounding`` (bf16 tables only; SGD / RowWiseAdagrad):
    updates are computed fp32 and stochastically rounded at the store —
    FBGEMM's fused-optimizer behavior for low-precision tables, which
    keeps sub-ULP gradient steps from vanishing. The random stream is a
    counter-derived PRNG carried in the optimizer state (``sr_step``), so
    the update stays a pure function.
    """

    learning_rate: float = 0.01
    stochastic_rounding: bool = False

    def _sr_state(self, table: jnp.ndarray) -> Params:
        if not self.stochastic_rounding:
            return {}
        if table.dtype != jnp.bfloat16:
            raise ValueError(
                "stochastic_rounding requires bf16 tables, got "
                f"{table.dtype}"
            )
        return {"sr_step": jnp.zeros((), jnp.uint32)}

    def _sr_bits(self, state: Params, shape) -> tuple:
        """-> (bits or None, state-with-advanced-counter)."""
        if not self.stochastic_rounding:
            return None, state
        step = state["sr_step"]
        key = jax.random.fold_in(jax.random.key(0x5317AB), step)
        bits = jax.random.bits(key, shape, jnp.uint32)
        return bits, {**state, "sr_step": step + 1}

    def init(self, table: jnp.ndarray) -> Params:
        raise NotImplementedError

    def update(
        self,
        table: jnp.ndarray,
        state: Params,
        unique_ids: jnp.ndarray,
        unique_grads: jnp.ndarray,
        lr: jnp.ndarray | float | None = None,
        ids_sorted: bool = True,
        ids_in_bounds: bool = False,
        old_rows: jnp.ndarray | None = None,
    ) -> Tuple[jnp.ndarray, Params]:
        # ``old_rows``: optional caller-precomputed ``table[unique_ids]``
        # (see _scatter_add_rows). Values at OOB-sentinel positions are
        # arbitrary; the forward's already-gathered rows qualify, letting
        # XLA CSE away the update's own row gather.
        raise NotImplementedError

    def _lr(self, lr):
        return self.learning_rate if lr is None else lr

    # see RowWiseAdagrad: EBC colocate_rowwise_state rides the table's
    # state-lane block; optimizers without a colocated kernel reject it
    supports_colocated_state = False

    def supports_segscan_update(self, table: jnp.ndarray) -> bool:
        """True when :meth:`segscan_update` implements this optimizer for
        ``table`` (fused run-sum + update + write, ops/tbe_pallas.py::
        row_scatter_write_segscan). Default: unsupported."""
        return False

    def segscan_update(
        self, table, state, rows_end, heads, ends, grads, old_rows,
        lr=None, interpret=False, parity=None, sorted_ids=None,
        _chunk: int = 0,
    ):
        """Fused sorted-stream update (see tbe_pallas.row_scatter_write_
        segscan for the argument contract; ``ends`` marks real-row run-end
        positions). bf16 tables use PAIR mode: ``parity`` is given,
        ``rows_end`` carries pair ids, ``grads`` are half-layout and
        ``old_rows`` are u32 pair words (tbe_pallas.row_scatter_write_
        segscan_pair). Only valid when :meth:`supports_segscan_update`
        returns True. ``_chunk``: interpret-mode test knob forwarded to
        the kernels (shrinks the unrolled DMA chunk)."""
        raise NotImplementedError

    def dense_update(
        self,
        table: jnp.ndarray,
        state: Params,
        grad: jnp.ndarray,  # [rows, dim] accumulated gradient (fp32)
        touched: jnp.ndarray,  # [rows] bool: row appeared this step
        lr: jnp.ndarray | float | None = None,
    ) -> Tuple[jnp.ndarray, Params]:
        """Sort-free whole-table update for small tables: identical math to
        :meth:`update` on the touched rows, no scatter/gather at all."""
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class SGD(EmbeddingOptimizer):
    """EXACT_SGD: T[r] -= lr * G[r]."""

    weight_decay: float = 0.0

    def init(self, table: jnp.ndarray) -> Params:
        return self._sr_state(table)

    def update(self, table, state, unique_ids, unique_grads, lr=None,
               ids_sorted=True, ids_in_bounds=False, old_rows=None):
        lr = self._lr(lr)
        g = unique_grads.astype(jnp.float32)
        if self.weight_decay:
            rows = old_rows if old_rows is not None else jnp.take(
                table, unique_ids, axis=0, mode="fill", fill_value=0,
                indices_are_sorted=ids_sorted)
            g = g + self.weight_decay * rows.astype(jnp.float32)
        sr_bits, state = self._sr_bits(state, g.shape)
        new_table = _scatter_add_rows(table, unique_ids, -lr * g,
                                      ids_sorted=ids_sorted, sr_bits=sr_bits,
                                      ids_in_bounds=ids_in_bounds,
                                      old_rows=old_rows)
        return new_table, state

    def dense_update(self, table, state, grad, touched, lr=None):
        lr = self._lr(lr)
        g = grad.astype(jnp.float32)
        if self.weight_decay:
            g = g + self.weight_decay * jnp.where(
                touched[:, None], table.astype(jnp.float32), 0.0
            )
        sr_bits, state = self._sr_bits(state, g.shape)
        if sr_bits is not None:
            new = stochastic_round_bf16(
                table.astype(jnp.float32) - lr * g, sr_bits
            ).astype(table.dtype)
            return jnp.where(touched[:, None], new, table), state
        return (table - (lr * g).astype(table.dtype)), state

    def supports_segscan_update(self, table: jnp.ndarray) -> bool:
        # 128-lane fp32 (flat run-end kernel) or u32 pair-packed bf16
        # storage (PAIR-granular kernel: fp32 in-kernel compute, bf16
        # rounding at the store — stochastic when SR is on)
        return (
            table.ndim == 2
            and table.dtype in (jnp.float32, jnp.uint32)
            and table.shape[1] == 128
        )

    def _sr_seed(self, state):
        if not self.stochastic_rounding:
            return None, state
        step = state["sr_step"]
        return (
            step.reshape(1).astype(jnp.uint32),
            {**state, "sr_step": step + 1},
        )

    # ONE-pass pair-packed small-region dense update (SGD only: the
    # kernel carries no per-row state I/O — RowWiseAdagrad's accumulator
    # would need a sub-128-lane operand). Valid only with wd == 0
    # (callers gate): the kernel has no touched mask — zero-acc rows
    # keep exact bits, which weight decay would break.
    @property
    def supports_dense_pair_update(self) -> bool:
        return self.weight_decay == 0.0

    def dense_pair_update(
        self, blob_small, acc_e, acc_o, state, lr=None, interpret=False
    ):
        from torchrec_tpu.ops.tbe_pallas import dense_pair_sgd_update

        sr_seed, state = self._sr_seed(state)
        new = dense_pair_sgd_update(
            blob_small, acc_e, acc_o, self._lr(lr), sr_seed,
            interpret=interpret,
        )
        return new, state

    def segscan_update(
        self, table, state, rows_end, heads, ends, grads, old_rows,
        lr=None, interpret=False, parity=None, sorted_ids=None,
        _chunk: int = 0,
    ):
        del sorted_ids  # stateless: only the rowwise family consumes it
        from torchrec_tpu.ops.tbe_pallas import (
            row_scatter_write_segscan,
            row_scatter_write_segscan_pair,
        )

        lr = self._lr(lr)
        scal = jnp.stack(
            [
                jnp.asarray(lr, jnp.float32),
                jnp.asarray(self.weight_decay, jnp.float32),
            ]
        )
        if parity is not None:
            # bf16 pair mode: rows_end carries PAIR ids, grads are in
            # half-layout, old_rows are u32 pair words
            sr_seed, state = self._sr_seed(state)
            new_table = row_scatter_write_segscan_pair(
                table, rows_end, heads, ends, parity, grads, old_rows,
                scal, sr_seed, interpret=interpret, _chunk=_chunk,
            )
            return new_table, state
        new_table = row_scatter_write_segscan(
            table, rows_end, heads, ends, grads, old_rows, scal,
            interpret=interpret, _chunk=_chunk,
        )
        return new_table, state


@dataclasses.dataclass(frozen=True)
class RowWiseAdagrad(EmbeddingOptimizer):
    """EXACT_ROWWISE_ADAGRAD (fbgemm semantics; eager reference
    torchrec/optim/rowwise_adagrad.py:22):

        G_r    = sum of the row's gradients this step (pre-deduped)
        s_r   += mean(G_r ** 2)            # one fp32 scalar per row
        T_r   -= lr * G_r / (sqrt(s_r) + eps)

    State is [R] fp32 — 1/D of Adagrad's memory, the recsys default.

    Under column-split shardings the "row" is the *local shard row* (one
    column block), so the accumulator is per (row, block) — matching
    FBGEMM's per-shard optimizer state, and hence the reference's behavior,
    rather than unsharded full-row semantics.
    """

    eps: float = 1e-8
    weight_decay: float = 0.0
    initial_accumulator_value: float = 0.0

    def init(self, table: jnp.ndarray) -> Params:
        return {
            "momentum": jnp.full(
                (table.shape[0],), self.initial_accumulator_value, jnp.float32
            ),
            **self._sr_state(table),
        }

    def update(self, table, state, unique_ids, unique_grads, lr=None,
               ids_sorted=True, ids_in_bounds=False, old_rows=None):
        lr = self._lr(lr)
        g = unique_grads.astype(jnp.float32)
        if self.weight_decay:
            rows = old_rows if old_rows is not None else jnp.take(
                table, unique_ids, axis=0, mode="fill", fill_value=0,
                indices_are_sorted=ids_sorted)
            g = g + self.weight_decay * rows.astype(jnp.float32)
        gsq = jnp.mean(g * g, axis=1)  # [N]
        mom = state["momentum"].at[unique_ids].add(gsq, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted)
        mom_rows = jnp.take(
            mom, unique_ids, axis=0, mode="fill", fill_value=1.0,
            indices_are_sorted=ids_sorted,
        )
        delta = -lr * g / (jnp.sqrt(mom_rows)[:, None] + self.eps)
        sr_bits, state = self._sr_bits(state, delta.shape)
        new_table = _scatter_add_rows(table, unique_ids, delta,
                                      ids_sorted=ids_sorted, sr_bits=sr_bits,
                                      ids_in_bounds=ids_in_bounds,
                                      old_rows=old_rows)
        return new_table, {**state, "momentum": mom}

    def dense_update(self, table, state, grad, touched, lr=None):
        lr = self._lr(lr)
        g = grad.astype(jnp.float32)
        if self.weight_decay:
            g = g + self.weight_decay * jnp.where(
                touched[:, None], table.astype(jnp.float32), 0.0
            )
        gsq = jnp.where(touched, jnp.mean(g * g, axis=1), 0.0)
        mom = state["momentum"] + gsq
        delta = jnp.where(
            touched[:, None], -lr * g / (jnp.sqrt(mom)[:, None] + self.eps), 0.0
        )
        sr_bits, state = self._sr_bits(state, delta.shape)
        if sr_bits is not None:
            new = stochastic_round_bf16(
                table.astype(jnp.float32) + delta, sr_bits
            ).astype(table.dtype)
            new_table = jnp.where(touched[:, None], new, table)
        else:
            new_table = table + delta.astype(table.dtype)
        return new_table, {**state, "momentum": mom}

    def supports_segscan_update(self, table: jnp.ndarray) -> bool:
        # 128-lane fp32 (flat kernel) or u32 pair-packed bf16 (pair
        # kernel; the fp32 accumulator always stays exact)
        return (
            table.ndim == 2
            and table.dtype in (jnp.float32, jnp.uint32)
            and table.shape[1] == 128
        )

    _sr_seed = SGD._sr_seed

    # ONE-pass pair-packed small-region dense update (see SGD's — the
    # rowwise form carries the accumulator as a [P, 2] operand like the
    # pair-rowwise segscan kernel). wd == 0 gate: no touched mask in the
    # kernel, and zero-acc rows leave weights AND accumulators unchanged.
    @property
    def supports_dense_pair_update(self) -> bool:
        return self.weight_decay == 0.0

    def dense_pair_update(
        self, blob_small, acc_e, acc_o, state, lr=None, interpret=False
    ):
        from torchrec_tpu.ops.tbe_pallas import dense_pair_rowwise_update

        mom = state["momentum"]
        n_pairs = acc_e.shape[0]
        need = 2 * n_pairs
        mom_head = mom[: min(need, mom.shape[0])]
        if mom_head.shape[0] < need:
            mom_head = jnp.concatenate(
                [
                    mom_head,
                    jnp.zeros((need - mom_head.shape[0],), mom.dtype),
                ]
            )
        sr_seed, state = self._sr_seed(state)
        new_blob, m_new = dense_pair_rowwise_update(
            blob_small, acc_e, acc_o, mom_head.reshape(n_pairs, 2),
            self._lr(lr), self.eps, sr_seed, interpret=interpret,
        )
        # zero-acc rows return their unchanged accumulator, so writing
        # the whole head back (clipped to real rows) is exact
        flat = m_new.reshape(-1)[: min(need, mom.shape[0])]
        new_mom = jax.lax.dynamic_update_slice(mom, flat, (0,))
        return new_blob, {**state, "momentum": new_mom}
    # A/B gate: monotonic-index accumulator passes (sorted-hint gather +
    # sorted scatter-max) — valid because the accumulator never
    # decreases, but measured SLOWER on v5e at the headline shapes
    # (1.415 vs 1.354 ms/step): XLA's sorted-scatter-max lowering does
    # not beat the unsorted unique set, and the duplicate slot positions
    # make the max pass longer. Kept for re-evaluation on other shapes.
    _MOM_SORTED_PASSES = False

    # EBC colocate_rowwise_state support: the large-region accumulator
    # rides a 128-lane state block in the table blob (column D, stored
    # as a delta from initial_accumulator_value), so the fused backward
    # has NO scalar state passes (tbe_pallas.
    # row_scatter_write_segscan_rowwise_colocated).
    supports_colocated_state = True

    def segscan_update_colocated(
        self, table, state, rows_end, heads, ends, grads, old_rows,
        lr=None, interpret=False, _chunk: int = 0,
    ):
        """Fused tail on a state-lane blob ``[R, D + 128]``: weights AND
        accumulator update in one pass; the state pytree passes through
        unchanged (its ``momentum`` entry covers only the small region —
        the module's dense path; large-region rows live in the blob)."""
        from torchrec_tpu.ops.tbe_pallas import (
            row_scatter_write_segscan_rowwise_colocated,
        )

        if self.stochastic_rounding:
            raise ValueError(
                "colocated state is fp32-only (no stochastic rounding)"
            )
        scal = jnp.stack(
            [
                jnp.asarray(self._lr(lr), jnp.float32),
                jnp.asarray(self.weight_decay, jnp.float32),
                jnp.asarray(self.eps, jnp.float32),
                jnp.asarray(
                    self.initial_accumulator_value, jnp.float32
                ),
            ]
        )
        new_table = row_scatter_write_segscan_rowwise_colocated(
            table, rows_end, heads, ends, grads, old_rows, scal,
            interpret=interpret, _chunk=_chunk,
        )
        return new_table, state

    def segscan_update(
        self, table, state, rows_end, heads, ends, grads, old_rows,
        lr=None, interpret=False, parity=None, sorted_ids=None,
        _chunk: int = 0,
    ):
        from torchrec_tpu.ops.tbe_pallas import (
            row_scatter_write_segscan_pair_rowwise,
            row_scatter_write_segscan_rowwise,
        )

        lr = self._lr(lr)
        mom = state["momentum"]
        scal = jnp.stack(
            [
                jnp.asarray(lr, jnp.float32),
                jnp.asarray(self.weight_decay, jnp.float32),
                jnp.asarray(self.eps, jnp.float32),
            ]
        )
        if parity is not None:
            # bf16 pair mode: gather/scatter the accumulator through an
            # even-padded [P, 2] pair view so both rows of each touched
            # pair ride one row op
            sr_seed, state = self._sr_seed(state)
            r = mom.shape[0]
            mom_p = (
                jnp.concatenate([mom, jnp.zeros((1,), mom.dtype)])
                if r % 2 else mom
            ).reshape(-1, 2)
            mom_pairs = jnp.take(
                mom_p, jnp.minimum(rows_end, mom_p.shape[0] - 1), axis=0
            )
            new_table, m_new = row_scatter_write_segscan_pair_rowwise(
                table, rows_end, heads, ends, parity, grads, old_rows,
                mom_pairs, scal, sr_seed, interpret=interpret,
                _chunk=_chunk,
            )
            new_mom = mom_p.at[rows_end].set(
                m_new, mode="drop", unique_indices=True
            ).reshape(-1)[:r]
            return new_table, {**state, "momentum": new_mom}
        if (
            sorted_ids is not None
            and self._MOM_SORTED_PASSES
            and self.initial_accumulator_value >= 0
        ):
            # both accumulator passes ride MONOTONIC per-slot indices
            # (the sorted stream's ids): the gather takes the honest
            # indices_are_sorted fast path, and the write-back is a
            # sorted scatter-MAX — the accumulator only grows, the
            # kernel zeroes non-end outputs, and mom >= 0, so duplicate
            # slot positions and zero values are no-ops
            idx = jnp.minimum(sorted_ids, mom.shape[0] - 1)
            mom_rows = jnp.take(mom, idx, indices_are_sorted=True)
            new_table, m_new = row_scatter_write_segscan_rowwise(
                table, rows_end, heads, ends, grads, old_rows, mom_rows,
                scal, interpret=interpret, _chunk=_chunk,
            )
            new_mom = mom.at[idx].max(
                m_new[:, 0], indices_are_sorted=True
            )
            return new_table, {**state, "momentum": new_mom}
        # accumulator at run-end rows (sentinel positions read garbage;
        # the kernel's ends mask zeroes their outputs)
        mom_rows = jnp.take(mom, jnp.minimum(rows_end, mom.shape[0] - 1))
        new_table, m_new = row_scatter_write_segscan_rowwise(
            table, rows_end, heads, ends, grads, old_rows, mom_rows, scal,
            interpret=interpret, _chunk=_chunk,
        )
        new_mom = mom.at[rows_end].set(
            m_new[:, 0], mode="drop", unique_indices=True
        )
        return new_table, {**state, "momentum": new_mom}


@dataclasses.dataclass(frozen=True)
class Adam(EmbeddingOptimizer):
    """ADAM with full [R, D] first+second moments (sparse row updates).

    Bias correction uses a per-row step count (rows update at different
    rates in sparse training; global-step bias correction would over-damp
    rarely-seen rows).
    """

    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0

    def init(self, table: jnp.ndarray) -> Params:
        return {
            "m": jnp.zeros_like(table, jnp.float32),
            "v": jnp.zeros_like(table, jnp.float32),
            "steps": jnp.zeros((table.shape[0],), jnp.int32),
        }

    def update(self, table, state, unique_ids, unique_grads, lr=None,
               ids_sorted=True, ids_in_bounds=False, old_rows=None):
        lr = self._lr(lr)
        g = unique_grads.astype(jnp.float32)
        if self.weight_decay:
            rows = old_rows if old_rows is not None else jnp.take(
                table, unique_ids, axis=0, mode="fill", fill_value=0,
                indices_are_sorted=ids_sorted)
            g = g + self.weight_decay * rows.astype(jnp.float32)
        steps = state["steps"].at[unique_ids].add(1, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted)
        t = jnp.take(steps, unique_ids, mode="fill", fill_value=1, indices_are_sorted=ids_sorted).astype(jnp.float32)
        m_rows = jnp.take(state["m"], unique_ids, axis=0, mode="fill", fill_value=0, indices_are_sorted=ids_sorted)
        v_rows = jnp.take(state["v"], unique_ids, axis=0, mode="fill", fill_value=0, indices_are_sorted=ids_sorted)
        m_new = self.beta1 * m_rows + (1 - self.beta1) * g
        v_new = self.beta2 * v_rows + (1 - self.beta2) * g * g
        m = state["m"].at[unique_ids].set(m_new, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted)
        v = state["v"].at[unique_ids].set(v_new, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted)
        m_hat = m_new / (1 - self.beta1 ** t)[:, None]
        v_hat = v_new / (1 - self.beta2 ** t)[:, None]
        delta = -lr * m_hat / (jnp.sqrt(v_hat) + self.eps)
        new_table = _scatter_add_rows(table, unique_ids, delta, ids_sorted=ids_sorted, ids_in_bounds=ids_in_bounds, old_rows=old_rows)
        return new_table, {"m": m, "v": v, "steps": steps}

    def dense_update(self, table, state, grad, touched, lr=None):
        lr = self._lr(lr)
        g = grad.astype(jnp.float32)
        if self.weight_decay:
            g = g + self.weight_decay * jnp.where(
                touched[:, None], table.astype(jnp.float32), 0.0
            )
        steps = state["steps"] + touched.astype(jnp.int32)
        t = jnp.maximum(steps, 1).astype(jnp.float32)
        tm = touched[:, None]
        m = jnp.where(tm, self.beta1 * state["m"] + (1 - self.beta1) * g, state["m"])
        v = jnp.where(tm, self.beta2 * state["v"] + (1 - self.beta2) * g * g, state["v"])
        m_hat = m / (1 - self.beta1 ** t)[:, None]
        v_hat = v / (1 - self.beta2 ** t)[:, None]
        delta = jnp.where(tm, -lr * m_hat / (jnp.sqrt(v_hat) + self.eps), 0.0)
        return table + delta.astype(table.dtype), {"m": m, "v": v, "steps": steps}


@dataclasses.dataclass(frozen=True)
class PartialRowWiseAdam(EmbeddingOptimizer):
    """PARTIAL_ROWWISE_ADAM: full [R, D] first moment, row-wise [R] second
    moment (fbgemm's memory compromise for wide tables)."""

    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8

    def init(self, table: jnp.ndarray) -> Params:
        return {
            "m": jnp.zeros_like(table, jnp.float32),
            "v": jnp.zeros((table.shape[0],), jnp.float32),
            "steps": jnp.zeros((table.shape[0],), jnp.int32),
        }

    def update(self, table, state, unique_ids, unique_grads, lr=None,
               ids_sorted=True, ids_in_bounds=False, old_rows=None):
        lr = self._lr(lr)
        g = unique_grads.astype(jnp.float32)
        steps = state["steps"].at[unique_ids].add(1, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted)
        t = jnp.take(steps, unique_ids, mode="fill", fill_value=1, indices_are_sorted=ids_sorted).astype(jnp.float32)
        m_rows = jnp.take(state["m"], unique_ids, axis=0, mode="fill", fill_value=0, indices_are_sorted=ids_sorted)
        v_rows = jnp.take(state["v"], unique_ids, mode="fill", fill_value=0, indices_are_sorted=ids_sorted)
        m_new = self.beta1 * m_rows + (1 - self.beta1) * g
        v_new = self.beta2 * v_rows + (1 - self.beta2) * jnp.mean(g * g, axis=1)
        m = state["m"].at[unique_ids].set(m_new, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted)
        v = state["v"].at[unique_ids].set(v_new, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted)
        m_hat = m_new / (1 - self.beta1 ** t)[:, None]
        v_hat = v_new / (1 - self.beta2 ** t)
        delta = -lr * m_hat / (jnp.sqrt(v_hat)[:, None] + self.eps)
        new_table = _scatter_add_rows(table, unique_ids, delta, ids_sorted=ids_sorted, ids_in_bounds=ids_in_bounds, old_rows=old_rows)
        return new_table, {"m": m, "v": v, "steps": steps}

    def dense_update(self, table, state, grad, touched, lr=None):
        lr = self._lr(lr)
        g = grad.astype(jnp.float32)
        steps = state["steps"] + touched.astype(jnp.int32)
        t = jnp.maximum(steps, 1).astype(jnp.float32)
        tm = touched[:, None]
        m = jnp.where(tm, self.beta1 * state["m"] + (1 - self.beta1) * g, state["m"])
        v = jnp.where(
            touched,
            self.beta2 * state["v"] + (1 - self.beta2) * jnp.mean(g * g, axis=1),
            state["v"],
        )
        m_hat = m / (1 - self.beta1 ** t)[:, None]
        v_hat = v / (1 - self.beta2 ** t)
        delta = jnp.where(tm, -lr * m_hat / (jnp.sqrt(v_hat)[:, None] + self.eps), 0.0)
        return table + delta.astype(table.dtype), {"m": m, "v": v, "steps": steps}


@dataclasses.dataclass(frozen=True)
class Adagrad(EmbeddingOptimizer):
    """Full ADAGRAD: per-element [R, D] accumulator (reference
    optimizers.py Adagrad -> fbgemm EXACT_ADAGRAD)."""

    eps: float = 1e-8
    initial_accumulator_value: float = 0.0

    def init(self, table: jnp.ndarray) -> Params:
        return {
            "sum": jnp.full(table.shape, self.initial_accumulator_value, jnp.float32)
        }

    def update(self, table, state, unique_ids, unique_grads, lr=None,
               ids_sorted=True, ids_in_bounds=False, old_rows=None):
        lr = self._lr(lr)
        g = unique_grads.astype(jnp.float32)
        s = state["sum"].at[unique_ids].add(
            g * g, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted
        )
        s_rows = jnp.take(s, unique_ids, axis=0, mode="fill", fill_value=1.0,
                          indices_are_sorted=ids_sorted)
        delta = -lr * g / (jnp.sqrt(s_rows) + self.eps)
        return _scatter_add_rows(table, unique_ids, delta, ids_sorted=ids_sorted, ids_in_bounds=ids_in_bounds, old_rows=old_rows), {"sum": s}

    def dense_update(self, table, state, grad, touched, lr=None):
        lr = self._lr(lr)
        g = grad.astype(jnp.float32)
        s = state["sum"] + jnp.where(touched[:, None], g * g, 0.0)
        delta = jnp.where(
            touched[:, None], -lr * g / (jnp.sqrt(s) + self.eps), 0.0
        )
        return table + delta.astype(table.dtype), {"sum": s}


@dataclasses.dataclass(frozen=True)
class LarsSGD(EmbeddingOptimizer):
    """Layer-wise adaptive-rate SGD with momentum (reference optimizers.py
    LarsSGD -> fbgemm LARS_SGD): the trust ratio scales lr per row by
    ||w|| / (||g|| + wd*||w||)."""

    momentum: float = 0.9
    eta: float = 0.001
    weight_decay: float = 0.0
    eps: float = 1e-8

    def init(self, table: jnp.ndarray) -> Params:
        return {"m": jnp.zeros_like(table, jnp.float32)}

    def _trust(self, w_rows, g):
        wn = jnp.linalg.norm(w_rows.astype(jnp.float32), axis=1)
        gn = jnp.linalg.norm(g, axis=1)
        ratio = self.eta * wn / (gn + self.weight_decay * wn + self.eps)
        return jnp.where(wn > 0, ratio, 1.0)

    def update(self, table, state, unique_ids, unique_grads, lr=None,
               ids_sorted=True, ids_in_bounds=False, old_rows=None):
        lr = self._lr(lr)
        g = unique_grads.astype(jnp.float32)
        w_rows = old_rows.astype(table.dtype) if old_rows is not None else jnp.take(
            table, unique_ids, axis=0, mode="fill", fill_value=0,
            indices_are_sorted=ids_sorted)
        if self.weight_decay:
            g = g + self.weight_decay * w_rows.astype(jnp.float32)
        scaled = lr * self._trust(w_rows, g)[:, None] * g
        m_rows = jnp.take(state["m"], unique_ids, axis=0, mode="fill",
                          fill_value=0, indices_are_sorted=ids_sorted)
        m_new = self.momentum * m_rows + scaled
        m = state["m"].at[unique_ids].set(
            m_new, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted
        )
        return _scatter_add_rows(table, unique_ids, -m_new, ids_sorted=ids_sorted, ids_in_bounds=ids_in_bounds, old_rows=old_rows), {"m": m}

    def dense_update(self, table, state, grad, touched, lr=None):
        lr = self._lr(lr)
        g = grad.astype(jnp.float32)
        if self.weight_decay:
            g = g + self.weight_decay * jnp.where(
                touched[:, None], table.astype(jnp.float32), 0.0
            )
        trust = self._trust(table, g)
        m = jnp.where(
            touched[:, None],
            self.momentum * state["m"] + lr * trust[:, None] * g,
            state["m"],
        )
        return table - jnp.where(touched[:, None], m, 0.0).astype(table.dtype), {"m": m}


@dataclasses.dataclass(frozen=True)
class LAMB(EmbeddingOptimizer):
    """LAMB (reference optimizers.py LAMB -> fbgemm LAMB): Adam moments +
    per-row trust-ratio scaling."""

    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-6
    weight_decay: float = 0.0

    def init(self, table: jnp.ndarray) -> Params:
        return {
            "m": jnp.zeros_like(table, jnp.float32),
            "v": jnp.zeros_like(table, jnp.float32),
            "steps": jnp.zeros((table.shape[0],), jnp.int32),
        }

    def _row_v(self, state, unique_ids, g, ids_sorted=True, ids_in_bounds=False):
        v_rows = jnp.take(state["v"], unique_ids, axis=0, mode="fill",
                          fill_value=0, indices_are_sorted=ids_sorted)
        return self.beta2 * v_rows + (1 - self.beta2) * g * g

    def update(self, table, state, unique_ids, unique_grads, lr=None,
               ids_sorted=True, ids_in_bounds=False, old_rows=None):
        lr = self._lr(lr)
        g = unique_grads.astype(jnp.float32)
        steps = state["steps"].at[unique_ids].add(
            1, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted
        )
        t = jnp.take(steps, unique_ids, mode="fill", fill_value=1,
                     indices_are_sorted=ids_sorted).astype(jnp.float32)
        m_rows = jnp.take(state["m"], unique_ids, axis=0, mode="fill",
                          fill_value=0, indices_are_sorted=ids_sorted)
        m_new = self.beta1 * m_rows + (1 - self.beta1) * g
        v_new = self._row_v(state, unique_ids, g, ids_sorted)
        m_hat = m_new / (1 - self.beta1 ** t)[:, None]
        v_hat = v_new / (1 - self.beta2 ** t)[:, None]
        w_rows = old_rows.astype(jnp.float32) if old_rows is not None else jnp.take(
            table, unique_ids, axis=0, mode="fill", fill_value=0,
            indices_are_sorted=ids_sorted).astype(jnp.float32)
        u = m_hat / (jnp.sqrt(v_hat) + self.eps)
        if self.weight_decay:
            u = u + self.weight_decay * w_rows
        wn = jnp.linalg.norm(w_rows, axis=1)
        un = jnp.linalg.norm(u, axis=1)
        trust = jnp.where((wn > 0) & (un > 0), wn / (un + self.eps), 1.0)
        delta = -lr * trust[:, None] * u
        m = state["m"].at[unique_ids].set(
            m_new, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted
        )
        v = state["v"].at[unique_ids].set(
            v_new, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted
        )
        return _scatter_add_rows(table, unique_ids, delta, ids_sorted=ids_sorted, ids_in_bounds=ids_in_bounds, old_rows=old_rows), {
            "m": m, "v": v, "steps": steps,
        }

    def dense_update(self, table, state, grad, touched, lr=None):
        lr = self._lr(lr)
        g = grad.astype(jnp.float32)
        tm = touched[:, None]
        steps = state["steps"] + touched.astype(jnp.int32)
        t = jnp.maximum(steps, 1).astype(jnp.float32)
        m = jnp.where(tm, self.beta1 * state["m"] + (1 - self.beta1) * g, state["m"])
        v = jnp.where(tm, self.beta2 * state["v"] + (1 - self.beta2) * g * g, state["v"])
        m_hat = m / (1 - self.beta1 ** t)[:, None]
        v_hat = v / (1 - self.beta2 ** t)[:, None]
        w = table.astype(jnp.float32)
        u = m_hat / (jnp.sqrt(v_hat) + self.eps)
        if self.weight_decay:
            u = u + self.weight_decay * w
        wn = jnp.linalg.norm(w, axis=1)
        un = jnp.linalg.norm(u, axis=1)
        trust = jnp.where((wn > 0) & (un > 0), wn / (un + self.eps), 1.0)
        delta = jnp.where(tm, -lr * trust[:, None] * u, 0.0)
        return table + delta.astype(table.dtype), {"m": m, "v": v, "steps": steps}


@dataclasses.dataclass(frozen=True)
class PartialRowWiseLAMB(LAMB):
    """PARTIAL_ROWWISE_LAMB: row-wise [R] second moment (fbgemm memory
    compromise)."""

    def init(self, table: jnp.ndarray) -> Params:
        return {
            "m": jnp.zeros_like(table, jnp.float32),
            "v": jnp.zeros((table.shape[0],), jnp.float32),
            "steps": jnp.zeros((table.shape[0],), jnp.int32),
        }

    def _row_v(self, state, unique_ids, g, ids_sorted=True, ids_in_bounds=False):
        v_rows = jnp.take(state["v"], unique_ids, mode="fill", fill_value=0,
                          indices_are_sorted=ids_sorted)
        v_new = self.beta2 * v_rows + (1 - self.beta2) * jnp.mean(g * g, axis=1)
        return v_new[:, None]

    def update(self, table, state, unique_ids, unique_grads, lr=None,
               ids_sorted=True, ids_in_bounds=False, old_rows=None):
        # the [R]-shaped v needs its own scatter; reuse LAMB via a view
        lr = self._lr(lr)
        g = unique_grads.astype(jnp.float32)
        steps = state["steps"].at[unique_ids].add(
            1, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted
        )
        t = jnp.take(steps, unique_ids, mode="fill", fill_value=1,
                     indices_are_sorted=ids_sorted).astype(jnp.float32)
        m_rows = jnp.take(state["m"], unique_ids, axis=0, mode="fill",
                          fill_value=0, indices_are_sorted=ids_sorted)
        m_new = self.beta1 * m_rows + (1 - self.beta1) * g
        v_rows = jnp.take(state["v"], unique_ids, mode="fill", fill_value=0,
                          indices_are_sorted=ids_sorted)
        v_new = self.beta2 * v_rows + (1 - self.beta2) * jnp.mean(g * g, axis=1)
        m_hat = m_new / (1 - self.beta1 ** t)[:, None]
        v_hat = (v_new / (1 - self.beta2 ** t))[:, None]
        w_rows = old_rows.astype(jnp.float32) if old_rows is not None else jnp.take(
            table, unique_ids, axis=0, mode="fill", fill_value=0,
            indices_are_sorted=ids_sorted).astype(jnp.float32)
        u = m_hat / (jnp.sqrt(v_hat) + self.eps)
        if self.weight_decay:
            u = u + self.weight_decay * w_rows
        wn = jnp.linalg.norm(w_rows, axis=1)
        un = jnp.linalg.norm(u, axis=1)
        trust = jnp.where((wn > 0) & (un > 0), wn / (un + self.eps), 1.0)
        delta = -lr * trust[:, None] * u
        m = state["m"].at[unique_ids].set(
            m_new, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted
        )
        v = state["v"].at[unique_ids].set(
            v_new, mode="drop", unique_indices=True, indices_are_sorted=ids_sorted
        )
        return _scatter_add_rows(table, unique_ids, delta, ids_sorted=ids_sorted, ids_in_bounds=ids_in_bounds, old_rows=old_rows), {
            "m": m, "v": v, "steps": steps,
        }

    def dense_update(self, table, state, grad, touched, lr=None):
        lr = self._lr(lr)
        g = grad.astype(jnp.float32)
        tm = touched[:, None]
        steps = state["steps"] + touched.astype(jnp.int32)
        t = jnp.maximum(steps, 1).astype(jnp.float32)
        m = jnp.where(tm, self.beta1 * state["m"] + (1 - self.beta1) * g, state["m"])
        v = jnp.where(
            touched,
            self.beta2 * state["v"] + (1 - self.beta2) * jnp.mean(g * g, axis=1),
            state["v"],
        )
        m_hat = m / (1 - self.beta1 ** t)[:, None]
        v_hat = (v / (1 - self.beta2 ** t))[:, None]
        w = table.astype(jnp.float32)
        u = m_hat / (jnp.sqrt(v_hat) + self.eps)
        if self.weight_decay:
            u = u + self.weight_decay * w
        wn = jnp.linalg.norm(w, axis=1)
        un = jnp.linalg.norm(u, axis=1)
        trust = jnp.where((wn > 0) & (un > 0), wn / (un + self.eps), 1.0)
        delta = jnp.where(tm, -lr * trust[:, None] * u, 0.0)
        return table + delta.astype(table.dtype), {"m": m, "v": v, "steps": steps}


_REGISTRY = {
    "sgd": SGD,
    "exact_sgd": SGD,
    "rowwise_adagrad": RowWiseAdagrad,
    "exact_rowwise_adagrad": RowWiseAdagrad,
    "adagrad": Adagrad,
    "exact_adagrad": Adagrad,
    "adam": Adam,
    "partial_rowwise_adam": PartialRowWiseAdam,
    "lamb": LAMB,
    "partial_rowwise_lamb": PartialRowWiseLAMB,
    "lars_sgd": LarsSGD,
}


def make_optimizer(name: str, **kwargs: Any) -> EmbeddingOptimizer:
    """Build a fused embedding optimizer by name (the ``fused_params``
    plumbing analog, torchrec/distributed/fused_params.py:120)."""
    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(
            f"unknown embedding optimizer {name!r}; have {sorted(_REGISTRY)}"
        )
    return _REGISTRY[key](**kwargs)
