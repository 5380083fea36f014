"""Core ragged sparse batch types: JaggedTensor / KeyedJaggedTensor / KeyedTensor.

Capability parity with the reference's ``torchrec/sparse/jagged_tensor.py``
(JaggedTensor :635, KeyedJaggedTensor :1910, KeyedTensor :3515) — re-designed
for JAX/XLA:

* All types are **registered pytrees**: they flow through ``jit`` / ``grad`` /
  ``shard_map`` and device transfers natively (the reference needed bespoke
  fx-proxy + pytree registration, jagged_tensor.py:1210-1240).

* **Static-shape discipline**: XLA requires static shapes, so ``values`` is a
  buffer padded to a fixed capacity chosen by the input pipeline (size
  bucketing bounds recompiles). The *logical* total length is implied by
  ``lengths``; padding slots are dropped by out-of-range segment ids, never by
  dynamic slicing.

* **Zero-copy views**: ``split`` / ``permute`` — hot ops the reference
  implements with fbgemm CUDA kernels (jagged_tensor.py:2673, :2828) — are
  pure *static metadata* changes here (a key-selection tuple), because the
  lookup kernels consume ``(ids, segment_ids, weights)`` triples in which
  value order is irrelevant. No data movement at all.

* Derived fields (offsets, per-value segment ids) are recomputed on demand;
  under ``jit`` XLA CSEs repeated computation, so the reference's lazy caches
  are unnecessary.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "JaggedTensor",
    "KeyedJaggedTensor",
    "KeyedTensor",
    "jagged_to_padded_dense",
    "padded_dense_to_jagged",
]


def _lengths_to_offsets(lengths: jnp.ndarray) -> jnp.ndarray:
    """[N] lengths -> [N+1] offsets (exclusive prefix sum)."""
    flat = lengths.reshape(-1)
    return jnp.concatenate(
        [jnp.zeros((1,), dtype=flat.dtype), jnp.cumsum(flat, dtype=flat.dtype)]
    )


def _repeat_with_oob_tail(
    per_segment: jnp.ndarray,
    lengths: jnp.ndarray,
    total: int,
    oob_value: int,
) -> jnp.ndarray:
    """Expand per-segment scalars to per-value slots of a padded buffer.

    Slots past the logical end get ``oob_value`` (so downstream segment-sums
    drop them, and masks can be derived). Expansion = scatter run-starts +
    cumsum + gather — ~5x faster than jnp.repeat's lowering on TPU (17us vs
    81us at 106k slots on v5e) and fully fusible.
    """
    seg = jnp.concatenate(
        [per_segment.reshape(-1), jnp.array([oob_value], dtype=per_segment.dtype)]
    ).astype(jnp.int32)
    lens = lengths.reshape(-1).astype(jnp.int32)
    # telescoping expansion with NO per-slot gather: scatter each run's
    # VALUE DELTA at its start position, then cumsum. Consecutive deltas of
    # empty runs accumulate at the same position and telescope away. (A
    # [total]-element scalar gather runs element-at-a-time on TPU — 0.76 ms
    # at 106k slots — while this is two vector passes.)
    deltas = jnp.concatenate([seg[:1], seg[1:] - seg[:-1]])
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lens)]
    )
    buf = jnp.zeros((total,), jnp.int32).at[starts].add(deltas, mode="drop")
    return jnp.cumsum(buf)


def jagged_to_padded_dense(
    values: jnp.ndarray,
    offsets: jnp.ndarray,
    max_length: int,
    padding_value: float = 0.0,
) -> jnp.ndarray:
    """[N, ...] jagged values + [B+1] offsets -> [B, max_length, ...] dense.

    Reference: JaggedTensor.to_padded_dense (jagged_tensor.py:953), which
    calls fbgemm ``jagged_to_padded_dense``. Here: one XLA gather.
    """
    b = offsets.shape[0] - 1
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    pos = jnp.arange(max_length, dtype=offsets.dtype)
    idx = starts[:, None] + pos[None, :]  # [B, max_length]
    valid = pos[None, :] < lens[:, None]
    idx = jnp.where(valid, idx, 0)
    gathered = jnp.take(values, idx.reshape(-1), axis=0)
    gathered = gathered.reshape((b, max_length) + values.shape[1:])
    mask = valid.reshape((b, max_length) + (1,) * (values.ndim - 1))
    return jnp.where(mask, gathered, jnp.asarray(padding_value, gathered.dtype))


def padded_dense_to_jagged(
    dense: jnp.ndarray,
    lengths: jnp.ndarray,
    total_length: int,
) -> jnp.ndarray:
    """[B, L, ...] dense -> [total_length, ...] jagged values (padded buffer).

    Inverse of :func:`jagged_to_padded_dense`; reference
    ``JaggedTensor.from_dense_lengths`` (jagged_tensor.py:806).
    """
    b, max_len = dense.shape[0], dense.shape[1]
    offsets = _lengths_to_offsets(lengths)
    # destination slot for each (b, l) element; OOB for l >= lengths[b]
    pos = jnp.arange(max_len, dtype=jnp.int32)
    dst = offsets[:-1][:, None] + pos[None, :]
    valid = pos[None, :] < lengths.reshape(-1)[:, None]
    dst = jnp.where(valid, dst, total_length)  # OOB rows dropped by scatter
    out_shape = (total_length,) + dense.shape[2:]
    out = jnp.zeros(out_shape, dtype=dense.dtype)
    flat_src = dense.reshape((b * max_len,) + dense.shape[2:])
    return out.at[dst.reshape(-1)].set(flat_src, mode="drop")


@jax.tree_util.register_pytree_node_class
class JaggedTensor:
    """A batch of variable-length rows: ``values`` + ``lengths`` (+weights).

    Reference: torchrec/sparse/jagged_tensor.py:635. ``values`` is padded to
    a static capacity; rows are laid out contiguously (row 0's values, then
    row 1's, ...).
    """

    def __init__(
        self,
        values: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        offsets: Optional[jnp.ndarray] = None,
        weights: Optional[jnp.ndarray] = None,
    ):
        if lengths is None:
            if offsets is None:
                raise ValueError("JaggedTensor needs lengths or offsets")
            lengths = offsets[1:] - offsets[:-1]
        self._values = values
        self._lengths = lengths
        self._weights = weights

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self._values, self._lengths, self._weights), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        values, lengths, weights = children
        return cls(values=values, lengths=lengths, weights=weights)

    # -- accessors ---------------------------------------------------------
    def values(self) -> jnp.ndarray:
        return self._values

    def lengths(self) -> jnp.ndarray:
        return self._lengths

    def offsets(self) -> jnp.ndarray:
        return _lengths_to_offsets(self._lengths)

    def weights(self) -> jnp.ndarray:
        if self._weights is None:
            raise ValueError("JaggedTensor has no weights")
        return self._weights

    def weights_or_none(self) -> Optional[jnp.ndarray]:
        return self._weights

    @property
    def capacity(self) -> int:
        """Static padded size of the values buffer."""
        return self._values.shape[0]

    def total_length(self) -> jnp.ndarray:
        """Dynamic logical number of values (<= capacity)."""
        return jnp.sum(self._lengths.astype(jnp.int32))

    def valid_mask(self) -> jnp.ndarray:
        """[capacity] bool mask of real (non-padding) value slots."""
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.total_length()

    def row_ids(self) -> jnp.ndarray:
        """[capacity] row index of each value slot; ``B`` (OOB) for padding."""
        b = self._lengths.shape[0]
        rows = jnp.arange(b, dtype=jnp.int32)
        return _repeat_with_oob_tail(rows, self._lengths, self.capacity, b)

    # -- converters ----------------------------------------------------------
    @staticmethod
    def from_dense_lengths(
        dense: jnp.ndarray, lengths: jnp.ndarray, capacity: Optional[int] = None
    ) -> "JaggedTensor":
        """Reference: jagged_tensor.py:806."""
        cap = capacity if capacity is not None else dense.shape[0] * dense.shape[1]
        values = padded_dense_to_jagged(dense, lengths, cap)
        return JaggedTensor(values=values, lengths=lengths)

    def to_padded_dense(
        self, max_length: int, padding_value: float = 0.0
    ) -> jnp.ndarray:
        """Reference: jagged_tensor.py:953."""
        return jagged_to_padded_dense(
            self._values, self.offsets(), max_length, padding_value
        )

    def __repr__(self) -> str:
        return (
            f"JaggedTensor(capacity={self.capacity}, "
            f"batch={self._lengths.shape[0]}, "
            f"weighted={self._weights is not None})"
        )


@jax.tree_util.register_pytree_node_class
class KeyedJaggedTensor:
    """The central sparse batch: F features x B examples of jagged id lists.

    Reference: torchrec/sparse/jagged_tensor.py:1910. Layout contract:

    * ``values``/``weights``: one padded buffer of capacity ``N`` holding all
      features' ids, **feature-major** in *physical* key order (all of
      physical feature 0's ids batch-contiguous, then feature 1's, ...).
    * ``lengths``: ``[F_phys, B]`` int32 for the full physical buffer.
    * ``keys``/``sel``: static. ``sel`` maps logical key position -> physical
      feature row; ``split``/``permute`` only change ``sel`` (zero-copy,
      unlike the reference's fbgemm permute kernels at :2673/:2828).

    Lookup kernels consume :meth:`segment_ids` — per-value-slot destination
    segments in logical ``(key, batch)`` order; padding and unselected
    features map to the out-of-range segment and are dropped by segment-sum.
    """

    def __init__(
        self,
        keys: Sequence[str],
        values: jnp.ndarray,
        lengths: jnp.ndarray,
        weights: Optional[jnp.ndarray] = None,
        sel: Optional[Tuple[int, ...]] = None,
        stride_per_key: Optional[Sequence[int]] = None,
        inverse_indices: Optional[jnp.ndarray] = None,
    ):
        """``stride_per_key``/``inverse_indices`` enable VBE (variable batch
        per key, reference jagged_tensor.py:2511): key k carries
        ``stride_per_key[k]`` deduplicated examples in lengths columns
        ``[0, stride_k)`` (the rest zero), and ``inverse_indices [F, B_out]``
        expands each key's pooled rows back to the global batch."""
        self._keys: Tuple[str, ...] = tuple(keys)
        self._values = values
        if lengths.ndim == 1:
            lengths = lengths.reshape(len(self._keys), -1)
        self._lengths = lengths
        self._weights = weights
        self._sel: Tuple[int, ...] = (
            tuple(sel) if sel is not None else tuple(range(len(self._keys)))
        )
        self._stride_per_key: Optional[Tuple[int, ...]] = (
            tuple(stride_per_key) if stride_per_key is not None else None
        )
        self._inverse_indices = inverse_indices

    # -- construction --------------------------------------------------------
    @staticmethod
    def from_lengths(
        keys: Sequence[str],
        values: jnp.ndarray,
        lengths: jnp.ndarray,
        weights: Optional[jnp.ndarray] = None,
    ) -> "KeyedJaggedTensor":
        """Reference: KJT.from_lengths_sync (jagged_tensor.py:~2000)."""
        return KeyedJaggedTensor(keys, values, lengths, weights)

    @staticmethod
    def from_offsets(
        keys: Sequence[str],
        values: jnp.ndarray,
        offsets: jnp.ndarray,
        weights: Optional[jnp.ndarray] = None,
    ) -> "KeyedJaggedTensor":
        lengths = offsets[1:] - offsets[:-1]
        return KeyedJaggedTensor(keys, values, lengths.reshape(len(keys), -1), weights)

    @staticmethod
    def empty(keys: Sequence[str], stride: int, capacity: int = 0) -> "KeyedJaggedTensor":
        """Zero-batch KJT (reference supports zero-batch end-to-end)."""
        return KeyedJaggedTensor(
            keys,
            jnp.zeros((capacity,), dtype=jnp.int32),
            jnp.zeros((len(keys), stride), dtype=jnp.int32),
        )

    @staticmethod
    def concat(kjts: Sequence["KeyedJaggedTensor"]) -> "KeyedJaggedTensor":
        """Concatenate along keys (reference jagged_tensor.py:2148).

        Materializes each input first (views must be flattened to physical
        order before buffers can be stacked).
        """
        mats = [k.materialize() for k in kjts]
        keys: List[str] = []
        for m in mats:
            keys.extend(m.keys())
        values = jnp.concatenate([m._values for m in mats])
        lengths = jnp.concatenate([m._lengths for m in mats], axis=0)
        any_w = any(m._weights is not None for m in mats)
        weights = None
        if any_w:
            weights = jnp.concatenate(
                [
                    m._weights
                    if m._weights is not None
                    else jnp.ones_like(m._values, dtype=jnp.float32)
                    for m in mats
                ]
            )
        return KeyedJaggedTensor(keys, values, lengths, weights)

    # -- pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        return (
            (self._values, self._lengths, self._weights, self._inverse_indices),
            (self._keys, self._sel, self._stride_per_key),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, sel, stride_per_key = aux
        values, lengths, weights, inverse_indices = children
        obj = object.__new__(cls)
        obj._keys = keys
        obj._stride_per_key = stride_per_key
        obj._inverse_indices = inverse_indices
        obj._values = values
        obj._lengths = lengths
        obj._weights = weights
        obj._sel = sel
        return obj

    # -- static/structural accessors -----------------------------------------
    def keys(self) -> List[str]:
        return [self._keys[i] for i in self._sel]

    def stride(self) -> int:
        return int(self._lengths.shape[1])

    @property
    def num_keys(self) -> int:
        return len(self._sel)

    @property
    def capacity(self) -> int:
        return self._values.shape[0]

    # -- dynamic accessors (logical view) --------------------------------------
    def values(self) -> jnp.ndarray:
        return self._values

    def weights(self) -> jnp.ndarray:
        if self._weights is None:
            raise ValueError("KeyedJaggedTensor has no weights")
        return self._weights

    def weights_or_none(self) -> Optional[jnp.ndarray]:
        return self._weights

    def lengths(self) -> jnp.ndarray:
        """[F_logical, B] lengths in logical key order."""
        return self._lengths[jnp.array(self._sel, dtype=jnp.int32), :]

    def offsets(self) -> jnp.ndarray:
        """[F_logical*B + 1] offsets of the *logical* stream.

        Only meaningful on a materialized KJT (physical order == logical).
        """
        return _lengths_to_offsets(self.lengths())

    def length_per_key(self) -> jnp.ndarray:
        """[F_logical] total ids per key (reference :2430)."""
        return jnp.sum(self.lengths(), axis=1)

    def offset_per_key(self) -> jnp.ndarray:
        """[F_logical+1] value-stream offset of each key (reference :2458)."""
        return _lengths_to_offsets(self.length_per_key())

    # -- physical-layout helpers (consumed by kernels) -------------------------
    def _physical_offsets(self) -> jnp.ndarray:
        return _lengths_to_offsets(self._lengths)

    def segment_ids(self, oob: Optional[int] = None) -> jnp.ndarray:
        """[capacity] destination segment of each physical value slot.

        Segment = ``logical_key_index * B + batch_index``; padding slots and
        slots of unselected keys get ``oob`` (default ``num_keys * B``).
        This is what the TBE kernel pools over.
        """
        f_phys, b = self._lengths.shape
        num_segments = self.num_keys * b
        oob_val = num_segments if oob is None else oob
        # physical feature -> logical position (or -1)
        pos = [-1] * f_phys
        for logical, phys in enumerate(self._sel):
            pos[phys] = logical
        pos_arr = jnp.array(pos, dtype=jnp.int32)  # [F_phys]
        batch_ids = jnp.arange(b, dtype=jnp.int32)
        seg = pos_arr[:, None] * b + batch_ids[None, :]  # [F_phys, B]
        seg = jnp.where(pos_arr[:, None] < 0, oob_val, seg)
        return _repeat_with_oob_tail(seg, self._lengths, self.capacity, oob_val)

    def valid_mask(self) -> jnp.ndarray:
        """[capacity] bool: slot holds a real id of a *selected* key."""
        b = self._lengths.shape[1]
        return self.segment_ids() < self.num_keys * b

    # -- views ------------------------------------------------------------------
    def split(self, segments: Sequence[int]) -> List["KeyedJaggedTensor"]:
        """Split along keys into len(segments) KJTs (reference :2673).

        Zero-copy: each output shares the buffers and carries a sub-selection.
        """
        if sum(segments) != self.num_keys:
            raise ValueError(
                f"split segments {segments} != num_keys {self.num_keys}"
            )
        out = []
        start = 0
        for seg in segments:
            out.append(
                KeyedJaggedTensor(
                    self._keys,
                    self._values,
                    self._lengths,
                    self._weights,
                    sel=self._sel[start : start + seg],
                    stride_per_key=self._stride_per_key,
                    inverse_indices=self._inverse_indices,
                )
            )
            start += seg
        return out

    def permute(self, indices: Sequence[int]) -> "KeyedJaggedTensor":
        """Reorder (and drop) keys (reference :2828). Zero-copy metadata
        change.

        Key DUPLICATION is rejected: the zero-copy design maps each
        physical slot to exactly ONE pooling segment, so a duplicated key
        would silently contribute to only its last copy. (The reference
        materializes a new KJT on permute and so supports duplicates;
        duplicate a key here by materializing two select_keys views.)
        """
        if len(set(indices)) != len(indices):
            raise ValueError(
                f"duplicate indices in permute({list(indices)}): zero-copy "
                "views cannot duplicate a key — take separate "
                "select_keys([...]) views instead"
            )
        return KeyedJaggedTensor(
            self._keys,
            self._values,
            self._lengths,
            self._weights,
            sel=tuple(self._sel[i] for i in indices),
            stride_per_key=self._stride_per_key,
            inverse_indices=self._inverse_indices,
        )

    def select_keys(self, keys: Sequence[str]) -> "KeyedJaggedTensor":
        """View with the given logical keys, in the given order."""
        key_to_pos = {k: i for i, k in enumerate(self.keys())}
        return self.permute([key_to_pos[k] for k in keys])

    def __getitem__(self, key: str) -> JaggedTensor:
        """One key's jagged values as a JaggedTensor (reference :3000).

        The returned JT shares the full padded buffer; its per-slot batch
        row ids follow from its lengths. Materialization is deferred: use
        :meth:`to_dict` on a materialized KJT for compact per-key buffers.
        """
        d = self.to_dict()
        if key not in d:
            raise KeyError(key)
        return d[key]

    def to_dict(self) -> Dict[str, JaggedTensor]:
        """Dict of per-key JaggedTensors (reference :3035).

        Each JT's values buffer is the slice of the materialized stream at a
        static per-key capacity (the full capacity — compaction under jit
        would need dynamic shapes). Offsets are correct; padding tails are
        dropped by length-driven consumers.
        """
        mat = self.materialize()
        out: Dict[str, JaggedTensor] = {}
        offsets = mat.offset_per_key()
        for i, key in enumerate(mat.keys()):
            start = offsets[i]
            # roll the stream so this key's values start at slot 0
            vals = _roll_left(mat._values, start)
            w = (
                _roll_left(mat._weights, start)
                if mat._weights is not None
                else None
            )
            out[key] = JaggedTensor(
                values=vals, lengths=mat._lengths[i], weights=w
            )
        return out

    def materialize(self) -> "KeyedJaggedTensor":
        """Produce a physically-ordered KJT (values feature-major in logical
        key order, identity selection). One XLA scatter; only needed before
        ``concat``/``to_dict``/host export — lookups never call this.
        """
        if self._sel == tuple(range(len(self._keys))):
            return self
        seg = self.segment_ids()  # logical segment per slot
        b = self._lengths.shape[1]
        logical_lengths = self.lengths()
        new_offsets = _lengths_to_offsets(logical_lengths)  # [F*B+1]
        n = self.capacity
        oob = self.num_keys * b
        # rank of each slot within its segment (physical order preserved)
        seg_start_phys = self._segment_starts_physical()
        slot = jnp.arange(n, dtype=jnp.int32)
        rank = slot - seg_start_phys
        dst = jnp.where(
            seg < oob, jnp.take(new_offsets, jnp.minimum(seg, oob), axis=0) + rank, n
        )
        new_values = (
            jnp.zeros((n,), dtype=self._values.dtype)
            .at[dst]
            .set(self._values, mode="drop")
        )
        new_weights = None
        if self._weights is not None:
            new_weights = (
                jnp.zeros((n,), dtype=self._weights.dtype)
                .at[dst]
                .set(self._weights, mode="drop")
            )
        return KeyedJaggedTensor(
            [self._keys[i] for i in self._sel],
            new_values,
            logical_lengths,
            new_weights,
        )

    def _segment_starts_physical(self) -> jnp.ndarray:
        """[capacity] physical offset at which each slot's (f,b) segment starts."""
        phys_off = self._physical_offsets()[:-1]  # [F_phys*B]
        f_phys, b = self._lengths.shape
        return _repeat_with_oob_tail(
            phys_off.astype(jnp.int32), self._lengths, self.capacity, 0
        )

    def variable_stride_per_key(self) -> bool:
        """True for VBE batches (reference :2511)."""
        return self._stride_per_key is not None

    def stride_per_key(self) -> Optional[Tuple[int, ...]]:
        """Per-LOGICAL-key deduplicated batch sizes."""
        if self._stride_per_key is None:
            return None
        return tuple(self._stride_per_key[p] for p in self._sel)

    def inverse_indices_or_none(self) -> Optional[jnp.ndarray]:
        if self._inverse_indices is None:
            return None
        return self._inverse_indices[jnp.asarray(self._sel, jnp.int32)]

    def inverse_indices(self) -> jnp.ndarray:
        """[F_logical, B_out] per-key map from global batch row ->
        deduplicated per-key example (reference :2552)."""
        if self._inverse_indices is None:
            raise ValueError("not a VBE KeyedJaggedTensor")
        return self._inverse_indices[jnp.asarray(self._sel, jnp.int32)]

    def sync(self) -> "KeyedJaggedTensor":
        """No-op (reference :2511 syncs cached fields across CPU/GPU)."""
        return self

    def unsync(self) -> "KeyedJaggedTensor":
        return self

    def __repr__(self) -> str:
        return (
            f"KeyedJaggedTensor(keys={self.keys()}, stride={self.stride()}, "
            f"capacity={self.capacity}, weighted={self._weights is not None})"
        )


def _roll_left(x: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Dynamic left-roll (jnp.roll with traced shift)."""
    n = x.shape[0]
    idx = (jnp.arange(n, dtype=jnp.int32) + shift.astype(jnp.int32)) % n
    return jnp.take(x, idx, axis=0)


@jax.tree_util.register_pytree_node_class
class KeyedTensor:
    """Dense output of pooled lookups: one [B, sum(dims)] tensor with static
    per-key dim splits.

    Reference: torchrec/sparse/jagged_tensor.py:3515.
    """

    def __init__(
        self,
        keys: Sequence[str],
        length_per_key: Sequence[int],
        values: jnp.ndarray,
    ):
        self._keys = tuple(keys)
        self._length_per_key = tuple(int(d) for d in length_per_key)
        self._values = values

    def tree_flatten(self):
        return (self._values,), (self._keys, self._length_per_key)

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, lpk = aux
        return cls(keys, lpk, children[0])

    def keys(self) -> List[str]:
        return list(self._keys)

    def values(self) -> jnp.ndarray:
        return self._values

    def length_per_key(self) -> List[int]:
        return list(self._length_per_key)

    def offset_per_key(self) -> List[int]:
        out = [0]
        for d in self._length_per_key:
            out.append(out[-1] + d)
        return out

    def __getitem__(self, key: str) -> jnp.ndarray:
        i = self._keys.index(key)
        off = self.offset_per_key()
        return self._values[:, off[i] : off[i + 1]]

    def to_dict(self) -> Dict[str, jnp.ndarray]:
        off = self.offset_per_key()
        return {
            k: self._values[:, off[i] : off[i + 1]]
            for i, k in enumerate(self._keys)
        }

    @staticmethod
    def regroup(
        keyed_tensors: Sequence["KeyedTensor"], groups: Sequence[Sequence[str]]
    ) -> List[jnp.ndarray]:
        """Regroup several KTs into named dense groups.

        Reference: KeyedTensor.regroup (:283) / fbgemm permute_multi_embedding;
        here static slices + concat, which XLA fuses into one copy.
        """
        lookup: Dict[str, jnp.ndarray] = {}
        for kt in keyed_tensors:
            lookup.update(kt.to_dict())
        return [jnp.concatenate([lookup[k] for k in g], axis=1) for g in groups]

    @staticmethod
    def regroup_as_dict(
        keyed_tensors: Sequence["KeyedTensor"],
        groups: Sequence[Sequence[str]],
        keys: Sequence[str],
    ) -> Dict[str, jnp.ndarray]:
        vals = KeyedTensor.regroup(keyed_tensors, groups)
        return dict(zip(keys, vals))

    def __repr__(self) -> str:
        return f"KeyedTensor(keys={list(self._keys)}, dims={list(self._length_per_key)})"
