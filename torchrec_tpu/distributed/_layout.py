"""Shared SPMD layout compiler for sharded embedding collections.

Both ShardedEmbeddingBagCollection (pooled) and ShardedEmbeddingCollection
(sequence) compile a sharding plan to the same uniform structure: each
(table, column-block) becomes a **virtual table** whose rows are
range-assigned to devices; virtual tables of one column width pack into one
per-device ``[local_rows, width]`` blob (the per-rank table pack FBGEMM TBE
uses, reference batched_embedding_kernel.py:3725). Placement lives in data
arrays ``id_lo/id_hi/blob_off[device, feature, block]`` indexed with
``lax.axis_index`` at runtime, so the compiled program is identical on every
device (SPMD) — only the data differs.

Reference parity: torchrec/distributed/embedding_sharding.py:556
(group_tables) + per-type sharding/*.py input/output dist composition.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.distributed.types import (
    EmbeddingModuleShardingPlan,
    ShardingEnv,
    device_put_global,
)
from torchrec_tpu.ops.fused_optim import EmbeddingOptimizer
from torchrec_tpu.types import DataType, ShardingType

Params = Dict[str, jnp.ndarray]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class WidthClass:
    """Static layout of one width class of virtual tables."""

    key: str
    width: int
    data_type: DataType
    max_blocks: int
    num_vf: int
    local_rows: int  # padded uniform per-device LOGICAL blob rows
    # static per-vf metadata
    vf_feature: Tuple[int, ...]  # logical feature index per vf
    vf_col_start: Tuple[int, ...]  # column start within the feature's dim
    # static [F+1, max_blocks]: vf position of (feature, block) or -1
    vf_pos: np.ndarray
    # data [W, F+1, max_blocks]
    id_lo: np.ndarray
    id_hi: np.ndarray
    blob_off: np.ndarray
    # per-device packing for (un)shard: list over devices of
    # (table_name, block_col_start, row_lo, row_hi, blob_row)
    packing: Tuple[Tuple[Tuple[str, int, int, int, int], ...], ...]
    # ---- fused-kernel storage tier (mirrors TableGroup in
    # modules/embedding_modules.py — the reference runs ONE TBE kernel
    # stack for every sharding type, batched_embedding_kernel.py:3725;
    # these fields port the same storage forms into the sharded blobs):
    # dead rows past local_rows so the branch-free Pallas write/segscan
    # kernels can park dedup sentinels at real addresses (0 = fast tier
    # off; storage is then exactly the plain [W, local_rows, width] blob)
    scratch_rows: int = 0
    # TILE-ROW storage for wide fp32 classes (width > 128, width % 128
    # == 0): physical blob [W, phys_rows * row_tiles, 128], logical row
    # r at physical rows r*nt .. r*nt+nt-1
    row_tiles: int = 1
    # pair-packed u32 storage for bf16 width-128 classes: physical blob
    # [W, phys_rows // 2, width] u32 (tbe_pallas pair layout)
    packed: bool = False
    # small-table region: shards of tables with <= DENSE_GRAD_ROWS_
    # THRESHOLD rows pack FIRST in each device blob so the backward can
    # split dense-path (prefix) vs sort/segscan (rest). Boundary is
    # per-device DATA ([W], 8-aligned); small_rows_max is the static
    # dense-accumulator size.
    small_rows_dev: Tuple[int, ...] = ()
    small_rows_max: int = 0
    # colocated rowwise-optimizer state (EBC colocate_rowwise_state
    # under sharding): nonzero means flat-small + INTERLEAVED-large
    # storage — physical blob [W, small_rows_max + 2 * (phys_rows -
    # small_rows_max), width]; each large logical row r lives at
    # physical pair (base: weights, base+1: state row, accumulator
    # delta in lane 0) with base = small_rows_max + 2*(r -
    # small_rows_max). Mirrors TableGroup.state_lanes.
    state_lanes: int = 0

    @property
    def phys_rows(self) -> int:
        """Physical LOGICAL-UNIT rows per device (logical + scratch);
        the stored minor shape additionally depends on
        row_tiles/packed/state_lanes."""
        return self.local_rows + self.scratch_rows

    @property
    def storage_rows(self) -> int:
        """Physical stored rows per device for the plain/colocated
        forms (packed stores storage_rows // 2 pair rows; tile-row
        stores phys_rows * row_tiles)."""
        if self.state_lanes:
            return self.small_rows_max + 2 * (
                self.phys_rows - self.small_rows_max
            )
        return self.phys_rows


def class_logical_blob(c: WidthClass, blob: np.ndarray) -> np.ndarray:
    """Host-side: storage-form blob -> logical [..., local_rows, width]
    fp32 (leading device axes preserved). Inverse of
    :func:`class_from_logical`."""
    blob = np.asarray(blob)
    lead = blob.shape[:-2]
    if c.packed:
        flat = blob.reshape((-1,) + blob.shape[-2:])
        out = np.stack([_unpack_pair_np(b) for b in flat])
        out = out.reshape(lead + (c.phys_rows, c.width))
    elif c.row_tiles > 1:
        out = blob.reshape(lead + (c.phys_rows, c.width)).astype(np.float32)
    elif c.state_lanes:
        sm = c.small_rows_max
        out = np.concatenate(
            [blob[..., :sm, :], blob[..., sm::2, :]], axis=-2
        ).astype(np.float32)
    else:
        out = blob.astype(np.float32)
    return out[..., : c.local_rows, :]


def class_from_logical(c: WidthClass, logical: np.ndarray) -> np.ndarray:
    """Host-side: logical [..., local_rows, width] fp32 -> storage form
    (scratch tail zero-filled)."""
    logical = np.asarray(logical, np.float32)
    lead = logical.shape[:-2]
    full = np.zeros(lead + (c.phys_rows, c.width), np.float32)
    full[..., : c.local_rows, :] = logical
    if c.packed:
        flat = full.reshape((-1,) + full.shape[-2:])
        out = np.stack([_pack_pair_np(b) for b in flat])
        return out.reshape(lead + (c.phys_rows // 2, c.width))
    if c.row_tiles > 1:
        return full.reshape(lead + (c.phys_rows * c.row_tiles, 128))
    if c.state_lanes:
        sm = c.small_rows_max
        lg = full[..., sm:, :]
        inter = np.stack([lg, np.zeros_like(lg)], axis=-2).reshape(
            lead + (2 * lg.shape[-2], c.width)
        )
        return np.concatenate([full[..., :sm, :], inter], axis=-2)
    return full.astype(c.data_type.as_jnp())


def class_logical_blob_jnp(c: WidthClass, blob: jnp.ndarray) -> jnp.ndarray:
    """Device-side: [W, ...] storage-form blob -> [W, local_rows, width]
    fp32 logical view (full-pass copies for packed/tile forms — boundary
    paths like resharding only)."""
    if c.packed:
        from torchrec_tpu.ops.tbe_pallas import unpack_pair_blob

        blob = jax.vmap(unpack_pair_blob)(blob)
    elif c.row_tiles > 1:
        blob = blob.reshape(blob.shape[0], -1, c.width)
    elif c.state_lanes:
        sm = c.small_rows_max
        blob = jnp.concatenate([blob[:, :sm], blob[:, sm::2]], axis=1)
    return blob[:, : c.local_rows].astype(jnp.float32)


def class_from_logical_jnp(c: WidthClass, logical: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse of :func:`class_logical_blob_jnp` (scratch
    tail zero-filled; bf16 rounds RN-even)."""
    w = logical.shape[0]
    logical = logical.astype(jnp.float32)
    if c.scratch_rows:
        logical = jnp.concatenate(
            [logical, jnp.zeros((w, c.scratch_rows, c.width), jnp.float32)],
            axis=1,
        )
    if c.packed:
        from torchrec_tpu.ops.tbe_pallas import pack_pair_blob

        return jax.vmap(pack_pair_blob)(logical)
    if c.row_tiles > 1:
        return logical.reshape(w, -1, 128)
    if c.state_lanes:
        sm = c.small_rows_max
        lg = logical[:, sm:]
        inter = jnp.stack([lg, jnp.zeros_like(lg)], axis=2).reshape(
            w, 2 * lg.shape[1], c.width
        )
        return jnp.concatenate([logical[:, :sm], inter], axis=1)
    return logical.astype(c.data_type.as_jnp())


def _pack_pair_np(x: np.ndarray) -> np.ndarray:
    """numpy pair-pack: [R (even), D] float -> u32 [R/2, D] in the
    tbe_pallas pair layout (delegates to its exact host converter)."""
    import ml_dtypes

    from torchrec_tpu.ops.tbe_pallas import pack_pairs_host

    return pack_pairs_host(np.asarray(x).astype(ml_dtypes.bfloat16))


def _unpack_pair_np(blob: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_pack_pair_np`: u32 [P, D] -> fp32 [2P, D]."""
    import ml_dtypes

    from torchrec_tpu.ops.tbe_pallas import unpack_pairs_host

    return unpack_pairs_host(blob, ml_dtypes.bfloat16).astype(np.float32)


def build_width_classes(
    tables: Dict[str, "BaseEmbeddingConfig"],  # noqa: F821
    plan: EmbeddingModuleShardingPlan,
    feature_names: Sequence[str],
    feat_of_table: Dict[str, List[int]],
    world_size: int,
    fast_window: Optional[int] = None,
    colocate_rowwise_state: bool = False,
) -> List[WidthClass]:
    """Compile plan -> width classes (skips DATA_PARALLEL tables).

    ``fast_window`` (= the module's ``max_unique_gradient_rows``): when
    set, classes whose storage the fused Pallas kernel tier supports get
    a sentinel scratch tail, tile-row (wide fp32) or pair-packed (bf16)
    physical storage, and a small-first packing order with per-device
    dense-path boundaries — the sharded analog of the single-chip
    TableGroup fast layout (one kernel stack for every sharding type,
    reference batched_embedding_kernel.py:3725)."""
    w = world_size
    f_count = len(feature_names)
    class_specs: Dict[Tuple[int, DataType], Dict] = {}
    for name, ps in plan.items():
        if ps.sharding_type == ShardingType.DATA_PARALLEL:
            continue
        t = tables[name]
        blocks = sorted({(s.col_start, s.col_count) for s in ps.shards})
        for col_start, col_count in blocks:
            ck = (col_count, t.data_type)
            spec = class_specs.setdefault(ck, {"tables": []})
            row_shards = [
                s for s in ps.shards
                if s.col_start == col_start and s.col_count == col_count
            ]
            spec["tables"].append((name, col_start, row_shards))

    from torchrec_tpu.modules.embedding_modules import (
        DENSE_GRAD_ROWS_THRESHOLD,
    )

    classes: List[WidthClass] = []
    for (width, dt), spec in sorted(
        class_specs.items(), key=lambda kv: (kv[0][0], kv[0][1].value)
    ):
        vf_feature: List[int] = []
        vf_col_start: List[int] = []
        tbl_block_counter: Dict[str, int] = {}
        entries = []  # (table, class-block-idx, col_start, row_shards)
        # small tables first (stable within each region): their shards
        # pack at the front of every device blob, giving the backward a
        # dense-path prefix (mirrors _EmbeddingCollectionBase grouping)
        def _is_large(item):
            return tables[item[0]].num_embeddings > DENSE_GRAD_ROWS_THRESHOLD

        for name, col_start, row_shards in sorted(
            spec["tables"], key=_is_large
        ):
            bi = tbl_block_counter.get(name, 0)
            tbl_block_counter[name] = bi + 1
            entries.append((name, bi, col_start, row_shards))
        max_blocks = max(tbl_block_counter.values())
        vf_pos = np.full((f_count + 1, max_blocks), -1, dtype=np.int32)
        for name, bi, col_start, row_shards in entries:
            for fi in feat_of_table[name]:
                vf_pos[fi, bi] = len(vf_feature)
                vf_feature.append(fi)
                vf_col_start.append(col_start)

        id_lo = np.zeros((w, f_count + 1, max_blocks), np.int32)
        id_hi = np.zeros((w, f_count + 1, max_blocks), np.int32)
        blob_off = np.zeros((w, f_count + 1, max_blocks), np.int32)
        packing: List[List[Tuple[str, int, int, int, int]]] = [
            [] for _ in range(w)
        ]
        dev_rows = [0] * w
        small_rows_dev = [0] * w
        small_done = False
        for name, bi, col_start, row_shards in entries:
            if not small_done and _is_large((name, col_start, row_shards)):
                # first LARGE entry: freeze every device's small boundary,
                # 8-aligned (pad rows are dead) so the dense-path prefix
                # and the pair/tile alignments never straddle it
                small_rows_dev = [_round_up(r, 8) for r in dev_rows]
                dev_rows = list(small_rows_dev)
                small_done = True
            for s in row_shards:
                d = s.rank
                if d < 0 or d >= w:
                    raise ValueError(f"shard rank {d} outside world {w}")
                for fi in feat_of_table[name]:
                    # the (device, feature, block) placement cell holds ONE
                    # contiguous id range; a second row shard of the same
                    # column block on the same rank would silently clobber
                    # the first (its ids would look up as zeros)
                    if id_hi[d, fi, bi] > id_lo[d, fi, bi]:
                        raise ValueError(
                            f"table {name!r}: two row shards of column "
                            f"block {bi} placed on rank {d}; merge them "
                            "into one contiguous shard per rank"
                        )
                    id_lo[d, fi, bi] = s.row_start
                    id_hi[d, fi, bi] = s.row_start + s.row_count
                    blob_off[d, fi, bi] = dev_rows[d]
                packing[d].append(
                    (
                        name,
                        col_start,
                        s.row_start,
                        s.row_start + s.row_count,
                        dev_rows[d],
                    )
                )
                dev_rows[d] += s.row_count
        if not small_done:  # all tables small
            small_rows_dev = [_round_up(r, 8) for r in dev_rows]
        local_rows = _round_up(max(max(dev_rows), 1), 8)
        has_large = any(
            dev_rows[d] > small_rows_dev[d] for d in range(w)
        )

        # ---- fused-kernel storage tier gates (see docstring) ----
        scratch = 0
        tiles = 1
        packed = False
        lanes = 0
        if fast_window is not None and has_large:
            if dt == DataType.FP32 and width == 128:
                supported = True
                if colocate_rowwise_state:
                    # flat-small + interleaved-large colocated storage
                    # (accumulator delta in lane 0 of each state row)
                    lanes = 128
            elif dt == DataType.FP32 and width > 128 and width % 128 == 0:
                supported = True
                tiles = width // 128
            elif dt == DataType.BF16 and width == 128:
                supported = True
                packed = True
            else:
                supported = False
            if supported:
                from torchrec_tpu.ops.tbe_pallas import _CHUNK as _wc

                scratch = _round_up(fast_window, _wc)
                if packed:
                    # pair-granular kernel: sentinels are PAIR indices,
                    # so the tail needs 2x the rows; local_rows is
                    # 8-aligned (even), so phys_rows stays even
                    scratch *= 2
        classes.append(
            WidthClass(
                key=f"shard_w{width}_{dt.value.lower()}",
                width=width,
                data_type=dt,
                max_blocks=max_blocks,
                num_vf=len(vf_feature),
                local_rows=local_rows,
                vf_feature=tuple(vf_feature),
                vf_col_start=tuple(vf_col_start),
                vf_pos=vf_pos,
                id_lo=id_lo,
                id_hi=id_hi,
                blob_off=blob_off,
                packing=tuple(tuple(p) for p in packing),
                scratch_rows=scratch,
                row_tiles=tiles,
                packed=packed,
                small_rows_dev=tuple(small_rows_dev),
                small_rows_max=max(small_rows_dev),
                state_lanes=lanes,
            )
        )
    return classes


class ShardedCollectionBase:
    """Shared param (un)packing + optimizer-state plumbing over width
    classes. Subclasses set ``self._classes``, ``self._env`` and optionally
    ``self._dp`` (an unsharded collection over the DATA_PARALLEL tables,
    whose group params are stored under ``dp_<group key>``)."""

    _classes: List[WidthClass]
    _env: ShardingEnv
    _dp = None  # Optional unsharded collection
    _all_tables: Sequence  # full table-config list

    @property
    def env(self) -> ShardingEnv:
        return self._env

    def _sharding(self, *spec) -> jax.sharding.NamedSharding:
        return jax.sharding.NamedSharding(
            self._env.mesh, jax.sharding.PartitionSpec(*spec)
        )

    # fused Pallas kernel tier shared by the pooled (EBC) and sequence
    # (EC) sharded collections — one kernel stack for every sharding
    # type, like the reference's per-shard BatchedFusedEmbeddingBag
    # (batched_embedding_kernel.py:3725 via embedding_lookup.py:605).
    _max_unique = None  # set by subclasses from the module's fast window

    # interpret-mode test knob ONLY (CPU-mesh oracle tests shrink the
    # segscan kernels' unrolled DMA chunk — the production chunk unrolls
    # a 1024-issue loop into the traced graph, minutes of compile under
    # an 8-device shard_map)
    _SEGSCAN_TEST_CHUNK = 0

    @staticmethod
    def _class_gather(
        c: _WidthClass,
        blob: jnp.ndarray,
        ids: jnp.ndarray,
        ids_sorted: bool = False,
    ) -> jnp.ndarray:
        """Gather logical rows ``[n, width]`` f32 from the class's storage
        form at (clipped) local ids. PACKED classes return HALF-LAYOUT
        columns (tbe_pallas._unpack_pair_half) — callers de-permute their
        POOLED outputs once via :meth:`_depermute_pooled`."""
        if c.packed:
            from torchrec_tpu.ops.tbe_pallas import _unpack_pair_half

            d2 = c.width // 2
            pair = jnp.take(
                blob, jnp.minimum(ids >> 1, blob.shape[0] - 1), axis=0,
                indices_are_sorted=ids_sorted,
            )
            half = jnp.where(
                (ids & 1)[:, None].astype(bool), pair[:, d2:], pair[:, :d2]
            )
            return _unpack_pair_half(half)
        if c.row_tiles > 1:
            nt = c.row_tiles
            idc = jnp.minimum(ids, c.local_rows - 1)
            return jnp.concatenate(
                [
                    jnp.take(
                        blob, idc * nt + t, axis=0,
                        indices_are_sorted=ids_sorted,
                    )
                    for t in range(nt)
                ],
                axis=1,
            )
        if c.state_lanes:
            sm = c.small_rows_max
            idc = jnp.minimum(ids, c.local_rows - 1)
            phys = jnp.where(idc < sm, idc, sm + 2 * (idc - sm))
            return jnp.take(
                blob, phys, axis=0, indices_are_sorted=ids_sorted
            )
        table = (
            blob.astype(jnp.float32)
            if c.data_type != DataType.FP32
            else blob
        )
        return jnp.take(
            table, jnp.minimum(ids, c.local_rows - 1), axis=0,
            indices_are_sorted=ids_sorted,
        )


    @staticmethod
    def _depermute_pooled(c: _WidthClass, pooled: jnp.ndarray) -> jnp.ndarray:
        """Half-layout -> logical lanes for packed classes (applied to
        the SMALL pooled output, not the row stream)."""
        if not c.packed:
            return pooled
        from torchrec_tpu.ops.tbe_pallas import _half_inv_perm

        return jnp.take(pooled, jnp.asarray(_half_inv_perm(c.width)), axis=1)


    def _class_fast_update(
        self,
        c: _WidthClass,
        blob: jnp.ndarray,  # [phys storage rows, minor] local 2-D view
        state: Dict[str, jnp.ndarray],
        optimizer: EmbeddingOptimizer,
        ids: jnp.ndarray,
        seg: jnp.ndarray,
        valid: jnp.ndarray,
        weights: Optional[jnp.ndarray],
        pg_flat: jnp.ndarray,
        d: jnp.ndarray,
        lr,
    ) -> Optional[Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]:
        """Fused backward for one width class (the sharded port of the
        single-chip segscan tail, modules/embedding_modules.py
        apply_gradients): ONE sort of the local slot stream; the sorted
        prefix (small-table region, packed first per device) feeds a
        dense-accumulator update, the windowed large region feeds the
        fused Pallas segscan kernel (run segment-sum + optimizer + row
        write in one pass, sentinels parked in the blob's scratch tail).
        Returns None when the class/optimizer lacks fast-tier support —
        the caller then takes the generic dedup + scatter path."""
        from torchrec_tpu.modules.embedding_modules import _on_tpu
        from torchrec_tpu.ops.lookup import sorted_window

        n = ids.shape[0]
        if c.scratch_rows == 0 or n == 0 or self._max_unique is None:
            return None
        if c.state_lanes:
            # colocated storage admits ONLY optimizers with a colocated
            # kernel — no generic fallback exists for interleaved rows
            if not (
                getattr(optimizer, "supports_colocated_state", False)
                and not optimizer.stochastic_rounding
            ):
                raise ValueError(
                    "colocate_rowwise_state under sharding requires an "
                    "optimizer with a colocated kernel (RowWiseAdagrad, "
                    "fp32, no stochastic rounding)"
                )
        elif not optimizer.supports_segscan_update(blob):
            return None
        interpret = not _on_tpu()
        u = min(self._max_unique, n)
        R = c.local_rows
        s = pg_flat.shape[0]
        width = c.width
        small_b = jnp.asarray(np.asarray(c.small_rows_dev, np.int32))[d]
        small_max = c.small_rows_max

        sk, ss, sw = sorted_window(
            ids, seg, valid, R, s, None, weights
        )  # full-length sorted stream (small ids first, sentinels last)
        padded = jnp.concatenate(
            [pg_flat, jnp.zeros((1, width), pg_flat.dtype)]
        )

        # ---- small-table region: sorted dense accumulator ----
        if small_max > 0:
            seg_all = jnp.where(sk < R, jnp.minimum(ss, s), s)
            g_all = jnp.take(padded, seg_all, axis=0)
            if sw is not None:
                g_all = g_all * sw[:, None].astype(g_all.dtype)
            tgt = jnp.where(sk < small_b, sk, small_max)  # non-decreasing
            acc = jax.ops.segment_sum(
                g_all, tgt, num_segments=small_max + 1,
                indices_are_sorted=True,
            )[:small_max]
            touched = (
                jax.ops.segment_sum(
                    (sk < small_b).astype(jnp.int32), tgt,
                    num_segments=small_max + 1, indices_are_sorted=True,
                )[:small_max]
                > 0
            )

        # ---- large region: run-END segscan window ----
        if small_max == 0:
            # STATIC head slice — the IDENTICAL expression to the fast
            # forward's window, so XLA CSEs the sort AND the row gather
            # below across the step (old_rows comes for free)
            sids_u, sseg_u = sk[:u], ss[:u]
            sw_u = None if sw is None else sw[:u]
            in_range = sids_u < R
        else:
            n_small = jnp.sum(
                (valid & (ids < small_b)).astype(jnp.int32)
            )
            sids_u = jax.lax.dynamic_slice(sk, (n_small,), (u,))
            sseg_u = jax.lax.dynamic_slice(ss, (n_small,), (u,))
            sw_u = (
                None if sw is None
                else jax.lax.dynamic_slice(sw, (n_small,), (u,))
            )
            in_range = (sids_u >= small_b) & (sids_u < R)
        seg_m = jnp.where(in_range, jnp.minimum(sseg_u, s), s)
        if c.packed:
            # pair kernels take HALF-LAYOUT grads; permute the TINY
            # pooled-grad buffer before the expand gather
            padded_g = jnp.concatenate(
                [padded[:, 0::2], padded[:, 1::2]], axis=1
            )
        else:
            padded_g = padded
        g_u = jnp.take(padded_g, seg_m, axis=0)
        if sw_u is not None:
            g_u = g_u * sw_u[:, None].astype(g_u.dtype)
        if c.packed:
            pp_R = R // 2  # R is 8-aligned, so even
            key_m = jnp.where(in_range, sids_u >> 1, pp_R)
            invalid_key = pp_R
        else:
            key_m = jnp.where(in_range, sids_u, R)
            invalid_key = R
        diff = key_m[1:] != key_m[:-1]
        heads = jnp.concatenate(
            [jnp.ones((1,), jnp.float32), diff.astype(jnp.float32)]
        )[:, None]
        is_end = jnp.concatenate([diff, jnp.ones((1,), jnp.bool_)])
        pos = jnp.arange(u, dtype=jnp.int32)
        real_end = is_end & in_range
        rows_end = jnp.where(real_end, key_m, invalid_key + pos)
        ends = real_end.astype(jnp.float32)[:, None]
        if c.packed:
            parity = (sids_u & 1).astype(jnp.float32)[:, None]
            old_rows = jnp.take(
                blob, jnp.minimum(sids_u >> 1, blob.shape[0] - 1),
                axis=0, indices_are_sorted=True,
            )
        elif c.row_tiles > 1:
            parity = None
            old_rows = self._class_gather(
                c, blob, jnp.minimum(sids_u, R - 1), ids_sorted=True
            )
        elif c.state_lanes:
            # colocated: (weights, state) pair gather at PHYSICAL
            # pair-base rows (two row-takes — a (2, dim)-slice gather
            # lowers to a slow sequential form on TPU); the kernel takes
            # physical pair-base targets
            sm = c.small_rows_max
            base = sm + 2 * (jnp.clip(sids_u, sm, R - 1) - sm)
            old_w = jnp.take(
                blob, base, axis=0, indices_are_sorted=True
            )
            old_s = jnp.take(
                blob, base + 1, axis=0, indices_are_sorted=True
            )
            old_rows = jnp.concatenate([old_w, old_s], axis=1)
            rows_end = sm + 2 * (rows_end - sm)
            blob, state = optimizer.segscan_update_colocated(
                blob, state, rows_end, heads, ends, g_u, old_rows,
                lr=lr, interpret=interpret,
                _chunk=self._SEGSCAN_TEST_CHUNK,
            )
            if small_max > 0:
                return self._finish_fast_small(
                    c, blob, state, optimizer, acc, touched, lr
                )
            return blob, state
        else:
            parity = None
            old_rows = jnp.take(
                blob, jnp.minimum(sids_u, R - 1), axis=0,
                indices_are_sorted=True,
            )
        blob, state = optimizer.segscan_update(
            blob, state, rows_end, heads, ends, g_u, old_rows,
            lr=lr, interpret=interpret, parity=parity, sorted_ids=sids_u,
            _chunk=self._SEGSCAN_TEST_CHUNK,
        )

        # ---- small-table dense update on the prefix ----
        if small_max > 0:
            return self._finish_fast_small(
                c, blob, state, optimizer, acc, touched, lr
            )
        return blob, state

    def _finish_fast_small(
        self, c, blob, state, optimizer, acc, touched, lr
    ):
        """Shared small-region dense-update tail of
        :meth:`_class_fast_update` (small tables pack FLAT at the blob
        head in every storage form, including colocated)."""
        small_max = c.small_rows_max
        width = c.width
        R = c.local_rows
        st_s = {
            k: v[:small_max]
            if (v.ndim and v.shape[0] == R)
            else v
            for k, v in state.items()
        }
        if c.packed:
            from torchrec_tpu.ops.tbe_pallas import (
                pack_pair_blob,
                unpack_pair_blob,
            )

            ps = small_max // 2  # small boundary is 8-aligned
            region = unpack_pair_blob(blob[:ps]).astype(jnp.bfloat16)
            tbl_s, st_s = optimizer.dense_update(
                region, st_s, acc, touched, lr=lr
            )
            blob = jax.lax.dynamic_update_slice(
                blob, pack_pair_blob(tbl_s), (0, 0)
            )
        elif c.row_tiles > 1:
            nt = c.row_tiles
            region = blob[: small_max * nt].reshape(small_max, width)
            tbl_s, st_s = optimizer.dense_update(
                region, st_s, acc, touched, lr=lr
            )
            blob = jax.lax.dynamic_update_slice(
                blob, tbl_s.reshape(small_max * nt, 128), (0, 0)
            )
        else:
            # plain AND colocated layouts keep the small region FLAT
            tbl_s, st_s = optimizer.dense_update(
                blob[:small_max], st_s, acc, touched, lr=lr
            )
            blob = jax.lax.dynamic_update_slice(blob, tbl_s, (0, 0))
        state = {
            k: jax.lax.dynamic_update_slice(
                state[k], st_s[k], (0,) * state[k].ndim
            )
            for k in state
        }
        return blob, state


    def _class_generic_update(
        self,
        c: _WidthClass,
        blob: jnp.ndarray,
        state: Dict[str, jnp.ndarray],
        optimizer: EmbeddingOptimizer,
        uids: jnp.ndarray,
        ugrads: jnp.ndarray,
        lr,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Position-layout dedup update with storage-aware fallbacks for
        optimizers without a segscan kernel (mirrors the single-chip
        packed/tile-row fallback paths)."""
        if c.packed:
            from torchrec_tpu.ops.tbe_pallas import (
                pack_pair_blob,
                unpack_pair_blob,
            )

            logical = unpack_pair_blob(blob).astype(jnp.bfloat16)
            logical, state = optimizer.update(
                logical, state, uids, ugrads, lr=lr, ids_sorted=False,
            )
            return pack_pair_blob(logical), state
        if c.row_tiles > 1:
            logical = blob.reshape(-1, c.width)
            logical, state = optimizer.update(
                logical, state, uids, ugrads, lr=lr, ids_sorted=False,
            )
            return logical.reshape(-1, 128), state
        return optimizer.update(
            blob, state, uids, ugrads, lr=lr,
            ids_sorted=False,  # position-layout dedup
        )


    def shard_params(self, unsharded: Params) -> Params:
        """Re-layout unsharded collection group params into per-device
        blobs (plus replicated DP groups)."""
        src = self._unsharded_collection()
        per_table = {
            t.name: np.asarray(src.table_slice(unsharded, t.name))
            for t in self._all_tables
        }
        return self.shard_from_tables(per_table)

    def shard_from_tables(self, per_table: Dict[str, np.ndarray]) -> Params:
        w = self._env.world_size
        params: Params = {}
        for c in self._classes:
            blob = np.zeros((w, c.local_rows, c.width), dtype=np.float32)
            for d in range(w):
                for name, col_start, row_lo, row_hi, brow in c.packing[d]:
                    blob[d, brow : brow + (row_hi - row_lo)] = per_table[name][
                        row_lo:row_hi, col_start : col_start + c.width
                    ]
            params[c.key] = device_put_global(
                class_from_logical(c, blob),
                self._sharding(self._env.shard_axis, None, None),
            )
        if self._dp is not None:
            # the DP collection owns its storage format (pair-packed
            # bf16, scratch tails, tile rows) — build through it
            dp_params = self._dp.params_from_tables(
                {
                    n: per_table[n]
                    for g in self._dp.groups
                    for n in g.table_names
                }
            )
            for k, v in dp_params.items():
                params[f"dp_{k}"] = device_put_global(v, self._sharding())
        return params

    def unshard_params(self, params: Params) -> Dict[str, np.ndarray]:
        """Gather per-table full weights (checkpoint/state_dict analog,
        reference embeddingbag.py:1231 ShardedTensor views)."""
        out: Dict[str, np.ndarray] = {}
        for t in self._all_tables:
            out[t.name] = np.zeros(
                (t.num_embeddings, t.embedding_dim), np.float32
            )
        for c in self._classes:
            blob = class_logical_blob(c, jax.device_get(params[c.key]))
            for d in range(self._env.world_size):
                for name, col_start, row_lo, row_hi, brow in c.packing[d]:
                    out[name][row_lo:row_hi, col_start : col_start + c.width] = (
                        blob[d, brow : brow + (row_hi - row_lo)]
                    )
        if self._dp is not None:
            dp_params = {
                g.key: params[f"dp_{g.key}"] for g in self._dp.groups
            }
            for name, w in self._dp.split_params(dp_params).items():
                out[name] = np.asarray(jax.device_get(w), np.float32)
        return out

    def init_optimizer(
        self, params: Params, optimizer: EmbeddingOptimizer
    ) -> Dict[str, Dict[str, jnp.ndarray]]:
        states: Dict[str, Dict[str, jnp.ndarray]] = {}
        for c in self._classes:
            # prototype carries the LOGICAL shape/dtype: optimizers key
            # behavior on it (stochastic rounding exists only for bf16);
            # pair-packed/tile-row storage forms keep logical-row state
            # (u32 pair rows would halve row counts and break momentum)
            proto = optimizer.init(
                jnp.zeros((c.local_rows, c.width), c.data_type.as_jnp())
            )
            w = self._env.world_size
            states[c.key] = {
                k: device_put_global(
                    jnp.broadcast_to(v[None], (w,) + v.shape),
                    self._sharding(self._env.shard_axis, *([None] * v.ndim)),
                )
                for k, v in proto.items()
            }
        if self._dp is not None:
            dp_params = {
                g.key: params[f"dp_{g.key}"] for g in self._dp.groups
            }
            dp_states = self._dp.init_optimizer(dp_params, optimizer)
            for k, sub in dp_states.items():
                states[f"dp_{k}"] = jax.tree_util.tree_map(
                    lambda v: device_put_global(v, self._sharding()), sub
                )
        return states

    def unshard_opt_states(
        self, opt_states, optimizer=None, params=None
    ) -> Dict[str, Dict[str, np.ndarray]]:
        """Per-table LOGICAL optimizer-state arrays (the sharded half of
        the reference's KeyedOptimizer state views,
        batched_embedding_kernel.py:1215). Row-wise state under column
        splits merges as the width-weighted mean across blocks (exact
        for mean-of-squares accumulators — same algebra as resharding);
        width-tailed state (Adam moments) re-assembles exactly. DP
        groups delegate to the DP collection's
        ``materialize_optimizer_state`` (``optimizer`` required when DP
        tables exist)."""
        out: Dict[str, Dict[str, np.ndarray]] = {
            t.name: {} for t in self._all_tables
        }
        rows_of = {
            t.name: t.num_embeddings for t in self._all_tables
        }
        dims = {t.name: t.embedding_dim for t in self._all_tables}
        acc_w: Dict[tuple, np.ndarray] = {}
        for c in self._classes:
            for k, v in opt_states[c.key].items():
                v = np.asarray(jax.device_get(v))
                if v.ndim < 2 or v.shape[1] != c.local_rows:
                    continue  # scalar state (e.g. sr_step)
                if c.state_lanes and k == "momentum":
                    # colocated: the live large-region accumulator sits
                    # in lane 0 of the blob's state rows (as a delta
                    # from initial_accumulator_value); the pytree entry
                    # is stale past the small boundary
                    if params is None or optimizer is None:
                        raise ValueError(
                            "unshard_opt_states needs `params` and "
                            "`optimizer` for colocated layouts"
                        )
                    blob = np.asarray(jax.device_get(params[c.key]))
                    sm = c.small_rows_max
                    iav = float(
                        getattr(
                            optimizer, "initial_accumulator_value", 0.0
                        )
                    )
                    large = iav + blob[:, sm + 1 :: 2, 0]
                    v = np.concatenate(
                        [v[:, :sm], large[:, : c.local_rows - sm]],
                        axis=1,
                    )
                width_tail = v.ndim >= 3 and v.shape[2] == c.width
                for d in range(self._env.world_size):
                    for name, col, row_lo, row_hi, brow in c.packing[d]:
                        seg = v[d, brow : brow + (row_hi - row_lo)]
                        if width_tail:
                            dest = out[name].setdefault(
                                k,
                                np.zeros(
                                    (rows_of[name], dims[name])
                                    + v.shape[3:],
                                    np.float32,
                                ),
                            )
                            dest[
                                row_lo:row_hi, col : col + c.width
                            ] = seg
                        else:
                            dest = out[name].setdefault(
                                k,
                                np.zeros(
                                    (rows_of[name],) + v.shape[2:],
                                    np.float32,
                                ),
                            )
                            wacc = acc_w.setdefault(
                                (name, k),
                                np.zeros(rows_of[name], np.float32),
                            )
                            dest[row_lo:row_hi] += seg * float(c.width)
                            wacc[row_lo:row_hi] += float(c.width)
        for (name, k), wacc in acc_w.items():
            v = out[name][k]
            out[name][k] = v / np.maximum(
                wacc.reshape((-1,) + (1,) * (v.ndim - 1)), 1.0
            )
        if self._dp is not None:
            if optimizer is None:
                raise ValueError(
                    "unshard_opt_states needs `optimizer` when the plan "
                    "has DATA_PARALLEL tables"
                )
            dp_states = {
                g.key: opt_states[f"dp_{g.key}"] for g in self._dp.groups
            }
            dp_params = (
                {g.key: params[f"dp_{g.key}"] for g in self._dp.groups}
                if params is not None
                else {}
            )
            for name, sub in self._dp.materialize_optimizer_state(
                dp_params, dp_states, optimizer
            ).items():
                out[name] = sub
        return out

    def shard_opt_states_from_tables(
        self,
        params: Params,
        optimizer: EmbeddingOptimizer,
        per_table: Dict[str, Dict[str, np.ndarray]],
        opt_states=None,
    ):
        """Inverse of :meth:`unshard_opt_states`: rebuild sharded state
        pytrees from per-table logical state arrays (cross-layout /
        cross-plan restore). Column blocks receive the table's row-wise
        value unchanged (exact inverse of the width-weighted-mean
        merge). Returns ``(params, opt_states)`` — params change only
        for DP groups with blob-resident state."""
        if opt_states is None:
            opt_states = self.init_optimizer(params, optimizer)
        new_states = {k: dict(v) for k, v in opt_states.items()}
        new_params = dict(params)
        w = self._env.world_size
        for c in self._classes:
            st = new_states[c.key]
            for k in list(st):
                v = np.asarray(jax.device_get(st[k]))
                if v.ndim < 2 or v.shape[1] != c.local_rows:
                    continue
                width_tail = v.ndim >= 3 and v.shape[2] == c.width
                have_all = all(
                    k in per_table.get(name, {})
                    for d in range(w)
                    for (name, *_r) in c.packing[d]
                )
                if not have_all:
                    continue
                v = np.array(v, copy=True)
                for d in range(w):
                    for name, col, row_lo, row_hi, brow in c.packing[d]:
                        src = np.asarray(per_table[name][k])
                        if width_tail:
                            v[d, brow : brow + (row_hi - row_lo)] = src[
                                row_lo:row_hi, col : col + c.width
                            ]
                        else:
                            v[d, brow : brow + (row_hi - row_lo)] = src[
                                row_lo:row_hi
                            ]
                if c.state_lanes and k == "momentum":
                    # re-interleave the large region into the blob's
                    # state-lane rows (delta from the initial value)
                    iav = float(
                        getattr(
                            optimizer, "initial_accumulator_value", 0.0
                        )
                    )
                    blob = np.array(
                        jax.device_get(new_params[c.key]), copy=True
                    )
                    sm = c.small_rows_max
                    n_large = c.local_rows - sm
                    blob[:, sm + 1 : sm + 1 + 2 * n_large : 2, 0] = (
                        v[:, sm:] - iav
                    )
                    new_params[c.key] = device_put_global(
                        jnp.asarray(blob),
                        self._sharding(
                            self._env.shard_axis, None, None
                        ),
                    )
                st[k] = device_put_global(
                    jnp.asarray(v, st[k].dtype),
                    self._sharding(
                        self._env.shard_axis, *([None] * (v.ndim - 1))
                    ),
                )
        if self._dp is not None:
            dp_params = {
                g.key: params[f"dp_{g.key}"] for g in self._dp.groups
            }
            dp_states = {
                g.key: opt_states[f"dp_{g.key}"] for g in self._dp.groups
            }
            dp_p, dp_s = self._dp.optimizer_state_from_tables(
                dp_params, optimizer, per_table, dp_states
            )
            for g in self._dp.groups:
                new_params[f"dp_{g.key}"] = device_put_global(
                    dp_p[g.key], self._sharding()
                )
                new_states[f"dp_{g.key}"] = jax.tree_util.tree_map(
                    lambda x: device_put_global(x, self._sharding()),
                    dp_s[g.key],
                )
        return new_params, new_states

    def _param_specs(self):
        P = jax.sharding.PartitionSpec
        axis = self._env.shard_axis
        specs = {c.key: P(axis, None, None) for c in self._classes}
        if self._dp is not None:
            for g in self._dp.groups:
                specs[f"dp_{g.key}"] = P()
        return specs

    def _unsharded_collection(self):
        raise NotImplementedError
