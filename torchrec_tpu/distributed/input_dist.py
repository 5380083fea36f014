"""Bucketized sparse input distribution (KJT all-to-all).

Reference parity: torchrec/distributed/embedding_sharding.py:271
(bucketize_kjt_before_all2all), torchrec/distributed/sharding/
rw_sharding.py:361 (RwSparseFeaturesDist) and torchrec/distributed/
dist_data.py:1137 (KJTAllToAll: splits a2a then values/lengths a2a).

TPU-first design — the reference's three CUDA kernels + two NCCL phases
collapse into one owner-sort plus one collective:

* Each device holds only its LOCAL batch shard's slot stream (static
  capacity ``cap_local`` ≈ cap_global / W) — per-device sparse work is
  O(global ids / W), which is the whole point (the replicated-input SPMD
  path scans the full global stream on every device and cannot scale).

* The SENDER pre-resolves everything the receiver needs: placement arrays
  (id_lo/id_hi/blob_off/vf_pos, see distributed/_layout.py) are replicated
  jit constants, so the sender converts each global id into the *receiver's*
  local blob row and its pooling segment. The wire payload is
  ``(local_row, pool_seg[, weight])`` — the receiver does a plain local
  gather + segment-sum with zero remapping (the reference ships raw ids and
  re-bucketizes on the receiver).

* Slots are sorted by owner device (multi-operand ``lax.sort``, owner is
  the single key) so each destination's slots form one contiguous segment —
  the layout both exchange primitives below want.

Two exchange primitives behind one interface:

* ``mode="ragged"``: ``jax.lax.ragged_all_to_all`` — one variable-split
  collective into a shared receive buffer (capacity ``recv_cap``). TPU only
  (XLA:CPU has no ragged-a2a lowering).
* ``mode="padded"``: fixed per-(src,dst) segments of ``recv_cap // W`` slots
  through a dense ``all_to_all`` (the reference's max-split padding
  fallback). Works everywhere; under skew it drops slots sooner than the
  ragged form (per-pair cap instead of a shared pool).

Both modes DROP slots beyond capacity and return the dropped count so the
module layer can surface it as a metric (same documented contract as
``max_unique_gradient_rows``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BucketizedStream",
    "StackedSparse",
    "bucketize_for_class",
    "exchange",
    "default_exchange_mode",
    "shard_kjt_arrays",
    "stack_sparse",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StackedSparse:
    """Per-device sparse batch streams for the bucketized input dist:
    leading axis = device (feed through shard_map with P(shard) specs).
    The input-pipeline analog of the reference's per-rank KJT batches."""

    values: jnp.ndarray  # [W, cap_local] global ids
    lengths: jnp.ndarray  # [W, F, B_local]
    weights: Optional[jnp.ndarray]  # [W, cap_local] or None

    def local(self):
        """Strip the leading device axis (call inside shard_map)."""
        return (
            self.values.reshape(self.values.shape[1:]),
            self.lengths.reshape(self.lengths.shape[1:]),
            None
            if self.weights is None
            else self.weights.reshape(self.weights.shape[1:]),
        )


class BucketizedStream(NamedTuple):
    """Received slot stream after the owner exchange (all ``[recv_cap]``)."""

    local_rows: jnp.ndarray  # receiver-local blob row per slot
    pool_seg: jnp.ndarray  # vf * B_global + global batch (OOB = invalid)
    weights: Optional[jnp.ndarray]  # per-slot weights or None
    valid: jnp.ndarray  # bool mask of real slots
    dropped: jnp.ndarray  # scalar int32: slots lost to capacity (this dev)


def default_exchange_mode() -> str:
    """ragged on TPU, padded elsewhere (XLA:CPU lacks ragged-all-to-all)."""
    try:
        return "ragged" if jax.devices()[0].platform == "tpu" else "padded"
    except Exception:  # pragma: no cover - no backend at trace time
        return "padded"


def bucketize_for_class(
    c,  # distributed/_layout.py WidthClass
    values: jnp.ndarray,  # [cap_local] global ids (local batch stream)
    slot_feature: jnp.ndarray,  # [cap_local] logical feature (pad -> F)
    slot_batch: jnp.ndarray,  # [cap_local] LOCAL batch position
    slot_valid: jnp.ndarray,  # [cap_local] bool
    weights: Optional[jnp.ndarray],
    b_local: int,
    d: jnp.ndarray,  # this device's index on the shard axis
    world: int,
) -> Tuple[jnp.ndarray, ...]:
    """Owner-sorted send stream for one width class.

    Returns ``(owner, local_rows, pool_seg[, weights])`` of length
    ``cap_local * max_blocks``, sorted ascending by owner; invalid slots
    carry ``owner == world`` and sort to the back. ``local_rows`` are
    RECEIVER-local blob rows; ``pool_seg`` is the receiver-side pooling
    segment ``vf * B_global + d * b_local + slot_batch``.
    """
    b_global = b_local * world
    id_lo = jnp.asarray(c.id_lo)  # [W, F+1, MB]
    id_hi = jnp.asarray(c.id_hi)
    blob_off = jnp.asarray(c.blob_off)
    vf_pos = jnp.asarray(c.vf_pos)  # [F+1, MB]

    owners, rows, segs = [], [], []
    for blk in range(c.max_blocks):
        pos = jnp.take(vf_pos[:, blk], slot_feature)  # [cap]
        # [W, cap] range membership (at most one owner true per slot)
        lo = jnp.take(id_lo[:, :, blk], slot_feature, axis=1)  # [W, cap]
        hi = jnp.take(id_hi[:, :, blk], slot_feature, axis=1)
        off = jnp.take(blob_off[:, :, blk], slot_feature, axis=1)
        hit = (
            (values[None, :] >= lo)
            & (values[None, :] < hi)
            & (hi > lo)
            & (pos >= 0)[None, :]
            & slot_valid[None, :]
        )  # [W, cap]
        any_hit = jnp.any(hit, axis=0)
        dev_iota = jnp.arange(world, dtype=jnp.int32)[:, None]
        owner = jnp.where(
            any_hit,
            jnp.sum(jnp.where(hit, dev_iota, 0), axis=0),
            jnp.int32(world),
        )
        # receiver-local row, resolved on the sender (vectorized over the
        # [W, cap] mask — no scalar (owner, feature) gathers)
        local_row = jnp.sum(
            jnp.where(hit, values[None, :] - lo + off, 0), axis=0
        )
        seg = jnp.where(
            any_hit,
            pos * b_global + d * b_local + slot_batch,
            jnp.int32(c.num_vf * b_global),
        )
        owners.append(owner)
        rows.append(local_row.astype(jnp.int32))
        segs.append(seg.astype(jnp.int32))

    owner = jnp.concatenate(owners)
    local_rows = jnp.concatenate(rows)
    pool_seg = jnp.concatenate(segs)
    ops = [owner, local_rows, pool_seg]
    if weights is not None:
        ops.append(jnp.tile(weights, c.max_blocks))
    return jax.lax.sort(tuple(ops), num_keys=1)


def bucketize_sequence_for_class(
    c,  # distributed/_layout.py WidthClass
    values: jnp.ndarray,  # [cap_local] global ids
    slot_feature: jnp.ndarray,  # [cap_local] logical feature (pad -> F)
    slot_valid: jnp.ndarray,  # [cap_local] bool
    world: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sequence-path variant of :func:`bucketize_for_class`: instead of a
    pooling segment, the third operand is the slot's position in the
    concatenated ``[cap_local * max_blocks]`` stream, so the rows returned
    by :func:`reverse_exchange` can be unsorted back to slot order.

    Returns ``(owner, local_rows, stream_pos)`` sorted ascending by owner.
    """
    id_lo = jnp.asarray(c.id_lo)
    id_hi = jnp.asarray(c.id_hi)
    blob_off = jnp.asarray(c.blob_off)
    vf_pos = jnp.asarray(c.vf_pos)
    owners, rows = [], []
    for blk in range(c.max_blocks):
        pos = jnp.take(vf_pos[:, blk], slot_feature)
        lo = jnp.take(id_lo[:, :, blk], slot_feature, axis=1)  # [W, cap]
        hi = jnp.take(id_hi[:, :, blk], slot_feature, axis=1)
        off = jnp.take(blob_off[:, :, blk], slot_feature, axis=1)
        hit = (
            (values[None, :] >= lo)
            & (values[None, :] < hi)
            & (hi > lo)
            & (pos >= 0)[None, :]
            & slot_valid[None, :]
        )
        any_hit = jnp.any(hit, axis=0)
        dev_iota = jnp.arange(world, dtype=jnp.int32)[:, None]
        owner = jnp.where(
            any_hit,
            jnp.sum(jnp.where(hit, dev_iota, 0), axis=0),
            jnp.int32(world),
        )
        local_row = jnp.sum(
            jnp.where(hit, values[None, :] - lo + off, 0), axis=0
        )
        owners.append(owner)
        rows.append(local_row.astype(jnp.int32))
    owner = jnp.concatenate(owners)
    local_rows = jnp.concatenate(rows)
    stream_pos = jnp.arange(owner.shape[0], dtype=jnp.int32)
    return jax.lax.sort((owner, local_rows, stream_pos), num_keys=1)


def _owner_counts(sorted_owner: jnp.ndarray, world: int) -> jnp.ndarray:
    """Per-destination slot counts from the owner-sorted key stream."""
    bounds = jnp.searchsorted(
        sorted_owner, jnp.arange(world + 1, dtype=sorted_owner.dtype)
    ).astype(jnp.int32)
    return bounds[1:] - bounds[:-1]


def exchange(
    sorted_ops: Tuple[jnp.ndarray, ...],  # owner-sorted (owner, *payloads)
    recv_cap: int,
    axis_name: str,
    world: int,
    mode: str = "padded",
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray, jnp.ndarray, dict]:
    """All-to-all the owner-sorted payloads to their owners.

    Returns ``(received_payloads, valid [recv_cap] bool, dropped scalar,
    route)``. ``received_payloads`` mirrors ``sorted_ops[1:]``; entries
    where ``valid`` is False are junk. ``dropped`` counts slots THIS device
    failed to deliver (capacity clamp), psum'able for a global counter.
    ``route`` feeds :func:`reverse_exchange` (sequence output dist).
    """
    owner = sorted_ops[0]
    payloads = sorted_ops[1:]
    counts = _owner_counts(owner, world)  # [W]
    in_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )

    if mode == "ragged":
        # clamp sends so every destination's total stays within recv_cap:
        # each source may use at most its fair share of the remaining pool.
        # All sources see the same all-gathered counts, so the clamp is
        # consistent on sender and receiver.
        all_counts = jax.lax.all_gather(counts, axis_name)  # [W_src, W_dst]
        me = jax.lax.axis_index(axis_name)
        cum_before = jnp.cumsum(all_counts, axis=0) - all_counts  # excl.
        send_ok = jnp.minimum(
            all_counts, jnp.maximum(recv_cap - cum_before, 0)
        )  # [W_src, W_dst] clamped sends
        send_sizes = send_ok[me]  # [W_dst] my clamped sends
        # where my segment starts on each destination: exclusive cumsum of
        # the CLAMPED sends over sources
        out_off = (jnp.cumsum(send_ok, axis=0) - send_ok)[me].astype(
            jnp.int32
        )
        recv_sizes = send_ok[:, me].astype(jnp.int32)
        dropped = jnp.sum(counts - send_sizes).astype(jnp.int32)
        recvd = []
        for p in payloads:
            out = jnp.zeros((recv_cap,) + p.shape[1:], p.dtype)
            recvd.append(
                jax.lax.ragged_all_to_all(
                    p,
                    out,
                    in_off,
                    send_sizes.astype(jnp.int32),
                    out_off,
                    recv_sizes,
                    axis_name=axis_name,
                )
            )
        total_recv = jnp.sum(recv_sizes)
        valid = jnp.arange(recv_cap, dtype=jnp.int32) < total_recv
        # ragged-a2a output positions are packed [sum recv_sizes) by
        # construction of out_off
        route = {
            "mode": "ragged",
            "n_send": owner.shape[0],
            "recv_cap": recv_cap,
            "owner": owner,
            "in_off": in_off,
            "all_counts": all_counts,
            "send_ok": send_ok,
            "send_sizes": send_sizes,
            "recv_sizes": recv_sizes,
        }
        return tuple(recvd), valid, dropped, route

    if mode != "padded":
        raise ValueError(f"unknown exchange mode {mode!r}")

    cap_pair = recv_cap // world
    if cap_pair <= 0:
        raise ValueError(
            f"recv_cap {recv_cap} must be >= world size {world}"
        )
    sent = jnp.minimum(counts, cap_pair)
    dropped = jnp.sum(counts - sent).astype(jnp.int32)
    # gather the sorted stream into [W, cap_pair] fixed segments
    j = jnp.arange(world * cap_pair, dtype=jnp.int32)
    dst = j // cap_pair
    slot = j % cap_pair
    src_idx = jnp.take(in_off, dst) + slot
    in_seg = slot < jnp.take(sent, dst)
    src_idx = jnp.where(in_seg, src_idx, owner.shape[0] - 1)

    # exchange the per-pair counts so the receiver can mask junk
    sent_recv = jax.lax.all_to_all(
        sent.astype(jnp.int32), axis_name, split_axis=0, concat_axis=0,
        tiled=True,
    )  # [W]: sent_recv[s] = slots device s sent me
    valid = (
        jnp.arange(world * cap_pair, dtype=jnp.int32) % cap_pair
    ) < jnp.repeat(sent_recv, cap_pair)

    recvd = []
    for p in payloads:
        send_buf = jnp.take(p, src_idx, axis=0)
        send_buf = jnp.where(
            in_seg.reshape((-1,) + (1,) * (p.ndim - 1)),
            send_buf,
            jnp.zeros_like(send_buf),
        )
        send_buf = send_buf.reshape((world, cap_pair) + p.shape[1:])
        r = jax.lax.all_to_all(
            send_buf, axis_name, split_axis=0, concat_axis=0, tiled=True
        )  # [W, cap_pair]: row s = from device s
        recvd.append(r.reshape((world * cap_pair,) + p.shape[1:]))
    route = {
        "mode": "padded",
        "n_send": owner.shape[0],
        "cap_pair": cap_pair,
        "owner": owner,
        "in_off": in_off,
        "sent": sent,
    }
    return tuple(recvd), valid, dropped, route


def reverse_exchange(
    route: dict,
    payload: jnp.ndarray,  # [recv_cap, ...] rows computed at the owner
    axis_name: str,
    world: int,
) -> jnp.ndarray:
    """Send owner-side per-slot results BACK to their source devices — the
    sequence output dist (reference SequenceEmbeddingsAllToAll,
    dist_data.py:1974, is this transpose pair with KJTAllToAll).

    ``payload`` rows must align 1:1 with the received stream of the
    :func:`exchange` that produced ``route``. Returns ``[n_send, ...]``
    rows aligned with the owner-SORTED send stream; slots that were dropped
    by the capacity clamp come back as zeros.
    """
    if route["mode"] == "ragged":
        me = jax.lax.axis_index(axis_name)
        recv_sizes = route["recv_sizes"]  # what each src sent me
        recv_off = (jnp.cumsum(recv_sizes) - recv_sizes).astype(jnp.int32)
        # my returned segment lands at src's sorted-stream offset of the
        # slots it destined to ME — the exclusive cumsum of its UNCLAMPED
        # counts (src's in_off[me]). Using the clamped sends here would
        # shift every segment after a capacity-dropped one.
        all_counts = route["all_counts"]  # [W_src, W_dst] unclamped
        dst_off = (
            jnp.cumsum(all_counts, axis=1) - all_counts
        )[:, me].astype(jnp.int32)  # [W_src]
        out = jnp.zeros((route["n_send"],) + payload.shape[1:], payload.dtype)
        return jax.lax.ragged_all_to_all(
            payload,
            out,
            recv_off,
            recv_sizes,
            dst_off,
            route["send_sizes"].astype(jnp.int32),
            axis_name=axis_name,
        )

    cap_pair = route["cap_pair"]
    buf = payload.reshape((world, cap_pair) + payload.shape[1:])
    back = jax.lax.all_to_all(
        buf, axis_name, split_axis=0, concat_axis=0, tiled=True
    ).reshape((world * cap_pair,) + payload.shape[1:])
    # back[dst*cap_pair + j] = result for my sorted slot in_off[dst] + j
    owner = route["owner"]
    k = jnp.arange(route["n_send"], dtype=jnp.int32)
    own_c = jnp.minimum(owner, world - 1)
    j = k - jnp.take(route["in_off"], own_c)
    ok = (owner < world) & (j < jnp.take(route["sent"], own_c))
    idx = jnp.where(ok, own_c * cap_pair + j, 0)
    rows = jnp.take(back, idx, axis=0)
    return jnp.where(
        ok.reshape((-1,) + (1,) * (payload.ndim - 1)),
        rows,
        jnp.zeros_like(rows),
    )


def shard_kjt_arrays(
    kjt,  # KeyedJaggedTensor (global batch, module feature order)
    world: int,
    cap_local: Optional[int] = None,
    return_positions: bool = False,
):
    """HOST-side split of a global-batch KJT into per-device local streams.

    Returns ``(values [W, cap_local], lengths [W, F, B_local],
    weights [W, cap_local] | None)`` — feed through ``shard_map`` with
    ``P(axis)`` specs so each device sees only its batch shard (the input
    pipeline analog of the reference's per-rank batches). ``cap_local``
    defaults to ``ceil(capacity / world)`` rounded up to 8.
    ``return_positions=True`` appends ``[W, cap_local]`` int64 positions of
    each local slot in the MATERIALIZED global stream (-1 = padding) for
    host-side reassembly of sequence outputs.
    """
    kjt = kjt.materialize()
    b = kjt.stride()
    if b % world:
        raise ValueError(f"global batch {b} not divisible by world {world}")
    b_local = b // world
    lengths = np.asarray(jax.device_get(kjt.lengths()))  # [F, B]
    values = np.asarray(jax.device_get(kjt.values()))
    w_arr = kjt.weights_or_none()
    w_np = None if w_arr is None else np.asarray(jax.device_get(w_arr))
    f = lengths.shape[0]
    offsets = np.concatenate([[0], np.cumsum(lengths.reshape(-1))])
    if cap_local is None:
        cap_local = int(-(-max(int(lengths.reshape(f, world, b_local).sum(
            axis=(0, 2)).max()), 1) // 8) * 8)
    out_vals = np.zeros((world, cap_local), values.dtype)
    out_lens = np.zeros((world, f, b_local), lengths.dtype)
    out_w = None if w_np is None else np.zeros((world, cap_local), w_np.dtype)
    out_pos = np.full((world, cap_local), -1, np.int64)
    cursor = np.zeros(world, np.int64)
    for fi in range(f):
        for bi in range(b):
            dvc = bi // b_local
            n = int(lengths[fi, bi])
            st = int(offsets[fi * b + bi])
            c0 = int(cursor[dvc])
            n_fit = min(n, cap_local - c0)
            out_vals[dvc, c0 : c0 + n_fit] = values[st : st + n_fit]
            if out_w is not None:
                out_w[dvc, c0 : c0 + n_fit] = w_np[st : st + n_fit]
            out_pos[dvc, c0 : c0 + n_fit] = np.arange(st, st + n_fit)
            out_lens[dvc, fi, bi % b_local] = n_fit
            cursor[dvc] += n_fit
    out = (
        jnp.asarray(out_vals),
        jnp.asarray(out_lens),
        None if out_w is None else jnp.asarray(out_w),
    )
    return out + (out_pos,) if return_positions else out


def stack_sparse(
    kjt, world: int, cap_local: Optional[int] = None
) -> StackedSparse:
    """``shard_kjt_arrays`` packaged as a :class:`StackedSparse` batch."""
    vals, lens, wts = shard_kjt_arrays(kjt, world, cap_local)
    return StackedSparse(values=vals, lengths=lens, weights=wts)
