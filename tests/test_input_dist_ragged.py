"""Ragged exchange mode on the CPU mesh via an emulated ragged-all-to-all.

XLA:CPU has no `ragged-all-to-all` lowering (the suite otherwise covers the
padded mode only), so these tests monkeypatch ``jax.lax.ragged_all_to_all``
with an all_gather-based emulation of its documented semantics. Everything
else — the fair-share capacity clamp, packed receive offsets, and the
reverse-exchange alignment back into each source's owner-sorted stream
(reference SequenceEmbeddingsAllToAll, dist_data.py:1974) — is the real
production code in distributed/input_dist.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.distributed import (
    ShardingEnv,
    column_wise,
    construct_module_sharding_plan,
    data_parallel,
    row_wise,
)
from torchrec_tpu.distributed.input_dist import exchange, reverse_exchange

WORLD = 8


def _emulated_ragged_all_to_all(
    operand, output, input_offsets, send_sizes, output_offsets, recv_sizes,
    *, axis_name,
):
    """jax.lax.ragged_all_to_all semantics, built from all_gather: device s
    sends operand[input_offsets[d] : +send_sizes[d]] to device d, landing at
    output[output_offsets_of_s[d] : +size]; untouched output entries keep
    their input value."""
    all_op = jax.lax.all_gather(operand, axis_name)  # [W, n, ...]
    all_io = jax.lax.all_gather(input_offsets, axis_name)  # [W, W]
    all_ss = jax.lax.all_gather(send_sizes, axis_name)
    all_oo = jax.lax.all_gather(output_offsets, axis_name)
    me = jax.lax.axis_index(axis_name)
    out = output
    j = jnp.arange(output.shape[0], dtype=jnp.int32)
    for s in range(all_op.shape[0]):
        oo = all_oo[s, me]
        ss = all_ss[s, me]
        io = all_io[s, me]
        mask = (j >= oo) & (j < oo + ss)
        src_pos = jnp.clip(io + (j - oo), 0, all_op.shape[1] - 1)
        vals = jnp.take(all_op[s], src_pos, axis=0)
        out = jnp.where(mask.reshape((-1,) + (1,) * (out.ndim - 1)), vals, out)
    return out


def _mesh():
    return jax.sharding.Mesh(np.array(jax.devices()[:WORLD]), ("x",))


def test_emulation_semantics():
    """Sanity: each device rotates one element to the next device."""
    P = jax.sharding.PartitionSpec

    def f(op, out):
        io = jnp.zeros((WORLD,), jnp.int32)
        ss = jnp.ones((WORLD,), jnp.int32)
        oo = jnp.zeros((WORLD,), jnp.int32)
        rs = jnp.ones((WORLD,), jnp.int32)
        return _emulated_ragged_all_to_all(
            op, out, io, ss, oo, rs, axis_name="x"
        )

    op = jnp.arange(WORLD, dtype=jnp.float32).reshape(WORLD, 1) * 10
    out0 = jnp.full((WORLD, 1), -1.0)
    r = jax.jit(
        jax.shard_map(f, mesh=_mesh(), in_specs=(P("x"), P("x")),
                      out_specs=P("x"))
    )(op, out0)
    # every device broadcast its single element to offset 0 of every other
    # device; the LAST writer in source order wins in the emulation loop,
    # but with one slot each device receives from all 8 and slot 0 ends as
    # source 7's value
    np.testing.assert_array_equal(np.asarray(r).ravel(), np.full(WORLD, 70.0))


def _clamp_oracle(counts, recv_cap):
    """Numpy replica of exchange()'s fair-share clamp: send_ok[s, d]."""
    cum_before = np.cumsum(counts, axis=0) - counts
    return np.minimum(counts, np.maximum(recv_cap - cum_before, 0))


def test_ragged_exchange_and_reverse_under_drops(monkeypatch):
    """Tight receive capacity: the echo payload returned by
    reverse_exchange must land at each source's owner-sorted positions —
    delivered slots come back exact, dropped slots come back zero. (This
    pins the in_off-vs-clamped-cumsum alignment: with drops, using the
    clamped send offsets on the reverse path shifts every later segment.)"""
    monkeypatch.setattr(
        jax.lax, "ragged_all_to_all", _emulated_ragged_all_to_all
    )
    P = jax.sharding.PartitionSpec
    n = 16
    recv_cap = 8  # global demand per owner ~14 -> guaranteed drops
    rng = np.random.default_rng(7)
    owners = np.sort(
        rng.integers(0, WORLD + 1, size=(WORLD, n)), axis=1
    ).astype(np.int32)
    payload = (
        np.arange(WORLD, dtype=np.int32)[:, None] * 1000
        + np.arange(n, dtype=np.int32)[None, :]
        + 1
    )

    def f(owner, pay):
        owner = owner.reshape(n)
        pay = pay.reshape(n)
        (r,), valid, dropped, route = exchange(
            (owner, pay), recv_cap, "x", WORLD, mode="ragged"
        )
        back = reverse_exchange(route, r, "x", WORLD)
        return (
            r[None], valid[None], dropped.reshape(1), back[None],
        )

    r, valid, dropped, back = jax.jit(
        jax.shard_map(
            f, mesh=_mesh(), in_specs=(P("x"), P("x")),
            out_specs=(P("x"), P("x"), P("x"), P("x")),
        )
    )(jnp.asarray(owners), jnp.asarray(payload))
    r, valid, dropped, back = (np.asarray(a) for a in (r, valid, dropped, back))

    counts = np.zeros((WORLD, WORLD), np.int64)  # [src, dst]
    for s in range(WORLD):
        for d in range(WORLD):
            counts[s, d] = int((owners[s] == d).sum())
    send_ok = _clamp_oracle(counts, recv_cap)
    in_off = np.cumsum(counts, axis=1) - counts  # [src, dst]

    # per-source dropped counter
    np.testing.assert_array_equal(
        dropped, (counts - send_ok).sum(axis=1)
    )
    # received stream on each dst: packed src-order concatenation of each
    # source's clamped segment prefix
    for d in range(WORLD):
        exp = np.concatenate(
            [
                payload[s, in_off[s, d] : in_off[s, d] + send_ok[s, d]]
                for s in range(WORLD)
            ]
        )
        tot = len(exp)
        assert valid[d, :tot].all() and not valid[d, tot:].any()
        np.testing.assert_array_equal(r[d, :tot], exp)
    # reverse echo: delivered slots return their payload at their own
    # sorted-stream position; dropped and invalid slots return zero
    for s in range(WORLD):
        sent_so_far = np.zeros(WORLD, np.int64)
        for j in range(n):
            d = owners[s, j]
            if d < WORLD and sent_so_far[d] < send_ok[s, d]:
                assert back[s, j] == payload[s, j], (s, j, d)
                sent_so_far[d] += 1
            else:
                assert back[s, j] == 0, (s, j, d)


def test_sequence_bucketized_ragged_matches_unsharded(monkeypatch):
    """Full EC bucketized forward in ragged mode (emulated collective)
    matches the unsharded module — the integration the real TPU runs."""
    import torchrec_tpu.distributed.input_dist as idist
    from torchrec_tpu.distributed import ShardedEmbeddingCollection
    from tests.test_input_dist import _build_ec

    monkeypatch.setattr(
        jax.lax, "ragged_all_to_all", _emulated_ragged_all_to_all
    )
    monkeypatch.setattr(idist, "default_exchange_mode", lambda: "ragged")

    ec, params, kjt, tables, _vals = _build_ec()
    e = ShardingEnv.from_devices(jax.devices()[:WORLD])
    plan = construct_module_sharding_plan(
        tables,
        {"t0": row_wise(), "t1": column_wise(ranks=[1, 5]),
         "t2": data_parallel()},
        e,
    )
    sec = ShardedEmbeddingCollection(ec, plan, e)
    sp = sec.shard_params(params)
    exp = ec.apply(params, kjt)
    got = sec.apply_bucketized(sp, kjt)
    for k in exp:
        nvalid = int(np.asarray(exp[k].lengths()).sum())
        np.testing.assert_allclose(
            np.asarray(got[k].values())[:nvalid],
            np.asarray(exp[k].values())[:nvalid],
            rtol=1e-4, atol=1e-4,
        )


import pytest
from hypothesis import given, settings, strategies as st


@pytest.mark.slow
@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.sampled_from([4, 9, 16]),
    recv_cap=st.sampled_from([4, 8, 16, 40]),
    mode=st.sampled_from(["padded", "ragged"]),
)
def test_exchange_reverse_property_sweep(seed, n, recv_cap, mode):
    """Both exchange modes, random owner streams, arbitrary capacity
    pressure: delivered slots echo exactly, dropped/invalid slots echo
    zero, per-device drop counters account for every undelivered slot.
    (Ragged runs on the all_gather emulation of the collective.)"""
    if mode == "padded" and recv_cap % WORLD:
        recv_cap = -(-recv_cap // WORLD) * WORLD
    orig = jax.lax.ragged_all_to_all
    jax.lax.ragged_all_to_all = _emulated_ragged_all_to_all
    try:
        P = jax.sharding.PartitionSpec
        rng = np.random.default_rng(seed)
        owners = np.sort(
            rng.integers(0, WORLD + 1, size=(WORLD, n)), axis=1
        ).astype(np.int32)
        payload = rng.integers(1, 1 << 20, size=(WORLD, n)).astype(np.int32)

        def f(owner, pay):
            owner = owner.reshape(n)
            pay = pay.reshape(n)
            (r,), valid, dropped, route = exchange(
                (owner, pay), recv_cap, "x", WORLD, mode=mode
            )
            back = reverse_exchange(route, r, "x", WORLD)
            return valid[None], dropped.reshape(1), back[None]

        valid, dropped, back = jax.jit(
            jax.shard_map(
                f, mesh=_mesh(), in_specs=(P("x"), P("x")),
                out_specs=(P("x"), P("x"), P("x")),
            )
        )(jnp.asarray(owners), jnp.asarray(payload))
        valid, dropped, back = (
            np.asarray(a) for a in (valid, dropped, back)
        )

        counts = np.zeros((WORLD, WORLD), np.int64)
        for s in range(WORLD):
            for d_ in range(WORLD):
                counts[s, d_] = int((owners[s] == d_).sum())
        if mode == "ragged":
            send_ok = _clamp_oracle(counts, recv_cap)
        else:
            send_ok = np.minimum(counts, recv_cap // WORLD)
        np.testing.assert_array_equal(
            dropped.reshape(WORLD), (counts - send_ok).sum(axis=1)
        )
        for s in range(WORLD):
            sent = np.zeros(WORLD, np.int64)
            for j in range(n):
                d_ = owners[s, j]
                if d_ < WORLD and sent[d_] < send_ok[s, d_]:
                    assert back[s, j] == payload[s, j], (mode, s, j)
                    sent[d_] += 1
                else:
                    assert back[s, j] == 0, (mode, s, j)
        # receiver-side: number of valid slots == what sources delivered
        np.testing.assert_array_equal(
            valid.reshape(WORLD, -1).sum(axis=1), send_ok.sum(axis=0)
        )
    finally:
        jax.lax.ragged_all_to_all = orig
