"""C++ dynamic embedding: id transformer + parameter server.

Reference analogs: test/cpp/dynamic_embedding (naive/cacheline transformer,
LFU/LRU strategy) and contrib python wrapper tests.
"""

import numpy as np
import pytest

from torchrec_tpu.dynamic_embedding import (
    IDTransformer,
    IDTransformerCollection,
    ParameterServer,
)


def test_transform_stable_and_bounded():
    t = IDTransformer(capacity=8)
    gids = np.array([10**12, 5, 10**12, 999999937], np.int64)
    cids, eg, es = t.transform(gids)
    assert cids[0] == cids[2]  # same gid -> same slot
    assert len(set(cids.tolist())) == 3
    assert (cids >= 0).all() and (cids < 8).all()
    # stable across calls
    cids2, _, _ = t.transform(gids)
    np.testing.assert_array_equal(cids, cids2)
    assert len(t) == 3


def test_eviction_coldest_first():
    t = IDTransformer(capacity=4)
    t.transform(np.array([1, 2, 3, 4], np.int64))
    # heat up 1 and 2
    for _ in range(5):
        t.transform(np.array([1, 2], np.int64))
    eg, es = t.evict(2)
    assert set(eg.tolist()) == {3, 4}  # cold ids evicted first
    assert len(t) == 2
    # slots are recycled for new ids
    cids, _, _ = t.transform(np.array([100, 200], np.int64))
    assert set(cids.tolist()) == set(es.tolist())


def test_auto_evict_on_full():
    t = IDTransformer(capacity=4)
    t.transform(np.array([1, 2, 3, 4], np.int64))
    cids, eg, es = t.transform(np.array([5], np.int64))
    assert len(eg) >= 1 and (cids >= 0).all()
    with pytest.raises(RuntimeError):
        IDTransformer(capacity=2).transform(np.array([1, 2, 3], np.int64))


def test_export_restore_roundtrip():
    t = IDTransformer(capacity=8)
    t.transform(np.array([7, 8, 9], np.int64))
    gids, slots = t.export_state()
    t2 = IDTransformer(capacity=8)
    t2.restore_state(gids, slots)
    a, _, _ = t.transform(np.array([7, 8, 9], np.int64), auto_evict=False)
    b, _, _ = t2.transform(np.array([7, 8, 9], np.int64), auto_evict=False)
    np.testing.assert_array_equal(a, b)


def test_parameter_server_push_pull():
    ps = ParameterServer(dim=4)
    gids = np.array([10, 20], np.int64)
    rows = np.arange(8, dtype=np.float32).reshape(2, 4)
    ps.push(gids, rows)
    got, hits = ps.pull(np.array([20, 10, 99], np.int64))
    assert hits == 2
    np.testing.assert_allclose(got[0], rows[1])
    np.testing.assert_allclose(got[1], rows[0])
    np.testing.assert_allclose(got[2], 0.0)
    assert len(ps) == 2


def test_transformer_collection_kjt_stream():
    col = IDTransformerCollection(
        capacities={"t0": 8, "t1": 8},
        feature_to_table={"f0": "t0", "f1": "t1"},
        dims={"t0": 4, "t1": 4},
    )
    keys = ["f0", "f1"]
    lengths = np.array([[2, 1], [1, 1]], np.int32)
    values = np.array([10**10, 10**10 + 1, 10**10, 55, 66], np.int64)
    out, evictions = col.transform_numpy(keys, values, lengths)
    assert out.dtype == np.int32
    assert out[0] == out[2]  # same raw id same slot
    assert (out[:3] < 8).all() and (out[3:5] < 8).all()
    assert not evictions
