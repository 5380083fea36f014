"""Tests for JaggedTensor / KeyedJaggedTensor / KeyedTensor.

Mirrors the reference's torchrec/sparse/tests/test_jagged_tensor.py coverage:
construction, derived fields, split/permute/concat/to_dict, padded-dense
round-trips, pytree/jit transparency, zero-batch, validator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.sparse import (
    JaggedTensor,
    KeyedJaggedTensor,
    KeyedTensor,
    jagged_to_padded_dense,
    validate_keyed_jagged_tensor,
)
from tests.utils import make_numpy_kjt, to_kjt


def simple_kjt(weighted=False, capacity=None):
    # f0: [[1,2],[3]], f1: [[],[4,5,6]]
    values = [1, 2, 3, 4, 5, 6]
    lengths = np.array([[2, 1], [0, 3]], dtype=np.int32)
    cap = capacity or 8
    vals = np.zeros(cap, dtype=np.int32)
    vals[:6] = values
    w = None
    if weighted:
        w = np.ones(cap, dtype=np.float32)
        w[:6] = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6]
    return KeyedJaggedTensor(
        keys=["f0", "f1"],
        values=jnp.asarray(vals),
        lengths=jnp.asarray(lengths),
        weights=jnp.asarray(w) if w is not None else None,
    )


class TestJaggedTensor:
    def test_offsets_from_lengths(self):
        jt = JaggedTensor(
            values=jnp.arange(6), lengths=jnp.array([2, 1, 3], dtype=jnp.int32)
        )
        np.testing.assert_array_equal(jt.offsets(), [0, 2, 3, 6])

    def test_lengths_from_offsets(self):
        jt = JaggedTensor(
            values=jnp.arange(6), offsets=jnp.array([0, 2, 3, 6], dtype=jnp.int32)
        )
        np.testing.assert_array_equal(jt.lengths(), [2, 1, 3])

    def test_padded_dense_roundtrip(self):
        lengths = jnp.array([2, 0, 3], dtype=jnp.int32)
        vals = jnp.arange(1, 9, dtype=jnp.float32)  # capacity 8, 5 real
        jt = JaggedTensor(values=vals, lengths=lengths)
        dense = jt.to_padded_dense(max_length=4, padding_value=0.0)
        np.testing.assert_allclose(
            dense,
            [[1, 2, 0, 0], [0, 0, 0, 0], [3, 4, 5, 0]],
        )
        jt2 = JaggedTensor.from_dense_lengths(dense, lengths, capacity=8)
        np.testing.assert_allclose(jt2.values()[:5], vals[:5])

    def test_padded_dense_2d_values(self):
        vals = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
        offsets = jnp.array([0, 1, 4], dtype=jnp.int32)
        dense = jagged_to_padded_dense(vals, offsets, max_length=3)
        assert dense.shape == (2, 3, 2)
        np.testing.assert_allclose(dense[0, 0], [0, 1])
        np.testing.assert_allclose(dense[0, 1], [0, 0])
        np.testing.assert_allclose(dense[1], [[2, 3], [4, 5], [6, 7]])

    def test_row_ids_and_mask(self):
        jt = JaggedTensor(
            values=jnp.zeros(8, jnp.int32),
            lengths=jnp.array([2, 1, 3], dtype=jnp.int32),
        )
        np.testing.assert_array_equal(jt.row_ids(), [0, 0, 1, 2, 2, 2, 3, 3])
        np.testing.assert_array_equal(
            jt.valid_mask(), [1, 1, 1, 1, 1, 1, 0, 0]
        )

    def test_jit_transparency(self):
        jt = JaggedTensor(
            values=jnp.arange(6.0), lengths=jnp.array([2, 4], dtype=jnp.int32)
        )

        @jax.jit
        def f(t):
            return JaggedTensor(values=t.values() * 2, lengths=t.lengths())

        out = f(jt)
        np.testing.assert_allclose(out.values(), jt.values() * 2)


class TestKeyedJaggedTensor:
    def test_basic_accessors(self):
        kjt = simple_kjt()
        assert kjt.keys() == ["f0", "f1"]
        assert kjt.stride() == 2
        np.testing.assert_array_equal(kjt.lengths(), [[2, 1], [0, 3]])
        np.testing.assert_array_equal(kjt.length_per_key(), [3, 3])
        np.testing.assert_array_equal(kjt.offset_per_key(), [0, 3, 6])
        np.testing.assert_array_equal(kjt.offsets(), [0, 2, 3, 3, 6])

    def test_segment_ids(self):
        kjt = simple_kjt()
        # f0b0 f0b0 f0b1 f1b1 f1b1 f1b1 pad pad -> seg 0 0 1 3 3 3 oob oob
        np.testing.assert_array_equal(
            kjt.segment_ids(), [0, 0, 1, 3, 3, 3, 4, 4]
        )
        np.testing.assert_array_equal(
            kjt.valid_mask(), [1, 1, 1, 1, 1, 1, 0, 0]
        )

    def test_split(self):
        kjt = simple_kjt()
        a, b = kjt.split([1, 1])
        assert a.keys() == ["f0"] and b.keys() == ["f1"]
        np.testing.assert_array_equal(a.lengths(), [[2, 1]])
        np.testing.assert_array_equal(b.lengths(), [[0, 3]])
        # zero-copy: same buffer, segment ids select the right subsets
        np.testing.assert_array_equal(
            a.segment_ids(), [0, 0, 1, 2, 2, 2, 2, 2]
        )
        np.testing.assert_array_equal(
            b.segment_ids(), [2, 2, 2, 1, 1, 1, 2, 2]
        )

    def test_split_empty_segment(self):
        kjt = simple_kjt()
        a, empty, b = kjt.split([1, 0, 1])
        assert empty.keys() == []
        assert a.keys() == ["f0"] and b.keys() == ["f1"]

    def test_permute(self):
        kjt = simple_kjt()
        p = kjt.permute([1, 0])
        assert p.keys() == ["f1", "f0"]
        np.testing.assert_array_equal(p.lengths(), [[0, 3], [2, 1]])
        np.testing.assert_array_equal(p.length_per_key(), [3, 3])
        # f1 now logical key 0: its slots get segments 0*B+b
        np.testing.assert_array_equal(
            p.segment_ids(), [2, 2, 3, 1, 1, 1, 4, 4]
        )

    def test_permute_rejects_duplicates(self):
        """Zero-copy views map each slot to ONE segment: a duplicated key
        would silently contribute only to its last copy (segment_ids is
        last-wins), so duplication is an explicit error — the reference
        materializes on permute and so can duplicate; here take separate
        select_keys views instead."""
        kjt = simple_kjt()
        with pytest.raises(ValueError, match="duplicate"):
            kjt.permute([0, 1, 0])
        with pytest.raises(ValueError, match="duplicate"):
            kjt.select_keys(["f0", "f0"])

    def test_materialize_identity(self):
        kjt = simple_kjt()
        assert kjt.materialize() is kjt

    def test_materialize_permuted(self):
        kjt = simple_kjt(weighted=True)
        p = kjt.permute([1, 0]).materialize()
        assert p.keys() == ["f1", "f0"]
        np.testing.assert_array_equal(p.values()[:6], [4, 5, 6, 1, 2, 3])
        np.testing.assert_allclose(
            p.weights()[:6], [0.4, 0.5, 0.6, 0.1, 0.2, 0.3]
        )

    def test_to_dict(self):
        kjt = simple_kjt()
        d = kjt.to_dict()
        assert set(d) == {"f0", "f1"}
        np.testing.assert_array_equal(d["f0"].values()[:3], [1, 2, 3])
        np.testing.assert_array_equal(d["f0"].lengths(), [2, 1])
        np.testing.assert_array_equal(d["f1"].values()[:3], [4, 5, 6])
        np.testing.assert_array_equal(d["f1"].lengths(), [0, 3])

    def test_getitem(self):
        kjt = simple_kjt()
        jt = kjt["f1"]
        np.testing.assert_array_equal(jt.values()[:3], [4, 5, 6])

    def test_concat(self):
        a, b = simple_kjt().split([1, 1])
        merged = KeyedJaggedTensor.concat([b, a])
        assert merged.keys() == ["f1", "f0"]
        np.testing.assert_array_equal(merged.length_per_key(), [3, 3])
        np.testing.assert_array_equal(merged.values()[:3], [4, 5, 6])

    def test_select_keys(self):
        kjt = simple_kjt()
        sub = kjt.select_keys(["f1"])
        assert sub.keys() == ["f1"]

    def test_zero_batch(self):
        kjt = KeyedJaggedTensor.empty(["f0"], stride=4, capacity=2)
        np.testing.assert_array_equal(kjt.length_per_key(), [0])
        np.testing.assert_array_equal(kjt.segment_ids(), [4, 4])

    def test_jit_and_pytree(self):
        kjt = simple_kjt(weighted=True)
        leaves, treedef = jax.tree_util.tree_flatten(kjt)
        kjt2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert kjt2.keys() == kjt.keys()

        @jax.jit
        def f(k):
            return k.permute([1, 0]).segment_ids()

        np.testing.assert_array_equal(f(kjt), kjt.permute([1, 0]).segment_ids())

    def test_vmap_compatible_shapes(self):
        # static capacity means stacked batches work
        kjts = [simple_kjt(), simple_kjt()]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *kjts)
        assert stacked.values().shape == (2, 8)

    def test_random_roundtrip_oracle(self):
        rng = np.random.default_rng(0)
        nk = make_numpy_kjt(
            rng, ["a", "b", "c"], batch_size=5, num_embeddings={"a": 10, "b": 20, "c": 30}
        )
        kjt = to_kjt(nk, capacity=256)
        assert kjt.keys() == ["a", "b", "c"]
        for f, key in enumerate(nk.keys):
            np.testing.assert_array_equal(
                kjt.lengths()[f], [len(x) for x in nk.ids[key]]
            )
        validate_keyed_jagged_tensor(
            kjt, num_embeddings_per_key={"a": 10, "b": 20, "c": 30}
        )

    def test_validator_rejects_oob_ids(self):
        kjt = simple_kjt()
        with pytest.raises(ValueError):
            validate_keyed_jagged_tensor(kjt, num_embeddings_per_key={"f1": 2})


class TestKeyedTensor:
    def test_basic(self):
        kt = KeyedTensor(
            keys=["a", "b"],
            length_per_key=[2, 3],
            values=jnp.arange(10.0).reshape(2, 5),
        )
        np.testing.assert_allclose(kt["a"], [[0, 1], [5, 6]])
        np.testing.assert_allclose(kt["b"], [[2, 3, 4], [7, 8, 9]])
        assert kt.offset_per_key() == [0, 2, 5]

    def test_regroup(self):
        kt1 = KeyedTensor(["a", "b"], [1, 2], jnp.ones((2, 3)))
        kt2 = KeyedTensor(["c"], [2], jnp.full((2, 2), 2.0))
        groups = KeyedTensor.regroup([kt1, kt2], [["a", "c"], ["b"]])
        assert groups[0].shape == (2, 3)
        np.testing.assert_allclose(groups[0][:, 1:], 2.0)
        assert groups[1].shape == (2, 2)

    def test_pytree(self):
        kt = KeyedTensor(["a"], [4], jnp.ones((2, 4)))

        @jax.jit
        def f(t):
            return t["a"] * 3

        np.testing.assert_allclose(f(kt), 3.0)


def test_compact_stream_order_preserving():
    """compact_stream: valid slots compact to an order-preserving prefix."""
    import jax.numpy as jnp
    import numpy as np
    from torchrec_tpu.ops.lookup import compact_stream

    ids = jnp.asarray([5, 9, 3, 7, 1, 8], jnp.int32)
    valid = jnp.asarray([True, False, True, True, False, True])
    seg = jnp.asarray([10, 11, 12, 13, 14, 15], jnp.int32)
    ids_c, seg_c = compact_stream(valid, 4, ids, 99, seg)
    np.testing.assert_array_equal(np.asarray(ids_c), [5, 3, 7, 8])
    np.testing.assert_array_equal(np.asarray(seg_c), [10, 12, 13, 15])
    # bound smaller than valid count drops the tail
    ids_c2, = compact_stream(valid, 2, ids, 99)
    np.testing.assert_array_equal(np.asarray(ids_c2), [5, 3])
    # all-invalid pads with the sentinel
    ids_c3, = compact_stream(jnp.zeros(6, bool), 3, ids, 99)
    np.testing.assert_array_equal(np.asarray(ids_c3), [99, 99, 99])


def test_vbe_forward_backward():
    """Variable batch per key (VBE): per-key dedup'd batches expand to the
    global batch via inverse indices (reference jagged_tensor.py:2511-2552
    + embeddingbag VBE path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from torchrec_tpu import KeyedJaggedTensor
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.ops import SGD

    # key 'a': 2 dedup'd examples; key 'b': 3; global batch 4
    lengths = jnp.asarray([[2, 1, 0], [1, 1, 1]], jnp.int32)
    values = jnp.asarray([4, 5, 6, 1, 2, 3], jnp.int32)
    inv = jnp.asarray([[0, 0, 1, 1], [0, 1, 2, 2]], jnp.int32)
    kjt = KeyedJaggedTensor(
        keys=["a", "b"], values=values, lengths=lengths,
        stride_per_key=(2, 3), inverse_indices=inv,
    )
    assert kjt.variable_stride_per_key()
    assert kjt.stride_per_key() == (2, 3)

    ebc = EmbeddingBagCollection([
        EmbeddingBagConfig(name="ta", num_embeddings=10, embedding_dim=8,
                           feature_names=["a"]),
        EmbeddingBagConfig(name="tb", num_embeddings=10, embedding_dim=8,
                           feature_names=["b"]),
    ])
    params = ebc.init(jax.random.key(0))
    kt = jax.jit(ebc.apply)(params, kjt)
    assert kt.values().shape == (4, 16)
    Ta = np.asarray(ebc.table_slice(params, "ta"))
    Tb = np.asarray(ebc.table_slice(params, "tb"))
    got = np.asarray(kt.values())
    # key a dedup rows: ex0 = T[4]+T[5], ex1 = T[6]; expanded [0,0,1,1]
    np.testing.assert_allclose(got[0, :8], Ta[4] + Ta[5], rtol=1e-5)
    np.testing.assert_allclose(got[1, :8], Ta[4] + Ta[5], rtol=1e-5)
    np.testing.assert_allclose(got[2, :8], Ta[6], rtol=1e-5)
    # key b rows [1,2,3] expanded [0,1,2,2]
    np.testing.assert_allclose(got[0, 8:], Tb[1], rtol=1e-5)
    np.testing.assert_allclose(got[3, 8:], Tb[3], rtol=1e-5)

    # backward: each expanded copy contributes its cotangent
    opt = SGD(learning_rate=1.0)
    states = ebc.init_optimizer(params, opt)
    cot = jnp.ones((4, 16), jnp.float32)
    p2, _ = jax.jit(lambda p, s, k, c: ebc.apply_gradients(p, s, opt, k, c))(
        params, states, kjt, cot
    )
    Ta2 = np.asarray(ebc.table_slice(p2, "ta"))
    # row 4 appears in dedup ex0, which expands to global rows 0 and 1 -> grad 2
    np.testing.assert_allclose(Ta2[4], Ta[4] - 2.0, rtol=1e-5)
    np.testing.assert_allclose(Ta2[6], Ta[6] - 2.0, rtol=1e-5)  # rows 2,3
    # permute keeps VBE metadata aligned
    kjt_p = kjt.permute([1, 0])
    assert kjt_p.stride_per_key() == (3, 2)
    kt_p = ebc.apply(params, kjt_p.select_keys(["a", "b"]))
    np.testing.assert_allclose(np.asarray(kt_p.values()), got, rtol=1e-5)
