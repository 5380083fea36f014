"""Dict-of-features -> KJT interop (reference sparse/tensor_dict.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.sparse import KeyedJaggedTensor
from torchrec_tpu.sparse.tensor_dict import maybe_dict_to_kjt


def test_kjt_passthrough():
    kjt = KeyedJaggedTensor.from_lengths(
        ["f0"], jnp.array([1, 2], jnp.int32), jnp.array([1, 1], jnp.int32)
    )
    assert maybe_dict_to_kjt(kjt) is kjt


def test_mixed_value_forms():
    feats = {
        "a": [[1, 2], [], [3]],                      # lists of lists
        "b": (np.array([7, 8, 9]), np.array([1, 0, 2])),  # (values, lengths)
        "c": np.array([[4, -1], [5, 6], [-1, -1]]),  # dense padded
        "d": np.array([10, 11, 12]),                 # one id per example
    }
    kjt = maybe_dict_to_kjt(feats)
    assert kjt.keys() == ["a", "b", "c", "d"]
    d = kjt.to_dict()
    np.testing.assert_array_equal(np.asarray(d["a"].values())[:3], [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(d["a"].lengths()), [2, 0, 1])
    np.testing.assert_array_equal(np.asarray(d["b"].values())[:3], [7, 8, 9])
    np.testing.assert_array_equal(np.asarray(d["c"].values())[:3], [4, 5, 6])
    np.testing.assert_array_equal(np.asarray(d["c"].lengths()), [1, 2, 0])
    np.testing.assert_array_equal(np.asarray(d["d"].lengths()), [1, 1, 1])


def test_torch_tensors():
    torch = pytest.importorskip("torch")
    feats = {
        "x": torch.tensor([[1, 2], [3, -1]]),
        "y": torch.nested.nested_tensor([[5], [6, 7]]),
    }
    kjt = maybe_dict_to_kjt(feats)
    d = kjt.to_dict()
    np.testing.assert_array_equal(np.asarray(d["x"].values())[:3], [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(d["y"].values())[:3], [5, 6, 7])
    np.testing.assert_array_equal(np.asarray(d["y"].lengths()), [1, 2])


def test_capacity_and_errors():
    kjt = maybe_dict_to_kjt({"a": [[1], [2, 3]]}, capacity=64)
    assert kjt.capacity == 64
    with pytest.raises(ValueError):
        maybe_dict_to_kjt({"a": [[1], [2, 3]]}, capacity=2)
    with pytest.raises(ValueError):
        maybe_dict_to_kjt({"a": [[1]], "b": [[1], [2]]})  # batch mismatch
    with pytest.raises(TypeError):
        maybe_dict_to_kjt([1, 2, 3])


def test_weighted_jagged_tensor_keeps_weights():
    """Weights on JaggedTensor inputs survive the dict->KJT conversion
    (unweighted siblings get 1.0)."""
    from torchrec_tpu.sparse import JaggedTensor
    from torchrec_tpu.sparse.tensor_dict import maybe_dict_to_kjt

    jt = JaggedTensor(
        values=jnp.array([1, 2, 3], jnp.int32),
        lengths=jnp.array([2, 1], jnp.int32),
        weights=jnp.array([0.5, 0.25, 2.0], jnp.float32),
    )
    kjt = maybe_dict_to_kjt(
        {"w": jt, "plain": np.array([7, 8])}, capacity=8
    )
    w = np.asarray(kjt.weights())
    np.testing.assert_allclose(w[:5], [0.5, 0.25, 2.0, 1.0, 1.0])
