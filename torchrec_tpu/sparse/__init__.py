"""Core sparse types: JaggedTensor / KeyedJaggedTensor / KeyedTensor (reference torchrec/sparse/jagged_tensor.py)."""
from torchrec_tpu.sparse.jagged import (
    JaggedTensor,
    KeyedJaggedTensor,
    KeyedTensor,
    jagged_to_padded_dense,
    padded_dense_to_jagged,
)
from torchrec_tpu.sparse.tensor_dict import maybe_dict_to_kjt
from torchrec_tpu.sparse.validators import validate_keyed_jagged_tensor

__all__ = [
    "JaggedTensor",
    "KeyedJaggedTensor",
    "KeyedTensor",
    "jagged_to_padded_dense",
    "padded_dense_to_jagged",
    "maybe_dict_to_kjt",
    "validate_keyed_jagged_tensor",
]
