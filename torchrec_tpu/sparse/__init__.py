from torchrec_tpu.sparse.jagged import (
    JaggedTensor,
    KeyedJaggedTensor,
    KeyedTensor,
    jagged_to_padded_dense,
    padded_dense_to_jagged,
)
from torchrec_tpu.sparse.validators import validate_keyed_jagged_tensor

__all__ = [
    "JaggedTensor",
    "KeyedJaggedTensor",
    "KeyedTensor",
    "jagged_to_padded_dense",
    "padded_dense_to_jagged",
    "validate_keyed_jagged_tensor",
]
