"""Sub-byte tensor storage: int4/int2 values packed into uint8 words.

Capability parity with torchrec/tensor_types.py (UInt4Tensor, UInt2Tensor —
sub-byte quantized state_dict storage). TPU-first: packed arrays are plain
uint8 jnp arrays plus pack/unpack kernels expressed as shifts/masks that
XLA fuses into the consumer (the dequant lookup reads packed rows and
unpacks in registers).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["UInt4Tensor", "UInt2Tensor", "pack_int4", "unpack_int4",
           "pack_int2", "unpack_int2"]


def pack_int4(values: jnp.ndarray) -> jnp.ndarray:
    """[..., D] uint4-range values (0..15) -> [..., D//2] uint8 (low nibble
    first). D must be even."""
    v = values.astype(jnp.uint8)
    lo = v[..., 0::2] & 0xF
    hi = (v[..., 1::2] & 0xF) << 4
    return lo | hi


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., D//2] uint8 -> [..., D] uint4-range uint8."""
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)


def pack_int2(values: jnp.ndarray) -> jnp.ndarray:
    """[..., D] uint2-range values (0..3) -> [..., D//4] uint8."""
    if values.shape[-1] % 4:
        # a ragged tail would silently BROADCAST (len-1 vs len-2 slices)
        raise ValueError(
            f"pack_int2 width {values.shape[-1]} not divisible by 4"
        )
    v = values.astype(jnp.uint8)
    return (
        (v[..., 0::4] & 0x3)
        | ((v[..., 1::4] & 0x3) << 2)
        | ((v[..., 2::4] & 0x3) << 4)
        | ((v[..., 3::4] & 0x3) << 6)
    )


def unpack_int2(packed: jnp.ndarray) -> jnp.ndarray:
    parts = [(packed >> (2 * i)) & 0x3 for i in range(4)]
    return jnp.stack(parts, axis=-1).reshape(*packed.shape[:-1], -1)


@dataclasses.dataclass
class UInt4Tensor:
    """Packed uint4 array view (reference tensor_types.py UInt4Tensor):
    logical shape [..., D], storage [..., D//2] uint8."""

    packed: jnp.ndarray

    @classmethod
    def from_unpacked(cls, values: jnp.ndarray) -> "UInt4Tensor":
        return cls(pack_int4(values))

    def unpack(self) -> jnp.ndarray:
        return unpack_int4(self.packed)

    @property
    def shape(self) -> Tuple[int, ...]:
        return (*self.packed.shape[:-1], self.packed.shape[-1] * 2)


@dataclasses.dataclass
class UInt2Tensor:
    """Packed uint2 array view (reference tensor_types.py UInt2Tensor)."""

    packed: jnp.ndarray

    @classmethod
    def from_unpacked(cls, values: jnp.ndarray) -> "UInt2Tensor":
        return cls(pack_int2(values))

    def unpack(self) -> jnp.ndarray:
        return unpack_int2(self.packed)

    @property
    def shape(self) -> Tuple[int, ...]:
        return (*self.packed.shape[:-1], self.packed.shape[-1] * 4)
