"""Quantized collective communication (qcomms).

Capability parity with torchrec/distributed/fbgemm_qcomm_codec.py
(QCommsConfig:55, get_qcomm_codecs; CommType FP32/FP16/BF16/FP8/INT8 incl.
rowwise-scaled INT8) and the QuantizedCommCodec protocol
(torchrec/distributed/types.py:233).

TPU-first notes: the pooled output/gradient dists here are arithmetic
collectives (psum_scatter / all_gather), so the wire format must be
summable — FP16/BF16/FP8 casts apply directly around the collective.
INT8 rowwise is a pure data-movement codec (encode -> move -> decode), fit
for the inference all-to-one path and host transfers; it round-trips
through an int8 payload + per-row fp16 scales like the fbgemm rowwise
codec.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "CommType",
    "QCommsConfig",
    "encode",
    "decode",
    "encode_int8_rowwise",
    "decode_int8_rowwise",
]


class CommType:
    """Reduced-precision wire formats for collectives (reference fbgemm_qcomm_codec.py:55 CommType)."""

    FP32 = "fp32"
    FP16 = "fp16"
    BF16 = "bf16"
    FP8 = "fp8"
    INT8 = "int8"


_DTYPES = {
    CommType.FP32: jnp.float32,
    CommType.FP16: jnp.float16,
    CommType.BF16: jnp.bfloat16,
    CommType.FP8: jnp.float8_e4m3fn,
}


@dataclasses.dataclass(frozen=True)
class QCommsConfig:
    """Reference QCommsConfig (fbgemm_qcomm_codec.py:55): precision of the
    forward (pooled output) and backward (gradient) collectives."""

    forward_precision: str = CommType.FP32
    backward_precision: str = CommType.FP32
    # loss-scale applied before the backward cast (fp16 underflow guard,
    # reference backward_loss_scale)
    backward_loss_scale: Optional[float] = None

    def __post_init__(self):
        for p in (self.forward_precision, self.backward_precision):
            if p not in _DTYPES:
                raise ValueError(
                    f"unsupported qcomms precision {p!r} for arithmetic "
                    f"collectives; INT8 is data-movement only "
                    f"(encode_int8_rowwise)"
                )


def encode(x: jnp.ndarray, precision: str) -> jnp.ndarray:
    """Cast payload for the wire (identity for fp32)."""
    dt = _DTYPES[precision]
    return x if dt == jnp.float32 else x.astype(dt)


def decode(x: jnp.ndarray, precision: str) -> jnp.ndarray:
    return x if x.dtype == jnp.float32 else x.astype(jnp.float32)


def encode_int8_rowwise(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[N, D] fp -> (int8 [N, D], fp16 scales [N]) — fbgemm rowwise codec."""
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float16)


def decode_int8_rowwise(
    q: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    return q.astype(jnp.float32) * scale.astype(jnp.float32)[..., None]
