"""Embedding-dim bucketing for table grouping.

Capability parity with the reference EmbDimBucketer
(torchrec/distributed/embedding_dim_bucketer.py:32): bucket tables by
(rounded) embedding dim so widely different widths are not batched into
one kernel group. On TPU the same force exists with different physics:
the width-class layout (distributed/_layout.py) pads every virtual table
in a class to the class width, so mixing a dim-8 table into a dim-512
class wastes HBM and lookup bandwidth; bucketing by lane-width
(128-multiple) keeps padding bounded — the cacheline policy's TPU analog
is "round up to the 128-lane register tile".
"""

from __future__ import annotations

import enum
from typing import Dict, Iterable, Tuple

from torchrec_tpu.types import DataType

__all__ = ["EmbDimBucketerPolicy", "EmbDimBucketer"]

_LANE = 128  # TPU lane width: the natural padding quantum (CUDA: cacheline)


class EmbDimBucketerPolicy(enum.Enum):
    """Reference embedding_dim_bucketer.py:18."""

    SINGLE_BUCKET = "single_bucket"      # everything together (no-op)
    ALL_BUCKETS = "all_buckets"          # one bucket per distinct dim
    CACHELINE_BUCKETS = "cacheline_buckets"  # one per 128-lane tile


class EmbDimBucketer:
    """Maps (dim, dtype) -> stable bucket id under the chosen policy."""

    def __init__(
        self,
        dims_and_dtypes: Iterable[Tuple[int, DataType]],
        policy: EmbDimBucketerPolicy = EmbDimBucketerPolicy.CACHELINE_BUCKETS,
    ):
        self.policy = policy
        keys = sorted(
            {self._key(d, t) for d, t in dims_and_dtypes},
            key=lambda k: (k[0], k[1]),
        )
        self._ids: Dict[Tuple[int, str], int] = {
            k: i for i, k in enumerate(keys)
        }

    def _key(self, dim: int, dtype: DataType) -> Tuple[int, str]:
        if self.policy == EmbDimBucketerPolicy.SINGLE_BUCKET:
            return (0, "")
        if self.policy == EmbDimBucketerPolicy.ALL_BUCKETS:
            return (dim, dtype.value)
        # CACHELINE_BUCKETS: row bytes rounded up to the lane tile —
        # dtype folds into the byte count, it is not a separate key
        bpe = dtype.bytes_per_element
        tiles = -(-int(dim * bpe) // _LANE)
        return (tiles, "")

    @property
    def bucket_count(self) -> int:
        return len(self._ids)

    def bucket(self, dim: int, dtype: DataType) -> int:
        return self._ids[self._key(dim, dtype)]
