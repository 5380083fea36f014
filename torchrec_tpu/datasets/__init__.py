"""Dataset readers and synthetic generators (reference torchrec/datasets/__init__.py)."""
from torchrec_tpu.datasets.criteo import (
    CAT_FEATURE_COUNT,
    DEFAULT_CAT_NAMES,
    DEFAULT_INT_NAMES,
    INT_FEATURE_COUNT,
    BinaryCriteoUtils,
    InMemoryBinaryCriteoIterDataPipe,
    criteo_tsv_reader,
    criteo_kaggle,
    criteo_terabyte,
)
from torchrec_tpu.datasets.criteo_native import NativeCriteoIterDataPipe
from torchrec_tpu.datasets.movielens import (
    MovieLensRatingsBatcher,
    movielens_20m,
    movielens_25m,
)
from torchrec_tpu.datasets.random import RandomRecDataset
from torchrec_tpu.datasets.synthetic import ClickModelRecDataset

__all__ = [
    "RandomRecDataset",
    "ClickModelRecDataset",
    "CAT_FEATURE_COUNT",
    "INT_FEATURE_COUNT",
    "DEFAULT_CAT_NAMES",
    "DEFAULT_INT_NAMES",
    "BinaryCriteoUtils",
    "InMemoryBinaryCriteoIterDataPipe",
    "criteo_tsv_reader",
    "criteo_kaggle",
    "criteo_terabyte",
    "NativeCriteoIterDataPipe",
    "MovieLensRatingsBatcher",
    "movielens_20m",
    "movielens_25m",
]
