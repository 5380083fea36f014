from torchrec_tpu.datasets.random import RandomRecDataset

__all__ = ["RandomRecDataset"]
