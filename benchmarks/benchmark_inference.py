"""Inference benchmark (reference distributed/benchmark/benchmark_inference.py):
quantized DLRM predictor latency/qps on the current backend."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.base import benchmark_scanned
from torchrec_tpu.datasets import RandomRecDataset
from torchrec_tpu.models import DLRM
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.inference import quantize_inference_model


def main(batch_size=256):
    tables = [
        EmbeddingBagConfig(name=f"t{i}", num_embeddings=100_000,
                           embedding_dim=64, feature_names=[f"f{i}"])
        for i in range(8)
    ]
    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables),
        dense_in_features=13,
        dense_arch_layer_sizes=(128, 64),
        over_arch_layer_sizes=(128, 64),
    )
    params = model.init(jax.random.key(0))
    sparse = params.pop("sparse")
    predictor = quantize_inference_model(model, sparse, params)
    ds = iter(RandomRecDataset(
        keys=model.embedding_bag_collection.feature_names(),
        batch_size=batch_size, hash_sizes=[100_000], num_dense=13,
    ))
    batch = next(ds)
    kjt = batch.sparse_features

    def step(c, d):
        # non-foldable carry dependence on BOTH inputs (anything XLA can
        # fold to a constant loop-hoists; see CLAUDE.md measurement notes)
        bump = (c[0] == jnp.inf).astype(jnp.float32)
        from torchrec_tpu.sparse import KeyedJaggedTensor

        k = d["kjt"]
        kjt2 = KeyedJaggedTensor(
            keys=k.keys(),
            values=k.values() + bump.astype(jnp.int32),
            lengths=k.lengths(),
        )
        out = predictor.apply(d["dense"] + bump, kjt2)
        return out[:1]

    r = benchmark_scanned(
        "quant_dlrm_predict", step,
        jnp.zeros((1,)), {"dense": batch.dense_features, "kjt": kjt},
        iters=2000, batch_size=batch_size,
    )
    print(r.json_line())


if __name__ == "__main__":
    main()
