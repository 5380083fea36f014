"""End-to-end serving recipe: train -> quantize -> shard -> gRPC serve.

The reference's inference story (examples around torchrec/inference/:
quantize_inference_model + shard_quant_model -> PredictFactory -> the C++
gRPC server + client.py) in its TPU-native shape:

  1. build + briefly train a DLRM;
  2. ``quantize_inference_model`` -> int8 tables, AOT-compilable predictor;
  3. place the quantized tables table-wise over the device mesh with
     ``ShardedQuantEmbeddingBagCollection`` (physically sharded blobs,
     psum all-to-one output) — the distinct multi-device serving layout;
  4. stand up the serving stack: C++ ``BatchingQueue`` (cross-request
     batch assembly + admission control) -> executor thread running the
     jitted predictor -> ``PredictorServer`` (gRPC transport);
  5. drive it with concurrent ``PredictorClient`` requests and print
     latency percentiles.

Run (CPU mesh):  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                 JAX_PLATFORMS=cpu python examples/serving_inference.py
Run (TPU):       python examples/serving_inference.py
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.inference import (
    PredictorClient,
    PredictorServer,
    ShardedQuantEmbeddingBagCollection,
    quantize_inference_model,
)
from torchrec_tpu.inference.serving import BatchingQueue, PredictionService
from torchrec_tpu.models import DLRM
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import SGD
from torchrec_tpu.sparse import KeyedJaggedTensor

NUM_DENSE = 13
NUM_SPARSE = 8
DIM = 32
MAX_BATCH = 32
IDS_CAP = MAX_BATCH * NUM_SPARSE * 4


def build_and_train(steps: int = 20, batch_size: int = 64):
    rng = np.random.default_rng(0)
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}",
            num_embeddings=10_000 if i < 2 else 500,
            embedding_dim=DIM,
            feature_names=[f"f{i}"],
        )
        for i in range(NUM_SPARSE)
    ]
    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables),
        dense_in_features=NUM_DENSE,
        dense_arch_layer_sizes=(64, DIM),
        over_arch_layer_sizes=(64, 1),
    )
    params = model.init(jax.random.key(0))
    sparse_params = params.pop("sparse")
    dense_params = params  # dense_arch + over_arch
    opt = SGD(learning_rate=0.05)
    states = model.embedding_bag_collection.init_optimizer(sparse_params, opt)

    import optax

    dense_opt = optax.sgd(0.05)
    dense_state = dense_opt.init(dense_params)

    @jax.jit
    def train_step(sp, st, dp, ds, dense, kjt, labels):
        # split forward: fused sparse backward via EBC cotangent
        emb = model.forward_sparse({"sparse": sp}, kjt)

        def loss_fn(dp, emb):
            logits = model.forward_dense(dp, dense, emb)
            return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

        loss, (gdp, demb) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            dp, emb
        )
        du, ds = dense_opt.update(gdp, ds)
        dp = optax.apply_updates(dp, du)
        sp, st = model.embedding_bag_collection.apply_gradients(
            sp, st, opt, kjt, demb
        )
        return sp, st, dp, ds, loss

    for step in range(steps):
        dense = jnp.asarray(
            rng.normal(size=(batch_size, NUM_DENSE)).astype(np.float32)
        )
        lengths = rng.integers(1, 4, size=(NUM_SPARSE * batch_size,)).astype(
            np.int32
        )
        vals = np.concatenate(
            [
                rng.integers(
                    0, tables[i].num_embeddings,
                    size=int(
                        lengths[i * batch_size: (i + 1) * batch_size].sum()
                    ),
                )
                for i in range(NUM_SPARSE)
            ]
        ).astype(np.int32)
        kjt = KeyedJaggedTensor.from_lengths(
            [f"f{i}" for i in range(NUM_SPARSE)],
            jnp.asarray(vals),
            jnp.asarray(lengths),
        )
        labels = jnp.asarray(
            rng.integers(0, 2, size=batch_size).astype(np.float32)
        )
        sparse_params, states, dense_params, dense_state, loss = train_step(
            sparse_params, states, dense_params, dense_state,
            dense, kjt, labels,
        )
        if step % 10 == 0:
            print(f"step {step}: loss {float(loss):.4f}")
    return model, sparse_params, dense_params


def main():
    model, sparse_params, dense_params = build_and_train()

    # ---- 2. quantize -------------------------------------------------------
    predictor = quantize_inference_model(model, sparse_params, dense_params)

    # ---- 3. table-wise sharded quant tables on the mesh --------------------
    devices = jax.devices()
    mesh = jax.sharding.Mesh(np.array(devices), ("serve",))
    sq = ShardedQuantEmbeddingBagCollection(predictor.quant_ebc, mesh)
    sqp = sq.shard_qparams(predictor.qparams)
    print("table placement:", sq.placement)

    dense_params = predictor.dense_params

    @jax.jit
    def predict(dense, ids, lengths):
        b = dense.shape[0]
        kjt = KeyedJaggedTensor.from_lengths(
            [f"f{i}" for i in range(NUM_SPARSE)],
            ids,
            lengths.reshape(-1),
        )
        kt = sq.apply(sqp, kjt)
        logits = model.forward_dense(dense_params, dense, kt.values())
        return jax.nn.sigmoid(logits)

    # ---- 4. serving stack --------------------------------------------------
    queue = BatchingQueue(
        max_batch_size=MAX_BATCH,
        num_dense=NUM_DENSE,
        num_sparse=NUM_SPARSE,
        out_dim=1,
        ids_capacity=IDS_CAP,
        batching_timeout_us=2_000,
    )

    def predict_fn(dense, ids, lengths):
        n = dense.shape[0]
        out = np.zeros((MAX_BATCH, 1), np.float32)
        probs = predict(
            jnp.asarray(dense), jnp.asarray(ids), jnp.asarray(lengths)
        )
        out[:, 0] = np.asarray(probs)[:MAX_BATCH]
        return out[:n]

    service = PredictionService(queue, predict_fn).start()
    server = PredictorServer(queue, task_names=("ctr",))
    port = server.start()
    print(f"serving on 127.0.0.1:{port}")

    # ---- 5. concurrent clients --------------------------------------------
    rng = np.random.default_rng(7)
    lat = []
    lock = threading.Lock()

    def client_worker(n_requests: int):
        client = PredictorClient(f"127.0.0.1:{port}")
        for _ in range(n_requests):
            dense = rng.normal(size=(1, NUM_DENSE)).astype(np.float32)
            lengths = rng.integers(1, 3, size=(NUM_SPARSE, 1)).astype(np.int32)
            vals = rng.integers(0, 500, size=int(lengths.sum())).astype(
                np.int64
            )
            t0 = time.perf_counter()
            out = client.predict(dense, lengths, vals)
            dt = time.perf_counter() - t0
            assert 0.0 <= out["ctr"][0] <= 1.0
            with lock:
                lat.append(dt)
        client.close()

    threads = [
        threading.Thread(target=client_worker, args=(20,)) for _ in range(4)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat_ms = np.sort(np.array(lat)) * 1e3
    print(
        f"{len(lat)} requests in {wall:.2f}s "
        f"(p50 {lat_ms[len(lat)//2]:.1f} ms, "
        f"p99 {lat_ms[int(len(lat)*0.99)]:.1f} ms)"
    )
    server.stop()
    service.stop()
    print("done")


if __name__ == "__main__":
    main()
