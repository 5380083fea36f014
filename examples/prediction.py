"""Offline prediction recipe: train, package, reload, predict.

Mirrors the reference's examples/prediction/predict_using_torchrec.py
(train a small DLRM on movie-interaction data, persist it, reload it
elsewhere, and run batch predictions) using the TPU-native flow: the
trained forward is exported as a self-contained StableHLO predict
package (`ir.py`), so the loading side needs NO model code — just the
package directory.

Run (CPU, no TPU needed):
    python examples/prediction.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from torchrec_tpu.ir import load_predict_package, save_predict_package
from torchrec_tpu.models.dlrm import DLRM
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import RowWiseAdagrad
from torchrec_tpu.sparse import KeyedJaggedTensor

TABLES = [
    EmbeddingBagConfig(name="movie", num_embeddings=5_000,
                       embedding_dim=32, feature_names=["movie_id"]),
    EmbeddingBagConfig(name="user", num_embeddings=2_000,
                       embedding_dim=32, feature_names=["user_id"]),
]
DENSE_IN = 8
BATCH = 64


def make_batch(rng):
    vals = np.concatenate([
        rng.integers(0, 5_000, BATCH * 2), rng.integers(0, 2_000, BATCH)
    ]).astype(np.int32)
    lengths = np.concatenate(
        [np.full((1, BATCH), 2), np.full((1, BATCH), 1)]
    ).astype(np.int32)
    kjt = KeyedJaggedTensor(
        keys=["movie_id", "user_id"],
        values=jnp.asarray(vals), lengths=jnp.asarray(lengths),
    )
    dense = jnp.asarray(rng.normal(size=(BATCH, DENSE_IN)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, BATCH), jnp.float32)
    return dense, kjt, labels


def train(steps=30):
    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection(TABLES),
        dense_in_features=DENSE_IN,
        dense_arch_layer_sizes=(32, 32),
        over_arch_layer_sizes=(32, 1),
    )
    params = model.init(jax.random.key(0))
    sparse_params = params.pop("sparse")
    dense_params = params
    opt = RowWiseAdagrad(learning_rate=0.05)
    states = model.embedding_bag_collection.init_optimizer(sparse_params, opt)
    dense_opt = optax.adam(1e-2)
    dense_state = dense_opt.init(dense_params)

    @jax.jit
    def train_step(sp, st, dp, ds, dense, kjt, labels):
        emb = model.forward_sparse({"sparse": sp}, kjt)

        def loss_fn(dp, emb):
            logits = model.forward_dense(dp, dense, emb)
            return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

        loss, (gdp, demb) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            dp, emb
        )
        du, ds = dense_opt.update(gdp, ds, dp)
        dp = optax.apply_updates(dp, du)
        sp, st = model.embedding_bag_collection.apply_gradients(
            sp, st, opt, kjt, demb
        )
        return sp, st, dp, ds, loss

    rng = np.random.default_rng(0)
    dense, kjt, labels = make_batch(rng)
    for i in range(steps):
        sparse_params, states, dense_params, dense_state, loss = train_step(
            sparse_params, states, dense_params, dense_state,
            dense, kjt, labels,
        )
        if i % 10 == 0:
            print(f"step {i:3d} loss {float(loss):.4f}")
    return model, {"sparse": sparse_params, **dense_params}


def main():
    model, params = train()

    def fwd(params, dense, values, lengths):
        kjt = KeyedJaggedTensor(
            keys=model.embedding_bag_collection.feature_names(),
            values=values, lengths=lengths,
        )
        return model.apply(params, dense, kjt)

    rng = np.random.default_rng(0)
    dense, kjt, _ = make_batch(rng)
    args = (dense, kjt.values(), kjt.lengths())
    pkg = os.path.join(tempfile.mkdtemp(prefix="trec_pkg_"), "dlrm")
    save_predict_package(
        pkg, fwd, params, args,
        configs=model.embedding_bag_collection.embedding_bag_configs(),
    )
    print(f"\nsaved predict package -> {pkg}")

    # -------- the "serving side": no model code, just the package
    predict, configs = load_predict_package(pkg)
    print("package tables:", [c.name for c in configs])
    f_dense, f_kjt, _ = make_batch(np.random.default_rng(7))
    scores = np.asarray(jax.nn.sigmoid(
        predict(f_dense, f_kjt.values(), f_kjt.lengths())
    )).ravel()
    want = np.asarray(jax.nn.sigmoid(
        fwd(params, f_dense, f_kjt.values(), f_kjt.lengths())
    )).ravel()
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-6)
    top = np.argsort(-scores)[:5]
    print("top-5 rows by predicted score:", top.tolist())
    print("scores:", np.round(scores[top], 4).tolist())
    print("\npackaged predictions match the in-process model — OK")


if __name__ == "__main__":
    main()
