"""Two-tower retrieval recipe: in-batch negatives + exact kNN serving.

Reference analog: examples/retrieval/two_tower_train.py:74 (two-tower over
a RW-sharded item table, FAISS kNN index). TPU shape: both towers train in
one jitted step; retrieval = a jitted matmul + lax.top_k over the encoded
corpus (exact kNN on-device).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python examples/two_tower_retrieval.py
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchrec_tpu import KeyedJaggedTensor
from torchrec_tpu.models import TwoTower, knn, two_tower_in_batch_negatives_loss
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig


def main(steps=200, batch=64, n_users=2000, n_items=500, dim=64):
    ebc = EmbeddingBagCollection([
        EmbeddingBagConfig(name="user", num_embeddings=n_users,
                           embedding_dim=dim, feature_names=["user"]),
        EmbeddingBagConfig(name="item", num_embeddings=n_items,
                           embedding_dim=dim, feature_names=["item"]),
    ])
    tt = TwoTower(ebc, ["user"], ["item"], layer_sizes=(128, 32))
    params = tt.init(jax.random.key(0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    # synthetic preference structure: user u likes items ~ u mod n_items
    rng = np.random.default_rng(0)

    def batch_kjt():
        users = rng.integers(0, n_users, batch)
        items = (users + rng.integers(0, 3, batch)) % n_items
        vals = np.concatenate([users, items]).astype(np.int32)
        return KeyedJaggedTensor(
            keys=["user", "item"], values=jnp.asarray(vals),
            lengths=jnp.asarray(np.ones((2, batch), np.int32)),
        )

    @jax.jit
    def step(params, opt_state, kjt):
        def loss_fn(p):
            q, c = tt.apply(p, kjt)
            return two_tower_in_batch_negatives_loss(q, c)
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, batch_kjt())
        if (i + 1) % 50 == 0:
            print(f"step {i+1}: in-batch loss {float(loss):.4f}")

    # build the corpus index: encode ALL items, retrieve for a query batch
    corpus_kjt = KeyedJaggedTensor(
        keys=["user", "item"],
        values=jnp.asarray(
            np.concatenate([np.zeros(n_items), np.arange(n_items)]).astype(np.int32)
        ),
        lengths=jnp.asarray(np.ones((2, n_items), np.int32)),
    )
    corpus = tt.candidate_embeddings(params, corpus_kjt)
    q_users = np.arange(32)
    q_kjt = KeyedJaggedTensor(
        keys=["user", "item"],
        values=jnp.asarray(np.concatenate([q_users, np.zeros(32)]).astype(np.int32)),
        lengths=jnp.asarray(np.ones((2, 32), np.int32)),
    )
    qe, _ = tt.apply(params, q_kjt)
    scores, idx = knn(qe, corpus, k=10)
    hits = np.mean([
        (u % n_items) in np.asarray(idx)[j] for j, u in enumerate(q_users)
    ])
    print(f"recall@10 over the synthetic preference: {hits:.2f}")


if __name__ == "__main__":
    main()
