"""Transfer-learning recipe: reuse trained embeddings, fine-tune dense.

The reference's examples/transfer_learning flow in TPU-native form:
pre-train a DLRM, keep the sparse tables FROZEN (simply don't run
apply_gradients on them — params are explicit pytrees, freezing is free),
swap in a fresh over-arch for the new task, and fine-tune only the dense
side. Frozen tables are bit-identical afterwards.

Run: python examples/transfer_learning.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchrec_tpu.models import DLRM
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import RowWiseAdagrad
from torchrec_tpu.sparse import KeyedJaggedTensor

F, DIM, B = 4, 16, 64


def batches(rng, tables, steps):
    cap = F * B * 4  # static value-buffer capacity: stable jit signature
    for _ in range(steps):
        lengths = rng.integers(1, 4, size=(F * B,)).astype(np.int32)
        vals = np.concatenate(
            [
                rng.integers(
                    0, tables[i].num_embeddings,
                    size=int(lengths[i * B: (i + 1) * B].sum()),
                )
                for i in range(F)
            ]
        ).astype(np.int32)
        vals = np.pad(vals, (0, cap - vals.shape[0]))
        kjt = KeyedJaggedTensor.from_lengths(
            [f"f{i}" for i in range(F)],
            jnp.asarray(vals), jnp.asarray(lengths),
        )
        dense = jnp.asarray(rng.normal(size=(B, 13)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 2, B).astype(np.float32))
        yield dense, kjt, labels


def main():
    rng = np.random.default_rng(0)
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=2000, embedding_dim=DIM,
            feature_names=[f"f{i}"],
        )
        for i in range(F)
    ]
    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables),
        dense_in_features=13,
        dense_arch_layer_sizes=(32, DIM),
        over_arch_layer_sizes=(32, 8),
    )
    params = model.init(jax.random.key(0))
    sparse = params.pop("sparse")
    dense = params
    ebc = model.embedding_bag_collection
    emb_opt = RowWiseAdagrad(learning_rate=0.05)
    emb_state = ebc.init_optimizer(sparse, emb_opt)
    dtx = optax.adam(1e-3)
    dstate = dtx.init(dense)

    @jax.jit
    def pretrain_step(sp, es, dp, ds, d, kjt, y):
        emb = model.forward_sparse({"sparse": sp}, kjt)

        def loss_fn(dp, emb):
            logits = model.forward_dense(dp, d, emb)
            return optax.sigmoid_binary_cross_entropy(logits, y).mean()

        loss, (gd, ge) = jax.value_and_grad(loss_fn, argnums=(0, 1))(dp, emb)
        du, ds = dtx.update(gd, ds)
        dp = optax.apply_updates(dp, du)
        sp, es = ebc.apply_gradients(sp, es, emb_opt, kjt, ge)
        return sp, es, dp, ds, loss

    for i, (d, kjt, y) in enumerate(batches(rng, tables, 30)):
        sparse, emb_state, dense, dstate, loss = pretrain_step(
            sparse, emb_state, dense, dstate, d, kjt, y
        )
    print(f"pretrain done: loss {float(loss):.4f}")

    # ---- transfer: freeze sparse, fresh over-arch, dense-only updates -----
    frozen = jax.tree.map(lambda x: np.asarray(x).copy(), sparse)
    new_model = DLRM(
        embedding_bag_collection=ebc,
        dense_in_features=13,
        dense_arch_layer_sizes=(32, DIM),
        over_arch_layer_sizes=(64, 16),  # new task head
    )
    new_dense = new_model.init(jax.random.key(7))
    new_dense.pop("sparse")
    new_dense["dense_arch"] = dense["dense_arch"]  # keep the bottom MLP too
    dstate2 = dtx.init(new_dense)

    @jax.jit
    def finetune_step(dp, ds, sp, d, kjt, y):
        emb = new_model.forward_sparse({"sparse": sp}, kjt)
        # emb is NOT differentiated: sparse stays frozen by construction

        def loss_fn(dp):
            logits = new_model.forward_dense(dp, d, emb)
            return optax.sigmoid_binary_cross_entropy(logits, y).mean()

        loss, gd = jax.value_and_grad(loss_fn)(dp)
        du, ds = dtx.update(gd, ds)
        return optax.apply_updates(dp, du), ds, loss

    first = last = None
    for d, kjt, y in batches(rng, tables, 30):
        new_dense, dstate2, loss = finetune_step(
            new_dense, dstate2, sparse, d, kjt, y
        )
        last = float(loss)
        first = first if first is not None else last
    print(f"finetune: first {first:.4f} -> last {last:.4f}")

    for k, v in frozen.items():
        np.testing.assert_array_equal(v, np.asarray(sparse[k]))
    print("frozen tables bit-identical: OK")
    print("done")


if __name__ == "__main__":
    main()
