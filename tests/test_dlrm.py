"""DLRM family tests: shapes, interaction oracle, end-to-end training.

Mirrors torchrec/models/tests/test_dlrm.py coverage plus the golden-training
loop (examples/golden_training/train_dlrm.py): loss must decrease on a
learnable synthetic task.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchrec_tpu.datasets import RandomRecDataset
from torchrec_tpu.models import (
    DLRM,
    DLRM_DCN,
    DLRM_Projection,
    DLRM_Transformer,
    DLRMTrain,
    InteractionArch,
    InteractionTransformerArch,
)
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import RowWiseAdagrad
from torchrec_tpu.training import init_train_state, make_train_step


def make_model(model_cls=DLRM, num_features=4, dim=16, **kwargs):
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=100, embedding_dim=dim,
            feature_names=[f"f{i}"],
        )
        for i in range(num_features)
    ]
    return model_cls(
        embedding_bag_collection=EmbeddingBagCollection(tables),
        dense_in_features=13,
        dense_arch_layer_sizes=(32, dim),
        over_arch_layer_sizes=(32, 16),
        **kwargs,
    )


def make_data(model, batch_size=8, seed=0):
    keys = model.embedding_bag_collection.feature_names()
    return RandomRecDataset(
        keys=keys, batch_size=batch_size, hash_sizes=[100],
        num_dense=13, seed=seed,
    )


class TestInteractionArch:
    def test_pairwise_dot_oracle(self):
        rng = np.random.default_rng(0)
        dense = rng.normal(size=(2, 4)).astype(np.float32)
        sparse = rng.normal(size=(2, 3, 4)).astype(np.float32)
        arch = InteractionArch(num_sparse_features=3)
        out = arch.apply(jnp.asarray(dense), jnp.asarray(sparse))
        assert out.shape == (2, 4 + 6)
        comb = np.concatenate([dense[:, None], sparse], axis=1)
        expected = []
        for b in range(2):
            pairs = [
                comb[b, i] @ comb[b, j]
                for i in range(4)
                for j in range(i + 1, 4)
            ]
            expected.append(np.concatenate([dense[b], pairs]))
        np.testing.assert_allclose(out, np.stack(expected), rtol=1e-5)


class TestInteractionTransformerArch:
    def test_shapes_and_token_mixing(self):
        """Output is [B, (F+1)*D] and every token's output depends on
        every other token (attention actually mixes the stack)."""
        arch = InteractionTransformerArch(
            num_sparse_features=3, embedding_dim=8, nhead=2,
            ntransformer_layers=1,
        )
        params = arch.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        dense = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
        sparse = jnp.asarray(rng.normal(size=(2, 3, 8)).astype(np.float32))
        out = arch.apply(params, dense, sparse)
        assert out.shape == (2, 4 * 8)
        # perturbing one sparse token must move the DENSE token's output
        sparse2 = sparse.at[:, 2, :].add(1.0)
        out2 = arch.apply(params, dense, sparse2)
        assert not np.allclose(out[:, :8], out2[:, :8])

    def test_head_divisibility_rejected(self):
        with pytest.raises(ValueError):
            InteractionTransformerArch(
                num_sparse_features=3, embedding_dim=10, nhead=4
            )


class TestDLRMVariants:
    @pytest.mark.parametrize(
        "builder",
        [
            lambda: make_model(DLRM),
            lambda: make_model(DLRM_DCN, dcn_num_layers=2, dcn_low_rank_dim=8),
            lambda: make_model(
                DLRM_Projection,
                interaction_branch1_layer_sizes=(32, 32),
                interaction_branch2_layer_sizes=(32, 48),
            ),
            lambda: make_model(
                DLRM_Transformer, nhead=4, ntransformer_layers=2
            ),
        ],
        ids=["dlrm", "dlrm_dcn", "dlrm_projection", "dlrm_transformer"],
    )
    def test_forward_shapes(self, builder):
        model = builder()
        params = model.init(jax.random.key(0))
        batch = next(iter(make_data(model)))
        logits = jax.jit(model.apply)(
            params, batch.dense_features, batch.sparse_features
        )
        assert logits.shape == (8,)
        assert np.isfinite(np.asarray(logits)).all()

    def test_mismatched_dense_dim_rejected(self):
        with pytest.raises(ValueError):
            tables = [
                EmbeddingBagConfig(name="t", num_embeddings=10,
                                   embedding_dim=16, feature_names=["f"])
            ]
            DLRM(
                embedding_bag_collection=EmbeddingBagCollection(tables),
                dense_in_features=13,
                dense_arch_layer_sizes=(32, 8),  # != 16
                over_arch_layer_sizes=(32, 16),
            )

    def test_dlrm_train_wrapper(self):
        model = make_model()
        task = DLRMTrain(model)
        params = model.init(jax.random.key(0))
        batch = next(iter(make_data(model)))
        loss, (detached, logits, labels) = task.apply(
            params, batch.dense_features, batch.sparse_features, batch.labels
        )
        assert loss.shape == ()
        np.testing.assert_allclose(loss, detached)


class TestEndToEndTraining:
    def test_loss_decreases(self):
        """Fixed-batch memorization: loss -> ~0 proves gradients flow
        through both the fused sparse path and the dense path."""
        model = make_model(num_features=3, dim=8)
        emb_opt = RowWiseAdagrad(learning_rate=0.2)
        dense_tx = optax.adagrad(0.05)
        state = init_train_state(model, jax.random.key(0), emb_opt, dense_tx)
        step = jax.jit(make_train_step(model, emb_opt, dense_tx),
                       donate_argnums=(0,))
        batch = next(iter(make_data(model, batch_size=32, seed=1)))
        losses = []
        for _ in range(150):
            state, aux = step(state, batch)
            losses.append(float(aux["loss"]))
        assert losses[-1] < 0.05, losses[::20]
        # sparse params actually moved
        moved = any(
            np.abs(np.asarray(v)).sum() > 0
            for v in jax.tree_util.tree_leaves(state.emb_opt_state)
        )
        assert moved

    def test_step_counter_and_state_pytree(self):
        model = make_model(num_features=2, dim=8)
        emb_opt = RowWiseAdagrad(learning_rate=0.1)
        dense_tx = optax.sgd(0.01)
        state = init_train_state(model, jax.random.key(0), emb_opt, dense_tx)
        step = jax.jit(make_train_step(model, emb_opt, dense_tx))
        batch = next(iter(make_data(model)))
        state, _ = step(state, batch)
        state, _ = step(state, batch)
        assert int(state.step) == 2
        leaves = jax.tree_util.tree_leaves(state)
        assert all(hasattr(l, "shape") for l in leaves)

    def test_lr_schedule_applied(self):
        model = make_model(num_features=2, dim=8)
        emb_opt = RowWiseAdagrad(learning_rate=1.0)
        dense_tx = optax.sgd(0.0)
        state = init_train_state(model, jax.random.key(0), emb_opt, dense_tx)
        # zero LR schedule -> sparse params must not move
        step = jax.jit(
            make_train_step(model, emb_opt, dense_tx,
                            lr_schedule=lambda s: jnp.zeros(()))
        )
        batch = next(iter(make_data(model)))
        before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                        state.sparse_params)
        state, _ = step(state, batch)
        for k in before:
            np.testing.assert_allclose(state.sparse_params[k], before[k])
