"""FusedParams kernel-knob threading (reference distributed/fused_params.py).

The bundle must (a) build the fused optimizer by registry name, (b) set
per-instance module knobs without touching class defaults, (c) flow
through shard() / DistributedModelParallel, and (d) carry
cache_load_factor into ParameterConstraints for the planner.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchrec_tpu import KeyedJaggedTensor
from torchrec_tpu.distributed import (
    FusedParams,
    ShardingEnv,
    apply_fused_params,
)
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import RowWiseAdagrad, SGD


def _tables(rows=64):
    return [
        EmbeddingBagConfig(
            name="t", num_embeddings=rows, embedding_dim=8,
            feature_names=["f"],
        )
    ]


class TestFusedParamsBundle:
    def test_optimizer_built_by_name(self):
        fp = FusedParams(optimizer="rowwise_adagrad", learning_rate=0.25)
        opt = fp.make_optimizer()
        assert isinstance(opt, RowWiseAdagrad)
        assert opt.learning_rate == 0.25

    def test_optimizer_kwargs_and_stochastic_rounding(self):
        fp = FusedParams(
            optimizer="sgd", learning_rate=0.1, stochastic_rounding=True
        )
        opt = fp.make_optimizer()
        assert isinstance(opt, SGD) and opt.stochastic_rounding

    def test_no_optimizer_returns_none(self):
        assert FusedParams().make_optimizer() is None

    def test_unknown_optimizer_rejected(self):
        with pytest.raises(ValueError, match="unknown"):
            FusedParams(optimizer="nope").make_optimizer()

    def test_module_knobs_are_instance_scoped(self):
        a = EmbeddingBagCollection(_tables())
        b = EmbeddingBagCollection(_tables())
        apply_fused_params(a, FusedParams(count_matrix_impl="v1",
                                          packed_sort=False))
        assert a._CM_IMPL == "v1" and a._CM_PACKED_SORT is False
        # b and the class defaults untouched
        assert b._CM_IMPL == EmbeddingBagCollection._CM_IMPL == "v3"
        assert b._CM_PACKED_SORT is True

    def test_bad_cm_impl_rejected(self):
        with pytest.raises(ValueError, match="count_matrix_impl"):
            apply_fused_params(
                EmbeddingBagCollection(_tables()),
                FusedParams(count_matrix_impl="v9"),
            )

    def test_max_unique_conflict_rejected(self):
        m = EmbeddingBagCollection(
            _tables(rows=100_000), max_unique_gradient_rows=32
        )
        with pytest.raises(ValueError, match="conflicts"):
            apply_fused_params(
                m, FusedParams(max_unique_gradient_rows=64)
            )

    def test_constraints_carry_cache_load_factor(self):
        fp = FusedParams(cache_load_factor=0.4)
        c = fp.constraints()
        assert c.cache_load_factor == 0.4


class TestFusedParamsThroughSharding:
    def test_shard_applies_knobs_and_matches_oracle(self):
        from torchrec_tpu.distributed.shard import shard

        env = ShardingEnv.from_devices()
        ebc = EmbeddingBagCollection(_tables())
        sharded = shard(ebc, env,
                        fused_params=FusedParams(count_matrix_impl="v2"))
        assert ebc._CM_IMPL == "v2"
        params = sharded.init(jax.random.key(0))
        kjt = KeyedJaggedTensor(
            keys=["f"], values=jnp.arange(24, dtype=jnp.int32) % 64,
            lengths=jnp.full((1, 8), 3, jnp.int32),
        )
        out = sharded.apply(params, kjt)
        ref = EmbeddingBagCollection(_tables())
        # same seed -> same unsharded tables
        ref_out = ref.apply(ref.init(jax.random.key(0)), kjt)
        np.testing.assert_allclose(
            np.asarray(out.values()), np.asarray(ref_out.values()),
            rtol=1e-5, atol=1e-5,
        )

    def test_dmp_uses_fused_params_optimizer(self):
        from torchrec_tpu.distributed.model_parallel import (
            DistributedModelParallel,
        )
        from torchrec_tpu.models.dlrm import DLRM
        from torchrec_tpu.training import Batch, init_train_state

        model = DLRM(
            embedding_bag_collection=EmbeddingBagCollection(_tables()),
            dense_in_features=4,
            dense_arch_layer_sizes=(8,),
            over_arch_layer_sizes=(4,),
        )
        dmp = DistributedModelParallel(
            model,
            fused_params=FusedParams(
                optimizer="rowwise_adagrad", learning_rate=0.1
            ),
        )
        step = dmp.make_train_step(dense_tx=optax.sgd(0.1))
        state = dmp.init_train_state(jax.random.key(0), dense_tx=optax.sgd(0.1))
        b = 8
        batch = Batch(
            dense_features=jnp.ones((b, 4), jnp.float32),
            sparse_features=KeyedJaggedTensor(
                keys=["f"],
                values=jnp.arange(b, dtype=jnp.int32),
                lengths=jnp.ones((1, b), jnp.int32),
            ),
            labels=jnp.ones((b,), jnp.float32),
        )
        state2, aux = step(state, batch)
        assert np.isfinite(float(np.asarray(aux["loss"])))
        assert int(state2.step) == 1

    def test_dmp_without_optimizer_anywhere_rejected(self):
        from torchrec_tpu.distributed.model_parallel import (
            DistributedModelParallel,
        )
        from torchrec_tpu.models.dlrm import DLRM

        model = DLRM(
            embedding_bag_collection=EmbeddingBagCollection(_tables()),
            dense_in_features=4,
            dense_arch_layer_sizes=(8,),
            over_arch_layer_sizes=(4,),
        )
        dmp = DistributedModelParallel(model)
        with pytest.raises(ValueError, match="emb_optimizer"):
            dmp.make_train_step(dense_tx=optax.sgd(0.1))
