"""Schema/API-stability tests: pin the public signatures.

Reference analog: torchrec/schema/api_tests/* (signature pinning for
EBC/KJT/planner/optimizer/inference APIs) — a breaking change to any of
these must be a deliberate edit HERE too.
"""

import inspect

import pytest


def sig_params(obj):
    return list(inspect.signature(obj).parameters)


def test_root_exports():
    import torchrec_tpu as tr

    # reference-parity root surface (torchrec/__init__.py:13-29)
    for name in [
        "JaggedTensor", "KeyedJaggedTensor", "KeyedTensor",
        "ComputeKernel", "DataType", "PoolingType", "ShardingType",
        "EmbeddingBagConfig", "EmbeddingConfig",
        "EmbeddingBagCollection", "EmbeddingCollection",
        "Multistreamable", "Pipelineable",
    ]:
        assert hasattr(tr, name), name


def test_kjt_schema():
    from torchrec_tpu import KeyedJaggedTensor

    assert sig_params(KeyedJaggedTensor.__init__)[:5] == [
        "self", "keys", "values", "lengths", "weights",
    ]
    for method in [
        "keys", "values", "lengths", "weights", "offsets", "split",
        "permute", "to_dict", "concat", "stride", "length_per_key",
        "offset_per_key", "select_keys", "materialize", "segment_ids",
        "valid_mask", "sync", "unsync",
    ]:
        assert hasattr(KeyedJaggedTensor, method), method


def test_ebc_schema():
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig

    assert sig_params(EmbeddingBagCollection.__init__) == [
        "self", "tables", "is_weighted", "max_unique_gradient_rows",
        "colocate_rowwise_state",
    ]
    for method in [
        "init", "apply", "apply_gradients", "init_optimizer",
        "embedding_bag_configs", "is_weighted", "feature_names",
        "embedding_dims", "sparse_grads", "table_slice", "split_params",
    ]:
        assert hasattr(EmbeddingBagCollection, method), method
    cfg = sig_params(EmbeddingBagConfig.__init__)
    for p in ["name", "num_embeddings", "embedding_dim", "feature_names",
              "pooling", "data_type"]:
        assert p in cfg, p


def test_sharding_schema():
    from torchrec_tpu.distributed import (
        ShardedEmbeddingBagCollection,
        ShardedEmbeddingCollection,
        ShardingEnv,
    )

    # a2a_capacity_factor/exchange_mode configure the bucketized
    # (KJT-all-to-all) input distribution path
    assert sig_params(ShardedEmbeddingBagCollection.__init__) == [
        "self", "ebc", "plan", "env", "qcomms", "a2a_capacity_factor",
        "exchange_mode",
    ]
    assert sig_params(ShardedEmbeddingCollection.__init__) == [
        "self", "ec", "plan", "env", "exchange_mode",
    ]
    for method in ["apply", "apply_local", "apply_gradients_local",
                   "shard_params", "unshard_params", "init_optimizer"]:
        assert hasattr(ShardedEmbeddingBagCollection, method), method
    # hierarchical=True factorizes the shard world into a (host, chip)
    # mesh for TWRW/GRID two-level collectives
    assert sig_params(ShardingEnv.from_devices) == [
        "devices", "replica_size", "local_size", "hierarchical",
    ]


def test_planner_schema():
    from torchrec_tpu.planner import EmbeddingShardingPlanner, Topology

    p = sig_params(EmbeddingShardingPlanner.__init__)
    assert p[:2] == ["self", "topology"]
    assert hasattr(EmbeddingShardingPlanner, "plan")
    t = sig_params(Topology.__init__)
    for key in ["world_size", "generation"]:
        assert key in t, key
    # service facade (reference planner/api.py analog)
    from torchrec_tpu.planner import (
        ModelArch,
        ShardingPlanResult,
        extract_model_arch,
        plan_for_model,
    )

    q = sig_params(plan_for_model)
    for key in ["model", "topology", "batch_size", "constraints",
                "reuse_dir"]:
        assert key in q, key
    for field in ["plan", "plan_hash", "arch_hash", "report", "reused"]:
        assert field in ShardingPlanResult.__dataclass_fields__, field
    assert "tables" in ModelArch.__dataclass_fields__
    del extract_model_arch


def test_optimizer_schema():
    from torchrec_tpu.ops import SGD, Adam, RowWiseAdagrad, make_optimizer
    from torchrec_tpu.ops.fused_optim import EmbeddingOptimizer

    # ids_sorted: position-layout dedup (v3) passes False so the XLA
    # sorted-gather/scatter hints stay honest. ids_in_bounds: blobs with a
    # write-kernel scratch tail (TableGroup.scratch_rows) pass True to take
    # the branch-free scatter.
    # old_rows: caller-provided table[unique_ids] (forward-gathered window
    # rows reused via CSE — kills one 20k-row gather per step)
    assert sig_params(EmbeddingOptimizer.update) == [
        "self", "table", "state", "unique_ids", "unique_grads", "lr",
        "ids_sorted", "ids_in_bounds", "old_rows",
    ]
    assert sig_params(EmbeddingOptimizer.dense_update) == [
        "self", "table", "state", "grad", "touched", "lr",
    ]
    for cls in [SGD, Adam, RowWiseAdagrad]:
        assert issubclass(cls, EmbeddingOptimizer)


def test_inference_schema():
    from torchrec_tpu.inference import quantize_inference_model, shard_quant_model
    from torchrec_tpu.inference.serving import BatchingQueue, PredictionService

    assert "model" in sig_params(quantize_inference_model)
    q = sig_params(BatchingQueue.__init__)
    for p in ["max_batch_size", "num_dense", "num_sparse", "out_dim",
              "ids_capacity", "batching_timeout_us", "max_in_flight"]:
        assert p in q, p

    from torchrec_tpu.inference import DLRMPredictFactory, DLRMPredictModule

    assert sig_params(DLRMPredictFactory.create_predict_module) == [
        "self", "params", "data_type", "key",
    ]
    for m in ["batching_metadata", "result_metadata", "model_inputs_data"]:
        assert hasattr(DLRMPredictFactory, m), m
    assert sig_params(DLRMPredictModule.predict_forward) == [
        "self", "params", "batch",
    ]


def test_metric_module_schema():
    from torchrec_tpu.metrics.metric_module import (
        MetricsConfig,
        RecMetricEnum,
        RecMetricModule,
    )

    # the enum must keep covering the reference families
    values = {e.value for e in RecMetricEnum}
    for required in [
        "ne", "auc", "auprc", "calibration", "ctr", "mse", "mae",
        "accuracy", "precision", "recall", "ndcg", "weighted_avg",
        "segmented_ne", "rauc", "xauc", "multiclass_recall", "scalar",
        "serving_ne", "cali_free_ne", "hindsight_target_pr",
    ]:
        assert required in values, required
    for method in ["init_state", "update", "compute", "should_compute"]:
        assert hasattr(RecMetricModule, method), method


def test_fused_ebc_and_streamable():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchrec_tpu import KeyedJaggedTensor, Multistreamable, Pipelineable
    from torchrec_tpu.modules import EmbeddingBagConfig, FusedEmbeddingBagCollection

    febc = FusedEmbeddingBagCollection(
        [EmbeddingBagConfig(name="t", num_embeddings=16, embedding_dim=8,
                            feature_names=["f"])],
        optimizer_type="rowwise_adagrad",
        optimizer_kwargs={"learning_rate": 0.1},
    )
    params, states = febc.init_full_state(jax.random.key(0))
    kjt = KeyedJaggedTensor(keys=["f"], values=jnp.asarray([1, 2], jnp.int32),
                            lengths=jnp.asarray([[1, 1]], jnp.int32))
    kt, p2, s2 = jax.jit(febc.forward_backward)(
        params, states, kjt, jnp.ones((2, 8))
    )
    assert kt.values().shape == (2, 8)
    assert not np.allclose(
        np.asarray(febc.table_slice(p2, "t"))[1],
        np.asarray(febc.table_slice(params, "t"))[1],
    )
    assert hasattr(Multistreamable, "record_stream")
    assert hasattr(Pipelineable, "to")


def test_quant_schema():
    """Round-2 quant surface (reference quant/embedding_modules.py:739,
    1054, 1207 + distributed/quant_embedding.py:597)."""
    from torchrec_tpu.quant import (
        QuantEmbeddingBagCollection,
        QuantEmbeddingCollection,
        QuantManagedCollisionEmbeddingBagCollection,
        QuantManagedCollisionEmbeddingCollection,
    )
    from torchrec_tpu.inference import (
        ShardedQuantEmbeddingBagCollection,
        ShardedQuantEmbeddingCollection,
    )

    assert sig_params(QuantEmbeddingCollection.__init__) == [
        "self", "ec", "data_type",
    ]
    assert sig_params(ShardedQuantEmbeddingCollection.__init__) == [
        "self", "qec", "mesh", "axis", "placement",
    ]
    for cls in [
        QuantEmbeddingBagCollection,
        QuantEmbeddingCollection,
        QuantManagedCollisionEmbeddingBagCollection,
        QuantManagedCollisionEmbeddingCollection,
        ShardedQuantEmbeddingBagCollection,
        ShardedQuantEmbeddingCollection,
    ]:
        assert hasattr(cls, "apply"), cls.__name__


def test_eviction_policy_schema():
    """Virtual-table eviction-policy family (reference
    modules/embedding_configs.py:181-359)."""
    from torchrec_tpu.modules import (
        CountBasedEvictionPolicy,
        CountTimestampMixedEvictionPolicy,
        FeatureL2NormBasedEvictionPolicy,
        FeatureScoreBasedEvictionPolicy,
        NoEvictionPolicy,
        TimestampBasedEvictionPolicy,
        VirtualTableEvictionPolicy,
    )

    for cls in [
        NoEvictionPolicy, CountBasedEvictionPolicy,
        TimestampBasedEvictionPolicy, CountTimestampMixedEvictionPolicy,
        FeatureL2NormBasedEvictionPolicy, FeatureScoreBasedEvictionPolicy,
    ]:
        assert issubclass(cls, VirtualTableEvictionPolicy), cls.__name__
    p = sig_params(CountBasedEvictionPolicy.__init__)
    for name in ["eviction_threshold", "decay_rate"]:
        assert name in p, name


def test_dynamic_embedding_schema():
    """PS storage-plugin ABI surface (reference
    csrc/dynamic_embedding/details/io_registry.cpp)."""
    from torchrec_tpu.dynamic_embedding import (
        IDTransformer,
        IDTransformerCollection,
        ParameterServer,
        register_io_plugin,
    )

    assert sig_params(ParameterServer.__init__) == [
        "self", "dim", "provider", "config",
    ]
    assert sig_params(register_io_plugin) == ["so_path"]
    for method in ["push", "pull", "scan"]:
        assert hasattr(ParameterServer, method), method
    assert hasattr(IDTransformer, "evict")
    assert hasattr(IDTransformer, "transform")
    assert IDTransformerCollection is not None


def test_dmp_and_env_schema():
    """DMP input-dist switch + hierarchical (host, chip) ShardingEnv +
    fused_params threading (round-2 VERDICT items #1/#4/carry-over)."""
    from torchrec_tpu.distributed import FusedParams, ShardingEnv
    from torchrec_tpu.distributed.model_parallel import (
        DistributedModelParallel,
    )

    assert sig_params(DistributedModelParallel.__init__) == [
        "self", "model", "env", "plan", "planner", "batch_size",
        "input_dist", "a2a_capacity_factor", "fused_params",
    ]
    assert sig_params(ShardingEnv.from_devices) == [
        "devices", "replica_size", "local_size", "hierarchical",
    ]
    fp = sig_params(FusedParams)
    for name in ["optimizer", "learning_rate", "stochastic_rounding",
                 "max_unique_gradient_rows", "cache_load_factor"]:
        assert name in fp, name


def test_sharded_mc_and_itep_schema():
    """Sharded MC-EC + sharded ITEP (reference distributed/mc_embedding.py:55,
    distributed/itep_embeddingbag.py:70,349)."""
    from torchrec_tpu.distributed.itep_embeddingbag import (
        ShardedITEPEmbeddingBagCollection,
    )
    from torchrec_tpu.distributed.mc_embedding import (
        ShardedManagedCollisionEmbeddingCollection,
    )
    from torchrec_tpu.distributed.mc_embeddingbag import (
        ShardedManagedCollisionEmbeddingBagCollection,
    )

    assert sig_params(ShardedManagedCollisionEmbeddingCollection.__init__) \
        == ["self", "mc_ec", "plan", "env"]
    assert sig_params(ShardedITEPEmbeddingBagCollection.__init__) == [
        "self", "itep_ebc", "plan", "env",
    ]
    assert ShardedManagedCollisionEmbeddingBagCollection is not None


def test_kv_embedding_schema():
    from torchrec_tpu.modules import KeyValueEmbeddingBagCollection

    assert sig_params(KeyValueEmbeddingBagCollection.__init__) == [
        "self", "tables", "cache_rows", "optimizer_state_width",
        "ps_provider", "ps_config", "max_unique_gradient_rows",
    ]
