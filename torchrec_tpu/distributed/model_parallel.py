"""DistributedModelParallel — shard a model's embedding collections and
train data-parallel dense + model-parallel sparse in ONE SPMD program.

Capability parity with torchrec/distributed/model_parallel.py
(DistributedModelParallel:255: plan -> swap modules -> fused optimizers ->
DDP-wrap dense). TPU-first shape:

* the "module swap" is building a ShardedEmbeddingBagCollection from the
  plan; the "DDP wrap" is running dense params replicated inside shard_map
  with psum'd gradients;
* the whole train step (embedding fwd -> dense fwd/bwd -> fused sparse
  update -> dense optimizer) is a single jitted, donated shard_map program —
  XLA schedules the collectives (input/output dists) to overlap with dense
  compute, which is what the reference needs train-pipeline stream juggling
  for (train_pipelines.py:530).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchrec_tpu.distributed.embeddingbag import ShardedEmbeddingBagCollection
from torchrec_tpu.distributed.sharding_plan import (
    construct_module_sharding_plan,
    row_wise,
    table_wise,
)
from torchrec_tpu.distributed.types import (
    EmbeddingModuleShardingPlan,
    ShardingEnv,
)
from torchrec_tpu.models.dlrm import DLRM, bce_with_logits
from torchrec_tpu.ops.fused_optim import EmbeddingOptimizer
from torchrec_tpu.training import Batch, TrainState

__all__ = ["DistributedModelParallel", "default_plan"]

P = jax.sharding.PartitionSpec


def _infer_generation(device) -> str:
    kind = getattr(device, "device_kind", "").lower()
    for gen in ("v5p", "v5e", "v6e", "v4"):
        if gen in kind:
            return gen
    if "v5" in kind:  # 'TPU v5 lite' etc.
        return "v5e" if "lite" in kind else "v5p"
    return "v5e"


def default_plan(
    tables, env: ShardingEnv, rw_threshold_rows: int = 8192
) -> EmbeddingModuleShardingPlan:
    """Planner-less default placement (the planner module refines this):
    large tables row-wise, small tables table-wise round-robin by size
    (greedy bin-packing like the reference's get_default_sharders path)."""
    sizes = sorted(
        tables, key=lambda t: t.num_embeddings * t.embedding_dim, reverse=True
    )
    per_param = {}
    load = [0] * env.world_size
    for t in sizes:
        if t.num_embeddings >= rw_threshold_rows:
            per_param[t.name] = row_wise()
        else:
            rank = int(np.argmin(load))
            load[rank] += t.num_embeddings * t.embedding_dim
            per_param[t.name] = table_wise(rank)
    return construct_module_sharding_plan(tables, per_param, env)


class DistributedModelParallel:
    """Sharded training facade for DLRM-family models."""

    def __init__(
        self,
        model: DLRM,
        env: Optional[ShardingEnv] = None,
        plan: Optional[EmbeddingModuleShardingPlan] = None,
        planner=None,
        batch_size: int = 512,
    ):
        self.model = model
        self.env = env if env is not None else ShardingEnv.from_devices()
        tables = model.embedding_bag_collection._tables
        if plan is None:
            if planner is None:
                # cost-model planner on the matching topology (the reference
                # runs EmbeddingShardingPlanner by default, model_parallel.py:291)
                from torchrec_tpu.planner import EmbeddingShardingPlanner, Topology

                dev = self.env.mesh.devices.flat[0]
                gen = _infer_generation(dev)
                planner = EmbeddingShardingPlanner(
                    Topology(
                        world_size=self.env.world_size,
                        generation=gen,
                        local_world_size=self.env.local_size,
                    ),
                    batch_size=batch_size,
                )
            plan = planner.plan(tables)
        self.plan = plan
        self.sharded_ebc = ShardedEmbeddingBagCollection(
            model.embedding_bag_collection, self.plan, self.env
        )

    # ---------------------------------------------------------------- state
    def init_train_state(
        self,
        key: jax.Array,
        emb_optimizer: EmbeddingOptimizer,
        dense_tx: optax.GradientTransformation,
    ) -> TrainState:
        params = self.model.init(key)
        unsharded_sparse = params.pop("sparse")
        sparse_params = self.sharded_ebc.shard_params(unsharded_sparse)
        replicated = jax.sharding.NamedSharding(self.env.mesh, P())
        dense_params = jax.device_put(params, replicated)
        state = TrainState(
            sparse_params=sparse_params,
            dense_params=dense_params,
            emb_opt_state=self.sharded_ebc.init_optimizer(
                sparse_params, emb_optimizer
            ),
            dense_opt_state=jax.device_put(dense_tx.init(params), replicated),
            step=jax.device_put(jnp.zeros((), jnp.int32), replicated),
        )
        return state

    # -------------------------------------------------------------- training
    def make_train_step(
        self,
        emb_optimizer: EmbeddingOptimizer,
        dense_tx: optax.GradientTransformation,
        loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = bce_with_logits,
        lr_schedule=None,
        example_state: Optional[TrainState] = None,
    ):
        """Build the jitted SPMD train step.

        ``step(state, batch) -> (state, aux)`` with:
          * batch.dense_features/labels batch-sharded over the shard axis,
          * batch.sparse_features (KJT) replicated,
          * aux.loss replicated scalar, aux.logits/labels batch-sharded.
        """
        from jax import shard_map

        model = self.model
        sebc = self.sharded_ebc
        env = self.env
        axis = env.shard_axis
        w = env.world_size

        def local_step(state: TrainState, batch: Batch):
            kjt = batch.sparse_features
            emb_values = sebc.apply_local(state.sparse_params, kjt)
            # [B_local, total_dim]

            def objective(dense_params, emb_values):
                logits = model.forward_dense(
                    dense_params, batch.dense_features, emb_values
                )
                # sum/global_B so per-device grads add up to the global-mean
                # gradient under psum
                losses = loss_fn(logits, batch.labels.astype(jnp.float32))
                return losses / w, logits

            (local_loss, logits), (dense_grads, emb_grad) = jax.value_and_grad(
                objective, argnums=(0, 1), has_aux=True
            )(state.dense_params, emb_values)

            lr = lr_schedule(state.step) if lr_schedule is not None else None
            new_sparse, new_emb_state = sebc.apply_gradients_local(
                state.sparse_params,
                state.emb_opt_state,
                emb_optimizer,
                kjt,
                emb_grad,
                lr=lr,
            )
            dense_grads = jax.lax.psum(dense_grads, axis)
            updates, new_dense_opt = dense_tx.update(
                dense_grads, state.dense_opt_state, state.dense_params
            )
            new_dense = optax.apply_updates(state.dense_params, updates)
            loss = jax.lax.psum(local_loss, axis)
            new_state = TrainState(
                sparse_params=new_sparse,
                dense_params=new_dense,
                emb_opt_state=new_emb_state,
                dense_opt_state=new_dense_opt,
                step=state.step + 1,
            )
            return new_state, {
                "loss": loss,
                "logits": jax.lax.stop_gradient(logits),
                "labels": batch.labels,
            }

        state_specs = self._state_specs(example_state, emb_optimizer, dense_tx)
        batch_specs = Batch(
            dense_features=P(axis), sparse_features=P(), labels=P(axis)
        )
        aux_specs = {"loss": P(), "logits": P(axis), "labels": P(axis)}

        fn = shard_map(
            local_step,
            mesh=env.mesh,
            in_specs=(state_specs, batch_specs),
            out_specs=(state_specs, aux_specs),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(0,))

    def _state_specs(self, example_state, emb_optimizer, dense_tx):
        axis = self.env.shard_axis
        sparse_specs = self.sharded_ebc._param_specs()
        if example_state is None:
            # build a throwaway state skeleton to derive opt-state structure
            example_state = self.init_train_state(
                jax.random.key(0), emb_optimizer, dense_tx
            )
        emb_state_specs = {
            k: jax.tree_util.tree_map(
                lambda v: P(axis, *([None] * (v.ndim - 1)))
                if not k.startswith("dp_")
                else P(),
                sub,
            )
            for k, sub in example_state.emb_opt_state.items()
        }
        dense_specs = jax.tree_util.tree_map(
            lambda _: P(), example_state.dense_params
        )
        dense_opt_specs = jax.tree_util.tree_map(
            lambda _: P(), example_state.dense_opt_state
        )
        return TrainState(
            sparse_params=sparse_specs,
            dense_params=dense_specs,
            emb_opt_state=emb_state_specs,
            dense_opt_state=dense_opt_specs,
            step=P(),
        )
