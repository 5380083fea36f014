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
    device_put_global,
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


def _assert_plan_consistent(plan) -> None:
    """Multi-process plan agreement check (reference collective_plan
    broadcasts rank 0's plan, planners.py:766 +
    collective_utils.py:47; ours is host-deterministic, so rank 0's hash
    is broadcast and every process verifies its own matches)."""
    import hashlib

    from jax.experimental import multihost_utils

    canon = repr(sorted((k, repr(v)) for k, v in plan.items()))
    # int32 words: jax x64 is disabled, an int64 scalar would silently wrap
    h = np.frombuffer(
        hashlib.sha256(canon.encode()).digest()[:16], dtype=np.int32
    )
    h0 = np.asarray(multihost_utils.broadcast_one_to_all(h))
    if not np.array_equal(h0, h):
        raise RuntimeError(
            "sharding plan differs across processes (planner inputs must "
            "be identical on every process; process 0 hash "
            f"{h0.tolist()}, local {h.tolist()})"
        )


class _StepFn:
    """Callable wrapper around the jitted SPMD step that makes
    ``input_dist`` transparent at the call site: a bucketized DMP fed a
    raw-KJT batch auto-prepares it host-side (prepare_batch), and a
    replicated DMP fed a prepared StackedSparse batch raises an
    actionable error instead of a pytree-structure traceback. Exposes
    ``.lower`` (AOT workflows call ``step.lower(...).compile()``)."""

    def __init__(self, jit_fn, dmp):
        self._jit_fn = jit_fn
        self._dmp = dmp

    def _dispatch_batch(self, batch):
        from torchrec_tpu.distributed.input_dist import StackedSparse

        sf = batch.sparse_features
        prepared = isinstance(sf, StackedSparse)
        if self._dmp.input_dist == "bucketized" and not prepared:
            # transparent auto-prepare (single-process hosts feed the
            # global batch; multi-process callers should prepare
            # explicitly with process_local=True)
            return self._dmp.prepare_batch(batch)
        if self._dmp.input_dist == "replicated" and prepared:
            raise TypeError(
                "this DistributedModelParallel runs "
                "input_dist='replicated' but the batch was already "
                "prepared into per-device streams (StackedSparse) — "
                "pass the raw KJT batch, or construct the DMP with "
                "input_dist='bucketized'"
            )
        return batch

    def __call__(self, state, batch):
        return self._jit_fn(state, self._dispatch_batch(batch))

    def lower(self, *args, **kwargs):
        return self._jit_fn.lower(*args, **kwargs)

    def __getattr__(self, name):
        return getattr(self._jit_fn, name)


class DistributedModelParallel:
    """Sharded training facade for DLRM-family models."""

    # world size at which input_dist="auto" switches to the bucketized
    # (KJT-all-to-all) path: replicated input bytes grow O(world x ids).
    # 16 = the first rung past the single-host v5e-8 (callers there keep
    # the simpler replicated contract unless they opt in).
    AUTO_BUCKETIZED_WORLD = 16

    def __init__(
        self,
        model: DLRM,
        env: Optional[ShardingEnv] = None,
        plan: Optional[EmbeddingModuleShardingPlan] = None,
        planner=None,
        batch_size: int = 512,
        input_dist: str = "auto",
        a2a_capacity_factor: float = 2.0,
        fused_params=None,
    ):
        """``input_dist``: ``"replicated"`` feeds every device the global
        KJT (small-world / inference default); ``"bucketized"`` expects
        ``batch.sparse_features`` to be a ``StackedSparse`` of per-device
        streams (see :meth:`prepare_batch`) and runs the KJT-all-to-all
        path — per-device sparse work AND wire cost are O(global ids /
        world), the reference's RwSparseFeaturesDist + KJTAllToAll
        scaling property. ``"auto"`` (default) picks bucketized at
        ``world_size >= AUTO_BUCKETIZED_WORLD`` (the replicated form's
        O(world x ids) input bytes stop being noise there) and
        replicated below; :meth:`prepare_batch` follows the choice, so
        auto is transparent to callers that feed batches through it."""
        if env is None:
            env = ShardingEnv.from_devices()
        if input_dist == "auto":
            input_dist = (
                "bucketized"
                if env.world_size >= self.AUTO_BUCKETIZED_WORLD
                else "replicated"
            )
        if input_dist not in ("replicated", "bucketized"):
            raise ValueError(f"unknown input_dist {input_dist!r}")
        self.input_dist = input_dist
        self.model = model
        self.env = env if env is not None else ShardingEnv.from_devices()
        ebc = getattr(model, "embedding_bag_collection", None) or getattr(
            model, "ebc", None
        )
        if ebc is None:
            raise TypeError(
                "model must expose its EmbeddingBagCollection as "
                "`.embedding_bag_collection` or `.ebc` (the DMP model "
                "contract also needs forward_sparse/forward_dense/init)"
            )
        self._ebc_module = ebc
        if fused_params is not None:
            from torchrec_tpu.distributed.fused_params import (
                apply_fused_params,
            )

            apply_fused_params(ebc, fused_params)
        self.fused_params = fused_params
        tables = ebc._tables
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
        if jax.process_count() > 1:
            _assert_plan_consistent(plan)
        self.sharded_ebc = ShardedEmbeddingBagCollection(
            self._ebc_module, self.plan, self.env,
            a2a_capacity_factor=a2a_capacity_factor,
        )

    def prepare_batch(self, batch: Batch, process_local: bool = False) -> Batch:
        """Host-side input prep for the bucketized path: split the KJT into
        per-device streams (the input pipeline would produce these directly
        in production).

        ``process_local=True`` (multi-process runtime): ``batch`` covers
        only THIS process's slice of the global batch — its examples are
        split across the process's local devices and assembled into global
        arrays via :meth:`make_global_batch`. This is the per-process input
        contract of the reference's env-derived process groups
        (torchrec/distributed/comm.py:164): each rank feeds its own batch.
        Every process's local batch must have the same example count and
        padded KJT capacity. Only supported with
        ``input_dist='bucketized'``: the replicated-input path needs the
        identical GLOBAL KJT on every process (see
        :meth:`make_global_batch`), which contradicts the per-slice
        contract — feed the full batch everywhere instead.
        """
        if self.input_dist != "bucketized":
            if process_local and jax.process_count() > 1:
                raise ValueError(
                    "prepare_batch(process_local=True) requires "
                    "input_dist='bucketized': the replicated-input path "
                    "places the KJT with a fully replicated sharding, which "
                    "needs the identical GLOBAL batch on every process — "
                    "pass the full batch with process_local=False instead"
                )
            return self.make_global_batch(batch) if process_local else batch
        from torchrec_tpu.distributed.input_dist import stack_sparse

        world = (
            jax.local_device_count() if process_local else self.env.world_size
        )
        kjt = batch.sparse_features.select_keys(
            self._ebc_module._feature_names
        )
        cap_local = None
        if process_local:
            # cap must be identical on every process (the default derives
            # it from THIS batch's data, which would give the processes
            # different global shapes — a collective size mismatch); use
            # the static padded capacity instead
            cap_local = -(-int(kjt.values().shape[0]) // world)
            cap_local = -(-cap_local // 8) * 8
        out = Batch(
            dense_features=batch.dense_features,
            sparse_features=stack_sparse(kjt, world, cap_local),
            labels=batch.labels,
        )
        return self.make_global_batch(out) if process_local else out

    def make_global_batch(self, batch: Batch) -> Batch:
        """Assemble per-PROCESS batch shards into global arrays for the
        jitted SPMD step (multi-process runtime; reference analog: each
        rank's dataloader feeding its own process, multi_process.py:126).

        Sharded leaves (dense/labels, bucketized sparse streams) carry only
        this process's rows; a replicated KJT must be passed identically on
        every process. No-op placement on a single-process env.
        """
        mesh = self.env.mesh
        if jax.process_count() == 1:
            return batch
        axis = self.env.shard_axis

        def leaf(x, spec):
            sh = jax.sharding.NamedSharding(mesh, spec)
            return jax.make_array_from_process_local_data(sh, np.asarray(x))

        sf = batch.sparse_features
        if self.input_dist == "bucketized":
            from torchrec_tpu.distributed.input_dist import StackedSparse

            sparse = StackedSparse(
                values=leaf(sf.values, P(axis)),
                lengths=leaf(sf.lengths, P(axis)),
                weights=(
                    None if sf.weights is None else leaf(sf.weights, P(axis))
                ),
            )
        else:
            sparse = jax.tree_util.tree_map(lambda v: leaf(v, P()), sf)
        return Batch(
            dense_features=leaf(batch.dense_features, P(axis)),
            sparse_features=sparse,
            labels=leaf(batch.labels, P(axis)),
        )

    # ---------------------------------------------------------------- state
    def init_train_state(
        self,
        key: jax.Array,
        emb_optimizer: Optional[EmbeddingOptimizer] = None,
        dense_tx: optax.GradientTransformation = None,
    ) -> TrainState:
        if emb_optimizer is None:
            fp = getattr(self, "fused_params", None)
            emb_optimizer = fp.make_optimizer() if fp is not None else None
            if emb_optimizer is None:
                raise ValueError(
                    "emb_optimizer required (or pass fused_params with an "
                    "optimizer name to DistributedModelParallel)"
                )
        if dense_tx is None:
            raise ValueError(
                "dense_tx (an optax.GradientTransformation for the dense "
                "arch, e.g. optax.adagrad(0.01)) is required — only the "
                "SPARSE optimizer can come from fused_params"
            )
        params = self.model.init(key)
        unsharded_sparse = params.pop("sparse")
        sparse_params = self.sharded_ebc.shard_params(unsharded_sparse)
        replicated = jax.sharding.NamedSharding(self.env.mesh, P())
        dense_params = jax.tree_util.tree_map(
            lambda v: device_put_global(v, replicated), params
        )
        state = TrainState(
            sparse_params=sparse_params,
            dense_params=dense_params,
            emb_opt_state=self.sharded_ebc.init_optimizer(
                sparse_params, emb_optimizer
            ),
            dense_opt_state=jax.tree_util.tree_map(
                lambda v: device_put_global(v, replicated),
                dense_tx.init(params),
            ),
            step=device_put_global(jnp.zeros((), jnp.int32), replicated),
        )
        return state

    # -------------------------------------------------------------- training
    def make_train_step(
        self,
        emb_optimizer: Optional[EmbeddingOptimizer] = None,
        dense_tx: optax.GradientTransformation = None,
        loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = bce_with_logits,
        lr_schedule=None,
        example_state: Optional[TrainState] = None,
    ):
        """Build the jitted SPMD train step.

        ``emb_optimizer`` may be omitted when ``fused_params`` named one
        (the apply_optimizer_in_backward analog — the sharding config
        owns the sparse optimizer).

        ``step(state, batch) -> (state, aux)`` with:
          * batch.dense_features/labels batch-sharded over the shard axis,
          * batch.sparse_features (KJT) replicated,
          * aux.loss replicated scalar, aux.logits/labels batch-sharded.

        ``input_dist`` transparency: when this DMP resolved to
        ``bucketized`` (explicitly or via ``"auto"`` at large world
        sizes) and the batch still carries a raw KJT, the step
        auto-prepares it host-side (``prepare_batch``) before
        dispatching — callers never see the StackedSparse contract
        unless they opt into preparing batches in their input pipeline
        (which skips the per-step host work). A replicated DMP fed an
        already-prepared batch raises a TypeError naming the fix.
        """
        from jax import shard_map

        if emb_optimizer is None:
            fp = getattr(self, "fused_params", None)
            emb_optimizer = fp.make_optimizer() if fp is not None else None
            if emb_optimizer is None:
                raise ValueError(
                    "emb_optimizer required (or pass fused_params with an "
                    "optimizer name to DistributedModelParallel)"
                )
        if dense_tx is None:
            raise ValueError(
                "dense_tx (an optax.GradientTransformation for the dense "
                "arch) is required — only the SPARSE optimizer can come "
                "from fused_params"
            )
        model = self.model
        sebc = self.sharded_ebc
        env = self.env
        axis = env.shard_axis
        w = env.world_size

        bucketized = self.input_dist == "bucketized"

        def local_step(state: TrainState, batch: Batch):
            if bucketized:
                sv, sl, sw = batch.sparse_features.local()
                emb_values, dropped = sebc.apply_local_bucketized(
                    state.sparse_params, sv, sl, sw
                )
            else:
                kjt = batch.sparse_features
                emb_values = sebc.apply_local(state.sparse_params, kjt)
                dropped = jnp.zeros((), jnp.int32)
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
            if bucketized:
                new_sparse, new_emb_state = (
                    sebc.apply_gradients_local_bucketized(
                        state.sparse_params,
                        state.emb_opt_state,
                        emb_optimizer,
                        sv, sl, sw,
                        emb_grad,
                        lr=lr,
                    )
                )
            else:
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
                "a2a_dropped": dropped,
            }

        state_specs = self._state_specs(example_state, emb_optimizer, dense_tx)
        if bucketized:
            from torchrec_tpu.distributed.input_dist import StackedSparse

            sparse_spec = StackedSparse(
                values=P(axis),
                lengths=P(axis),
                weights=P(axis) if self._ebc_module.is_weighted() else None,
            )
        else:
            sparse_spec = P()
        batch_specs = Batch(
            dense_features=P(axis), sparse_features=sparse_spec,
            labels=P(axis),
        )
        aux_specs = {
            "loss": P(), "logits": P(axis), "labels": P(axis),
            "a2a_dropped": P(),
        }

        fn = shard_map(
            local_step,
            mesh=env.mesh,
            in_specs=(state_specs, batch_specs),
            out_specs=(state_specs, aux_specs),
            check_vma=False,
        )
        return _StepFn(jax.jit(fn, donate_argnums=(0,)), self)

    def make_eval_step(
        self,
        loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = bce_with_logits,
        example_state: Optional[TrainState] = None,
    ):
        """Forward-only SPMD evaluation step (EvalPipelineSparseDist
        analog, reference train_pipelines.py:2259 — the sharded
        counterpart of training.make_eval_step). ``eval_step(state,
        batch) -> aux`` with replicated loss and batch-sharded
        logits/labels; no parameter mutation, no donation."""
        from jax import shard_map

        if example_state is None:
            raise ValueError(
                "pass example_state (e.g. the trained TrainState): eval "
                "has no optimizer args to build a state skeleton from"
            )
        model = self.model
        sebc = self.sharded_ebc
        env = self.env
        axis = env.shard_axis
        w = env.world_size
        bucketized = self.input_dist == "bucketized"

        def local_eval(state: TrainState, batch: Batch):
            dropped = jnp.zeros((), jnp.int32)
            if bucketized:
                sv, sl, sw = batch.sparse_features.local()
                emb_values, dropped = sebc.apply_local_bucketized(
                    state.sparse_params, sv, sl, sw
                )
                # surface a2a-capacity overflow exactly like the train step
                # ("a2a_dropped" aux) — eval silently losing ids would skew
                # metrics with no signal
                dropped = jax.lax.psum(dropped, axis)
            else:
                emb_values = sebc.apply_local(
                    state.sparse_params, batch.sparse_features
                )
            logits = model.forward_dense(
                state.dense_params, batch.dense_features, emb_values
            )
            loss = jax.lax.psum(
                loss_fn(logits, batch.labels.astype(jnp.float32)) / w, axis
            )
            return {
                "loss": loss,
                "logits": logits,
                "labels": batch.labels,
                "a2a_dropped": dropped,
            }

        state_specs = self._state_specs(example_state, None, None)
        if bucketized:
            from torchrec_tpu.distributed.input_dist import StackedSparse

            sparse_spec = StackedSparse(
                values=P(axis),
                lengths=P(axis),
                weights=P(axis) if self._ebc_module.is_weighted() else None,
            )
        else:
            sparse_spec = P()
        batch_specs = Batch(
            dense_features=P(axis), sparse_features=sparse_spec,
            labels=P(axis),
        )
        aux_specs = {
            "loss": P(), "logits": P(axis), "labels": P(axis),
            "a2a_dropped": P(),
        }
        fn = shard_map(
            local_eval,
            mesh=env.mesh,
            in_specs=(state_specs, batch_specs),
            out_specs=aux_specs,
            check_vma=False,
        )
        return _StepFn(jax.jit(fn), self)

    def _state_specs(self, example_state, emb_optimizer, dense_tx):
        axis = self.env.shard_axis
        sparse_specs = self.sharded_ebc._param_specs()
        if example_state is None:
            # build a throwaway state skeleton to derive opt-state
            # structure. NOTE: this materializes the full state (tables +
            # optimizer buffers) — shard_params is host-side (np.asarray),
            # so jax.eval_shape cannot trace init_train_state abstractly.
            # Pass example_state (the state you just initialized) to skip
            # this allocation on big models.
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


def stack_replica_batches(batches) -> Batch:
    """Stack one Batch per replica group into the 2D layout DMPCollection
    trains on: dense/labels rows replica-major ([R*B, ...], split over
    ('replica','shard')); KJT buffers concatenated group-major (values
    [R*cap] split over 'replica'; lengths columns [F, R*B] grouped by
    replica so each group sees a consistent local KJT)."""
    kjts = [b.sparse_features for b in batches]
    keys = kjts[0].keys()
    values = jnp.concatenate([k.values() for k in kjts])
    lengths = jnp.concatenate([k.lengths() for k in kjts], axis=1)
    weights = None
    if kjts[0].weights_or_none() is not None:
        weights = jnp.concatenate([k.weights() for k in kjts])
    from torchrec_tpu.sparse import KeyedJaggedTensor

    return Batch(
        dense_features=jnp.concatenate([b.dense_features for b in batches]),
        sparse_features=KeyedJaggedTensor(
            keys=keys, values=values, lengths=lengths, weights=weights
        ),
        labels=jnp.concatenate([b.labels for b in batches]),
    )


class DMPCollection(DistributedModelParallel):
    """2D parallelism: model sharded over the 'shard' axis, replicated
    across 'replica' groups, with periodic cross-replica weight sync.

    Capability parity with torchrec/distributed/model_parallel.py
    DMPCollection (:1028): each replica group holds a full sharded copy of
    the embedding tables and trains on its own batch slice; every
    ``sync_interval`` steps the sparse tables + fused optimizer state are
    averaged across groups on the 'replica' axis (the reference's replica-PG
    allreduce, :1037-1046). Dense params are plain DP over ALL devices
    (grads psum'd over both axes every step).

    TPU-first: the whole thing is one shard_map over a (replica, shard)
    mesh; within-group collectives ride the 'shard' axis exactly as in the
    1D program, so the 1D lookup/update code is reused unchanged.
    """

    def __init__(
        self,
        model: DLRM,
        env: ShardingEnv,
        plan: Optional[EmbeddingModuleShardingPlan] = None,
        sync_interval: int = 1,
        **kwargs,
    ):
        if env.replica_axis is None:
            raise ValueError(
                "DMPCollection needs a 2D env "
                "(ShardingEnv.from_devices(replica_size=R))"
            )
        if kwargs.get("input_dist", "replicated") != "replicated":
            # the 2D train step only implements the replicated input dist;
            # silently accepting "bucketized" would either crash on a
            # prepared StackedSparse batch or quietly train replicated
            raise NotImplementedError(
                "DMPCollection supports input_dist='replicated' only (the "
                "1D DistributedModelParallel has the bucketized a2a path)"
            )
        # pin it: the parent's default is "auto", which resolves to
        # bucketized at large world sizes — the 2D step is replicated-only
        kwargs["input_dist"] = "replicated"
        self.sync_interval = sync_interval
        super().__init__(model, env, plan, **kwargs)

    def make_train_step(
        self,
        emb_optimizer: EmbeddingOptimizer,
        dense_tx: optax.GradientTransformation,
        loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = bce_with_logits,
        lr_schedule=None,
        example_state: Optional[TrainState] = None,
    ):
        """step(state, stacked_batch) with stacked_batch from
        stack_replica_batches (leading axis = replica groups)."""
        from jax import shard_map

        model = self.model
        sebc = self.sharded_ebc
        env = self.env
        axis = env.shard_axis
        raxis = env.replica_axis
        w = env.world_size
        r = env.num_replicas
        sync_interval = self.sync_interval

        def local_step(state: TrainState, batch: Batch):
            kjt = batch.sparse_features  # local group's KJT (full buffers)
            emb_values = sebc.apply_local(state.sparse_params, kjt)

            def objective(dense_params, emb_values):
                logits = model.forward_dense(
                    dense_params, batch.dense_features, emb_values
                )
                losses = loss_fn(logits, batch.labels.astype(jnp.float32))
                return losses / (w * r), logits

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

            # periodic replica sync (reference weight-sync allreduce)
            def sync(args):
                def avg(x):
                    if jnp.issubdtype(x.dtype, jnp.integer):
                        return jax.lax.pmax(x, raxis)
                    return jax.lax.pmean(x, raxis)

                return jax.tree_util.tree_map(avg, args)

            new_step = state.step + 1
            new_sparse, new_emb_state = jax.lax.cond(
                new_step % sync_interval == 0,
                sync,
                lambda a: a,
                (new_sparse, new_emb_state),
            )

            dense_grads = jax.lax.psum(dense_grads, (raxis, axis))
            updates, new_dense_opt = dense_tx.update(
                dense_grads, state.dense_opt_state, state.dense_params
            )
            new_dense = optax.apply_updates(state.dense_params, updates)
            loss = jax.lax.psum(local_loss, (raxis, axis))
            new_state = TrainState(
                sparse_params=new_sparse,
                dense_params=new_dense,
                emb_opt_state=new_emb_state,
                dense_opt_state=new_dense_opt,
                step=new_step,
            )
            return new_state, {
                "loss": loss,
                "logits": jax.lax.stop_gradient(logits),
                "labels": batch.labels,
            }

        state_specs = self._state_specs(example_state, emb_optimizer, dense_tx)

        # KJT leaves: values [R*cap] over replica; lengths [F, R*B] over
        # replica on the batch dim; weights like values
        def kjt_specs(kjt):
            leaves, treedef = jax.tree_util.tree_flatten(kjt)
            specs = []
            for leaf in leaves:
                specs.append(P(env.replica_axis) if leaf.ndim == 1 else P(None, env.replica_axis))
            return jax.tree_util.tree_unflatten(treedef, specs)

        def step(state, batch):
            batch_specs = Batch(
                dense_features=P((env.replica_axis, axis)),
                sparse_features=kjt_specs(batch.sparse_features),
                labels=P((env.replica_axis, axis)),
            )
            aux_specs = {
                "loss": P(),
                "logits": P((env.replica_axis, axis)),
                "labels": P((env.replica_axis, axis)),
            }
            fn = shard_map(
                local_step,
                mesh=env.mesh,
                in_specs=(state_specs, batch_specs),
                out_specs=(state_specs, aux_specs),
                check_vma=False,
            )
            return fn(state, batch)

        return _StepFn(jax.jit(step, donate_argnums=(0,)), self)
