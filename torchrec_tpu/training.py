"""Train-step factory: fused sparse update + optax dense update in ONE jit.

The reference's training recipe (examples/golden_training/train_dlrm.py:
meta-device model -> apply_optimizer_in_backward -> DMP ->
TrainPipelineSparseDist) maps to a single donated jitted step here:

  * embedding forward is taken out of the autodiff graph; ``jax.value_and_grad``
    differentiates the dense remainder w.r.t. (dense params, pooled values)
  * the pooled-value cotangent feeds the fused sparse optimizer
    (EmbeddingBagCollection.apply_gradients) — no dense table grads
  * dense params update via any optax transform

XLA overlaps/fuses everything inside the step; cross-step overlap comes from
the input pipeline (train_pipeline module).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from torchrec_tpu.models.dlrm import DLRM, bce_with_logits
from torchrec_tpu.ops.fused_optim import EmbeddingOptimizer
from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = [
    "TrainState",
    "Batch",
    "GradientAccumulationConfig",
    "make_train_step",
    "make_eval_step",
    "make_semi_sync_train_step",
    "make_grad_accum_train_step",
    "stack_batches",
    "init_train_state",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Batch:
    """One training batch (reference torchrec/datasets/utils.py Batch):
    dense float features, sparse KJT, labels."""

    dense_features: jnp.ndarray  # [B, num_dense]
    sparse_features: KeyedJaggedTensor
    labels: jnp.ndarray  # [B]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Carried train-step state: params + optimizer states (reference train_pipeline context)."""

    sparse_params: Dict[str, jnp.ndarray]
    dense_params: Dict[str, Any]
    emb_opt_state: Dict[str, Dict[str, jnp.ndarray]]
    dense_opt_state: Any
    step: jnp.ndarray


def init_train_state(
    model: DLRM,
    key: jax.Array,
    emb_optimizer: EmbeddingOptimizer,
    dense_tx: optax.GradientTransformation,
) -> TrainState:
    params = model.init(key)
    sparse_params = params.pop("sparse")
    return TrainState(
        sparse_params=sparse_params,
        dense_params=params,
        emb_opt_state=model.embedding_bag_collection.init_optimizer(
            sparse_params, emb_optimizer
        ),
        dense_opt_state=dense_tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    model: DLRM,
    emb_optimizer: EmbeddingOptimizer,
    dense_tx: optax.GradientTransformation,
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = bce_with_logits,
    lr_schedule: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Returns ``step(state, batch) -> (state, aux)``; jit with
    ``donate_argnums=(0,)`` for in-place HBM table updates."""

    ebc = model.embedding_bag_collection

    def step(state: TrainState, batch: Batch):
        kjt = batch.sparse_features
        emb_values = model.forward_sparse({"sparse": state.sparse_params}, kjt)

        def objective(dense_params, emb_values):
            logits = model.forward_dense(
                dense_params, batch.dense_features, emb_values
            )
            loss = loss_fn(logits, batch.labels.astype(jnp.float32))
            return loss, logits

        (loss, logits), (dense_grads, emb_grad) = jax.value_and_grad(
            objective, argnums=(0, 1), has_aux=True
        )(state.dense_params, emb_values)

        lr = lr_schedule(state.step) if lr_schedule is not None else None
        new_sparse, new_emb_state = ebc.apply_gradients(
            state.sparse_params,
            state.emb_opt_state,
            emb_optimizer,
            kjt,
            emb_grad,
            lr=lr,
        )
        updates, new_dense_opt = dense_tx.update(
            dense_grads, state.dense_opt_state, state.dense_params
        )
        new_dense = optax.apply_updates(state.dense_params, updates)
        new_state = TrainState(
            sparse_params=new_sparse,
            dense_params=new_dense,
            emb_opt_state=new_emb_state,
            dense_opt_state=new_dense_opt,
            step=state.step + 1,
        )
        aux = {
            "loss": loss,
            "logits": jax.lax.stop_gradient(logits),
            "labels": batch.labels,
            # slots silently dropped by the max_unique_gradient_rows
            # window this step — nonzero means the model trained WRONG
            "emb_grad_overflow": ebc.gradient_overflow(kjt),
        }
        return new_state, aux

    return step


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SemiSyncCarry:
    """Deferred sparse-update payload carried between semi-sync steps."""

    kjt: Optional[KeyedJaggedTensor]
    emb_grad: Optional[jnp.ndarray]


def make_semi_sync_train_step(
    model: DLRM,
    emb_optimizer: EmbeddingOptimizer,
    dense_tx: optax.GradientTransformation,
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = bce_with_logits,
    lr_schedule: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
):
    """Semi-synchronous training step (TrainPipelineSemiSync analog,
    reference train_pipelines.py:1637): the fused sparse update for batch i
    is applied at the START of step i+1, so on hardware the embedding
    update overlaps step i's dense backward instead of serializing after
    it. Embeddings are one step stale — the documented semi-sync trade-off.

    Returns (step, init_carry) where
    ``step((state, carry), batch) -> ((state, carry), aux)``.
    """
    ebc = model.embedding_bag_collection

    def step(state_and_carry, batch: Batch):
        state, carry = state_and_carry
        sparse, emb_state = state.sparse_params, state.emb_opt_state
        lr = lr_schedule(state.step) if lr_schedule is not None else None
        # 1) apply the DEFERRED update from the previous batch
        if carry.kjt is not None:
            sparse, emb_state = ebc.apply_gradients(
                sparse, emb_state, emb_optimizer, carry.kjt, carry.emb_grad,
                lr=lr,
            )
        # 2) forward/backward on the CURRENT batch against the fresh tables
        kjt = batch.sparse_features
        emb_values = model.forward_sparse({"sparse": sparse}, kjt)

        def objective(dense_params, emb_values):
            logits = model.forward_dense(
                dense_params, batch.dense_features, emb_values
            )
            loss = loss_fn(logits, batch.labels.astype(jnp.float32))
            return loss, logits

        (loss, logits), (dense_grads, emb_grad) = jax.value_and_grad(
            objective, argnums=(0, 1), has_aux=True
        )(state.dense_params, emb_values)

        updates, new_dense_opt = dense_tx.update(
            dense_grads, state.dense_opt_state, state.dense_params
        )
        new_dense = optax.apply_updates(state.dense_params, updates)
        new_state = TrainState(
            sparse_params=sparse,
            dense_params=new_dense,
            emb_opt_state=emb_state,
            dense_opt_state=new_dense_opt,
            step=state.step + 1,
        )
        new_carry = SemiSyncCarry(kjt=kjt, emb_grad=emb_grad)
        aux = {
            "loss": loss,
            "logits": jax.lax.stop_gradient(logits),
            "labels": batch.labels,
        }
        return (new_state, new_carry), aux

    def flush(state_and_carry):
        """Apply the final pending update (end of training)."""
        state, carry = state_and_carry
        if carry.kjt is None:
            return state
        lr = lr_schedule(state.step) if lr_schedule is not None else None
        sparse, emb_state = ebc.apply_gradients(
            state.sparse_params, state.emb_opt_state, emb_optimizer,
            carry.kjt, carry.emb_grad, lr=lr,
        )
        return dataclasses.replace(
            state, sparse_params=sparse, emb_opt_state=emb_state
        )

    init_carry = SemiSyncCarry(kjt=None, emb_grad=None)
    return step, init_carry, flush


@dataclasses.dataclass(frozen=True)
class GradientAccumulationConfig:
    """Gradient-accumulation settings (reference
    distributed/train_pipeline/gradient_accumulation.py:31
    GradientAccumulationConfig). ``num_warmup_steps`` exists there only for
    DDP static-graph compatibility; under one jitted SPMD program there is
    no graph capture to warm up, so it is accepted and ignored."""

    num_steps: int = 1
    num_warmup_steps: int = 1

    def __post_init__(self) -> None:
        if self.num_steps < 1:
            raise ValueError(f"num_steps must be >= 1, got {self.num_steps}")


def stack_batches(batches) -> Batch:
    """Stack per-micro-batch ``Batch`` pytrees into one ``Batch`` whose
    leaves carry a leading ``[num_steps, ...]`` axis (the scan input for
    :func:`make_grad_accum_train_step`). All micro-batches must share
    static shapes: same KJT keys/capacity, same batch size."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def make_grad_accum_train_step(
    model: DLRM,
    emb_optimizer: EmbeddingOptimizer,
    dense_tx: optax.GradientTransformation,
    config: GradientAccumulationConfig,
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = bce_with_logits,
    lr_schedule: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
):
    """Gradient-accumulation train step (reference
    distributed/train_pipeline/gradient_accumulation.py:118
    GradientAccumulationWrapper). Matches the reference's fused-TBE
    semantics exactly: the embedding optimizer is fused into the backward,
    so SPARSE tables update on EVERY micro-batch; only the DENSE gradients
    accumulate, and the dense optimizer steps once per ``num_steps``
    micro-batches on their mean.

    Returns ``step(state, microbatches) -> (state, aux)`` where
    ``microbatches`` is a :class:`Batch` with a leading ``[num_steps]``
    axis on every leaf (build it with :func:`stack_batches`). The
    micro-batch loop is a ``lax.scan`` inside ONE jitted program, so XLA
    overlaps micro-batch i+1's forward with i's sparse update. ``aux``
    carries per-micro-batch ``loss``/``logits``/``labels`` (leading
    ``[num_steps]`` axis) plus the summed ``emb_grad_overflow``.
    """
    ebc = model.embedding_bag_collection
    num_steps = config.num_steps

    def step(state: TrainState, microbatches: Batch):
        lr = lr_schedule(state.step) if lr_schedule is not None else None

        def micro(carry, mb: Batch):
            sparse, emb_state, acc = carry
            kjt = mb.sparse_features
            emb_values = model.forward_sparse({"sparse": sparse}, kjt)

            def objective(dense_params, emb_values):
                logits = model.forward_dense(
                    dense_params, mb.dense_features, emb_values
                )
                loss = loss_fn(logits, mb.labels.astype(jnp.float32))
                return loss, logits

            (loss, logits), (dense_grads, emb_grad) = jax.value_and_grad(
                objective, argnums=(0, 1), has_aux=True
            )(state.dense_params, emb_values)

            sparse, emb_state = ebc.apply_gradients(
                sparse, emb_state, emb_optimizer, kjt, emb_grad, lr=lr
            )
            acc = jax.tree.map(jnp.add, acc, dense_grads)
            ys = {
                "loss": loss,
                "logits": jax.lax.stop_gradient(logits),
                "labels": mb.labels,
                "emb_grad_overflow": ebc.gradient_overflow(kjt),
            }
            return (sparse, emb_state, acc), ys

        zero = jax.tree.map(jnp.zeros_like, state.dense_params)
        (new_sparse, new_emb_state, acc), ys = jax.lax.scan(
            micro,
            (state.sparse_params, state.emb_opt_state, zero),
            microbatches,
        )
        mean_grads = jax.tree.map(lambda g: g / num_steps, acc)
        updates, new_dense_opt = dense_tx.update(
            mean_grads, state.dense_opt_state, state.dense_params
        )
        new_dense = optax.apply_updates(state.dense_params, updates)
        new_state = TrainState(
            sparse_params=new_sparse,
            dense_params=new_dense,
            emb_opt_state=new_emb_state,
            dense_opt_state=new_dense_opt,
            step=state.step + 1,
        )
        aux = {
            "loss": ys["loss"],
            "logits": ys["logits"],
            "labels": ys["labels"],
            "emb_grad_overflow": ys["emb_grad_overflow"].sum(),
        }
        return new_state, aux

    return step


def make_eval_step(
    model: DLRM,
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = bce_with_logits,
):
    """Forward-only evaluation step (EvalPipelineSparseDist analog,
    reference train_pipelines.py:2259): returns
    ``eval_step(state, batch) -> aux`` with loss/logits/labels for metric
    updates; no parameter mutation, safe to jit without donation."""

    def eval_step(state: TrainState, batch: Batch):
        emb_values = model.forward_sparse(
            {"sparse": state.sparse_params}, batch.sparse_features
        )
        logits = model.forward_dense(
            state.dense_params, batch.dense_features, emb_values
        )
        loss = loss_fn(logits, batch.labels.astype(jnp.float32))
        return {
            "loss": loss,
            "logits": logits,
            "labels": batch.labels,
        }

    return eval_step
