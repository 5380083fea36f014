"""End-to-end quality proof on a learnable Criteo-shaped stream.

The BASELINE.md north star is DLRM Criteo AUC parity; the reference
validates its golden_training recipe against externally published Criteo
AUC (facebookresearch/dlrm). This container has no Criteo data, so the
proof runs on ClickModelRecDataset — a planted logistic click model over
Criteo-shaped features (26 sparse + 13 dense) whose Bayes-optimal AUC is
~0.98 — through the FULL production stack: DistributedModelParallel with
the bucketized input dist on the 8-device mesh, the RecMetricModule, and
a mid-train checkpoint/resume. Asserts a pinned eval AUC and exact
resume equivalence (reference examples/golden_training/train_dlrm.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from torchrec_tpu.checkpoint import restore_train_state, save_train_state
from torchrec_tpu.datasets import ClickModelRecDataset
from torchrec_tpu.distributed import ShardingEnv
from torchrec_tpu.distributed.model_parallel import DistributedModelParallel
from torchrec_tpu.metrics import (
    AUCMetric,
    NEMetric,
    RecMetricModule,
    ThroughputMetric,
)
from torchrec_tpu.models import DLRM
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import RowWiseAdagrad

F = 26
ROWS = [100 if i % 3 else 500 for i in range(F)]
BATCH = 256
TRAIN_STEPS = 150
CKPT_STEP = 75
EVAL_BATCHES = 12
# pinned quality bar: measured 0.83-0.87 eval AUC at 150 steps (Bayes
# ~0.98); the bar is set with margin so only a real regression trips it
AUC_THRESHOLD = 0.78


def _build():
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=ROWS[i], embedding_dim=16,
            feature_names=[f"f{i}"],
        )
        for i in range(F)
    ]
    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables),
        dense_in_features=13,
        dense_arch_layer_sizes=(32, 16),
        over_arch_layer_sizes=(64, 32),
    )
    env = ShardingEnv.from_devices(jax.devices()[:8])
    dmp = DistributedModelParallel(
        model, env, batch_size=BATCH, input_dist="bucketized",
        a2a_capacity_factor=8.0,
    )
    return model, dmp


def _dataset(seed):
    return ClickModelRecDataset(
        keys=[f"f{i}" for i in range(F)], batch_size=BATCH,
        hash_sizes=ROWS, seed=seed, truth_seed=1,
    )


@pytest.mark.slow
def test_golden_quality_auc_and_resume(tmp_path):
    model, dmp = _build()
    emb_opt = RowWiseAdagrad(learning_rate=0.1)
    tx = optax.adam(3e-3)
    state = dmp.init_train_state(jax.random.key(0), emb_opt, tx)
    step = dmp.make_train_step(
        emb_optimizer=emb_opt, dense_tx=tx, example_state=state
    )
    mm = RecMetricModule(
        metrics=[NEMetric(), AUCMetric()],
        throughput=ThroughputMetric(batch_size=BATCH),
        compute_interval_steps=50,
    )
    mstate = mm.init_state()

    it = iter(_dataset(seed=1))
    batches = [next(it) for _ in range(TRAIN_STEPS)]
    ckpt = str(tmp_path / "ckpt")
    for i, b in enumerate(batches):
        state, aux = step(state, dmp.prepare_batch(b))
        mstate = mm.update(
            mstate,
            jax.nn.sigmoid(aux["logits"].reshape(-1)),
            aux["labels"].reshape(-1),
        )
        mm.tick()
        if i + 1 == CKPT_STEP:
            save_train_state(ckpt, state, metadata={"step": i + 1})
    train_metrics = mm.compute(mstate)
    assert any("auc" in k for k in train_metrics)
    assert any("ne" in k for k in train_metrics)

    # ---- resume equivalence: restore at CKPT_STEP, replay the tail -----
    state2 = dmp.init_train_state(jax.random.key(7), emb_opt, tx)
    state2 = restore_train_state(ckpt, like=state2)
    for b in batches[CKPT_STEP:]:
        state2, _ = step(state2, dmp.prepare_batch(b))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        state.sparse_params, state2.sparse_params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        state.dense_params, state2.dense_params,
    )

    # ---- pinned eval quality on held-out stream -------------------------
    eval_step = dmp.make_eval_step(example_state=state)
    auc = AUCMetric(window=EVAL_BATCHES * BATCH)
    astate = auc.init_state()
    eit = iter(_dataset(seed=999))
    for _ in range(EVAL_BATCHES):
        b = next(eit)
        aux = eval_step(state, dmp.prepare_batch(b))
        astate = auc.update(
            astate,
            jax.nn.sigmoid(aux["logits"].reshape(-1)),
            aux["labels"].reshape(-1),
        )
    got = auc.compute(astate)
    val = next(v for k, v in got.items() if "auc" in k)
    assert float(val) >= AUC_THRESHOLD, f"eval AUC {float(val):.4f}"
