"""Criteo DLRM training with the native (C++) input pipeline.

End-to-end recipe mirroring the reference's DLRM-on-Criteo flow
(examples/dlrm -> dlrm_main with InMemoryBinaryCriteoIterDataPipe under a
multi-worker DataLoader, reference datasets/criteo.py:715): mmap'd day
files feed a C++ background-assembly prefetch ring
(``NativeCriteoIterDataPipe``), the cost-model planner places the tables
on the mesh, and ONE donated jitted SPMD step trains DLRM. Adds the
checkpoint/resume leg: save mid-training, restore, finish the epoch.

By default the recipe synthesizes two tiny criteo-format "day" npy files
so it runs anywhere; pass real day-file stems to train on actual data:

Run (CPU mesh):  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                 JAX_PLATFORMS=cpu python examples/criteo_dlrm_native.py
Run (TPU):       python examples/criteo_dlrm_native.py [day0 day1 ...]
                 (expects <stem>_dense.npy/_sparse.npy/_labels.npy)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import optax

from torchrec_tpu.checkpoint import restore_train_state, save_train_state
from torchrec_tpu.datasets.criteo import (
    CAT_FEATURE_COUNT,
    DEFAULT_CAT_NAMES,
    INT_FEATURE_COUNT,
)
from torchrec_tpu.datasets.criteo_native import NativeCriteoIterDataPipe
from torchrec_tpu.distributed import ShardingEnv
from torchrec_tpu.distributed.model_parallel import DistributedModelParallel
from torchrec_tpu.metrics import AUCMetric, NEMetric
from torchrec_tpu.models import DLRM
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import RowWiseAdagrad

HASH_SIZES = [10_000 if i % 5 else 100_000 for i in range(CAT_FEATURE_COUNT)]


def synth_days(dirname: str, rows_per_day: int = 2048, n_days: int = 2):
    """Write tiny criteo-layout day files (dense <f4 [N,13], sparse <i8
    [N,26], labels <i4 [N]) with a learnable signal: label correlates with
    sparse feature 0's parity."""
    rng = np.random.default_rng(0)
    stems = []
    for d in range(n_days):
        ids = rng.integers(0, 1 << 40, size=(rows_per_day, CAT_FEATURE_COUNT))
        dense = rng.normal(size=(rows_per_day, INT_FEATURE_COUNT)).astype(
            np.float32
        )
        labels = ((ids[:, 0] % 2) ^ (rng.random(rows_per_day) < 0.1)).astype(
            np.int32
        )
        stem = os.path.join(dirname, f"day_{d}")
        np.save(stem + "_dense.npy", dense)
        np.save(stem + "_sparse.npy", ids)
        np.save(stem + "_labels.npy", labels)
        stems.append(stem)
    return stems


def main(stems=None, batch_size: int = 256):
    tmp = None
    if not stems:
        tmp = tempfile.TemporaryDirectory()
        stems = synth_days(tmp.name)

    pipe = NativeCriteoIterDataPipe(
        dense_paths=[s + "_dense.npy" for s in stems],
        sparse_paths=[s + "_sparse.npy" for s in stems],
        labels_paths=[s + "_labels.npy" for s in stems],
        batch_size=batch_size,
        hashes=HASH_SIZES,
        shuffle_batches=True,
        seed=17,
    )

    tables = [
        EmbeddingBagConfig(
            name=f"t_{name}",
            num_embeddings=h,
            embedding_dim=64,
            feature_names=[name],
        )
        for name, h in zip(DEFAULT_CAT_NAMES, HASH_SIZES)
    ]
    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables),
        dense_in_features=INT_FEATURE_COUNT,
        dense_arch_layer_sizes=(128, 64),
        over_arch_layer_sizes=(128, 64),
    )

    env = ShardingEnv.from_devices()
    dmp = DistributedModelParallel(model, env, batch_size=batch_size)
    emb_opt = RowWiseAdagrad(learning_rate=0.05)
    dense_tx = optax.adagrad(0.02)
    state = dmp.init_train_state(jax.random.key(0), emb_opt, dense_tx)
    step = dmp.make_train_step(emb_opt, dense_tx, example_state=state)

    ne, auc = NEMetric(), AUCMetric(window=8192)
    ne_state, auc_state = ne.init_state(), auc.init_state()

    ckpt_dir = tempfile.mkdtemp(prefix="criteo_ckpt_")
    n = len(pipe)
    print(f"epoch of {n} batches from {len(stems)} day files")
    for i, batch in enumerate(pipe):
        state, aux = step(state, batch)
        preds = jax.nn.sigmoid(aux["logits"].reshape(-1))
        labels = aux["labels"].reshape(-1)
        ne_state = ne.update(ne_state, preds, labels)
        auc_state = auc.update(auc_state, preds, labels)
        if i + 1 == n // 2:
            # mid-epoch checkpoint (sharded arrays written distributed)
            save_train_state(ckpt_dir, state, metadata={"step": i + 1})
            print(f"step {i+1}: checkpoint saved to {ckpt_dir}")
        if (i + 1) % 4 == 0:
            out = {**ne.compute(ne_state), **auc.compute(auc_state)}
            msg = " ".join(
                f"{k.split('|')[-1]}={float(v):.4f}" for k, v in out.items()
            )
            print(
                f"step {i+1}/{n}: loss="
                f"{float(np.asarray(aux['loss'])):.4f} {msg}"
            )

    # resume leg: restore the mid-epoch state and take one more step on a
    # fresh epoch (the loader reseeds its shuffle per epoch)
    restored = restore_train_state(ckpt_dir, like=state)
    batch = next(iter(pipe))
    restored, aux = step(restored, batch)
    print(f"resumed from step {n//2}: loss={float(np.asarray(aux['loss'])):.4f}")

    print("plan:")
    for name, ps in dmp.plan.items():
        print(f"  {name}: {ps.sharding_type.value} x{len(ps.shards)}")


if __name__ == "__main__":
    main(sys.argv[1:] or None)
