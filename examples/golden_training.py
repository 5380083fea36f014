"""Golden training recipe: sharded DLRM on a device mesh.

The canonical loop of the reference (examples/golden_training/
train_dlrm.py: meta-device model -> apply_optimizer_in_backward -> DMP ->
TrainPipelineSparseDist) in its TPU-native shape: build the model, let the
cost-model planner place the tables, jit ONE donated SPMD train step, and
drive it with a prefetching input pipeline + streaming metrics.

Run (CPU mesh):  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                 JAX_PLATFORMS=cpu python examples/golden_training.py
Run (TPU):       python examples/golden_training.py
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchrec_tpu.datasets import RandomRecDataset
from torchrec_tpu.distributed import ShardingEnv
from torchrec_tpu.distributed.model_parallel import DistributedModelParallel
from torchrec_tpu.metrics import AUCMetric, NEMetric, ThroughputMetric
from torchrec_tpu.models import DLRM
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import RowWiseAdagrad


def main(num_steps: int = 50, batch_size: int = 256):
    tables = [
        EmbeddingBagConfig(
            name=f"table_{i}",
            num_embeddings=100_000 if i < 2 else 1_000,
            embedding_dim=64,
            feature_names=[f"feature_{i}"],
        )
        for i in range(8)
    ]
    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables),
        dense_in_features=13,
        dense_arch_layer_sizes=(128, 64),
        over_arch_layer_sizes=(128, 64),
    )

    env = ShardingEnv.from_devices()
    dmp = DistributedModelParallel(model, env, batch_size=batch_size)
    emb_opt = RowWiseAdagrad(learning_rate=0.05)
    dense_tx = optax.adagrad(0.02)
    state = dmp.init_train_state(jax.random.key(0), emb_opt, dense_tx)
    step = dmp.make_train_step(emb_opt, dense_tx, example_state=state)

    ds = iter(
        RandomRecDataset(
            keys=model.embedding_bag_collection.feature_names(),
            batch_size=batch_size,
            hash_sizes=[t.num_embeddings for t in tables],
            num_dense=13,
        )
    )
    ne, auc = NEMetric(), AUCMetric(window=8192)
    ne_state, auc_state = ne.init_state(), auc.init_state()
    throughput = ThroughputMetric(batch_size, env.world_size)

    for i in range(num_steps):
        batch = next(ds)
        state, aux = step(state, batch)
        preds = jax.nn.sigmoid(aux["logits"].reshape(-1))
        labels = aux["labels"].reshape(-1)
        ne_state = ne.update(ne_state, preds, labels)
        auc_state = auc.update(auc_state, preds, labels)
        throughput.update()
        if (i + 1) % 10 == 0:
            out = {**ne.compute(ne_state), **auc.compute(auc_state),
                   **throughput.compute()}
            msg = " ".join(
                f"{k.split('|')[-1]}={float(v):.4f}" for k, v in out.items()
            )
            print(f"step {i+1}: loss={float(np.asarray(aux['loss'])):.4f} {msg}")

    print("done; plan:")
    for name, ps in dmp.plan.items():
        print(f"  {name}: {ps.sharding_type.value} x{len(ps.shards)}")


if __name__ == "__main__":
    main()
