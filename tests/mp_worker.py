"""Multi-process runtime worker (spawned by test_multiprocess.py).

One OS process per "host": 2 processes x 4 virtual CPU devices = an
8-device (host, chip) world driven through jax.distributed — the runtime
entry the reference exercises with MultiProcessTestBase
(torchrec/distributed/test_utils/multi_process.py:126). The worker runs
the FULL sharded train step (TWRW + RW + boundary TW plan, bucketized
input dist, per-process batch feeding) and checks its loss trajectory
against a 1-device oracle run of the same model.

Usage: python mp_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if __name__ == "__main__":
    # must run before ANY backend-initializing call (the torchrec_tpu
    # import chain touches jax.devices) — coordinator args from argv
    jax.distributed.initialize(
        coordinator_address=f"localhost:{sys.argv[3]}",
        num_processes=int(sys.argv[2]),
        process_id=int(sys.argv[1]),
    )

import numpy as np  # noqa: E402

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)


def _global_batch(model, batch_size, n_proc, step, num_dense=13):
    """Deterministic per-process local batches + their global concat.
    Returns (list of per-process local batches, global batch).

    The global KJT is rebuilt from the merged per-key id lists — NOT
    ``stack_replica_batches``, whose buffer-concatenated values layout is
    only valid under shard_map replica slicing, not as a plain KJT.
    """
    from utils import NumpyKJT, make_numpy_kjt, to_kjt

    from torchrec_tpu.training import Batch

    keys = model.embedding_bag_collection.feature_names()
    rows = {
        t.name: t.num_embeddings
        for t in model.embedding_bag_collection._tables
    }
    num_emb = {
        k: rows[t.name]
        for t in model.embedding_bag_collection._tables
        for k in t.feature_names
    }
    b_loc = batch_size // n_proc
    locals_, nks, denses, labels = [], [], [], []
    for p in range(n_proc):
        rng = np.random.default_rng(1000 * step + p)
        nk = make_numpy_kjt(
            rng, keys, b_loc, num_emb, max_length=6, allow_empty=False
        )
        nks.append(nk)
        kjt = to_kjt(nk, capacity=b_loc * 8 * len(keys))
        denses.append(
            rng.standard_normal((b_loc, num_dense)).astype(np.float32)
        )
        labels.append((rng.random(b_loc) < 0.5).astype(np.float32))
        locals_.append(
            Batch(
                dense_features=denses[-1],
                sparse_features=kjt,
                labels=labels[-1],
            )
        )
    merged = NumpyKJT(
        keys=list(keys),
        ids={k: [ex for nk in nks for ex in nk.ids[k]] for k in keys},
        weights=None,
    )
    global_batch = Batch(
        dense_features=np.concatenate(denses),
        sparse_features=to_kjt(merged, capacity=batch_size * 8 * len(keys)),
        labels=np.concatenate(labels),
    )
    return locals_, global_batch


def main():
    pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from torchrec_tpu.distributed import (
        ShardingEnv,
        construct_module_sharding_plan,
        row_wise,
        table_row_wise,
        table_wise,
    )
    from torchrec_tpu.distributed.model_parallel import (
        DistributedModelParallel,
    )
    from torchrec_tpu.ops import RowWiseAdagrad

    import optax

    env = ShardingEnv.from_global()  # runtime initialized at module import
    assert jax.process_count() == n_proc, jax.process_count()
    assert env.hierarchical and env.num_hosts == n_proc
    w = env.world_size
    assert w == n_proc * jax.local_device_count()

    from __graft_entry__ import _build_model

    model = _build_model(num_features=4, dim=64, rows=512)
    tables = model.embedding_bag_collection._tables
    plan = construct_module_sharding_plan(
        tables,
        {
            "t0": row_wise(),
            "t1": table_row_wise(0),  # rows within host 0
            "t2": table_row_wise(n_proc - 1),  # rows within the last host
            "t3": table_wise(w - 1),  # boundary rank
        },
        env,
    )
    emb_opt = RowWiseAdagrad(learning_rate=0.1)
    dense_tx = optax.adagrad(0.05)

    print("PHASE construct dmp", flush=True)
    dmp = DistributedModelParallel(
        model, env, plan, input_dist="bucketized",
        a2a_capacity_factor=float(w),
    )
    print("PHASE init state", flush=True)
    state = dmp.init_train_state(jax.random.key(0), emb_opt, dense_tx)
    step_fn = dmp.make_train_step(
        emb_optimizer=emb_opt, dense_tx=dense_tx, example_state=state
    )

    # 1-device oracle of the same model/optimizers on the global batch
    print("PHASE oracle", flush=True)
    env1 = ShardingEnv.from_devices(jax.local_devices()[:1])
    plan1 = construct_module_sharding_plan(
        tables, {t.name: table_wise(0) for t in tables}, env1
    )
    dmp1 = DistributedModelParallel(model, env1, plan1)
    state1 = dmp1.init_train_state(jax.random.key(0), emb_opt, dense_tx)
    step1 = dmp1.make_train_step(
        emb_optimizer=emb_opt, dense_tx=dense_tx, example_state=state1
    )

    batch_size = 4 * w
    losses, oracle_losses = [], []
    for step in range(3):
        locals_, global_batch = _global_batch(
            model, batch_size, n_proc, step
        )
        print(f"PHASE step {step} prep", flush=True)
        fed = dmp.prepare_batch(locals_[pid], process_local=True)
        print(f"PHASE step {step} run", flush=True)
        state, aux = step_fn(state, fed)
        assert int(np.asarray(aux["a2a_dropped"])) == 0
        losses.append(float(np.asarray(aux["loss"])))
        if step == 0:
            loc = [np.asarray(sh.data) for sh in aux["logits"].addressable_shards]
            mp_logits = np.concatenate(loc).ravel()

        print(f"PHASE step {step} oracle", flush=True)
        state1, aux1 = step1(state1, global_batch)
        oracle_losses.append(float(np.asarray(aux1["loss"])))
        if step == 0:
            og = np.asarray(aux1["logits"]).ravel()
            lo = pid * len(mp_logits)
            diff = np.abs(mp_logits - og[lo : lo + len(mp_logits)])
            print(
                f"pid={pid} step0 logits maxdiff={diff.max():.3e} "
                f"mean={diff.mean():.3e}",
                flush=True,
            )
            assert diff.max() < 1e-4, diff.max()

    np.testing.assert_allclose(losses, oracle_losses, rtol=2e-4, atol=2e-5)
    print(f"MP_OK pid={pid} losses={losses}", flush=True)


if __name__ == "__main__":
    main()
