"""DeepFM / two-tower / BERT4Rec models + criteo / movielens ingest.

Reference analogs: models/tests/test_deepfm.py, examples/retrieval &
bert4rec recipes, datasets/tests/test_criteo.py & test_movielens.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu import KeyedJaggedTensor
from torchrec_tpu.datasets import (
    BinaryCriteoUtils,
    InMemoryBinaryCriteoIterDataPipe,
    MovieLensRatingsBatcher,
    criteo_tsv_reader,
)
from torchrec_tpu.models import (
    BERT4Rec,
    SimpleDeepFMNN,
    TwoTower,
    knn,
    ndcg_at_k,
    recall_at_k,
    two_tower_in_batch_negatives_loss,
)
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig


# ------------------------------------------------------------------- deepfm
def test_simple_deepfm_forward_and_grads():
    ebc = EmbeddingBagCollection([
        EmbeddingBagConfig(name="t0", num_embeddings=20, embedding_dim=16,
                           feature_names=["f0"]),
        EmbeddingBagConfig(name="t1", num_embeddings=30, embedding_dim=16,
                           feature_names=["f1"]),
    ])
    model = SimpleDeepFMNN(
        num_dense_features=8, embedding_bag_collection=ebc,
        hidden_layer_size=32, deep_fm_dimension=8,
    )
    params = model.init(jax.random.key(0))
    b = 4
    lens = np.ones((2, b), np.int32)
    vals = np.array([1, 2, 3, 4, 5, 6, 7, 8], np.int32)
    kjt = KeyedJaggedTensor(keys=["f0", "f1"], values=jnp.asarray(vals),
                            lengths=jnp.asarray(lens))
    dense = jnp.asarray(np.random.default_rng(0).normal(size=(b, 8)), jnp.float32)
    logits = jax.jit(model.apply)(params, dense, kjt)
    assert logits.shape == (b,)

    def loss(p):
        return jnp.mean(model.forward_dense(p, dense, model.forward_sparse(p, kjt)) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["deep"]["layer_0/w"]).sum()) > 0


# ---------------------------------------------------------------- two tower
def test_two_tower_loss_and_knn():
    ebc = EmbeddingBagCollection([
        EmbeddingBagConfig(name="user", num_embeddings=50, embedding_dim=16,
                           feature_names=["user"]),
        EmbeddingBagConfig(name="movie", num_embeddings=60, embedding_dim=16,
                           feature_names=["movie"]),
    ])
    tt = TwoTower(ebc, ["user"], ["movie"], layer_sizes=(32, 8))
    params = tt.init(jax.random.key(0))
    b = 8
    vals = np.concatenate([
        np.arange(b), 10 + np.arange(b)
    ]).astype(np.int32)
    kjt = KeyedJaggedTensor(keys=["user", "movie"], values=jnp.asarray(vals),
                            lengths=jnp.asarray(np.ones((2, b), np.int32)))
    qe, ce = jax.jit(tt.apply)(params, kjt)
    assert qe.shape == (b, 8) and ce.shape == (b, 8)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(qe), axis=1), 1.0, rtol=1e-4)
    loss = two_tower_in_batch_negatives_loss(qe, ce)
    assert np.isfinite(float(loss))
    # training for a few steps should decrease the in-batch loss
    import optax
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o):
        def f(p):
            q, c = tt.apply(p, kjt)
            return two_tower_in_batch_negatives_loss(q, c)
        l, g = jax.value_and_grad(f)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    l0 = None
    for i in range(20):
        params, opt_state, l = step(params, opt_state)
        if l0 is None:
            l0 = float(l)
    assert float(l) < l0
    # knn: the trained positives should usually be retrieved at k=3
    qe, ce = tt.apply(params, kjt)
    scores, idx = knn(qe, ce, 3)
    hits = np.mean([i in np.asarray(idx)[i] for i in range(b)])
    assert hits >= 0.75


# ----------------------------------------------------------------- bert4rec
def test_bert4rec_mlm_and_metrics():
    model = BERT4Rec(vocab_size=50, max_seq_len=8, emb_dim=16, num_layers=1,
                     num_heads=2)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    b = 4
    ids = rng.integers(0, 50, (b, 8)).astype(np.int32)
    valid = np.ones((b, 8), bool); valid[:, 6:] = False
    targets = ids.copy()
    masked = np.zeros((b, 8), bool); masked[:, 3] = True
    ids_masked = ids.copy(); ids_masked[:, 3] = model.mask_token

    loss = jax.jit(model.masked_lm_loss)(
        params, jnp.asarray(ids_masked), jnp.asarray(valid),
        jnp.asarray(targets), jnp.asarray(masked),
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    hidden = model.encode(params, jnp.asarray(ids_masked), jnp.asarray(valid))
    lg = model.logits(params, hidden)[:, 3, :50]
    r = recall_at_k(lg, jnp.asarray(targets[:, 3]), 10)
    n = ndcg_at_k(lg, jnp.asarray(targets[:, 3]), 10)
    assert 0.0 <= float(r) <= 1.0 and 0.0 <= float(n) <= 1.0
    # ndcg of a perfect ranking is 1
    perfect = jax.nn.one_hot(jnp.asarray(targets[:, 3]), 50) * 10.0
    assert float(ndcg_at_k(perfect, jnp.asarray(targets[:, 3]), 10)) == 1.0


# ------------------------------------------------------------------- criteo
def test_criteo_tsv_and_inmemory_pipe(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(17):
        label = rng.integers(0, 2)
        ints = rng.integers(0, 100, 13)
        cats = [format(int(x), "x") for x in rng.integers(0, 1 << 30, 26)]
        rows.append("\t".join([str(label)] + [str(v) for v in ints] + cats))
    tsv = tmp_path / "day_0.tsv"
    tsv.write_text("\n".join(rows) + "\n")

    parsed = list(criteo_tsv_reader(str(tsv)))
    assert len(parsed) == 17 and "int_0" in parsed[0] and "cat_25" in parsed[0]

    BinaryCriteoUtils.tsv_to_npys(
        str(tsv), str(tmp_path / "d.npy"), str(tmp_path / "s.npy"),
        str(tmp_path / "l.npy"),
    )
    assert BinaryCriteoUtils.get_shape_from_npy(str(tmp_path / "d.npy")) == (17, 13)

    ranges, rem = BinaryCriteoUtils.get_file_row_ranges_and_remainder(
        [17], rank=1, world_size=2
    )
    assert ranges == {0: (8, 17)} and rem == 1

    pipe = InMemoryBinaryCriteoIterDataPipe(
        dense_paths=[str(tmp_path / "d.npy")],
        sparse_paths=[str(tmp_path / "s.npy")],
        labels_paths=[str(tmp_path / "l.npy")],
        batch_size=4,
        hashes=[1000] * 26,
    )
    batches = list(pipe)
    assert len(batches) == 4  # 17 // 4 with drop_last
    b0 = batches[0]
    assert b0.dense_features.shape == (4, 13)
    assert b0.sparse_features.num_keys == 26
    assert int(np.asarray(b0.sparse_features.values()).max()) < 1000
    np.testing.assert_array_equal(
        np.asarray(b0.sparse_features.lengths()), np.ones((26, 4))
    )


# ---------------------------------------------------------------- movielens
def test_movielens_batcher(tmp_path):
    ratings = ["userId,movieId,rating,timestamp"]
    rng = np.random.default_rng(0)
    for i in range(10):
        ratings.append(f"{i+1},{(i*7)%9+1},{rng.choice([1.0, 3.0, 5.0])},{1000+i}")
    (tmp_path / "ratings.csv").write_text("\n".join(ratings) + "\n")
    (tmp_path / "movies.csv").write_text(
        "movieId,title,genres\n1,Toy Story,Animation\n"
    )

    from torchrec_tpu.datasets import movielens_20m

    rows = list(movielens_20m(str(tmp_path), include_movies_data=True))
    assert len(rows) == 10 and rows[0]["title"] in ("Toy Story", "")

    batches = list(MovieLensRatingsBatcher(str(tmp_path), batch_size=4))
    assert len(batches) == 2
    assert batches[0].sparse_features.keys() == ["user", "movie"]
    assert set(np.asarray(batches[0].labels)) <= {0.0, 1.0}


def test_criteo_pipe_feeds_dmp_training(tmp_path):
    """Ingest -> DMP training integration: a criteo-format file trains the
    sharded DLRM end-to-end (golden_training over real ingest)."""
    import optax
    from torchrec_tpu.datasets import (
        BinaryCriteoUtils,
        DEFAULT_CAT_NAMES,
        InMemoryBinaryCriteoIterDataPipe,
    )
    from torchrec_tpu.distributed import ShardingEnv
    from torchrec_tpu.distributed.model_parallel import DistributedModelParallel
    from torchrec_tpu.models import DLRM
    from torchrec_tpu.ops import RowWiseAdagrad

    rng = np.random.default_rng(0)
    rows = []
    for _ in range(64):
        label = rng.integers(0, 2)
        ints = rng.integers(0, 100, 13)
        cats = [format(int(x), "x") for x in rng.integers(0, 1 << 20, 26)]
        rows.append("\t".join([str(label)] + [str(v) for v in ints] + cats))
    tsv = tmp_path / "day.tsv"
    tsv.write_text("\n".join(rows) + "\n")
    BinaryCriteoUtils.tsv_to_npys(
        str(tsv), str(tmp_path / "d.npy"), str(tmp_path / "s.npy"),
        str(tmp_path / "l.npy"),
    )
    pipe = InMemoryBinaryCriteoIterDataPipe(
        dense_paths=[str(tmp_path / "d.npy")],
        sparse_paths=[str(tmp_path / "s.npy")],
        labels_paths=[str(tmp_path / "l.npy")],
        batch_size=16, hashes=[500] * 26,
    )
    tables = [
        EmbeddingBagConfig(name=f"t{i}", num_embeddings=500, embedding_dim=16,
                           feature_names=[name])
        for i, name in enumerate(DEFAULT_CAT_NAMES)
    ]
    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables),
        dense_in_features=13,
        dense_arch_layer_sizes=(32, 16),
        over_arch_layer_sizes=(16,),
    )
    env = ShardingEnv.from_devices(jax.devices()[:8])
    dmp = DistributedModelParallel(model, env, batch_size=16)
    from torchrec_tpu.ops import RowWiseAdagrad
    emb_opt = RowWiseAdagrad(learning_rate=0.05)
    tx = optax.sgd(0.01)
    state = dmp.init_train_state(jax.random.key(0), emb_opt, tx)
    step = dmp.make_train_step(emb_opt, tx, example_state=state)
    for batch in pipe:
        state, aux = step(state, batch)
        assert np.isfinite(float(np.asarray(aux["loss"])))


def test_dmp_trains_dcn_and_projection_variants():
    import optax
    from torchrec_tpu.datasets import RandomRecDataset
    from torchrec_tpu.distributed import ShardingEnv
    from torchrec_tpu.distributed.model_parallel import DistributedModelParallel
    from torchrec_tpu.models import DLRM_DCN, DLRM_Projection
    from torchrec_tpu.ops import SGD

    tables = [
        EmbeddingBagConfig(name="t", num_embeddings=200, embedding_dim=16,
                           feature_names=["f"]),
    ]
    for cls, kwargs in [
        (DLRM_DCN, dict(dcn_num_layers=2, dcn_low_rank_dim=8)),
        (DLRM_Projection, dict(interaction_branch1_layer_sizes=(16, 16),
                               interaction_branch2_layer_sizes=(16, 16))),
    ]:
        model = cls(
            embedding_bag_collection=EmbeddingBagCollection(tables),
            dense_in_features=4,
            dense_arch_layer_sizes=(16, 16),
            over_arch_layer_sizes=(16,),
            **kwargs,
        )
        env = ShardingEnv.from_devices(jax.devices()[:8])
        dmp = DistributedModelParallel(model, env, batch_size=8)
        opt, tx = SGD(learning_rate=0.05), optax.sgd(0.01)
        state = dmp.init_train_state(jax.random.key(0), opt, tx)
        step = dmp.make_train_step(opt, tx, example_state=state)
        batch = next(iter(RandomRecDataset(keys=["f"], batch_size=8,
                                           hash_sizes=[200], num_dense=4)))
        state, aux = step(state, batch)
        assert np.isfinite(float(np.asarray(aux["loss"]))), cls.__name__
