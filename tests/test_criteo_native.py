"""Native C++ Criteo loader vs the python in-memory pipe (oracle).

The C++ sidecar must be batch-for-batch identical to
InMemoryBinaryCriteoIterDataPipe in unshuffled mode — same per-rank row
ranges, same dense transform, same hash mod, same feature-major KJT
layout (reference criteo.py:715 semantics).
"""

import numpy as np
import pytest

from torchrec_tpu.datasets import (
    CAT_FEATURE_COUNT,
    INT_FEATURE_COUNT,
    InMemoryBinaryCriteoIterDataPipe,
    NativeCriteoIterDataPipe,
)


@pytest.fixture(scope="module")
def day_files(tmp_path_factory):
    """Three small 'day' files of different sizes (119 rows total)."""
    root = tmp_path_factory.mktemp("criteo")
    rng = np.random.default_rng(0)
    paths = {"dense": [], "sparse": [], "labels": []}
    for day, n in enumerate([40, 64, 15]):
        dense = rng.normal(size=(n, INT_FEATURE_COUNT)).astype(np.float32)
        dense[rng.random(dense.shape) < 0.1] = 0.0  # missing -> 0 like ingest
        sparse = rng.integers(
            0, 2**31, size=(n, CAT_FEATURE_COUNT), dtype=np.int64
        )
        labels = rng.integers(0, 2, size=(n,)).astype(np.int32)
        for name, arr in [("dense", dense), ("sparse", sparse),
                          ("labels", labels)]:
            p = str(root / f"day{day}_{name}.npy")
            np.save(p, arr)
            paths[name].append(p)
    return paths


def _collect(pipe):
    out = []
    for batch in pipe:
        out.append((
            np.asarray(batch.dense_features),
            np.asarray(batch.sparse_features.values()),
            np.asarray(batch.labels),
        ))
    return out


@pytest.mark.parametrize("transform", [True, False])
@pytest.mark.parametrize("rank,world", [(0, 1), (0, 3), (2, 3)])
def test_matches_python_pipe(day_files, transform, rank, world):
    kwargs = dict(
        dense_paths=day_files["dense"],
        sparse_paths=day_files["sparse"],
        labels_paths=day_files["labels"],
        batch_size=8,
        rank=rank,
        world_size=world,
        hashes=[1000 + i for i in range(CAT_FEATURE_COUNT)],
        transform_dense=transform,
    )
    oracle = InMemoryBinaryCriteoIterDataPipe(**kwargs)
    native = NativeCriteoIterDataPipe(**kwargs)
    got = _collect(native)
    want = _collect(oracle)
    assert len(got) == len(want) == len(native) == len(oracle)
    for (gd, gs, gl), (wd, ws, wl) in zip(got, want):
        np.testing.assert_allclose(gd, wd, rtol=1e-6)
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(gl, wl)


def test_second_epoch_and_shuffle(day_files):
    pipe = NativeCriteoIterDataPipe(
        dense_paths=day_files["dense"],
        sparse_paths=day_files["sparse"],
        labels_paths=day_files["labels"],
        batch_size=7,  # 119 rows = 17 full batches: no drop_last residue,
        # so both epochs cover the same multiset in different order
        shuffle_batches=True,
        seed=7,
        transform_dense=False,
    )
    e1 = _collect(pipe)
    e2 = _collect(pipe)  # reset + reshuffled with seed+epoch
    assert len(e1) == len(e2) == len(pipe) > 0
    # different row order across epochs, same multiset of labels+rows
    assert not all(np.array_equal(a[1], b[1]) for a, b in zip(e1, e2))
    all1 = np.sort(np.concatenate([x[2] for x in e1]))
    all2 = np.sort(np.concatenate([x[2] for x in e2]))
    np.testing.assert_array_equal(all1, all2)
    d1 = np.sort(np.concatenate([x[0] for x in e1]).ravel())
    d2 = np.sort(np.concatenate([x[0] for x in e2]).ravel())
    np.testing.assert_allclose(d1, d2)


def test_bad_input_rejected(day_files, tmp_path):
    bad = str(tmp_path / "bad.npy")
    np.save(bad, np.zeros((5, 7), np.float32))  # wrong column count
    with pytest.raises(ValueError):
        NativeCriteoIterDataPipe(
            dense_paths=[bad],
            sparse_paths=day_files["sparse"][:1],
            labels_paths=day_files["labels"][:1],
            batch_size=4,
        )
    with pytest.raises(ValueError):
        NativeCriteoIterDataPipe(
            dense_paths=["/no/such/file.npy"],
            sparse_paths=day_files["sparse"][:1],
            labels_paths=day_files["labels"][:1],
            batch_size=4,
        )
