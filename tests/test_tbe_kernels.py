"""Pallas row scatter kernels: interpret-mode oracles incl. sentinel rows.

Reference analog: FBGEMM TBE's sparse row-update kernels
(torchrec/distributed/batched_embedding_kernel.py:3725 wraps them).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.ops.tbe_pallas import row_scatter_add, row_scatter_write


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    R, D, U = 5000, 128, 2100
    table = rng.normal(size=(R, D)).astype(np.float32)
    # distinct real rows + OOB sentinels + NEGATIVE sentinels (the
    # position-layout dedup emits num_rows+pos; kernels compare unsigned)
    rows = np.concatenate([
        rng.choice(R, size=U - 60, replace=False),
        np.arange(R, R + 30), np.full(30, -1),
    ]).astype(np.int32)
    return table, rows, rng


def test_row_scatter_add_skips_oob_and_negative(data):
    table, rows, rng = data
    U, D = rows.shape[0], table.shape[1]
    deltas = rng.normal(size=(U, D)).astype(np.float32)
    out = np.asarray(
        row_scatter_add(
            jnp.asarray(table), jnp.asarray(rows), jnp.asarray(deltas),
            interpret=True,
        )
    )
    want = table.copy()
    for i in range(U - 60):
        want[rows[i]] += deltas[i]
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_row_scatter_write_skips_oob_and_negative(data):
    table, rows, rng = data
    U, D = rows.shape[0], table.shape[1]
    vals = rng.normal(size=(U, D)).astype(np.float32)
    out = np.asarray(
        row_scatter_write(
            jnp.asarray(table), jnp.asarray(rows), jnp.asarray(vals),
            interpret=True,
        )
    )
    want = table.copy()
    for i in range(U - 60):
        want[rows[i]] = vals[i]
    np.testing.assert_allclose(out, want, rtol=1e-6)
