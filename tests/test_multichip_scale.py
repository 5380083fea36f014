"""Multi-chip scale validation beyond the 8-device mesh.

Two axes the 8-device CPU-mesh suite cannot see:

* world sizes 16/32 — the reference's own TPU experiment hit an XLA
  all_to_all lowering bug at world=32
  (/root/reference/torchrec/experimental/torch_tpu/
  repro_collective_lowering.py:8-18); the dryrun's core legs re-run in a
  subprocess with that many virtual CPU devices.
* REAL TPU topologies — the full sharded train step AOT-compiles against
  v5e meshes via jax.experimental.topologies (no hardware needed), and
  the compiled HLO must contain the cross-chip collectives.

Both are also wired into the driver entry (__graft_entry__.dryrun_
multichip at n=8); these tests pin them in the suite.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.slow
def test_dryrun_scale_16():
    import __graft_entry__ as e

    e._dryrun_scale(16)


@pytest.mark.slow
def test_dryrun_scale_32():
    import __graft_entry__ as e

    e._dryrun_scale(32)


@pytest.mark.slow
def test_aot_real_topologies():
    import __graft_entry__ as e

    e._dryrun_aot_topologies()
