"""Examples smoke: every recipe in examples/ runs end-to-end on the
virtual 8-device CPU mesh.

The reference pins its example scripts with per-example CI smoke runs
(reference .github/workflows + examples/*/tests); here one slow-marked
parametrized test drives each recipe in a subprocess (the wrapper pattern
from CLAUDE.md: ``jax.config.update("jax_platforms", "cpu")`` MUST run
before any jax op — the env var alone does not stick in this container,
so a ``-c`` bootstrap + runpy is used instead of ``JAX_PLATFORMS``).
"""

import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).resolve().parent.parent / "examples"
EXAMPLES = sorted(p.name for p in EXAMPLES_DIR.glob("*.py"))

_BOOTSTRAP = (
    "import sys, jax, runpy;"
    "jax.config.update('jax_platforms', 'cpu');"
    "path = sys.argv[1];"
    "sys.argv = sys.argv[1:];"
    "runpy.run_path(path, run_name='__main__')"
)


def test_examples_inventory():
    """Every recipe is picked up (guards against the list drifting the way
    the hand-run wrapper's '9 examples' note did)."""
    assert len(EXAMPLES) >= 10, EXAMPLES


@pytest.mark.slow
@pytest.mark.parametrize("example", EXAMPLES)
def test_example_runs(example):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _BOOTSTRAP, str(EXAMPLES_DIR / example)],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=str(EXAMPLES_DIR.parent),
    )
    assert proc.returncode == 0, (
        f"{example} failed\n--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}"
    )
