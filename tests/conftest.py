"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; all sharding tests run against
``--xla_force_host_platform_device_count=8`` (the reference's analog is
MultiProcessTestBase spawning N single-host processes,
torchrec/distributed/test_utils/multi_process.py:126). Set
``TORCHREC_TPU_TEST_REAL_DEVICE=1`` to run on real hardware instead.

Note: this environment's TPU plugin registers itself programmatically and
sets ``jax_platforms`` via the config API, so the env var alone does not
stick — we must force the platform through ``jax.config`` before first use.
"""

import os

_REAL = bool(os.environ.get("TORCHREC_TPU_TEST_REAL_DEVICE"))

if not _REAL:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _REAL:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
