"""Test configuration: force an 8-device virtual CPU mesh.

Must run before the first `import jax` anywhere in the test process so that
multi-device sharding tests (SURVEY.md §4 note 5) get real multi-device
semantics on one host.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# This box can have very few cores: 8 virtual devices execute their
# partitions nearly serially, so the default 20s/40s collective rendezvous
# warn/terminate windows abort valid runs. Widen them.
if "collective_call_terminate" not in _flags:
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
               " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
               " --xla_cpu_collective_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = _flags
# PJRT CPU client sizes its thread pool from detected cores; on a 1-core
# host blocking collectives starve the other partitions (deadlock). Force a
# pool large enough for all 8 virtual devices.
if (os.cpu_count() or 1) < 16:
    os.environ.setdefault("PJRT_NPROC", "16")

# The axon sitecustomize may have registered a remote-TPU backend and forced
# jax_platforms before this conftest ran; override it at the config level too
# (backends are not yet initialized at collection time, so this wins).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    import jax
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.RandomState(0)
