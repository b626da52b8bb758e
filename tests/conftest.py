"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Must run before jax is imported anywhere — pytest imports conftest first.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Keep the axon TPU plugin OUT of the test process entirely: even with
# JAX_PLATFORMS=cpu its get_backend hook creates a TPU client, so every
# "CPU" test run silently connects to the chip — and HANGS whenever the
# TPU worker is wedged (observed: a killed TPU job wedged the worker and
# the whole CPU suite froze in make_c_api_client). The plugin registers
# from /root/.axon_site/sitecustomize.py at interpreter startup (before
# conftest), so path stripping is too late — deregister the backend
# factory instead.
os.environ.pop("PYTHONPATH", None)
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
# sitecustomize pins jax_platforms='axon' via jax.config at registration,
# which outlives the env var set above — pin it back
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")


def pytest_configure(config):
    # two-tier runs: inner loop `pytest -m "not slow"`, full suite as the
    # round gate (see CLAUDE.md). Marks carry no behavior by default.
    config.addinivalue_line(
        "markers", "slow: long-running e2e/compile-heavy test; excluded "
        "from the inner-loop run with -m 'not slow'")
