"""Test harness: force an 8-device virtual CPU mesh.

Closes the reference's multi-device test gap (SURVEY.md §4): real
pjit/shard_map paths run on ``--xla_force_host_platform_device_count=8``
CPU devices; Pallas kernels run in interpreter mode off-TPU.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Default run = fast subset (<3 min pre-commit gate); the full suite
    (compile-heavy mesh/parity tests included) runs with PS_RUN_SLOW=1 or an
    explicit ``-m`` selection (VERDICT r1 item 9)."""
    if os.environ.get("PS_RUN_SLOW") == "1" or config.getoption("-m"):
        return
    skip = pytest.mark.skip(
        reason="slow (compile-heavy); set PS_RUN_SLOW=1 for the full suite"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
