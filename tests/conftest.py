"""Test fixtures.

Tests run on CPU with 8 virtual XLA devices so the data-parallel mesh
logic (psum over "data") is exercised without TPU hardware — the TPU
answer to "multi-node tests without a cluster" (SURVEY.md §4).

NOTE: this environment's sitecustomize pre-imports jax and registers a
TPU ("axon") backend, so mutating JAX_PLATFORMS here is too late;
``jax.config.update("jax_platforms", ...)`` still works because the
backends are not initialized until first use.  XLA_FLAGS is read at
backend init, so setting it here (before any jax.devices() call) works.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session", autouse=True)
def _check_devices():
    assert jax.device_count() >= 8, (
        "tests expect 8 virtual CPU devices; got "
        f"{jax.device_count()} ({jax.devices()})"
    )


def pytest_collection_modifyitems(config, items):
    """Auto-mark measured-slow tests (call time >= 15 s on the 1-CPU
    container, tests/slow_tests.json — regenerate from a full-suite
    `--durations=0` log) so the pre-commit fast suite
    `pytest -m "not slow"` stays cheap enough to run before every
    commit (CLAUDE.md).  Explicit @pytest.mark.slow marks still apply.
    """
    import json

    path = os.path.join(os.path.dirname(__file__), "slow_tests.json")
    try:
        with open(path) as f:
            slow = set(json.load(f))
    except (OSError, ValueError):
        return
    for item in items:
        if item.nodeid in slow:
            item.add_marker(pytest.mark.slow)
