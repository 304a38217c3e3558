"""Real-hardware (TPU) kernel tests.

``tests/`` pins a virtual CPU backend for CI; the Pallas kernels there run
in interpret mode, and interpret mode and the real Mosaic compiler have
disagreed before (ROUND1_NOTES §3). This suite runs the same row-exact
checks against the real compiler. It is SKIPPED automatically when no TPU
is attached:

    python -m pytest tests_tpu/ -q
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU backend attached")
        for item in items:
            item.add_marker(skip)
