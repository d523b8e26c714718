"""TPU smoke-test configuration.

The main suite (tests/) forces an 8-virtual-device CPU backend and runs
the Pallas kernels in interpret mode; Mosaic lowering regressions are
therefore invisible to it (VERDICT round 3, weak item 6).  This
directory holds a small Mosaic-compiled subset that runs on the real
chip.  It is NOT collected by default (pyproject testpaths=["tests"]);
run it explicitly when the chip is free:

    python -m pytest tests_tpu -q

One TPU process at a time — do not run concurrently with bench.py or
other TPU jobs (the tunnel faults one of the two processes).
"""

import pytest


def pytest_collection_modifyitems(config, items):
    import jax

    if jax.devices()[0].platform != "tpu":
        skip = pytest.mark.skip(reason="no real TPU chip available")
        for item in items:
            item.add_marker(skip)
