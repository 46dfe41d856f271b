"""Test bootstrap: force an 8-device virtual CPU mesh before jax imports.

Multi-host/multi-chip logic is exercised on a virtual mesh (the driver
separately dry-runs the real multi-chip path via __graft_entry__).
Set GRAV1_TEST_TPU=1 to run device tests on the real chip instead.
"""

import os
import sys

if not os.environ.get("GRAV1_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
