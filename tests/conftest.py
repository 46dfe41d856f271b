"""Test bootstrap: force an 8-device virtual CPU mesh before jax imports.

Multi-host/multi-chip logic is exercised on a virtual mesh (the driver
separately dry-runs the real multi-chip path via __graft_entry__).
Set GRAV1_TEST_TPU=1 to run device tests on the real chip instead.
"""

import os
import sys

if not os.environ.get("GRAV1_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The axon TPU-tunnel plugin (sitecustomize) imports jax at
    # interpreter start and pins jax.config jax_platforms="axon,cpu",
    # so the env var alone is ignored; re-pin the config before any
    # backend initializes to get the 8-device virtual CPU mesh.
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
