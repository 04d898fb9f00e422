"""Test configuration.

Forces JAX onto the CPU backend with 8 virtual devices so the sharding /
multi-chip code paths are exercised without TPU hardware (the TPU-native
analogue of testing multi-node without a cluster; see SURVEY.md section 4).

NOTE: this image re-exports JAX_PLATFORMS=axon (the TPU tunnel) at
interpreter startup, so the env var cannot be overridden from here; the
config API can.  XLA_FLAGS must still be set before the backend initializes.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
