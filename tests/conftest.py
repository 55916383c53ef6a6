import os
import sys

# Tests always run on CPU with a virtual 8-device mesh so multi-chip
# sharding paths compile+execute without TPU hardware.
# Force CPU even if the outer environment selects a TPU platform: parity
# tests need float64, and the virtual 8-device mesh needs host devices.
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax

# The sitecustomize in this image registers the axon TPU plugin and resets
# jax_platforms to "axon,cpu"; the config update below (post-import,
# pre-backend-init) reliably forces CPU for tests.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against the float64 reference implementation.
jax.config.update("jax_enable_x64", True)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
