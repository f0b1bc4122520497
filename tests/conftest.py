"""Test config: run everything on a virtual 8-device CPU mesh.

TPU hardware is single-chip in CI; multi-chip sharding paths are validated on
host-platform virtual devices exactly as the driver's dryrun does.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The harness image force-registers the 'axon' TPU-tunnel platform ahead of the
# env var, so pin the platform explicitly — tests must run on the virtual CPU
# mesh (f64 available, 8 devices), never on the single tunneled TPU chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
