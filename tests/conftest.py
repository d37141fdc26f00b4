"""Test configuration: force a virtual 8-device CPU platform.

The driver benches on one real TPU chip; tests exercise the full multi-device
sharding semantics on CPU via ``xla_force_host_platform_device_count``
(SURVEY.md §4's test-plan note). float64 is enabled so model/solver code can be
validated against double-precision references.
"""

import os

# NB: sitecustomize may import jax at interpreter startup (axon TPU plugin),
# so env-var selection (JAX_PLATFORMS) is too late here — use jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
