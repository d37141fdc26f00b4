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

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables_per_module():
    """Cap the process's live-executable footprint.

    A full-suite run accumulates hundreds of compiled XLA programs; near
    the end of the session the XLA CPU compiler reproducibly SEGFAULTED
    compiling whichever large program came next (position-dependent, not
    test-dependent — moving/removing the test at the crash site just moved
    the crash to the next heavy compile). Dropping the jit/pjit executable
    caches at module teardown keeps peak memory bounded; the framework's
    own ``lru_cache``d program builders simply retrace on next use."""
    yield
    jax.clear_caches()
    # also drop the framework-level cached program builders, which pin
    # their compiled callables outside jax's own caches
    from brdf_tpu.parallel.fit import _fit_pipeline_program, _make_fit_block
    from brdf_tpu.pipeline.fit import (
        _irls_weights_fn,
        _joint_program,
        _reprojection_program,
        _report_statistics_program,
        _single_material_program,
    )

    for cached in (
        _fit_pipeline_program, _make_fit_block, _irls_weights_fn,
        _joint_program, _reprojection_program, _report_statistics_program,
        _single_material_program,
    ):
        cached.cache_clear()
    gc.collect()
