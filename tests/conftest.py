"""Test configuration: run everything on CPU with 8 virtual devices and f64.

Mirrors the reference's accuracy regime (complex128 everywhere) so the 1e-10
identity gates are meaningful; sharding tests use the 8-device virtual mesh
(SURVEY.md section 4 item 5).

Note: this environment's sitecustomize imports jax and registers the 'axon'
TPU backend at interpreter start, so JAX_PLATFORMS in os.environ is read too
late — switch platforms through jax.config instead (backends are not yet
instantiated at conftest time).  XLA_FLAGS is read at CPU-client creation, so
setting it here still works.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
