"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no fake backend at all (SURVEY.md §4); we make multi-device
correctness testable on any host by forcing the XLA CPU platform with 8
virtual devices. NOTE: the axon TPU plugin ignores JAX_PLATFORMS, so the
switch must go through jax.config before any computation."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
