"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), a capability the
GPU reference never had (SURVEY.md section 4).  The axon sitecustomize in
this image pins jax to the tunnelled TPU, so the platform is re-pinned to
CPU via jax.config (env vars alone are overridden).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
