"""Test config: run on CPU with 8 virtual devices (multi-chip sharding tests run on
a simulated mesh; real-TPU benchmarking happens in bench.py, not here).

NB. the environment's sitecustomize (PYTHONPATH=.axon_site) registers the axon
TPU-tunnel backend and imports jax BEFORE any user code runs, with
JAX_PLATFORMS=axon pinned in the env — so env vars alone cannot redirect to CPU;
we must also update the live jax config."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
