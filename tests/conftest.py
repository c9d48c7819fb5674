"""Test config: force CPU JAX with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(SURVEY.md §4). The environment's sitecustomize registers a remote 'axon'
TPU backend and forces jax_platforms='axon,cpu' *after* env vars are read,
so we must override the config again post-import — env vars alone are not
enough.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
