"""Test harness: force an 8-device CPU backend so data-parallel sharding,
all-gather negatives and per-host pipelines are exercised without TPUs
(JAX's standard fake-backend trick; see SURVEY.md §4).

Note: this environment pins JAX_PLATFORMS=axon via a site hook, so the
env var alone is not enough — `jax.config.update` wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
