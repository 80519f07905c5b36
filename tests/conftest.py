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

# persistent XLA compilation cache: this box has ONE cpu and the suite is
# compile-bound, so warm reruns are ~an order of magnitude faster
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
