"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4: multi-device semantics (psum-in-loss, eval gather) are
validated via `--xla_force_host_platform_device_count`, substituting for the
reference's nonexistent distributed tests.

NOTE: the axon sitecustomize force-registers the TPU backend and overrides
JAX_PLATFORMS, so plain env vars don't stick — `jax.config.update` after
import does.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the e2e train-step graphs take ~20 min to
# compile on CPU the first time; cached runs are seconds.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
