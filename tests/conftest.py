"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4: multi-device semantics (psum-in-loss, eval gather) are
validated via `--xla_force_host_platform_device_count`, substituting for the
reference's nonexistent distributed tests.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
