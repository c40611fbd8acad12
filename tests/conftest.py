"""Test config: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's `--fake-devices=N` testing pattern (reference:
src/options.hh:355-357) — multi-device code paths are exercised without
real hardware by faking the topology.
"""

import os

# The environment may pin JAX_PLATFORMS to a hardware plugin (e.g. axon);
# override hard — tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
