"""Force tests onto an 8-virtual-device CPU backend (SURVEY.md §4: simulate
the mesh without TPUs). Must run before any backend is initialized.

Note: this image's sitecustomize registers the 'axon' TPU plugin and pins
``jax_platforms='axon,cpu'`` regardless of JAX_PLATFORMS, so we re-pin the
config to cpu after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
