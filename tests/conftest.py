"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere in the test process.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# force CPU: the ambient environment pins JAX to the TPU tunnel (the axon
# sitecustomize calls jax.config.update('jax_platforms', 'axon,cpu') at interpreter
# start, which overrides the JAX_PLATFORMS env var), but the test suite needs the
# virtual 8-device CPU mesh and CPU-exact numerics — so re-override the config here,
# before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# keep HF offline: everything in these tests is constructed locally
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
