import os

# Tests run on a virtual 8-device CPU mesh: the standard fake-backend trick
# for validating multi-chip sharding without hardware.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# This environment's sitecustomize registers a remote TPU backend and
# overrides jax_platforms at import time; force CPU back explicitly so the
# suite never rides the single-chip tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
