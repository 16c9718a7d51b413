import os

# Run the test suite on a virtual 8-device CPU mesh in float64, so sharding
# logic is exercised without real multi-chip hardware and numerics match the
# f64 CPU reference.
#
# NOTE: this environment's sitecustomize registers and initializes a TPU
# backend at interpreter startup, so env vars alone are too late — we must
# flip the config and clear the cached backends.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.extend.backend as _jeb  # noqa: E402

_jeb.clear_backends()

jax.config.update("jax_enable_x64", True)

assert len(jax.devices()) == 8, jax.devices()

from hifiles_tpu.utils import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
