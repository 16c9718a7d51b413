import os

from .sharding import ShardedSolver

__all__ = ["ShardedSolver", "provision_devices"]


def provision_devices(n_devices: int):
    """Return ``n_devices`` jax devices for a sharded run, forcing a
    virtual CPU mesh when fewer real devices exist (the ``mpirun -np N``
    analog, ref:src/HiFiLES.cpp:62-65).  The host-platform device-count
    flag is only read at CPU-client creation, so it must be set before
    the first ``jax.devices()`` call; when the backend is already
    initialized (this environment's sitecustomize starts a TPU client at
    interpreter startup) we flip the platform config and clear the cached
    backends, exactly as tests/conftest.py does."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()

    import jax

    if len(jax.devices()) >= n_devices:
        return jax.devices()[:n_devices]

    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"--devices {n_devices}: only {len(devices)} jax devices "
            f"available, even after forcing a virtual CPU mesh")
    return devices[:n_devices]
