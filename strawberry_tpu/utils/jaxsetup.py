"""Central JAX runtime setup.

Importing this module enables x64 (the host oracle and the reference's
Eigen EM are float64; bit-parity tests need f64 on device). Device kernels
that prefer bf16/f32 for MXU throughput request those dtypes explicitly.
"""
import jax

jax.config.update("jax_enable_x64", True)


def device_kind() -> str:
    d = jax.devices()[0]
    return d.platform


def is_tpu() -> bool:
    return device_kind() == "tpu"
