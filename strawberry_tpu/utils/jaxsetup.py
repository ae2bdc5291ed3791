"""Central JAX runtime setup.

Importing this module enables x64 (the host oracle and the reference's
Eigen EM are float64; bit-parity tests need f64 on device). Device kernels
that prefer bf16/f32 for MXU throughput request those dtypes explicitly.
"""
import os

import jax

jax.config.update("jax_enable_x64", True)

# The ambient axon plugin pins jax_platforms programmatically (env
# JAX_PLATFORMS is overridden at interpreter start), so offer our own
# escape hatch for tests/CI: STRAWB_PLATFORM=cpu forces the CPU backend.
_plat = os.environ.get("STRAWB_PLATFORM")
if _plat:
    jax.config.update("jax_platforms", _plat)

# Persistent compilation cache: bucketed kernel shapes recompile across
# processes otherwise (first TPU compile is tens of seconds). Keyed by
# platform so CPU AOT blobs (with machine-feature baggage) don't mix with
# TPU executables.
_plat_hint = os.environ.get("STRAWB_PLATFORM") \
    or os.environ.get("JAX_PLATFORMS", "default")
_cache_dir = os.environ.get(
    "STRAWB_JAX_CACHE",
    os.path.expanduser(f"~/.cache/strawberry_tpu_jax/{_plat_hint}"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # older jax without these knobs
    pass


def device_kind() -> str:
    d = jax.devices()[0]
    return d.platform


def is_tpu() -> bool:
    return device_kind() == "tpu"
