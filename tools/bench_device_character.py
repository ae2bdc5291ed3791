#!/usr/bin/env python
"""Characterize the attached JAX device: the measurements that drive the
golden-path host/device routing decisions.

Writes benchmarks/device_characterization.json:
  * bf16 matmul TFLOP/s  (MXU — where this chip is strong)
  * f32 / i32 streaming GB/s (VPU / effective memory bandwidth)
  * random-gather rate   (the op class integer prep kernels live on)
  * H2D bandwidth + dispatch roundtrip latency (tunnel overheads)
  * f64 IEEE bit-exactness vs the host (add/mul/div/sqrt + seq accum)

Interpretation for routing: the golden path may only off-load work that is
(a) bit-exact on device and (b) faster than the 2-core host. f64 being
non-IEEE excludes all float math; the gather/streaming rates decide the
integer compat/row kernels (quant/device_prep.py)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from strawberry_tpu.utils import jaxsetup  # noqa: F401
    import jax
    import jax.numpy as jnp

    out = {"device": str(jax.devices()[0]),
           "backend": jax.default_backend()}

    def steady(f, *a, n=5):
        g = jax.jit(f)
        _ = np.asarray(g(*a)).ravel()[:1]          # warm + compile
        t0 = time.perf_counter()
        for _i in range(n):
            r = g(*a)
        _ = np.asarray(r).ravel()[:1]
        return (time.perf_counter() - t0) / n

    rng = np.random.default_rng(0)

    a = jnp.asarray(rng.random((4096, 4096), np.float32)).astype(jnp.bfloat16)
    dt = steady(lambda a: (a @ a).astype(jnp.float32).sum(), a)
    out["bf16_matmul_tflops"] = round(2 * 4096**3 / dt / 1e12, 2)

    x = jnp.asarray(rng.random(32 * 1024 * 1024).astype(np.float32))
    dt = steady(lambda x: (x * 1.5 + 2.0).sum(), x)
    out["f32_stream_gbps"] = round(0.128 / dt, 1)

    xi = jnp.asarray(rng.integers(0, 1000, 32 * 1024 * 1024).astype(np.int32))
    dt = steady(lambda x: (x * 3 + 7).sum(), xi)
    out["i32_stream_gbps"] = round(0.128 / dt, 1)

    idx = jnp.asarray(rng.integers(0, 32 * 1024 * 1024,
                                   8 * 1024 * 1024).astype(np.int32))
    dt = steady(lambda x, i: x[i].sum(), x, idx)
    out["gather_mps"] = round(8 / dt, 1)

    h = rng.integers(0, 1000, 1024 * 1024).astype(np.int32)  # 4MB
    jax.device_put(h).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        jax.device_put(h).block_until_ready()
    out["h2d_gbps"] = round(5 * 0.004 / (time.perf_counter() - t0), 2)

    f = jax.jit(lambda v: v * 2)
    s = jnp.zeros((128,), jnp.int32)
    f(s).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        f(s).block_until_ready()
    out["roundtrip_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)

    # f64 IEEE bit-exactness vs numpy
    av = rng.standard_normal(100000) * rng.uniform(1e-8, 1e8, 100000)
    bv = rng.standard_normal(100000) * rng.uniform(1e-8, 1e8, 100000)
    mism = {}
    for name, hostv, devf in [
        ("add", av + bv, lambda: jnp.asarray(av) + jnp.asarray(bv)),
        ("mul", av * bv, lambda: jnp.asarray(av) * jnp.asarray(bv)),
        ("div", av / bv, lambda: jnp.asarray(av) / jnp.asarray(bv)),
    ]:
        d = np.asarray(devf())
        eq = (d.view(np.uint64) == hostv.view(np.uint64)) \
            | (np.isnan(d) & np.isnan(hostv))
        mism[name] = int((~eq).sum())
    out["f64_bit_mismatches_per_100k"] = mism
    out["f64_ieee_bit_exact"] = all(v == 0 for v in mism.values())

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks",
        "device_characterization.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
