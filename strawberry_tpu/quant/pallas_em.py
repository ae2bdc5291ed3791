"""Pallas TPU kernel for the batched EM inner loop.

The XLA batched EM (quant/device.py) round-trips the (B,R,C) state through
HBM every iteration. This Mosaic kernel pins a TILE of loci in VMEM and
runs the whole E/M `while_loop` on-chip: the grid walks tiles of the
bucket, each tile iterates lockstep across its loci (VPU-parallel) and
exits as soon as every locus in the tile converged — bounding HBM traffic
to one read + one write of the bucket.

f32 only (TPU Mosaic has no f64), so this is the opt-in fast path for
throughput runs; the f64 XLA path stays the default and the golden oracle.
Semantics otherwise identical: raw-F first iteration, once-normalized F
afterwards, previous-theta-on-convergence, theta0 on zero-denominator.
Must run with x64 disabled (64-bit grid indices fail Mosaic legalization);
the wrapper handles that.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

from ..utils import jaxsetup  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_ITER = 1000
THETA_CHANGE_LIMIT = 1e-2


def _em_kernel(F_ref, u_ref, theta0_ref, valid_ref, active_ref,
               theta_out_ref):
    F_raw = F_ref[...]                     # (TB, R, C)
    u = u_ref[...]                         # (TB, R)
    theta0 = theta0_ref[...]               # (TB, C)
    validf = valid_ref[...].astype(jnp.float32)   # (TB, R)
    activef = active_ref[...].astype(jnp.float32)  # (TB, 1)

    colsum = jnp.sum(F_raw, axis=1, keepdims=True)
    csafe = colsum + jnp.where(colsum == 0.0, jnp.float32(1.0),
                               jnp.float32(0.0))
    F_norm = jnp.where(colsum != 0.0, F_raw / csafe, jnp.float32(0.0))

    def step(F, theta):
        # (TB,R): E-step denominator per bin
        denom = jnp.sum(F * theta[:, None, :], axis=2)
        dz = jnp.where(denom == 0.0, jnp.float32(1.0), jnp.float32(0.0))
        failf = jnp.max(dz * validf, axis=1, keepdims=True)     # (TB,1)
        safe = denom + dz
        U = (u[:, :, None] * F * theta[:, None, :]) / safe[:, :, None]
        U = U * validf[:, :, None]
        next_theta = jnp.sum(U, axis=1)                         # (TB,C)
        dist2 = jnp.sum((next_theta - theta) ** 2, axis=1,
                        keepdims=True)                          # (TB,1)
        return next_theta, dist2, failf

    lim2 = jnp.float32(THETA_CHANGE_LIMIT * THETA_CHANGE_LIMIT)

    def advance(F, theta, done, failed):
        nt, dist2, failf = step(F, theta)
        newly_failed = jnp.minimum(failf, 1.0 - done)           # (TB,1)
        convf = jnp.where(dist2 < lim2, jnp.float32(1.0), jnp.float32(0.0))
        stepf = (1.0 - done) * (1.0 - convf) * (1.0 - newly_failed)
        theta = stepf * nt + (1.0 - stepf) * theta
        theta = newly_failed * theta0 + (1.0 - newly_failed) * theta
        done = jnp.maximum(done, jnp.maximum(convf, newly_failed))
        failed = jnp.maximum(failed, newly_failed)
        return theta, done, failed

    # iteration 1 on raw weights (peeled), like the oracle
    done0 = 1.0 - activef
    failed0 = jnp.zeros_like(done0)
    theta1, done1, failed1 = advance(F_raw, theta0, done0, failed0)

    def cond(state):
        it, _theta, done, _failed = state
        return jnp.logical_and(it < MAX_ITER, jnp.min(done) < 0.5)

    def body(state):
        it, theta, done, failed = state
        theta, done, failed = advance(F_norm, theta, done, failed)
        return it + 1, theta, done, failed

    _it, theta, _done, _failed = jax.lax.while_loop(
        cond, body, (jnp.int32(1), theta1, done1, failed1))
    theta_out_ref[...] = activef * theta + (1.0 - activef) * theta0


def em_bucket_pallas(F_raw, u, theta0, valid_row, active,
                     tile_b: Optional[int] = None,
                     interpret: bool = False):
    """Drop-in f32 variant of quant.device._em_bucket (theta only)."""
    F_raw = np.asarray(F_raw, np.float32)
    u = np.asarray(u, np.float32)
    theta0 = np.asarray(theta0, np.float32)
    valid_row = np.asarray(valid_row, np.int32)
    active = np.asarray(active, np.int32)
    B, R, C = F_raw.shape
    if tile_b is None:
        # tile such that F tile + U temp fit comfortably in VMEM (~16MB);
        # power of two >= 8 for Mosaic's sublane tiling.
        # ~8 live (TB,R,C) f32 temporaries inside the loop; budget against
        # the VREG-PADDED footprint (last dim pads to 128 lanes, second-to-
        # last to 8 sublanes), or a (128,8,64) tier blows the 16MB scoped
        # VMEM 16x through lane padding alone
        rp = -(-R // 8) * 8
        cp = -(-C // 128) * 128
        budget = 256 * 1024 // (rp * cp * 4)
        tile_b = 8
        while tile_b * 2 <= min(B, max(8, budget)):
            tile_b *= 2
    pad = (-B) % tile_b
    if pad:
        F_raw = np.pad(F_raw, ((0, pad), (0, 0), (0, 0)))
        u = np.pad(u, ((0, pad), (0, 0)))
        theta0 = np.pad(theta0, ((0, pad), (0, 0)))
        valid_row = np.pad(valid_row, ((0, pad), (0, 0)))
        active = np.pad(active, ((0, pad),))
    with jax.enable_x64(False):
        out = _em_bucket_pallas(F_raw, u, theta0, valid_row,
                                active[:, None], tile_b, interpret)
    return out[:B]


@partial(jax.jit, static_argnames=("tile_b", "interpret"))
def _em_bucket_pallas(F_raw, u, theta0, valid_row, active, tile_b,
                      interpret=False):
    B, R, C = F_raw.shape
    TB = tile_b
    grid = (B // TB,)
    out = pl.pallas_call(
        _em_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, R, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, R), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, C), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, R), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, C), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        interpret=interpret,
    )(F_raw, u, theta0, valid_row, active)
    return out
