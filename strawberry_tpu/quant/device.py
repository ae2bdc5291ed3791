"""Batched EM over padded (loci, bins, isoforms) tensors — the flagship
TPU kernel.

The reference runs one Eigen EM per locus inside a thread pool
(src/estimate.cpp:411-488). Here loci are bucketed by padded shape and the
whole bucket iterates as one jitted `lax.while_loop` whose E/M steps are
batched matmuls on the MXU; per-locus convergence is tracked with masks.

Semantics match quant/em.py (the host oracle) exactly, using an algebraic
simplification of the reference's per-iteration F column renormalization:
renormalizing column-stochastic F is the identity, so iteration 1 uses the
raw weights and every later iteration uses the once-normalized F (the
`newF==0` quirk keeps all-zero columns zero). Convergence keeps the
PREVIOUS theta (the reference breaks before assigning), and a zero E-step
denominator on a live row aborts the locus back to theta0.
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..utils import jaxsetup  # noqa: F401  (enables x64)
import jax
import jax.numpy as jnp

MAX_ITER = 1000
THETA_CHANGE_LIMIT = 1e-2


def _round_up(x: int, choices: Sequence[int]) -> int:
    for c in choices:
        if x <= c:
            return c
    return choices[-1]


_ROW_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
_COL_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


@partial(jax.jit, static_argnames=("max_iter",))
def _em_bucket(F_raw, u, theta0, valid_row, active, max_iter=MAX_ITER):
    """Run EM for a bucket.

    F_raw:     (B, R, C) raw bin weights (padded rows/cols zero)
    u:         (B, R)    truncated bin counts
    theta0:    (B, C)    total_count/num_iso start (padded cols zero)
    valid_row: (B, R)    rows that survived the >1e-5 filter
    active:    (B,)      real (non-padding, EM-initialized) loci
    Returns (theta_final, failed)
    """
    dt = F_raw.dtype
    colsum = jnp.sum(F_raw, axis=1, keepdims=True)            # (B,1,C)
    F_norm = jnp.where(colsum != 0, F_raw / jnp.where(colsum == 0, 1, colsum),
                       jnp.zeros_like(F_raw))

    def step_once(F, theta, theta_ref, done, failed):
        denom = jnp.einsum("brc,bc->br", F, theta,
                           preferred_element_type=dt)          # (B,R)
        row_fail = (denom == 0.0) & valid_row
        newly_failed = jnp.any(row_fail, axis=1) & ~done
        safe_denom = jnp.where(denom == 0.0, 1.0, denom)
        U = (u[:, :, None] * F * theta[:, None, :]) / safe_denom[:, :, None]
        U = jnp.where(valid_row[:, :, None], U, 0.0)
        next_theta = jnp.sum(U, axis=1)                        # (B,C)
        dist = jnp.sqrt(jnp.sum((next_theta - theta) ** 2, axis=1))
        converged = dist < THETA_CHANGE_LIMIT
        # on convergence keep the PREVIOUS theta; on failure reset to theta0
        # (EmSolver::run writes _theta only on clean exit; a zero-denominator
        # abort leaves the init value, estimate.cpp:449-452,484-487)
        step = ~done & ~converged & ~newly_failed
        theta = jnp.where(step[:, None], next_theta, theta)
        theta = jnp.where(newly_failed[:, None], theta_ref, theta)
        done = done | converged | newly_failed
        failed = failed | newly_failed
        return theta, done, failed

    def body(state):
        it, theta, done, failed = state
        theta, done, failed = step_once(F_norm, theta, theta0, done, failed)
        return it + 1, theta, done, failed

    def cond(state):
        it, _theta, done, _failed = state
        return (it < max_iter) & ~jnp.all(done)

    B = F_raw.shape[0]
    done0 = ~active
    failed0 = jnp.zeros((B,), bool)
    # iteration 1 uses the raw weights (peeled out of the loop); every later
    # iteration uses the once-normalized F
    theta1, done1, failed1 = step_once(F_raw, theta0, theta0, done0, failed0)
    init = (jnp.asarray(1, jnp.int32), theta1, done1, failed1)
    _, theta, _, failed = jax.lax.while_loop(cond, body, init)
    return theta, failed


@dataclass
class LocusProblem:
    """One locus' EM inputs, produced on host from a LocusContext."""
    counts: np.ndarray          # (r,) int truncated bin counts (all rows)
    weights: np.ndarray         # (r, c) raw bin weights (all rows)

    def filtered(self):
        keep = (self.weights > 1e-5).any(axis=1)
        return self.counts[keep], self.weights[keep]


def batched_em(problems: List[LocusProblem],
               dtype=jnp.float64,
               use_pallas: bool = False,
               device_min_elems: int = 1 << 21
               ) -> List[Optional[np.ndarray]]:
    """Solve many per-locus EMs on device with shape-bucketed batching.

    Returns per-problem theta (or None when EM init fails — no surviving
    rows — matching EmSolver::init returning false)."""
    if os.environ.get("STRAWB_FORCE_HOST"):
        device_min_elems = 1 << 60
        use_pallas = False
    results: List[Optional[np.ndarray]] = [None] * len(problems)
    buckets: Dict[Tuple[int, int], List[Tuple[int, np.ndarray, np.ndarray,
                                              float, int]]] = {}
    for idx, p in enumerate(problems):
        total = float(np.sum(p.counts))
        niso = p.weights.shape[1]
        u, F = p.filtered()
        if u.size == 0:
            continue  # init failure
        rb = _round_up(F.shape[0], _ROW_BUCKETS)
        cb = _round_up(niso, _COL_BUCKETS)
        buckets.setdefault((rb, cb), []).append((idx, u, F, total, niso))

    host_items = []
    for (rb, cb), items in sorted(buckets.items()):
        # pad the batch dim to a power of two so each (B,R,C) bucket shape
        # compiles once and is reused via the persistent cache
        B = max(8, 1 << (len(items) - 1).bit_length())
        if B * rb * cb < device_min_elems and not use_pallas:
            # tiny bucket: device dispatch costs more than the math; the
            # host path follows the oracle spec (native batch, numpy
            # fallback), so results match
            host_items.extend(items)
            continue
        F = np.zeros((B, rb, cb), dtype=np.float64)
        u = np.zeros((B, rb), dtype=np.float64)
        theta0 = np.zeros((B, cb), dtype=np.float64)
        valid = np.zeros((B, rb), dtype=bool)
        active = np.zeros((B,), dtype=bool)
        for b, (idx, uu, FF, total, niso) in enumerate(items):
            r = FF.shape[0]
            F[b, :r, :niso] = FF
            u[b, :r] = uu
            theta0[b, :niso] = total / niso
            valid[b, :r] = True
            active[b] = True
        if use_pallas:
            from .pallas_em import em_bucket_pallas
            theta = em_bucket_pallas(F, u, theta0, valid, active)
        else:
            theta, _failed = _em_bucket(jnp.asarray(F, dtype),
                                        jnp.asarray(u, dtype),
                                        jnp.asarray(theta0, dtype),
                                        jnp.asarray(valid),
                                        jnp.asarray(active))
        theta = np.asarray(theta, np.float64)
        for b, (idx, _uu, _FF, _total, niso) in enumerate(items):
            results[idx] = theta[b, :niso]

    if host_items:
        _host_em_batch(host_items, results)
    return results


_native_em = None


def _get_native_em():
    global _native_em
    if _native_em is None:
        try:
            import ctypes as C
            from ..io.native import get_lib
            lib = get_lib()
            P64 = C.POINTER(C.c_int64)
            PD = C.POINTER(C.c_double)
            lib.strawb_em_batch.restype = None
            lib.strawb_em_batch.argtypes = [
                C.c_int64, P64, P64, P64, PD, PD, PD, P64, PD, C.c_int64]
            _native_em = lib.strawb_em_batch
        except Exception:
            _native_em = False
    return _native_em


def _host_em_batch(items, results):
    """Solve host-routed EM problems in one native batch call (em.cc);
    per-problem numpy oracle fallback."""
    import ctypes as C
    fn = _get_native_em()
    if not fn:
        from .em import em_run
        for (idx, uu, FF, total, niso) in items:
            # rows here are already >1e-5-filtered; theta0 uses the
            # unfiltered count total, as EmSolver::init does
            theta0 = np.full(niso, total / niso, dtype=np.float64)
            theta = em_run(uu.astype(np.float64), FF, theta0)
            if theta is None:
                theta = theta0
            results[idx] = theta
        return
    n = len(items)
    u_off = np.zeros(n + 1, np.int64)
    F_off = np.zeros(n + 1, np.int64)
    th_off = np.zeros(n + 1, np.int64)
    ncol = np.zeros(n, np.int64)
    theta0 = np.zeros(n, np.float64)
    for k, (idx, uu, FF, total, niso) in enumerate(items):
        u_off[k + 1] = u_off[k] + len(uu)
        F_off[k + 1] = F_off[k] + FF.size
        th_off[k + 1] = th_off[k] + niso
        ncol[k] = niso
        theta0[k] = total / niso
    u_flat = np.ascontiguousarray(
        np.concatenate([np.asarray(it[1], np.float64) for it in items]))
    F_flat = np.ascontiguousarray(
        np.concatenate([np.asarray(it[2], np.float64).ravel()
                        for it in items]))
    out = np.zeros(int(th_off[-1]), np.float64)
    P64 = C.POINTER(C.c_int64)
    PD = C.POINTER(C.c_double)
    fn(n, u_off.ctypes.data_as(P64), F_off.ctypes.data_as(P64),
       ncol.ctypes.data_as(P64), theta0.ctypes.data_as(PD),
       u_flat.ctypes.data_as(PD), F_flat.ctypes.data_as(PD),
       th_off.ctypes.data_as(P64), out.ctypes.data_as(PD),
       min(2, os.cpu_count() or 1))
    for k, (idx, _uu, _FF, _total, niso) in enumerate(items):
        results[idx] = out[int(th_off[k]):int(th_off[k + 1])]
