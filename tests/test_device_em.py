"""Device batched EM vs the host oracle (quant/em.py)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strawberry_tpu.quant.device import LocusProblem, batched_em
from strawberry_tpu.quant.em import em_init, em_run


def random_problems(rng, n, max_rows=40, max_cols=6):
    problems = []
    for _ in range(n):
        r = rng.integers(1, max_rows)
        c = rng.integers(1, max_cols)
        W = rng.random((r, c)) * rng.random((r, c))
        # sprinkle zeros and tiny values (sub-1e-5 rows get dropped)
        W[rng.random((r, c)) < 0.4] = 0.0
        W[rng.random((r, c)) < 0.1] = 1e-6
        counts = rng.integers(0, 500, size=r).astype(np.float64)
        problems.append(LocusProblem(counts=counts, weights=W))
    return problems


def host_solve(p: LocusProblem):
    init = em_init(p.weights.shape[1], p.counts, p.weights)
    if init is None:
        return None
    theta = em_run(*init)
    if theta is None:
        theta = init[2]
    return theta


@pytest.mark.parametrize("force_host", [False, True])
def test_batched_em_matches_host_oracle(force_host, monkeypatch):
    # default routes every problem to the device tier kernels;
    # STRAWB_FORCE_HOST routes everything to the host solver
    if force_host:
        monkeypatch.setenv("STRAWB_FORCE_HOST", "1")
    rng = np.random.default_rng(0)
    problems = random_problems(rng, 60)
    dev = batched_em(problems)
    for i, p in enumerate(problems):
        host = host_solve(p)
        if host is None:
            assert dev[i] is None
        else:
            assert dev[i] is not None
            np.testing.assert_allclose(dev[i], host, rtol=1e-9, atol=1e-9,
                                       err_msg=f"problem {i}")


def test_batched_em_zero_denominator_failure():
    # a valid row (weight > 1e-5) whose denominator can be zero only if
    # theta has zeros — engineer: two isoforms, one bin each, disjoint
    W = np.array([[0.5, 0.0], [0.0, 0.4]])
    counts = np.array([10.0, 0.0])
    p = LocusProblem(counts=counts, weights=W)
    host = host_solve(p)
    dev = batched_em([p])[0]
    np.testing.assert_allclose(dev, host, rtol=1e-9)


def test_batched_em_all_rows_dropped():
    p = LocusProblem(counts=np.array([3.0]), weights=np.array([[1e-6]]))
    assert host_solve(p) is None
    assert batched_em([p])[0] is None


def test_em_dispatcher_routing_counts(monkeypatch):
    """Routing follows the measured crossover (benchmarks/
    em_crossover.json): the golden f64 path solves on host; with
    STRAWB_DEVICE_EM=1 (or --fast-em) every fitting problem dispatches to
    the device tiers."""
    from strawberry_tpu.quant.device import EmDispatcher, _TIERS
    rng = np.random.default_rng(1)
    problems = random_problems(rng, 40)
    n_fit = sum(1 for p in problems if p.filtered()[0].size > 0)

    # default golden mode: host carries the f64 EM
    d0 = EmDispatcher()
    for i, p in enumerate(problems):
        d0.add(i, p)
    r0 = d0.finish()
    assert d0.n_host == n_fit and d0.n_device == 0

    # forced device mode: everything that fits the menu goes on-chip
    monkeypatch.setenv("STRAWB_DEVICE_EM", "1")
    d = EmDispatcher()
    for i, p in enumerate(problems):
        d.add(i, p)
    res = d.finish()
    assert d.n_device == n_fit and d.n_host == 0
    for a, b in zip(r0, res):  # same numerics either way (device f64 vs
        assert (a is None) == (b is None)  # host: 1e-9, like the oracle
        if a is not None:                  # parity tests above)
            np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9)
    # oversized problems fall back to the host solver
    big_r = _TIERS[-1][0] + 1
    big = LocusProblem(counts=np.ones(big_r),
                       weights=np.full((big_r, 2), 0.5))
    d2 = EmDispatcher()
    d2.add(0, big)
    r2 = d2.finish()
    assert d2.n_host == 1 and d2.n_device == 0 and r2[0] is not None
