"""Flow-for-flow parity: native lemonns.cc NetworkSimplex vs the Python
oracle assembly/lemonns.py on randomized CMPC-shaped circulation problems
(DAG + source/sink + circulation arc, lower bounds on constraint arcs —
the exact problem family pipeline builds; ref: src/assembly.cpp:882-904).
Degenerate optima are common by construction (small integer costs), so any
pivoting divergence shows up as a different optimal flow vector."""
import ctypes as C
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")
from strawberry_tpu.assembly.flow import Graph
from strawberry_tpu.assembly.lemonns import network_simplex


def _native_solver():
    from strawberry_tpu.io.native import get_lib
    try:
        lib = get_lib()
    except OSError:
        pytest.skip("native lib unavailable")
    i64p = C.POINTER(C.c_int64)
    lib.strawb_ns_solve.restype = C.c_int32
    lib.strawb_ns_solve.argtypes = [C.c_int64, C.c_int64, i64p, i64p,
                                    i64p, i64p, i64p]

    def solve(g, cost_map, lower_map):
        m = g.n_arcs()
        src = np.array(g.arc_src, np.int64)
        dst = np.array(g.arc_dst, np.int64)
        cost = np.zeros(m, np.int64)
        lower = np.zeros(m, np.int64)
        for a, c in cost_map.items():
            cost[a] = c
        for a, c in lower_map.items():
            lower[a] = c
        out = np.zeros(max(m, 1), np.int64)
        ok = lib.strawb_ns_solve(
            g.n_nodes, m, src.ctypes.data_as(i64p),
            dst.ctypes.data_as(i64p), cost.ctypes.data_as(i64p),
            lower.ctypes.data_as(i64p), out.ctypes.data_as(i64p))
        return out[:m].tolist() if ok else None

    return solve


def test_native_ns_matches_oracle_flow_for_flow():
    solve = _native_solver()
    rng = random.Random(99)
    n_infeasible = 0
    for trial in range(1500):
        ne = rng.randint(1, 14)
        g = Graph()
        for _ in range(ne):
            g.add_node()
        cost_map = {}
        lower_map = {}
        for i in range(ne):
            for j in range(i + 1, ne):
                if rng.random() < 0.35:
                    a = g.add_arc(i, j)
                    cost_map[a] = rng.randint(0, 50)
                    if rng.random() < 0.5:
                        lower_map[a] = 1
        source = g.add_node()
        sink = g.add_node()
        for n in range(ne):
            if g.in_deg(n) == 0:
                g.add_arc(source, n)
            if g.out_deg(n) == 0:
                g.add_arc(n, sink)
        g.add_arc(sink, source)
        ref = network_simplex(g, cost_map, lower_map)
        got = solve(g, cost_map, lower_map)
        assert ref == got, (trial, ref, got)
        if ref is None:
            n_infeasible += 1
    # the family must exercise both outcomes
    assert 0 <= n_infeasible < 1500
