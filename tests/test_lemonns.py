"""lemon-exact NetworkSimplex regression tests.

The first case is the real degenerate-optimum locus that exposed the SSP
divergence (chr1:1153063-1161178 of the realistic 20k-gene dataset): two
equal-cost alternative paths (5->6->8 = 32+44 vs 5->7->8 = 49+27) where
lemon's block-search simplex lands on a specific flow that the assembled
transcript structures read directly. The expected flows are the ones an
instrumented reference binary printed for this exact problem."""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strawberry_tpu.assembly.flow import Graph
from strawberry_tpu.assembly.lemonns import network_simplex


def _build(arcs):
    """arcs: (src, dst, cost, lower) in CREATION order."""
    g = Graph()
    n = max(max(a[0], a[1]) for a in arcs) + 1
    for _ in range(n):
        g.add_node()
    cost = {}
    lower = {}
    for (u, v, c, lo) in arcs:
        a = g.add_arc(u, v)
        cost[a] = c
        lower[a] = lo
    return g, cost, lower


# the gene_0063 locus: nodes 0..8 = exon segments in genomic order,
# 9 = source, 10 = sink; arc creation order matches create_network
# (adjacency/intron arcs first, then constraint arcs, then
# add_sink_source's sink/source/circulation arcs)
GENE63_ARCS = [
    (0, 1, 31, 0), (0, 2, 50, 0), (0, 3, 58, 0),
    (1, 2, 47, 0), (1, 3, 34, 0), (1, 5, 58, 0),
    (2, 3, 18, 0),
    (3, 4, 0, 0), (3, 5, 55, 0),
    (4, 5, 24, 0), (4, 7, 37, 0),
    (5, 6, 32, 0), (5, 7, 49, 0),
    (6, 7, 55, 0), (6, 8, 44, 0),
    (7, 8, 27, 0),
    (0, 8, 234, 1), (1, 4, 34, 1), (2, 4, 18, 1), (2, 5, 73, 1),
    (3, 7, 104, 1), (4, 6, 56, 1),
    (8, 10, 0, 0), (9, 0, 0, 0), (10, 9, 0, 0),
]
# flows the reference's lemon NetworkSimplex produces (STRAWB_DUMP_FLOW
# instrumentation); note arc (5,6)=0 / (5,7)=1 — the degenerate tie the
# generic SSP got backwards
GENE63_FLOWS = [1, 2, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0, 1, 3,
                1, 1, 1, 1, 1, 1, 5, 5, 5]


def test_gene63_degenerate_tie():
    g, cost, lower = _build(GENE63_ARCS)
    flows = network_simplex(g, cost, lower)
    assert flows == GENE63_FLOWS


def test_matches_ssp_total_cost():
    """Both solvers are optimal: total cost must agree on random DAG
    circulations even where the argmin flow differs."""
    import numpy as np
    from strawberry_tpu.assembly.mincostflow import solve_dense
    rng = np.random.default_rng(5)
    for trial in range(30):
        n = int(rng.integers(4, 10))
        arcs = []
        for u in range(n):
            for v in range(u + 1, n):
                if v == u + 1 or rng.random() < 0.5:
                    arcs.append((u, v, int(rng.integers(0, 60)),
                                 int(rng.integers(0, 2))))
        # sink/source/circulation (add_sink_source shape)
        src, snk = n, n + 1
        arcs.append((n - 1, snk, 0, 0))
        arcs.append((src, 0, 0, 0))
        arcs.append((snk, src, 0, 0))
        g, cost, lower = _build(arcs)
        flows = network_simplex(g, cost, lower)
        assert flows is not None
        # feasibility: conservation + lower bounds
        bal = [0] * g.n_nodes
        for a in range(g.n_arcs()):
            assert flows[a] >= lower.get(a, 0)
            bal[g.arc_src[a]] -= flows[a]
            bal[g.arc_dst[a]] += flows[a]
        assert all(b == 0 for b in bal)
        ns_cost = sum(flows[a] * cost.get(a, 0) for a in range(g.n_arcs()))
        M = g.n_nodes
        cm = np.zeros((M, M), np.int64)
        ha = np.zeros((M, M), bool)
        lo = np.zeros((M, M), np.int64)
        for a in range(g.n_arcs()):
            u, v = g.arc_src[a], g.arc_dst[a]
            ha[u, v] = True
            cm[u, v] = cost.get(a, 0)
            lo[u, v] = lower.get(a, 0)
        fm = solve_dense(cm, ha, lo)
        assert fm is not None
        ssp_cost = int((fm * cm).sum())
        assert ns_cost == ssp_cost, (trial, ns_cost, ssp_cost)
