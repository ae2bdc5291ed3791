"""Unit tests for the pure kernels (SURVEY §4: interval algebra,
CIGAR->features, compatibility, effective length, EM step)."""
import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strawberry_tpu.core.cluster import one_d_binary_clustering, phi
from strawberry_tpu.core.features import (Contig, S_INTRON, S_MATCH,
                                          exonic_overlaps_len, is_compatible,
                                          merge_features, merge_genomic_feats)
from strawberry_tpu.core.insert_size import InsertSize
from strawberry_tpu.quant.bins import (disjoint_exon_segs, effective_len,
                                       bin_under_iso)
from strawberry_tpu.quant.binweights import effective_len_vec


def test_disjoint_exon_segs():
    # two overlapping exons split at all boundaries
    exons = [(S_MATCH, 10, 11), (S_MATCH, 15, 16)]   # [10,20], [15,30]
    segs = disjoint_exon_segs(exons)
    assert segs == [(S_MATCH, 10, 5), (S_MATCH, 15, 6), (S_MATCH, 21, 10)]
    # disjoint input unchanged
    exons = [(S_MATCH, 10, 11), (S_MATCH, 40, 11)]
    segs = disjoint_exon_segs(exons)
    assert segs == [(S_MATCH, 10, 11), (S_MATCH, 40, 11)]
    # identical intervals collapse
    exons = [(S_MATCH, 10, 11), (S_MATCH, 10, 11)]
    assert disjoint_exon_segs(exons) == [(S_MATCH, 10, 11)]


def test_one_d_binary_clustering():
    assert one_d_binary_clustering([0, 0, 0, 1, 1, 1]) == 2
    # last index wins on score ties (>= comparison, clustering.h:40)
    assert one_d_binary_clustering([0, 0, 0, 0]) == 3
    assert one_d_binary_clustering([]) == -1
    assert one_d_binary_clustering([1, 0, 1, 0, 1]) in range(5)


def test_phi_abramowitz_stegun():
    # A&S 7.1.26 has ~7.5e-8 absolute error vs exact
    from math import erf, sqrt
    for x in (-3.0, -1.0, -0.1, 0.0, 0.5, 2.0, 5.0):
        exact = 0.5 * (1 + erf(x / sqrt(2)))
        assert abs(phi(x) - exact) < 1e-6
    assert math.isnan(phi(float("nan")))


def test_merge_genomic_feats_pair_overlap():
    # overlapping mates merge; mismatched introns fail
    a = [(S_MATCH, 100, 50), (S_MATCH, 120, 50)]
    m = merge_genomic_feats(sorted(a, key=lambda f: (f[1], f[2])))
    assert m == [(S_MATCH, 100, 70)]
    bad = [(S_INTRON, 100, 50), (S_INTRON, 100, 60)]
    assert merge_genomic_feats(bad) == []
    # disjoint same-code matches (hole) fail
    hole = [(S_MATCH, 100, 10), (S_MATCH, 200, 10)]
    assert merge_genomic_feats(hole) == []


def test_merge_features_adjacent():
    f = [(S_MATCH, 10, 5), (S_MATCH, 15, 5), (S_INTRON, 20, 10),
         (S_MATCH, 30, 5)]
    assert merge_features(f) == [(S_MATCH, 10, 10), (S_INTRON, 20, 10),
                                 (S_MATCH, 30, 5)]


def _iso(feats):
    return Contig(ref_id=0, strand=1, feats=feats, is_ref=True)


def _read(feats):
    return Contig(ref_id=0, strand=0, feats=feats, is_ref=False)


def test_is_compatible():
    iso = _iso([(S_MATCH, 100, 100), (S_INTRON, 200, 50),
                (S_MATCH, 250, 100)])
    # exact junction match
    assert is_compatible(_read([(S_MATCH, 180, 20), (S_INTRON, 200, 50),
                                (S_MATCH, 250, 20)]), iso)
    # intron mismatch
    assert not is_compatible(_read([(S_MATCH, 180, 20), (S_INTRON, 200, 40),
                                    (S_MATCH, 240, 20)]), iso)
    # contained single segment
    assert is_compatible(_read([(S_MATCH, 120, 50)]), iso)
    # crosses junction without splice -> incompatible
    assert not is_compatible(_read([(S_MATCH, 180, 40)]), iso)
    # ref reads are never compatible
    assert not is_compatible(iso, iso)


def test_exonic_overlaps_len():
    iso = _iso([(S_MATCH, 100, 100), (S_INTRON, 200, 50),
                (S_MATCH, 250, 100)])
    assert exonic_overlaps_len(iso, 150, 300) == 50 + 51
    assert exonic_overlaps_len(iso, 210, 240) == 0


def test_effective_len_scalar_vs_vectorized():
    rng = np.random.default_rng(3)
    for _ in range(200):
        n = int(rng.integers(1, 8))
        seg_lens = [int(rng.integers(20, 300)) for _ in range(n)]
        n_imp = int(rng.integers(0, max(1, n - 2) + 1)) if n > 2 else 0
        if n == 3 and n_imp > 1:
            n_imp = 1
        if n == 4 and n_imp > 2:
            n_imp = 2
        implicit = sorted(rng.choice(np.arange(1, n - 1), size=n_imp,
                                     replace=False).tolist()) if n_imp else []
        rl = 75
        lmin = max(rl, sum(seg_lens[1:-1]) if n > 2 else 0)
        lmax = sum(seg_lens)
        if lmin > lmax:
            continue
        fl = np.arange(lmin, lmax + 1, dtype=np.int64)
        vec = effective_len_vec(seg_lens, implicit, fl, rl)
        vec = np.broadcast_to(vec, fl.shape)
        for k in range(0, len(fl), max(1, len(fl) // 17)):
            assert vec[k] == effective_len(seg_lens, implicit, int(fl[k]),
                                           rl), (seg_lens, implicit, fl[k])


def test_insert_size_empirical_pdf():
    isz = InsertSize(frag_lens=[100, 100, 200, 300])
    assert isz.use_emp
    assert isz.emp_dist_pdf(100) == 0.5
    assert isz.emp_dist_pdf(200) == 0.25
    # empty bin falls back to the normal pdf
    assert isz.emp_dist_pdf(150) > 0
    # outside [min,max] also falls back
    assert isz.emp_dist_pdf(1000) >= 0


def test_native_efflen_closed_form_vs_enum():
    """The n>=5 closed-form effective length (quantprep.cc
    effective_len_n5) must equal the reference-semantics bitmask
    enumeration (isoform.h:476-514 incl. the bp_last quirk) exactly."""
    import ctypes as C
    import random
    from strawberry_tpu.io.native import get_lib
    try:
        lib = get_lib()
    except OSError:
        pytest.skip("native lib unavailable")
    i64p = C.POINTER(C.c_int64)
    for f in ("strawb_efflen_enum", "strawb_efflen"):
        fn = getattr(lib, f)
        fn.restype = C.c_int64
        fn.argtypes = [i64p, C.c_int64, i64p, C.c_int64, C.c_int64,
                       C.c_int64]
    rng = random.Random(1234)
    for _ in range(20000):
        n = rng.randint(5, 12)
        s = [rng.randint(1, 60) if rng.random() < 0.8
             else rng.randint(1, 800) for _ in range(n)]
        ni = n - 2
        imp = sorted(rng.sample(range(1, ni + 1),
                                rng.randint(0, min(ni, 3)))) \
            if rng.random() < 0.6 else []
        rl = rng.choice([50, 76, 100, 150])
        fl = rng.randint(0, sum(s) + 50)
        sa = np.array(s, np.int64)
        ia = np.array(imp, np.int64)
        a = lib.strawb_efflen_enum(sa.ctypes.data_as(i64p), n,
                                   ia.ctypes.data_as(i64p), len(imp), fl, rl)
        b = lib.strawb_efflen(sa.ctypes.data_as(i64p), n,
                              ia.ctypes.data_as(i64p), len(imp), fl, rl)
        assert a == b, (s, imp, fl, rl, a, b)
