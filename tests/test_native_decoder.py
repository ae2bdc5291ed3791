"""Native C++ BAM decoder vs the Python oracle: identical arrays."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strawberry_tpu.config import Config
from strawberry_tpu.io.bamreader import load_bam
from strawberry_tpu.io.bamwriter import BamRecord, BamWriter
from strawberry_tpu.sim import make_dataset

try:
    from strawberry_tpu.io.native import load_bam_native
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native lib unavailable")

FIELDS = ("ref_id", "left", "right", "strand", "flag", "mate_ref",
          "mate_pos", "nh", "read_id", "cigar_hash", "feat_off",
          "feat_code", "feat_left", "feat_len")


def assert_equal_tables(a, b):
    for f in FIELDS:
        assert np.array_equal(getattr(a, f), getattr(b, f)), f
    assert a.read_len_hist == b.read_len_hist
    assert a.ref_names == b.ref_names
    assert a.ref_lens == b.ref_lens
    assert a.paired_end == b.paired_end


@pytest.mark.parametrize("kw", [
    dict(seed=2, n_frags=2000),
    dict(seed=3, n_frags=1500, paired=False, with_xs=False),
])
def test_native_matches_python_on_sim(tmp_path, kw):
    bam, _gtf, _ = make_dataset(str(tmp_path), **kw)
    for cfg in (Config(), Config(fr_strand=True), Config(rf_strand=True)):
        assert_equal_tables(load_bam(bam, cfg), load_bam_native(bam, cfg))


def test_native_matches_python_tricky_records(tmp_path):
    recs = [
        BamRecord("unmapped", 4, -1, -1),
        BamRecord("plain", 0, 0, 10, cigar=[(50, "M")], seq="A" * 50),
        BamRecord("splice", 16, 0, 100, cigar=[(20, "M"), (500, "N"),
                                               (30, "M")],
                  seq="A" * 50, tags=[("XS", "A", "-"), ("NM", "i", 2)]),
        BamRecord("shortN", 0, 0, 200, cigar=[(20, "M"), (5, "N"), (30, "M")],
                  seq="A" * 50),
        BamRecord("multi", 0, 0, 300, cigar=[(50, "M")], seq="A" * 50,
                  tags=[("NH", "i", 3)]),
        BamRecord("sec", 0x100, 0, 400, cigar=[(50, "M")], seq="A" * 50),
        BamRecord("del", 0, 0, 500,
                  cigar=[(3, "S"), (20, "M"), (3, "D"), (27, "M")],
                  seq="A" * 50, tags=[("ZZ", "Z", "strval"), ("XF", "f", 1.5)]),
        BamRecord("ins", 0, 0, 600,
                  cigar=[(2, "S"), (20, "M"), (2, "I"), (26, "M")],
                  seq="A" * 50),
        BamRecord("edgeins", 0, 0, 700, cigar=[(20, "M"), (2, "I"), (28, "M")],
                  seq="A" * 50),
        # hard clips + padding: H counts toward seq-len only, P is ignored
        BamRecord("hardclip", 0, 0, 800,
                  cigar=[(5, "H"), (45, "M"), (5, "H")], seq="A" * 45),
        BamRecord("pad", 0, 0, 900,
                  cigar=[(20, "M"), (1, "P"), (30, "M")], seq="A" * 50),
        # I as the LAST op: rejected (not MATCH-sandwiched)
        BamRecord("tailins", 0, 0, 1000, cigar=[(48, "M"), (2, "I")],
                  seq="A" * 50),
        # D at kept-index 1 (after S): rejected by the index<=1 quirk
        BamRecord("earlydel", 0, 0, 1100,
                  cigar=[(3, "S"), (2, "D"), (47, "M")], seq="A" * 50),
        # zero-length op drops the record
        BamRecord("zerolen", 0, 0, 1200, cigar=[(0, "M"), (50, "M")],
                  seq="A" * 50),
        # B-array aux tag must be skipped correctly
        BamRecord("btag", 0, 0, 1300, cigar=[(50, "M")], seq="A" * 50,
                  tags=[("XB", "B", ("i", [1, 2, 3])), ("XS", "A", "+")]),
    ]
    path = str(tmp_path / "t.bam")
    with BamWriter(path, ["chr1"], [100000]) as bw:
        for r in recs:
            bw.write(r)
    for cfg in (Config(), Config(use_only_unique_hits=False)):
        assert_equal_tables(load_bam(path, cfg), load_bam_native(path, cfg))
