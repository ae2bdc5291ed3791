"""Streaming BAM decoder (sbam): block-concat equality vs the batch
decoder, streaming-vs-batch pipeline output equality, and the low-memory
drop path."""
import io
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strawberry_tpu.config import Config
from strawberry_tpu.sim import make_dataset

try:
    from strawberry_tpu.io.native import load_bam_native
    from strawberry_tpu.io.sbam import open_bam_stream
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native lib unavailable")

CAT_FIELDS = ("ref_id", "left", "right", "strand", "flag", "mate_ref",
              "mate_pos", "nh", "read_id", "cigar_hash", "feat_code",
              "feat_left", "feat_len")


def collect_blocks(s):
    blocks, k = [], 0
    while s.wait_block(k):
        blocks.append(s.block_table(k))
        k += 1
    return blocks


def assert_stream_equals_batch(bam, cfg):
    t = load_bam_native(bam, cfg)
    s = open_bam_stream(bam, cfg)
    assert s.ref_real_names == t.ref_real_names
    assert s.ref_lens == t.ref_lens
    assert s.read_len_hist == t.read_len_hist
    blocks = collect_blocks(s)
    for f in CAT_FIELDS:
        cat = (np.concatenate([getattr(b, f) for b in blocks])
               if blocks else np.zeros(0))
        assert np.array_equal(cat, getattr(t, f)), f
    fo = np.concatenate(
        [[0]] + [np.diff(b.feat_off) for b in blocks]).cumsum() \
        if blocks else np.zeros(1, np.int64)
    assert np.array_equal(fo, t.feat_off)
    # each block holds exactly one chromosome, in file order
    chroms = [int(b.ref_id[0]) for b in blocks]
    assert chroms == sorted(set(chroms))
    for b in blocks:
        assert (b.ref_id == b.ref_id[0]).all()
    assert len(s) == len(t)
    assert s.paired_end == t.paired_end
    assert s.read_len_mode() == t.read_len_mode()


@pytest.mark.parametrize("kw,cfg_kw", [
    (dict(seed=11, n_frags=4000, n_chroms=3), {}),
    (dict(seed=12, n_frags=1500, paired=False, with_xs=False),
     dict(rf_strand=True)),
])
def test_stream_equals_batch(tmp_path, kw, cfg_kw):
    bam, _gtf, _ = make_dataset(str(tmp_path), **kw)
    assert_stream_equals_batch(bam, Config(**cfg_kw))


def test_stream_pipeline_matches_batch_pipeline(tmp_path):
    bam, gtf, _ = make_dataset(str(tmp_path), seed=13, n_frags=3000,
                               n_chroms=2)
    from strawberry_tpu.pipeline import run_driver
    outs = {}
    for stream in (False, True):
        cfg = Config(ref_gtf_filename=gtf, utilize_ref_models=True,
                     stream_decode=stream)
        out = io.StringIO()
        run_driver(bam, cfg, out, io.StringIO())
        outs[stream] = out.getvalue()
    assert outs[True] == outs[False]
    assert outs[True]


def test_low_mem_pipeline_matches_default(tmp_path):
    """--low-mem: pass 1 drops blocks as consumed (decoder backpressure),
    pass 2 re-decodes; output must stay byte-identical and the consumed
    blocks must actually be released."""
    bam, gtf, _ = make_dataset(str(tmp_path), seed=15, n_frags=3000,
                               n_chroms=3)
    from strawberry_tpu.pipeline import run_driver
    outs = {}
    samples = {}
    for low in (False, True):
        cfg = Config(ref_gtf_filename=gtf, utilize_ref_models=True,
                     low_mem=low)
        out = io.StringIO()
        samples[low] = run_driver(bam, cfg, out, io.StringIO())
        outs[low] = out.getvalue()
    assert outs[True] == outs[False]
    assert outs[True]
    # every block of the (re-opened) pass-2 stream was dropped after use
    t = samples[True].table
    for k in range(t.num_blocks()):
        assert int(t._lib.strawb_sbam_block_n(t.handle, k)) == 0
    # the default run retains its blocks
    t0 = samples[False].table
    assert sum(int(t0._lib.strawb_sbam_block_n(t0.handle, k))
               for k in range(t0.num_blocks())) == len(t0)


def test_drop_block_releases_and_errors_surface(tmp_path):
    bam, _gtf, _ = make_dataset(str(tmp_path), seed=14, n_frags=500,
                                n_chroms=2)
    s = open_bam_stream(bam, Config())
    assert s.wait_block(0)
    n0 = int(s.block_table(0).ref_id.shape[0])
    assert n0 > 0
    s.drop_block(0)
    assert int(s._lib.strawb_sbam_block_n(s.handle, 0)) == 0
    # truncated file -> decode error raised from wait_block
    raw = open(bam, "rb").read()
    bad = os.path.join(str(tmp_path), "trunc.bam")
    with open(bad, "wb") as f:
        f.write(raw[:len(raw) // 2 + 13])
    # the decode error surfaces either at open (small file: pipeline fails
    # before the header wait returns) or from a block wait
    with pytest.raises(IOError):
        s2 = open_bam_stream(bad, Config())
        k = 0
        while s2.wait_block(k):
            k += 1
        s2.wait_block(1 << 60)
