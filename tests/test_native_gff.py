"""Native GTF/GFF3 parser (gffparse.cc) vs the Python oracle (io/gff.py)."""
import pytest

from strawberry_tpu.io.gff import (GffReader, load_ref_mrnas,
                                   load_ref_mrnas_native, parse_native)
from strawberry_tpu.sim import make_dataset


def _contig_tuple(c):
    return (c.ref_id, c.strand, tuple(c.feats), c.trans_id, c.parent_id,
            c.ref_gene_id, c.ref_gene_name, c.mass, c.is_ref)


@pytest.mark.parametrize("fmt", ["gtf", "gff3"])
def test_native_gff_matches_oracle(tmp_path, fmt):
    kw = dict(annotation_format=fmt) if fmt == "gff3" else {}
    _bam, gtf, _txs = make_dataset(str(tmp_path), seed=33, n_frags=500,
                                   n_chroms=3, max_isoforms=4, **kw)
    reader = GffReader(gtf)
    reader.read_all()
    name2id = {c.name: i for i, c in enumerate(reader.chroms)}
    oracle = load_ref_mrnas(reader, name2id)
    native = load_ref_mrnas_native(parse_native(gtf), name2id)
    assert [_contig_tuple(c) for c in native] == \
        [_contig_tuple(c) for c in oracle]


def test_native_gff_quirks(tmp_path):
    p = tmp_path / "quirks.gtf"
    p.write_text(
        # numeric score -> dropped
        'chr2\tx\texon\t100\t200\t5\t+\t.\tgene_id "gA"; transcript_id "tA";\n'
        # kept; quoted attrs, auto-created gene/transcript
        'chr2\tx\texon\t300\t400\t.\t+\t.\tgene_id "gB"; transcript_id "tB";\n'
        'chr2\tx\texon\t500\t600\t.\t+\t.\tgene_id "gB"; transcript_id "tB";\n'
        # minus strand, descending exon order -> reversed
        'chr1\tx\texon\t900\t950\t.\t-\t.\tgene_id "gC"; transcript_id "tC";\n'
        'chr1\tx\texon\t700\t800\t.\t-\t.\tgene_id "gC"; transcript_id "tC";\n'
        # short line skipped
        "#comment\n"
        "x\ty\n")
    reader = GffReader(str(p))
    reader.read_all()
    name2id = {"chr1": 0, "chr2": 1}
    oracle = load_ref_mrnas(reader, name2id)
    native = load_ref_mrnas_native(parse_native(str(p)), name2id)
    assert [_contig_tuple(c) for c in native] == \
        [_contig_tuple(c) for c in oracle]
    assert [c.trans_id for c in native] == ["tC", "tB"]
    assert native[0].feats[0][1] == 700  # reversed exon order


def test_gtf_sidecar_cache(tmp_path, monkeypatch):
    """The .sbidx sidecar reproduces the fresh parse exactly (arrays, ref
    Contig order, flat RLE), invalidates on file change, and can be
    disabled with STRAWB_GTF_CACHE=0."""
    import os

    import numpy as np

    from strawberry_tpu.io.gff import _sidecar_path
    _bam, gtf, _txs = make_dataset(str(tmp_path), seed=34, n_frags=500,
                                   n_chroms=3, max_isoforms=6)
    sc = _sidecar_path(gtf)
    if os.path.exists(sc):
        os.unlink(sc)
    g1 = parse_native(gtf)          # cold: parses text, writes the sidecar
    assert os.path.exists(sc)
    g2 = parse_native(gtf)          # warm: loads the sidecar
    assert g2.perm is not None and g1.perm is None
    name2id = {n: i for i, n in enumerate(sorted(set(g1.chroms)))}
    r1, f1 = load_ref_mrnas_native(g1, name2id, return_flat=True)
    r2, f2 = load_ref_mrnas_native(g2, name2id, return_flat=True)
    assert [_contig_tuple(c) for c in r1] == [_contig_tuple(c) for c in r2]
    for a, b in zip(f1, f2):
        assert np.array_equal(a, b)
    # invalidation: content change (different mtime/size) forces a reparse
    with open(gtf, "a") as fh:
        fh.write('chr1\tx\texon\t10\t90\t.\t+\t.\tgene_id "gZ"; '
                 'transcript_id "tZ";\n')
    g3 = parse_native(gtf)
    assert g3.perm is None          # stale sidecar rejected, fresh parse
    assert len(g3.strand) == len(g1.strand) + 1
    g4 = parse_native(gtf)          # the reparse rewrote the sidecar
    assert g4.perm is not None and len(g4.strand) == len(g3.strand)
    # escape hatch
    monkeypatch.setenv("STRAWB_GTF_CACHE", "0")
    g5 = parse_native(gtf)
    assert g5.perm is None
