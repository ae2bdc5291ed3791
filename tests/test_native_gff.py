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
