"""Sharded (locus-data-parallel) pipeline over an 8-virtual-device CPU
mesh vs the single-shard pipeline: byte-identical GTF."""
import io
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strawberry_tpu.config import Config
from strawberry_tpu.io.bamreader import load_bam
from strawberry_tpu.parallel.distributed import run_sharded, split_by_chrom
from strawberry_tpu.parallel.mesh import make_mesh
from strawberry_tpu.pipeline import run_driver
from strawberry_tpu.sim import make_dataset


@pytest.mark.parametrize("mode", ["abinitio", "refguided", "quantonly"])
def test_sharded_matches_single(tmp_path, mode):
    bam, gtf, txs = make_dataset(str(tmp_path), seed=52, n_frags=5000,
                                 max_isoforms=3, n_chroms=4)
    cfg = Config()
    if mode in ("refguided", "quantonly"):
        cfg = cfg.replace(ref_gtf_filename=gtf, utilize_ref_models=True)
    if mode == "quantonly":
        cfg = cfg.apply_no_assembly()

    single = io.StringIO()
    run_driver(bam, cfg, single)

    table = load_bam(bam, cfg)
    mesh = make_mesh(mdl=1)
    sharded = io.StringIO()
    run_sharded(table, cfg, bam, sharded, n_shards=4, mesh=mesh)

    assert sharded.getvalue() == single.getvalue()
    assert sharded.getvalue().count("\ttranscript\t") > 0


def test_split_by_chrom_contiguous(tmp_path):
    bam, gtf, txs = make_dataset(str(tmp_path), seed=11, n_frags=1000,
                                 n_chroms=5)
    table = load_bam(bam)
    shards = split_by_chrom(table, 3)
    flat = [r for s in shards for r in s]
    assert flat == sorted(flat)
    assert len(flat) == len(table.ref_names)
