"""End-to-end parity: the pure-Python oracle pipeline (native_cluster=False
— oracle clustering, coverage, splice graph, flow network, EM) must produce
byte-identical GTF output to the default native path. This keeps BOTH
implementations honest now that the native path handles every default run
(the oracle otherwise only executes on native-lib load failure)."""
import io
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strawberry_tpu.config import Config
from strawberry_tpu.pipeline import run_driver
from strawberry_tpu.sim import make_dataset


def run_pipeline(bam, gtf, native: bool, **cfg_kw):
    cfg = Config(ref_gtf_filename=gtf, utilize_ref_models=bool(gtf),
                 native_cluster=native, **cfg_kw)
    out = io.StringIO()
    run_driver(bam, cfg, out, io.StringIO())
    return out.getvalue()


@pytest.mark.parametrize("mode", ["guided", "abinitio", "quantonly"])
def test_native_vs_oracle_end_to_end(tmp_path, mode):
    bam, gtf, _ = make_dataset(str(tmp_path), seed=321, n_genes_hint=8,
                               n_frags=6000, max_isoforms=3, n_chroms=2,
                               chrom_len=400_000)
    kw = {}
    if mode == "abinitio":
        gtf_arg = ""
    elif mode == "quantonly":
        gtf_arg = gtf
        kw = {"no_assembly": True, "enforce_ref_models": True,
              "min_isoform_frac": 0.0}
    else:
        gtf_arg = gtf
    a = run_pipeline(bam, gtf_arg, native=True, **kw)
    b = run_pipeline(bam, gtf_arg, native=False, **kw)
    assert a == b


def test_native_vs_oracle_single_end(tmp_path):
    bam, gtf, _ = make_dataset(str(tmp_path), seed=654, n_genes_hint=6,
                               n_frags=4000, paired=False)
    a = run_pipeline(bam, gtf, native=True)
    b = run_pipeline(bam, gtf, native=False)
    assert a == b
