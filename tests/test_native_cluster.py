"""Native clusterizer vs the Python oracle (core.cluster.ClusterFactory):
identical clusters, contigs, masses, bounds, and refine segments."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strawberry_tpu.config import Config
from strawberry_tpu.core.cluster import (ClusterFactory, HitCluster,
                                         finalize_cluster)
from strawberry_tpu.io.bamreader import load_bam
from strawberry_tpu.io.gff import GffReader, load_ref_mrnas
from strawberry_tpu.sim import make_dataset

try:
    from strawberry_tpu.core.fastcluster import run_native_clustering
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native lib unavailable")


def oracle_clusters(table, cfg, refs, mode):
    factory = ClusterFactory(table, cfg, refs)
    out = []
    while True:
        cluster = HitCluster(cfg)
        rc = (factory.next_cluster_refguide(cluster) if mode == "refguide"
              else factory.next_cluster_ref_demand(cluster))
        if rc == -1:
            break
        if cluster.ref_id == -1:
            continue
        finalize_cluster(cluster, True)
        # refine exactly where the pipeline would (denovo pass-1 path)
        if (mode == "refguide"
                and not (cluster.ref_mrnas and cfg.utilize_ref_models)
                and len(cluster.uniq_hits) >= cfg.min_read_for_assemb):
            cluster.refine_cluster()
        out.append(cluster)
    return out


def compare(table, cfg, refs, mode):
    oracle = oracle_clusters(table, cfg, refs, mode)
    native = run_native_clustering(table, cfg, refs, mode)
    assert len(native) == len(oracle), (mode, len(native), len(oracle))
    for k, (o, nc) in enumerate(zip(oracle, native)):
        assert nc.leftmost == o.leftmost, k
        assert nc.rightmost == o.rightmost, k
        assert nc.ref_id == o.ref_id, k
        assert abs(nc.weighted_mass - o.weighted_mass) < 1e-12, k
        assert [id(r) for r in nc.ref_mrnas] == \
            [id(r) for r in o.ref_mrnas], k
        o_contigs = [o.pair_to_contig(ph) for ph in o.uniq_hits]
        assert len(nc.uniq_hits) == len(o_contigs), k
        for a, b in zip(nc.uniq_hits, o_contigs):
            if b is None:
                assert a is None
                continue
            assert a is not None
            assert a.feats == b.feats, k
            assert a.strand == b.strand, k
            assert a.single_orit == b.single_orit, k
            assert abs(a.mass - b.mass) < 1e-12, k
        o_segs = [(s.left, s.right, s.left_read_idx, s.right_read_idx,
                   s.strand) for s in o.segs]
        n_segs = [(s.left, s.right, s.left_read_idx, s.right_read_idx,
                   s.strand) for s in nc.segs]
        assert n_segs == o_segs, k


@pytest.mark.parametrize("seed,kw", [
    (21, dict(n_frags=4000, max_isoforms=2)),
    (52, dict(n_frags=5000, max_isoforms=3, n_chroms=2)),
    (63, dict(n_frags=3000, with_xs=False)),
    (44, dict(n_frags=2500, paired=False)),
])
def test_native_cluster_matches_oracle(tmp_path, seed, kw):
    bam, gtf, txs = make_dataset(str(tmp_path), seed=seed, **kw)
    table = load_bam(bam)
    name2id = {n: i for i, n in enumerate(table.ref_names)}
    reader = GffReader(gtf)
    reader.read_all()
    refs = load_ref_mrnas(reader, name2id)

    # ab initio pass 1 (no refs)
    compare(table, Config(), [], "refguide")
    # ref-guided pass 1
    compare(table, Config(utilize_ref_models=True), refs, "refguide")
    # quant-only pass (ref demand, enforce)
    compare(table, Config(utilize_ref_models=True).apply_no_assembly(),
            refs, "refdemand")
    # plain ref-demand (pass 2 with annotations as models)
    compare(table, Config(utilize_ref_models=True), refs, "refdemand")
