"""Array-native locus quantification (no per-read Python objects).

Builds the exact LocusContext state (exon bins, counts, iso->bin map) from
the native clusterizer's flat RLE arrays using the C++ compat kernel plus
numpy grouping, then reuses LocusContext's weight/EM/finalize machinery.
Byte-identical to the oracle path (goldens cover it); used on the hot
quantification pass when the fragment-context export is off (that path
needs the per-fragment objects).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..config import Config
from ..core.features import Contig, is_compatible_feat, S_MATCH
from ..core.insert_size import InsertSize
from .bins import Coords, ExonBin, disjoint_exon_segs
from .locus import Isoform, LocusContext


def build_fast_locus(cfg: Config, read_len: int,
                     insert_dist: Optional[InsertSize],
                     hit_flat, hit_masses: np.ndarray,
                     transcripts: List[Contig],
                     long_read_sample: bool = False) -> LocusContext:
    """LocusContext equivalent from flat hit arrays.

    hit_flat: (off, code, left, len) for the locus's valid uniq contigs,
    hit_masses: per-contig collapse masses aligned with hit_flat."""
    from ..core.fastcluster import native_compat

    est = LocusContext.__new__(LocusContext)
    est.cfg = cfg
    est.read_len = read_len
    est.insert_dist = insert_dist
    est._hit_flat = hit_flat

    exons = []
    for t in transcripts:
        for f in t.feats:
            if f[0] == S_MATCH:
                exons.append(f)
    exons = sorted(set(exons), key=lambda f: (f[1], f[2]))
    est.exon_segs = disjoint_exon_segs(exons)

    est.transcripts = []
    for t in transcripts:
        iso_segs = [s for s in est.exon_segs if is_compatible_feat(t, s)]
        iso = Isoform(contig=t, length=t.exonic_length(),
                      gene_str=t.parent_id, isoform_str=t.trans_id,
                      ref_gene_id=t.ref_gene_id,
                      ref_gene_name=t.ref_gene_name, exon_segs=iso_segs)
        iso.id = len(est.transcripts)
        est.transcripts.append(iso)

    est.exon_bins = []
    est._bin_index = {}
    est.iso_2_bins_map = {}

    nh = len(hit_flat[0]) - 1
    ni = len(est.transcripts)
    ns = len(est.exon_segs)
    if nh and ni and ns:
        compat, _fraglen, seghit, fragkey = native_compat(
            None, [t.contig for t in est.transcripts], est.exon_segs,
            hit_flat=hit_flat, want_fragkey=True)
        keep = compat.any(axis=1) & seghit.any(axis=1)
        idx = np.nonzero(keep)[0]
        if len(idx):
            sh = seghit[idx]
            # group identical seg-overlap rows into bins, first-encounter
            # order (the oracle creates bins in hit order); 1-D unique over
            # a void view is much faster than axis=0 row sorting
            shc = np.ascontiguousarray(sh)
            rowview = shc.view(np.dtype((np.void, shc.shape[1])))[:, 0]
            _vals, first_idx, inverse = np.unique(
                rowview, return_index=True, return_inverse=True)
            uniq_rows = shc[first_idx]
            order = np.argsort(first_idx, kind="stable")
            rank = np.empty(len(order), np.int64)
            rank[order] = np.arange(len(order))
            bin_id = rank[inverse]                 # per kept hit
            nbins = len(order)
            seg_coords = [(f[1], f[1] + f[2] - 1) for f in est.exon_segs]
            # per-bin counts: fragment-set dedupe by (left,len)-seq key,
            # first occurrence's mass wins (ExonBin._frags std::set)
            keys = fragkey[idx]
            combo = bin_id.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) \
                + keys  # injective enough: 64-bit mix of (bin, fragkey)
            _u, ufirst = np.unique(combo, return_index=True)
            counts = np.zeros(nbins, np.float64)
            np.add.at(counts, bin_id[ufirst], hit_masses[idx][ufirst])
            # per-(bin,iso) presence
            M = np.zeros((nbins, ni), bool)
            hrow, icol = np.nonzero(compat[idx])
            M[bin_id[hrow], icol] = True

            for b in range(nbins):
                coords: Coords = tuple(
                    seg_coords[j]
                    for j in np.nonzero(uniq_rows[order[b]])[0])
                eb = ExonBin(coords, frag_masses={0: float(counts[b])})
                eb.id = b
                est.exon_bins.append(eb)
                est._bin_index[coords] = b
            for j in range(ni):
                bins = np.nonzero(M[:, j])[0]
                if len(bins):
                    est.iso_2_bins_map[j] = [int(x) for x in bins]

    if long_read_sample:
        est._set_bin_weight_without_frag_dist()
    else:
        est._set_theory_bin_weight()
    return est
