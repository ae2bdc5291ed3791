"""Single-host multiprocess pipeline (-p N): the TPU-native successor of
the reference's per-locus thread pool (SURVEY §2 component 23,
src/alignments.cpp:19-28,1684-1727).

The genome splits into contiguous chromosome-range shards (same exact
split as parallel/distributed.py); shard pipelines run in forked worker
processes, global statistics reduce between the passes, and cluster
numbering is renumbered post-hoc with an exclusive scan so the merged GTF
is byte-identical to the single-process run (tests assert this).
"""
from __future__ import annotations

import io
import multiprocessing as mp
import re
from typing import Dict, List, Optional, TextIO, Tuple

import numpy as np

from ..config import Config
from ..io.bamreader import HitTable
from ..io.gtfwriter import print2gtf
from ..pipeline import Sample, _NullLog
from ..quant.locus import Isoform, c_str
from .distributed import shard_table, split_by_chrom

_WORK = {}
_PARENT = {}  # set pre-fork; children inherit it copy-on-write (passing the
              # HitTable through initargs would pickle ~100MB per worker)


def _init_worker():
    # forked workers must not share the parent's (possibly initialized)
    # accelerator backend; keep their kernels on host
    import os
    os.environ["STRAWB_FORCE_HOST"] = "1"
    _WORK.update(_PARENT)


def _make_sample(k: int) -> Sample:
    table: HitTable = _WORK["table"]
    cfg: Config = _WORK["cfg"]
    sub = shard_table(table, _WORK["shards"][k])
    s = Sample(sub, cfg, _WORK["bam_path"])
    s.long_read_sample = table.is_long_read_sample(cfg.long_read_len) \
        or cfg.long_read_sample
    refs = _WORK.get("refs")
    if refs is not None:
        # annotation parsed ONCE in the parent pre-fork (copy-on-write);
        # each worker keeps its shard's chromosomes
        ids = set(_WORK["shards"][k])
        s.factory.set_ref_mrnas([r for r in refs if r.ref_id in ids])
    elif cfg.ref_gtf_filename:
        s.load_ref_gtf(cfg.ref_gtf_filename)
        ids = set(_WORK["shards"][k])
        s.factory.set_ref_mrnas(
            [r for r in s.factory.ref_mrnas if r.ref_id in ids])
    return s


def _pass1(k: int):
    cfg: Config = _WORK["cfg"]
    s = _make_sample(k)
    log = io.StringIO()
    if cfg.no_assembly:
        if s.factory.ref_mrnas:
            s.pre_process(log)
    else:
        s.assemble_sample(log)
    return (k, s.assembly, s.frag_dist, s.total_mapped_reads,
            s.num_cluster)


def _pass2(args):
    k, assembly, frag_dist, total_mapped = args
    cfg: Config = _WORK["cfg"]
    s = _make_sample(k)
    s.assembly = assembly
    s.frag_dist = frag_dist
    s.total_mapped_reads = total_mapped
    if cfg.no_assembly and not s.factory.ref_mrnas:
        return (k, [])
    if not cfg.no_assembly and not assembly:
        return (k, [])
    s.select_insert_size()
    iso = s.proc_sample(io.StringIO(), _NullLog())
    return (k, iso)


def run_multiprocess(table: HitTable, cfg: Config, bam_path: str,
                     out: TextIO, log: Optional[TextIO] = None,
                     n_procs: int = 2) -> List[Isoform]:
    shards = split_by_chrom(table, n_procs)
    ctx = mp.get_context("fork")
    refs = None
    if cfg.ref_gtf_filename:
        # one parent-side parse instead of one per worker per pass
        tmp = Sample(table, cfg, bam_path)
        tmp.load_ref_gtf(cfg.ref_gtf_filename)
        refs = tmp.factory.ref_mrnas
    _PARENT.update(table=table, cfg=cfg, bam_path=bam_path, shards=shards,
                   refs=refs)
    with ctx.Pool(n_procs, initializer=_init_worker) as pool:
        p1 = sorted(pool.map(_pass1, range(len(shards))))

        # exclusive scan of per-shard cluster counts -> renumber names so
        # they match the sequential single-process numbering
        bases = np.zeros(len(shards), np.int64)
        for k in range(1, len(shards)):
            bases[k] = bases[k - 1] + p1[k - 1][4]
        for k, assembly, _fd, _tm, _nc in p1:
            b = int(bases[k])
            if b:
                for c in assembly:
                    c.parent_id = _renumber_parent(c.parent_id, b)
                    c.trans_id = _renumber_trans(c.trans_id, b)

        # one int32 array, unsorted: InsertSize is order-free (integer
        # sums + bincount), and a boxed 5M-int Python list would pickle
        # ~40x larger into each pass-2 worker
        total_mapped = 0
        fds = []
        for _k, _a, fd, tm, _nc in p1:
            fds.append(np.asarray(fd, np.int32))
            total_mapped += tm
        global_frag = np.concatenate(fds) if fds else np.zeros(0, np.int32)

        p2 = sorted(pool.map(
            _pass2, [(k, a, global_frag, total_mapped)
                     for k, a, _fd, _tm, _nc in p1]))

    all_isoforms: List[Isoform] = []
    for _k, iso in p2:
        all_isoforms.extend(iso)

    total_fpkm = sum(i.fpkm for i in all_isoforms)
    for i in all_isoforms:
        i.tpm = 1e6 * i.fpkm / total_fpkm if total_fpkm != 0 else float("nan")
        i.tpm_s = c_str(i.tpm)
    for i in all_isoforms:
        ref_name = table.ref_real_names[i.contig.ref_id] \
            if i.contig.ref_id >= 0 else "?"
        print2gtf(out, i.contig, ref_name, i.fpkm_s, i.frac_s, i.tpm_s,
                  i.gene_str, i.isoform_str, i.ref_gene_id, i.ref_gene_name)
    return all_isoforms


def _renumber_parent(pid: str, base: int) -> str:
    """sample.N -> sample.(N+base)"""
    head, _, num = pid.rpartition(".")
    if head and num.isdigit():
        return f"{head}.{int(num) + base}"
    return pid


def _renumber_trans(tid: str, base: int) -> str:
    """sample.N.M -> sample.(N+base).M"""
    parts = tid.rsplit(".", 2)
    if len(parts) == 3 and parts[1].isdigit() and parts[2].isdigit():
        return f"{parts[0]}.{int(parts[1]) + base}.{parts[2]}"
    return tid
