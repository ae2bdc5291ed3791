"""Vectorized theoretical bin weights (bit-exact fast path).

Replaces the per-fragment-length Python loop of
LocusContext._set_theory_bin_weight (host oracle; ref: src/estimate.cpp:
201-234 + isoform.h:419-516) with numpy closed forms over the whole
fragment-length range, while preserving bit-identical float64 results:

  * the insert-size pdf is precomputed once into a dense table using
    math.exp (glibc libm — the same exp the reference's normal_pdf calls),
  * effective lengths are pure integer arithmetic (vectorized exactly),
  * per-(iso,bin) term sums run in strict left-to-right order through the
    native strawb_seqsum_batch helper (numpy's pairwise reduction would
    round differently).
"""
from __future__ import annotations

import ctypes as c
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.insert_size import InsertSize

_INV_SQRT_2PI = 0.3989422804014327


def pdf_table(dist: InsertSize, max_len: int) -> np.ndarray:
    """emp_dist_pdf(i) for i in [0, max_len] (read.cpp:274-297)."""
    tbl = np.zeros(max_len + 1, dtype=np.float64)
    mean, sd = dist.mean, dist.sd
    for i in range(max_len + 1):
        ret = 0.0
        if dist.use_emp and dist.start_offset <= i <= dist.end_offset:
            ret = dist.emp_dist[i - dist.start_offset] / dist.total_reads
        if ret == 0.0:
            a = (i - mean) / sd
            p = _INV_SQRT_2PI / sd * math.exp(-0.5 * a * a)
            ret = p if p > 0 else 0.0
        tbl[i] = ret
    return tbl


def _no_gap_ef_vec(l_left: int, l_right: int, l_int: int,
                   fl: np.ndarray) -> np.ndarray:
    mid = fl - l_int - 1
    v = np.minimum(l_left, mid) + np.minimum(l_right, mid) - mid
    bad = (fl < l_int + 2) | (fl > l_left + l_right + l_int)
    return np.where(bad, 0, v)


def _gap_ef_vec(l_left: int, l_right: int, l_int: int, rl: int,
                gap: np.ndarray) -> np.ndarray:
    start = np.maximum(rl, l_left + l_int - gap - 1)
    end = np.minimum(l_left, l_left + l_right + l_int - gap - rl)
    v = np.maximum(0, end - start)
    tot = 2 * rl + gap
    bad = (tot < l_int + 2) | (tot > l_left + l_right + l_int)
    return np.where(bad, 0, v)


def effective_len_vec(seg_lens: Sequence[int], implicit_idx: Sequence[int],
                      fl: np.ndarray, rl: int) -> np.ndarray:
    """Vectorized ExonBin::effective_len over a fragment-length vector."""
    n = len(seg_lens)
    gap = fl - 2 * rl
    if n == 1:
        return seg_lens[0] - fl + 1
    if n == 2:
        return _no_gap_ef_vec(seg_lens[0], seg_lens[1], 0, fl)
    if n == 3:
        if len(implicit_idx) == 1:
            return _gap_ef_vec(seg_lens[0], seg_lens[2], seg_lens[1], rl, gap)
        return (_no_gap_ef_vec(seg_lens[0], seg_lens[2], seg_lens[1], fl)
                - _gap_ef_vec(seg_lens[0], seg_lens[2], seg_lens[1], rl, gap))
    if n == 4:
        hit14 = _gap_ef_vec(seg_lens[0], seg_lens[3],
                            seg_lens[2] + seg_lens[1], rl, gap)
        hit24 = _gap_ef_vec(seg_lens[3], seg_lens[1], seg_lens[2], rl, gap)
        hit124 = _gap_ef_vec(seg_lens[0] + seg_lens[1], seg_lens[3],
                             seg_lens[2], rl, gap)
        hit13 = _gap_ef_vec(seg_lens[0], seg_lens[2], seg_lens[1], rl, gap)
        hit134 = _gap_ef_vec(seg_lens[0], seg_lens[2] + seg_lens[3],
                             seg_lens[1], rl, gap)
        if len(implicit_idx) == 0:
            total = _no_gap_ef_vec(seg_lens[0], seg_lens[3],
                                   seg_lens[1] + seg_lens[2], fl)
            return total - (hit124 - hit14 - hit24) \
                - (hit134 - hit14 - hit13) - hit14
        if len(implicit_idx) == 2:
            return hit14
        if implicit_idx[0] == 1:
            return hit134 - hit14 - hit13
        return hit124 - hit14 - hit24

    # n >= 5: vectorize the bitmask enumeration over (fl, i). A left-end
    # position i is counted when every inner segment j is end-covered
    # exactly per the implicit mask; bp_last must lie in [1, last_seg]
    # (the reference's int/uint comparison sends negatives to `continue`,
    # isoform.h:485).
    seg = np.asarray(seg_lens, dtype=np.int64)
    ni = n - 2
    inner_sum = int(seg[1:n - 1].sum())
    i = np.arange(1, seg_lens[0] + 1, dtype=np.int64)          # (I,)
    flv = np.asarray(fl, dtype=np.int64)[:, None]              # (F,1)
    bp_last = flv - i[None, :] - inner_sum                     # (F,I)
    valid = (bp_last >= 1) & (bp_last <= seg[-1])
    # suffix_sum[j] = sum seg[j+1..ni]; right end covers j iff
    # rl - bp_last > suffix_sum[j]
    # prefix_sum[j] = sum seg[1..j-1]; left end covers j iff
    # rl - i > prefix_sum[j]
    inner = np.arange(1, ni + 1)
    suffix = np.array([seg[j + 1:ni + 1].sum() for j in inner])
    prefix = np.array([seg[1:j].sum() for j in inner])
    want = np.ones(ni, dtype=bool)
    for idx in implicit_idx:
        want[idx - 1] = False
    rb = (rl - bp_last)[:, :, None] > suffix[None, None, :]    # (F,I,J)
    lb = (rl - i)[None, :, None] > prefix[None, None, :]
    covered = rb | lb
    okj = covered == want[None, None, :]
    ok = valid & okj.all(axis=2)
    return ok.sum(axis=1).astype(np.int64)


_seqsum_batch = None


def seqsum_batch(terms: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Strict sequential segment sums (native); Python fallback."""
    global _seqsum_batch
    if _seqsum_batch is None:
        try:
            from ..io.native import get_lib
            lib = get_lib()
            lib.strawb_seqsum_batch.restype = None
            lib.strawb_seqsum_batch.argtypes = [
                c.POINTER(c.c_double), c.POINTER(c.c_int64), c.c_int64,
                c.POINTER(c.c_double)]
            _seqsum_batch = lib.strawb_seqsum_batch
        except Exception:
            _seqsum_batch = False
    nseg = len(offsets) - 1
    out = np.zeros(nseg, dtype=np.float64)
    if _seqsum_batch:
        terms = np.ascontiguousarray(terms, dtype=np.float64)
        offsets = np.ascontiguousarray(offsets, dtype=np.int64)
        _seqsum_batch(terms.ctypes.data_as(c.POINTER(c.c_double)),
                      offsets.ctypes.data_as(c.POINTER(c.c_int64)),
                      nseg, out.ctypes.data_as(c.POINTER(c.c_double)))
    else:
        for k in range(nseg):
            s = 0.0
            for v in terms[offsets[k]:offsets[k + 1]]:
                s += v
            out[k] = s
    return out
