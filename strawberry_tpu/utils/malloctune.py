"""glibc malloc tuning for numpy-heavy host phases.

numpy routes large temporaries through malloc; with glibc defaults every
allocation above ~128KB becomes its own mmap/munmap pair, and under
virtualized hosts (firecracker) the resulting page-fault storm can spend
multiples of the actual compute time in the kernel (observed: 5.6s sys ->
0.3s on the 1M-read workload). Raising the mmap/trim thresholds keeps the
arena heap warm so large buffers are reused instead of re-faulted.

mallopt(3) applies at runtime, so this works without re-exec or env vars.
"""
from __future__ import annotations

import ctypes
import sys

M_TRIM_THRESHOLD = -1
M_MMAP_THRESHOLD = -3

_done = False


def tune(threshold: int = 1 << 30) -> bool:
    """Raise glibc's dynamic mmap/trim thresholds. Safe no-op on failure
    or non-glibc platforms. Returns True if applied."""
    global _done
    if _done:
        return True
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        mallopt = libc.mallopt
        mallopt.restype = ctypes.c_int
        mallopt.argtypes = [ctypes.c_int, ctypes.c_int]
        ok = mallopt(M_MMAP_THRESHOLD, threshold) == 1
        ok = mallopt(M_TRIM_THRESHOLD, threshold) == 1 and ok
        _done = ok
        return ok
    except Exception:
        return False
