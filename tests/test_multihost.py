"""Real multi-host execution: N separate processes connected through
jax.distributed over a local coordinator, each running exactly its genome
shard (jax.process_index()), with the frag-length histogram / total-reads
psum'd over the global mesh and the isoform records gathered to host 0 —
whose GTF must be byte-identical to the single-process run.

(SURVEY §5 "Distributed communication backend"; VERDICT r1 item 4.)
"""
import os
import socket
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strawberry_tpu.sim import make_dataset

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_single(tmp_path, bam, gtf_args):
    out = str(tmp_path / "single.gtf")
    env = dict(os.environ, STRAWB_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    env.pop("STRAWB_DIST_NPROCS", None)
    r = subprocess.run(
        [sys.executable, "-m", "strawberry_tpu.cli", *gtf_args,
         "-o", out, "-T", str(tmp_path / "single.log"), bam],
        capture_output=True, text=True, timeout=600, cwd=ROOT, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return [l for l in open(out) if not l.startswith("#")]


def _run_dist(tmp_path, bam, gtf_args, nprocs):
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(nprocs):
        out = str(tmp_path / f"dist{pid}.gtf")
        env = dict(os.environ,
                   STRAWB_PLATFORM="cpu", JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=2",
                   STRAWB_DIST_COORD=coord,
                   STRAWB_DIST_NPROCS=str(nprocs),
                   STRAWB_DIST_PROCID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "strawberry_tpu.cli", *gtf_args,
             "-o", out, "-T", str(tmp_path / f"dist{pid}.log"), bam],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=ROOT, env=env))
    for pid, p in enumerate(procs):
        try:
            _, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (pid, err[-2000:])
    return [l for l in open(tmp_path / "dist0.gtf")
            if not l.startswith("#")]


@pytest.mark.parametrize("nprocs,mode", [
    (2, "full"), (2, "quant"), (3, "full"),
])
def test_multihost_matches_single_process(tmp_path, nprocs, mode):
    bam, gtf, _ = make_dataset(str(tmp_path), seed=61, n_frags=4000,
                               n_chroms=3, chrom_len=400_000)
    gtf_args = ["-g", gtf] + (["-r"] if mode == "quant" else [])
    single = _run_single(tmp_path, bam, gtf_args)
    dist = _run_dist(tmp_path, bam, gtf_args, nprocs)
    assert single, "single-process produced no transcripts"
    assert dist == single
    # ranged ingest: each process must have inflated only ~1/N of the
    # compressed stream (VERDICT r2 item 5; anchor src/read.cpp:428-478)
    import re
    shares = []
    for pid in range(nprocs):
        txt = open(tmp_path / f"dist{pid}.log").read()
        m = re.search(r"ranged ingest: inflated (\d+) of (\d+)", txt)
        assert m, f"no ranged-ingest record in dist{pid}.log"
        shares.append(int(m.group(1)) / int(m.group(2)))
    assert sum(shares) < 1.5, shares       # overlap blocks only
    for sh in shares:
        assert sh < 1.6 / nprocs + 0.1, shares


def test_multihost_ab_initio(tmp_path):
    bam, _gtf, _ = make_dataset(str(tmp_path), seed=62, n_frags=3000,
                                n_chroms=2, chrom_len=400_000)
    single = _run_single(tmp_path, bam, [])
    dist = _run_dist(tmp_path, bam, [], 2)
    assert single
    assert dist == single
