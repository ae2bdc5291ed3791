"""-v stderr parity: the run-level diagnostic lines must match the
reference binary's cerr output (Strawberry.cpp:305-356, read.cpp:248-253)
textually — including C++ default double formatting."""
import os
import re
import subprocess
import sys

import pytest

sys.path.insert(0, ".")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.path.join(ROOT, ".refbuild", "strawberry")

RUN_LEVEL = (
    "Inspecting sample......",
    "read len mode: ",
    "Total number of mapped reads is: ",
    "Calculated averaged fragment length is: ",
    "Calculated fragment length sd is: ",
    "Min fragment length is: ",
    "Max fragment length is: ",
    "Using empirical insert size distribution ",
    "Using user specified insert size mean: ",
)


def _extract(stderr: str):
    out = []
    for line in stderr.splitlines():
        if any(line.startswith(p) for p in RUN_LEVEL):
            out.append(line)
    return out


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not built")
def test_verbose_run_level_lines_match_reference(tmp_path):
    from strawberry_tpu.sim import make_dataset
    d = str(tmp_path / "ds")
    make_dataset(d, seed=17, n_frags=6000, n_chroms=2, max_isoforms=3)
    bam = f"{d}/sample_01.sorted.bam"
    gtf = f"{d}/annotation.gtf"

    ours = subprocess.run(
        [sys.executable, "-m", "strawberry_tpu.cli", "-v", "-g", gtf,
         "-o", str(tmp_path / "ours.gtf"), "-T", str(tmp_path / "ours.log"),
         bam],
        capture_output=True, text=True, cwd=ROOT, timeout=300)
    assert ours.returncode == 0, ours.stderr[-2000:]
    ref = subprocess.run(
        [REF, "-v", "-g", gtf, "-o", str(tmp_path / "ref.gtf"),
         "-T", str(tmp_path / "ref.log"), bam],
        capture_output=True, text=True, timeout=300)
    assert ref.returncode == 0, ref.stderr[-2000:]
    assert _extract(ours.stderr) == _extract(ref.stderr)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not built")
def test_verbose_run_level_lines_match_reference_mp(tmp_path):
    """-p N keeps run-level -v parity (the parent prints them from the
    reduced global statistics; per-read lines stay single-process scope
    since the reference's own -p interleaves threads' cerr output
    nondeterministically)."""
    from strawberry_tpu.sim import make_dataset
    d = str(tmp_path / "ds")
    make_dataset(d, seed=18, n_frags=5000, n_chroms=3, max_isoforms=3)
    bam = f"{d}/sample_01.sorted.bam"
    gtf = f"{d}/annotation.gtf"
    ours = subprocess.run(
        [sys.executable, "-m", "strawberry_tpu.cli", "-v", "-p", "2",
         "-g", gtf, "-o", str(tmp_path / "ours.gtf"),
         "-T", str(tmp_path / "ours.log"), bam],
        capture_output=True, text=True, cwd=ROOT, timeout=300)
    assert ours.returncode == 0, ours.stderr[-2000:]
    ref = subprocess.run(
        [REF, "-v", "-p", "2", "-g", gtf, "-o", str(tmp_path / "ref.gtf"),
         "-T", str(tmp_path / "ref.log"), bam],
        capture_output=True, text=True, timeout=300)
    assert ref.returncode == 0, ref.stderr[-2000:]
    assert _extract(ours.stderr) == _extract(ref.stderr)


_PER_READ = re.compile(
    r"^(read \S+ has unmapped pair|Ignoring read \S+ has multiple hits)$")


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not built")
@pytest.mark.parametrize("mode", [[], ["-r"], None])
def test_verbose_per_read_lines_match_reference(tmp_path, mode):
    """The per-read cerr diagnostics (read.cpp:611-614,679-684) must match
    the reference's EXACT line sequence — including the reference's
    re-decode multiplicity (inspect_read_len window, then once per decode
    per pass, where cluster-boundary rewinds re-decode a hit). Dataset
    carries both event classes: unmapped mates and NH=2 multimappers
    rejected under the default unique-hits mode. mode None = ab initio
    (no -g)."""
    from strawberry_tpu.sim import make_dataset
    d = str(tmp_path / "ds")
    make_dataset(d, seed=31, n_frags=3000, n_chroms=2, max_isoforms=3,
                 multimap_frac=0.05, unmapped_mate_frac=0.05)
    bam = f"{d}/sample_01.sorted.bam"
    gtf = f"{d}/annotation.gtf"
    args = [] if mode is None else ["-g", gtf, *mode]

    def per_read(err):
        return [l for l in err.splitlines() if _PER_READ.match(l)]

    ours = subprocess.run(
        [sys.executable, "-m", "strawberry_tpu.cli", "-v", *args,
         "-o", str(tmp_path / "ours.gtf"), "-T", str(tmp_path / "ours.log"),
         bam],
        capture_output=True, text=True, cwd=ROOT, timeout=300)
    assert ours.returncode == 0, ours.stderr[-2000:]
    ref = subprocess.run(
        [REF, "-v", *args, "-o", str(tmp_path / "ref.gtf"),
         "-T", str(tmp_path / "ref.log"), bam],
        capture_output=True, text=True, timeout=300)
    assert ref.returncode == 0, ref.stderr[-2000:]
    a, b = per_read(ours.stderr), per_read(ref.stderr)
    assert a, "dataset produced no per-read diagnostics"
    assert a == b
