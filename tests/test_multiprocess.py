"""-p multiprocess pipeline vs single-process: byte-identical GTF."""
import io
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strawberry_tpu.sim import make_dataset


@pytest.mark.parametrize("mode", [[], ["-r"]])
def test_multiprocess_matches_single(tmp_path, mode):
    bam, gtf, txs = make_dataset(str(tmp_path), seed=52, n_frags=5000,
                                 max_isoforms=3, n_chroms=4)
    outs = {}
    for tag, extra in [("single", []), ("mp", ["-p", "4"])]:
        out = str(tmp_path / f"{tag}.gtf")
        env = dict(os.environ, STRAWB_PLATFORM="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "strawberry_tpu.cli", "-g", gtf, *mode,
             *extra, "-o", out, "-T", str(tmp_path / f"{tag}.log"), bam],
            capture_output=True, text=True, timeout=600, cwd="/root/repo",
            env=env)
        assert r.returncode == 0, (tag, r.stderr[-2000:])
        outs[tag] = [l for l in open(out) if not l.startswith("#")]
    assert outs["mp"] == outs["single"]
    assert outs["single"]
