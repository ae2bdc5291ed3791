#!/usr/bin/env python
"""The 50x ceiling, measured (VERDICT r3 item 9).

Runs the realistic scoreboard workload once with profiling enabled,
collects wall, per-phase wall, native thread-CPU by hot path, and the
process CPU totals, then writes benchmarks/budget_50x.json recording the
budget arithmetic: on an H-core host the wall floor is
(total_cpu_seconds / H); the >=50x target (~4.15M reads/s, BASELINE.md)
implies a wall of reads / 4.15e6 seconds. The JSON states how many host
cores (or how much work reduction) the target requires AT THE CURRENT
per-read cost, plus the chip-offload bound from the measured tunnel
characteristics (h2d GB/s x bytes — device_characterization.json).
"""
import json
import os
import resource
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASELINE = 83000.0
TARGETS = {"20x": 20 * BASELINE, "50x": 50 * BASELINE}


class Sink:
    is_null = True  # match bench.py's scoreboard sink

    def write(self, *_a):
        pass


def main():
    from strawberry_tpu.config import Config
    from strawberry_tpu.pipeline import run_driver
    from strawberry_tpu.utils.profiling import GLOBAL as PROF, native_counters

    bam = "/tmp/strawberry_bench_realistic/sample_01.sorted.bam"
    gtf = "/tmp/strawberry_bench_realistic/annotation.gtf"
    if not os.path.exists(bam):
        from strawberry_tpu.sim import make_dataset
        make_dataset("/tmp/strawberry_bench_realistic", seed=303,
                     n_frags=5_000_000, n_chroms=24, chrom_len=16_000_000,
                     max_isoforms=20, exon_range=(2, 9),
                     abundance="lognormal", protocol="fr",
                     indel_rate=0.02, clip_rate=0.03)
    cfg = Config(ref_gtf_filename=gtf, utilize_ref_models=True,
                 fr_strand=True, verbose=True)
    # warm-up: the block-storage pool and the .sbidx annotation sidecar
    # make repeat runs the steady state (bench.py measures the same way);
    # the cold run's extra page-fault/parse cost is one-time
    run_driver(bam, cfg.replace(verbose=False), Sink(), Sink())
    PROF.phases.clear()
    native_counters(reset=True)
    ru0 = resource.getrusage(resource.RUSAGE_SELF)
    t0 = time.perf_counter()
    sample = run_driver(bam, cfg, Sink(), Sink())
    wall = time.perf_counter() - t0
    ru1 = resource.getrusage(resource.RUSAGE_SELF)
    n_reads = len(sample.table)
    cpu_user = ru1.ru_utime - ru0.ru_utime
    cpu_sys = ru1.ru_stime - ru0.ru_stime
    total_cpu = cpu_user + cpu_sys
    ncpu = os.cpu_count() or 1

    phases = {name: round(st.seconds, 3)
              for name, st in PROF.phases.items() if st.seconds >= 0.01}
    # per-phase CPU of the thread that ran the phase (time.thread_time):
    # the Python/numpy work plus any synchronous native calls issued from
    # that thread; pool-worker CPU is in native_thread_cpu_s instead
    phase_cpu = {name: round(st.cpu, 3)
                 for name, st in PROF.phases.items() if st.cpu >= 0.01}
    native = {k: round(v, 3) for k, v in native_counters().items()
              if v >= 0.01}

    out = {
        "dataset": "realistic 20k genes / 10M reads "
                   "(benchmarks/bench_realistic.json)",
        "reads": n_reads,
        "host_cores": ncpu,
        "wall_s": round(wall, 2),
        "reads_per_sec": round(n_reads / wall),
        "vs_baseline": round(n_reads / wall / BASELINE, 2),
        "cpu_user_s": round(cpu_user, 2),
        "cpu_sys_s": round(cpu_sys, 2),
        "total_cpu_s": round(total_cpu, 2),
        "cpu_bound_wall_floor_s": round(total_cpu / ncpu, 2),
        "phase_wall_s": phases,
        "phase_thread_cpu_s": phase_cpu,
        "native_thread_cpu_s": native,
        "cpu_accounting": {
            "sum_phase_thread_cpu_s": round(sum(phase_cpu.values()), 2),
            "sum_native_thread_cpu_s": round(sum(native.values()), 2),
            "note": "total_cpu_s ~= phase thread-CPU (Python/numpy + "
                    "synchronous native calls on the phase's thread) + "
                    "native pool-worker CPU + unphased startup "
                    "(imports, malloc tuning). Phases nest on the same "
                    "thread (pass1/pass2 contain the inner phases), so "
                    "outer entries already include inner ones — compare "
                    "the top-level pass entries against the native "
                    "pools, not the raw sum.",
        },
        "targets": {},
        "p2_on_this_host": {
            # filled from p_scaling.json below
            "note": "end-to-end CLI walls, interleaved best-of-3: with "
                    "the r5 ranged shard workers (each inflates only its "
                    "own BGZF span; no parent decode; shards render "
                    "their own GTF ranges and load the .sbidx sidecar) "
                    "-p 2 matches the single process on this 2-core "
                    "host — benchmarks/p_scaling.json itemizes the "
                    "per-worker costs and where -p takes over (>=4 "
                    "cores)",
        },
        "pass2_rescan_decision": {
            "cost_s": round(native.get("scan_p2", 0)
                            + native.get("collapse_p2", 0)
                            + native.get("emit_p2", 0), 3),
            "note": "pass 2 re-scans hits against the assembled gene "
                    "spans WITH the pass-1 pairing cache reused (the "
                    "expensive half). The remaining scan is the "
                    "membership computation itself (~80ns/hit); the "
                    "collapse CANNOT reuse pass-1 results byte-exactly "
                    "because the reference re-runs std::sort per pass-2 "
                    "cluster and the unstable tie permutation depends on "
                    "the pass-2 formation order, which differs from any "
                    "pass-1 order. Reusing collapsed fragments would "
                    "change output on tie-heavy loci.",
        },
        "chip_offload_bound": {
            "h2d_gbps": 0.02,
            "rtt_ms": 28,
            "note": "tunneled v5e (device_characterization.json): shipping "
                    "the ~1.6GB of decoded hit tensors to the chip would "
                    "alone cost ~80s at 0.02 GB/s — 8x the entire current "
                    "wall — so host->device offload cannot buy wall time "
                    "on this link regardless of kernel speed",
        },
        "verdict": None,
        "r5_deltas": [
            "lazy FeatView contigs + flat-driven ref pack/sort (r4 lever "
            "2, done)", "native GTF emission (gtfemit.cc) replacing 50k "
            "Isoform objects + Python f-strings",
            "raw-slice native EM (em.cc strawb_em_batch_raw) replacing "
            "the per-locus Python preamble, chunked on a side thread",
            "allocation-light GTF C parse (lowercase table, hoisted "
            "buffers, keyed map buffers)",
            "gen-0 GC threshold + frozen import heap (2.8k collections "
            "-> ~0)",
            "decode inflate/parse/merge now carry perf counters — the "
            "r4 'unitemized ~6.7s' was largely this trio plus the "
            "gtf thread, both now itemized above",
            "SbamBlock storage recycler: dropped blocks park their "
            "vectors for the next chromosome/run instead of cycling "
            "~GB/run through fresh arena heap mmaps (killed the ~2s "
            "sys-time merge tail on repeat runs; the r4 'exact-size "
            "block assembly' lever, done differently)",
            ".sbidx annotation sidecar: parsed GTF arrays + per-chrom "
            "Contig sort order persisted next to the annotation "
            "(mtime+size keyed); repeat runs and -p shards load flat "
            "arrays — side-thread CPU 1.23s -> 0.37s",
        ],
        "next_levers_measured": [
            "the decode trio (inflate ~1.0 + parse ~0.7 + merge ~0.5s "
            "CPU) is the largest remaining native block; inflate is "
            "libdeflate at ~1GB/s/thread (at spec)",
            "cluster scan p1+p2 (~2.3s thread-CPU at ~85ns/hit) and the "
            "collapse sorts (~0.6s) remain memory-bound and "
            "semantics-pinned (unstable-sort tie permutations)",
            "asm_prep (~1.4s) + quant_prep (~1.5s) pools: round-4 "
            "optimized; remaining cost is the per-locus coverage fill "
            "and the fl-sum weight loop, both already vectorized",
            "the ref Contig build (~0.3s) is now pure Python object "
            "construction (117k Contig+FeatView); a fully lazy contig "
            "list would defer it but every expressed locus touches its "
            "refs",
        ],
    }
    try:
        with open(os.path.join(ROOT, "benchmarks", "p_scaling.json")) as fh:
            ps = json.load(fh)["measured_cli_end_to_end_best_of_3"]
        out["p2_on_this_host"]["cli_single_wall_s"] = ps["single_wall_s"]
        out["p2_on_this_host"]["cli_p2_wall_s"] = ps["p2_wall_s"]
    except (OSError, KeyError):
        pass
    for name, rps in TARGETS.items():
        need_wall = n_reads / rps
        need_cores = total_cpu / need_wall
        out["targets"][name] = {
            "reads_per_sec": int(rps),
            "required_wall_s": round(need_wall, 2),
            "cores_needed_at_current_per_read_cost": round(need_cores, 1),
            "or_work_reduction_factor_on_this_host":
                round(total_cpu / (need_wall * ncpu), 2),
        }
    t50 = out["targets"]["50x"]
    out["verdict"] = (
        f"{n_reads} reads at >=50x needs wall <= "
        f"{t50['required_wall_s']}s; the pipeline currently costs "
        f"{out['total_cpu_s']}s of CPU, so on this {ncpu}-core host the "
        f"floor is {out['cpu_bound_wall_floor_s']}s even at perfect "
        f"overlap. 50x therefore needs ~"
        f"{t50['cores_needed_at_current_per_read_cost']} cores at the "
        "current per-read cost (the work parallelizes: -p shards and the "
        "per-locus native pools scale with cores), or a "
        f"{t50['or_work_reduction_factor_on_this_host']}x per-read work "
        "reduction, or a non-tunneled accelerator (see "
        "chip_offload_bound).")
    path = os.path.join(ROOT, "benchmarks", "budget_50x.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
