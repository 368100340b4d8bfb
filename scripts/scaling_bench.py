"""Scaling-efficiency evidence (BASELINE.md protocol).

Runs the IDENTICAL CDC merge-apply job on IDENTICAL input at two parallelism
levels (local[N] and local[4N]). Every timed repetition runs in its OWN
subprocess with a fresh JVM and a fresh tmpfs scratch dir: round-1 shared
one JVM per level, and accumulated shuffle scratch in the fixed
spark.local.dir degraded later repetitions by up to 45% — per-rep isolation
measures steady state instead of tmpfs fill. Each rep warms up (JVM codegen
+ Arrow/Python worker spin-up) on a small log slice before the timed replay.

    python scripts/scaling_bench.py [--n 1] [--events 4000000] [--reps 3]

APPENDS a timestamped results section to BENCH/BASELINE.md (never
truncates — two consecutive runs both survive in git diff) and prints a
JSON summary.
The sandbox substitute for the north rule's N→4N executor criterion:
efficiency = eps(4N) / (4 × eps(N)).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from hyped_spark.session import get_spark
from hyped_spark.plans.replay import ReplayConfig, ReplayEngine

cores = int(sys.argv[1]); log_path = sys.argv[2]
batch_lsns = int(sys.argv[3]); n_buckets = int(sys.argv[4])
scratch = sys.argv[5]
spark = get_spark("scaling_bench", cores=cores, shuffle_partitions=2 * cores,
                  extra_conf={{"spark.local.dir": os.path.join(scratch, "sl")}})
log = spark.read.parquet(log_path)
# tmpfs: the sandbox's single throttled virtual disk does not scale with
# cores (a real cluster's aggregate disk bandwidth scales with executors);
# RAM-backed IO isolates the compute/shuffle scaling the criterion is about.
warm = ReplayEngine(spark, ReplayConfig(
    table_path=os.path.join(scratch, "wt"), metrics_path=os.path.join(scratch, "wm"),
    batch_lsns=batch_lsns, n_buckets=n_buckets, n_salt=8))
warm.replay(log.filter(f"lsn < {{max(batch_lsns // 8, 1000)}}"))
engine = ReplayEngine(spark, ReplayConfig(
    table_path=os.path.join(scratch, "t"), metrics_path=os.path.join(scratch, "m"),
    batch_lsns=batch_lsns, n_buckets=n_buckets, n_salt=8))
t0 = time.monotonic()
stats = engine.replay(log)
dt = time.monotonic() - t0
applied = sum(s.rows_in_batch for s in stats if not s.skipped_replay)
print("RESULT " + json.dumps({{"sec": dt, "events": applied, "eps": applied / dt}}))
"""


def run_level(cores: int, log_path: str, reps: int, batch_lsns: int,
              n_buckets: int) -> list[dict]:
    script = WORKER.format(repo=REPO)
    results = []
    # Pin the whole process tree (JVM task threads, GC threads, shuffle IO,
    # Python UDF workers) to exactly `cores` host CPUs. Without pinning,
    # local[1]'s JVM borrows idle host cores for GC and the Python workers —
    # resources a real 1-core executor does NOT have — inflating the
    # low-parallelism throughput and understating scaling efficiency.
    pin = ["taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0"]
    if shutil.which("taskset") is None:
        pin = []
    for _rep in range(reps):
        scratch = tempfile.mkdtemp(prefix=f"scale_{cores}_", dir="/dev/shm")
        try:
            out = subprocess.run(
                pin + [sys.executable, "-c", script, str(cores), log_path,
                       str(batch_lsns), str(n_buckets), scratch],
                capture_output=True, text=True, timeout=3600,
            )
            for line in out.stdout.splitlines():
                if line.startswith("RESULT "):
                    results.append(json.loads(line[len("RESULT "):]))
                    break
            else:
                raise RuntimeError(
                    f"worker failed (cores={cores}):\n{out.stderr[-3000:]}"
                )
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="lower parallelism N (upper = 4N)")
    ap.add_argument("--events", type=int, default=120_000)
    ap.add_argument("--urls", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch-lsns", type=int, default=40_000)
    ap.add_argument("--buckets", type=int, default=16,
                    help="table buckets — FIXED across levels so both run "
                         "the identical table layout")
    args = ap.parse_args()

    # materialize one fixed input log (identical for both levels), tmpfs
    gen = tempfile.mkdtemp(prefix="scaling_log_", dir="/dev/shm")
    log_path = os.path.join(gen, "log")
    gen_script = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "from hyped_spark.session import get_spark\n"
        "from hyped_spark.sources.synthetic import binlog\n"
        "spark = get_spark('gen', cores=32, shuffle_partitions=32)\n"
        f"binlog(spark, {args.events}, {args.urls}, partitions=64)"
        f".write.mode('overwrite').parquet({log_path!r})\n"
    )
    subprocess.run([sys.executable, "-c", gen_script], check=True, timeout=1800,
                   capture_output=True, text=True)

    try:
        lo = run_level(args.n, log_path, args.reps, args.batch_lsns, args.buckets)
        hi = run_level(args.n * 4, log_path, args.reps, args.batch_lsns, args.buckets)
    finally:
        shutil.rmtree(gen, ignore_errors=True)

    eps_lo = statistics.median(r["eps"] for r in lo)
    eps_hi = statistics.median(r["eps"] for r in hi)
    eff = eps_hi / (4 * eps_lo)
    summary = {
        "n": args.n, "events": args.events,
        "eps_lo": round(eps_lo, 1), "eps_hi": round(eps_hi, 1),
        "sec_lo": round(statistics.median(r["sec"] for r in lo), 2),
        "sec_hi": round(statistics.median(r["sec"] for r in hi), 2),
        "efficiency": round(eff, 3),
        "pass": eff >= 0.8,
        "runs_lo": lo, "runs_hi": hi,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    import pyspark
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    # APPEND-ONLY protocol: each run adds a timestamped section and never
    # truncates previous results (earlier versions overwrote the file and
    # silently destroyed the appended run history — twice)
    import time as _time
    stamp = _time.strftime("%Y-%m-%d %H:%M:%S", _time.localtime())
    header_needed = not os.path.exists(out_path)
    with open(out_path, "a") as f:
        if header_needed:
            f.write("# BENCH/BASELINE — measured engine numbers\n")
        f.write(f"""
---

## Scaling run — {stamp}

Protocol (see script docstring for rationale): identical CDC merge-apply
job (LSN-chunked replay of a deterministic {args.events:,}-event binlog
over {args.urls:,} urls: window-rank LWW dedup + vectorized text
extraction + bucketed copy-on-write merge) on identical input at two
parallelism levels; fresh JVM + fresh tmpfs scratch per repetition;
per-rep warmup replay discarded; median of {args.reps} reps; each level
taskset-pinned to exactly N host CPUs. Spark {pyspark.__version__};
shuffle partitions = cores; AQE on; table buckets = {args.buckets}
(fixed across levels); salt fan-out 8; batch size {args.batch_lsns:,}
LSNs; host: 32 cores, 125 GiB RAM.

| level | cores | median sec | median events/sec |
|---|---|---|---|
| N | {args.n} | {summary["sec_lo"]} | {summary["eps_lo"]:,} |
| 4N | {args.n * 4} | {summary["sec_hi"]} | {summary["eps_hi"]:,} |

**Scaling efficiency = eps(4N) / (4 x eps(N)) = {summary["efficiency"]}**
(criterion >= 0.8: {"PASS" if summary["pass"] else "FAIL"})

All repetitions (sec, events/sec):

- local[{args.n}]: {[(round(r["sec"], 2), round(r["eps"], 1)) for r in lo]}
- local[{args.n * 4}]: {[(round(r["sec"], 2), round(r["eps"], 1)) for r in hi]}
""")


if __name__ == "__main__":
    main()
