"""N-vs-4N scaling evidence (BASELINE.json north_rule, sandbox proxy).

Runs bench.py twice in fresh JVMs — local[8] (N) and local[32] (4N) — on
the SAME input, compares steady-state throughput of the headline stage
(tile assignment + PIP join), and writes BENCH.md with both runs + the
scaling efficiency = (thr_4N / thr_N) / 4. Criterion: >= 0.8.

Usage: python tools/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("BENCH_ITERS", "5")
    env.setdefault("BENCH_REPL", "32")  # see bench.py — keeps the parallel
    # region dominant over fixed per-job cost at sandbox data sizes
    env.setdefault("SPARK_DRIVER_MEMORY", "24g")
    env["BENCH_HEADLINE_ONLY"] = "1"
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if cpus < (os.cpu_count() or cpus):
        # pin the N-core run to N physical CPUs so GC/JIT/python workers
        # can't silently use the whole machine (honest small-cluster proxy)
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1800)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    r8 = run(8, sf_dir)
    r32 = run(32, sf_dir)
    thr8 = r8["throughput_rows_per_sec"]
    thr32 = r32["throughput_rows_per_sec"]
    eff = (thr32 / thr8) / 4.0
    report = {
        "sf": r8["sf"],
        "N_cpus": 8,
        "4N_cpus": 32,
        "thr_N_rows_per_sec": thr8,
        "thr_4N_rows_per_sec": thr32,
        "speedup": round(thr32 / thr8, 3),
        "scaling_efficiency": round(eff, 3),
        "stage_sec_N": r8["value"],
        "stage_sec_4N": r32["value"],
        "tiles": r32["tiles"],
        "joined_rows": r32["joined_rows"],
    }
    print(json.dumps(report))
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            f"""# BENCH — steady-state throughput + N vs 4N scaling

Headline stage (BASELINE.json metric): **tile assignment + cell-keyed PIP
join** over the deterministic `images` fixture at {report['sf']}
({report['tiles']} tiles, {report['joined_rows']} joined rows per pass).
Steady state: inputs cached, best of $BENCH_ITERS passes, every output
column force-evaluated (bench.py:force_eval).

| parallelism | stage sec | throughput (tiles+joined rows)/s |
|---|---|---|
| local[8]  (N)  | {report['stage_sec_N']} | {thr8:,.0f} |
| local[32] (4N) | {report['stage_sec_4N']} | {thr32:,.0f} |

**Speedup {report['speedup']}x -> scaling efficiency {report['scaling_efficiency']}**
(criterion >= 0.8, BASELINE.json north_rule; local[8] vs local[32] is the
sandbox proxy for N vs 4N executors — same input, same plan, fresh JVM per
run, per driver instruction).
"""
        )
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
