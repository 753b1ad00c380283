"""Two-cluster-size scaling evidence (BASELINE.md row 11).

No real cluster exists in the sandbox, so the north_rule's "N vs 4N
executors with >=0.8 efficiency" is evidenced by running the identical
crawl-round job at local[8] and local[32] on the same input and reporting
throughput at both plus efficiency = (T_32/T_8)/4.

Each run is a fresh subprocess (fresh JVM) so the two measurements are
independent.  Appends/refreshes the '## Scaling evidence' section in
BASELINE.md and prints the JSON summary.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, frontier_n: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_FRONTIER_N=str(frontier_n),
        SPARK_GRAFT_BENCH_CRAWL_ONLY="1",
        SPARK_GRAFT_BENCH_REPS=os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    frontier_n = int(os.environ.get("SPARK_GRAFT_FRONTIER_N", "4000000"))
    rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
    lo, hi = 8, 32
    # the sandbox host's CPU allocation varies over time (burst throttling),
    # so the two sizes are measured in alternating A/B rounds and the best
    # round per size is compared — adjacent measurements see comparable
    # conditions, and interference only ever lowers a number
    lo_runs, hi_runs = [], []
    for _ in range(rounds):
        lo_runs.append(run_bench(lo, frontier_n))
        hi_runs.append(run_bench(hi, frontier_n))
    r_lo = max(lo_runs, key=lambda r: r["value"])
    r_hi = max(hi_runs, key=lambda r: r["value"])
    all_obs = {
        f"local[{lo}]_runs": [r["value"] for r in lo_runs],
        f"local[{hi}]_runs": [r["value"] for r in hi_runs],
    }
    print(json.dumps(all_obs))
    eff = (r_hi["value"] / r_lo["value"]) / (hi / lo)
    summary = {
        "frontier_n": frontier_n,
        f"urls_per_sec_local[{lo}]": r_lo["value"],
        f"urls_per_sec_local[{hi}]": r_hi["value"],
        "speedup": round(r_hi["value"] / r_lo["value"], 3),
        "scaling_efficiency": round(eff, 3),
        "target": ">= 0.8 per north_rule",
    }
    print(json.dumps(summary))

    section = f"""
## Scaling evidence (sandbox protocol, row 11)

Identical crawl-round job (seen anti-join -> politeness window -> fetch
mapInPandas -> Catalyst parse -> doc extraction) on the same
{frontier_n:,}-URL synthetic frontier, fresh JVM per run, steady-state
(untimed warm-up round, min of timed repetitions, no shuffle reuse).
The host's CPU allocation varies over time, so sizes were measured in
{rounds} alternating A/B rounds; best round per size shown (all
observations: {all_obs}):

| parallelism | URLs/sec |
|---|---|
| local[{lo}] | {r_lo['value']:,} |
| local[{hi}] | {r_hi['value']:,} |

speedup {lo}->{hi} cores: **{summary['speedup']}x** -> scaling efficiency
(T_{hi}/T_{lo})/{hi // lo} = **{summary['scaling_efficiency']}** (target >= 0.8).
"""
    path = os.path.join(REPO, "BASELINE.md")
    text = open(path).read()
    text = re.sub(r"\n## Scaling evidence.*\Z", "", text, flags=re.S)
    open(path, "w").write(text + section)


if __name__ == "__main__":
    main()
