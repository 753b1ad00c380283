"""Round-6 optimization harness — NOT the graded bench (bench.py is frozen).

Times individual catalog queries in isolation with the noop sink (guide
§1.4) under the same session config bench.py uses for its catalog section,
and optionally dumps .explain("formatted") for plan-diff evidence
(plans/r06/<query>_<tag>.txt).

Usage:
    python bench_extra.py [--explain TAG] [--reps N] [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
measurement scale), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEAVY = [
    "dedup_semantic_semdedup",
    "dedup_semantic_incremental",
    "dedup_substring_spans",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_winnow_fingerprints",
    "curation_dsir_scores",
    "text_lm_perplexity",
    "text_quality",
    "clean_passage_dedup",
    "clean_gopher_rules",
    "dedup_semantic_prototypes",
    "crawl_pagerank_priority",
    "crawl_recrawl_schedule",
    "export_token_budget_sample",
    "export_shard_manifest",
    "tpch_q1",
    "tpch_q3ish",
]


def _steal_ticks() -> int:
    try:
        return int(open("/proc/stat").readline().split()[8])
    except Exception:
        return 0


def build_session() -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sfas-bench-extra")
        .config("spark.sql.shuffle.partitions", str(2 * CPUS))
        .config("spark.default.parallelism", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config(
            "spark.local.dir",
            "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    args = sys.argv[1:]
    explain_tag = None
    reps = 3
    cold = False
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--cold":
            cold = True
            i += 1
        elif args[i] == "--explain":
            explain_tag = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = HEAVY

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    from spiders_for_all_spark.submit import attach

    attach(spark)
    from spiders_for_all_spark.plans import catalog

    out: dict[str, object] = {"sf_dir": SF_DIR, "cpus": CPUS}
    steal0 = _steal_ticks()
    times: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if explain_tag:
            os.makedirs("plans/r06", exist_ok=True)
            df = catalog.QUERIES[name](spark, SF_DIR)
            with open(f"plans/r06/{name}_{explain_tag}.txt", "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if reps <= 0:
            continue
        if not cold:
            # warmup (JIT) + best-of-reps, identical methodology to bench.py
            catalog.QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            catalog.QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.monotonic() - t0)
        times[name] = round(best, 3)
        print(f"{name:32s} {best:8.3f} s", file=sys.stderr)
    out["queries"] = times
    out["steal_s"] = round((_steal_ticks() - steal0) / 100.0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
