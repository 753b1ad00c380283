"""Probe: where does crawl_round_1m_frontier's docs leg spend time?

NOT the graded bench (bench.py is frozen).  Mirrors bench.py's round
exactly — imports its session/synth/constants — runs AQE-off like the
bench's round section, warm-up + min-of-3, noop sinks per leg
(optimization guide §1.4).  Variants:

  sched_noop   = through the politeness window
  fetched_noop = + mapInPandas fetch
  parsed_noop  = + parse_stage, docs column materialized to the noop sink
  full         = the frozen bench leg: explode(docs).select(doc_id).count()
  ids_only     = CEILING A: docs replaced by transform(items, x -> x.id) —
                 what perfect span-construction pruning could reach
  ids_pruned   = CEILING B: ids_only + from_json schema pruned to
                 code/success/_corrupt/data.list[].id

The gap between parsed_noop and full is NOT explode+count cost: the
optimizer's InferFiltersFromGenerate inserts `Filter size(docs)>0` under
the Generate, and predicate pushdown then substitutes the alias chain,
inlining a SECOND full from_json + span-construction evaluation into the
Filter (see plans/r06/crawl_round_docs_leg_plan.txt).  Run with
--dump-plan to regenerate that evidence file.
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (frozen harness — imported, never modified)
from pyspark.sql import functions as F, types as T  # noqa: E402


def main() -> None:
    spark = bench.build_session()
    spark.sparkContext.setLogLevel("ERROR")

    from spiders_for_all_spark.operators.dedup import seen_anti_join
    from spiders_for_all_spark.operators.parse import ENVELOPE_SCHEMA, parse_stage
    from spiders_for_all_spark.operators.politeness import schedule_round
    from spiders_for_all_spark.sources.fetcher import ProceduralFetcher

    n = bench.FRONTIER_N
    tmp = tempfile.mkdtemp(prefix="sfas_probe_")
    bench.synth_frontier(spark, n).write.mode("overwrite").parquet(f"{tmp}/frontier")
    frontier = spark.read.parquet(f"{tmp}/frontier")
    frontier.filter(F.pmod(F.xxhash64("canonical_url"), F.lit(10)) < 3).select(
        "url_hash"
    ).write.mode("overwrite").parquet(f"{tmp}/seen")
    seen = spark.read.parquet(f"{tmp}/seen")
    budget = max(n // bench.N_HOSTS, 1)

    spark.conf.set("spark.sql.adaptive.enabled", "false")

    def fetched_df():
        candidates = seen_anti_join(frontier, seen)
        sched = schedule_round(candidates, default_budget=budget, salt_n=bench.SALT_N)
        return ProceduralFetcher(
            items_per_page=bench.ITEMS_PER_PAGE,
            partitions=bench.SHUFFLE_MULT * bench.CPUS,
            colocate_hosts=False,
        ).fetch(sched.drop("sched_rank"))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    pruned_item = T.StructType([T.StructField("id", T.StringType())])
    pruned_env = T.StructType(
        [
            T.StructField("code", T.IntegerType()),
            T.StructField("success", T.BooleanType()),
            T.StructField(
                "data",
                T.StructType([T.StructField("list", T.ArrayType(pruned_item))]),
            ),
            T.StructField("_corrupt", T.StringType()),
        ]
    )

    def ids_expr(schema):
        is_http_ok = F.col("status") == 200
        env = F.when(
            is_http_ok,
            F.from_json(F.col("body"), schema, {"columnNameOfCorruptRecord": "_corrupt"}),
        )
        env_ok = (
            env.isNotNull()
            & (F.coalesce(env.getField("code"), F.lit(0)) == 0)
            & F.coalesce(env.getField("success"), F.lit(True))
        )
        good = is_http_ok & ~(env.isNull() | env.getField("_corrupt").isNotNull())
        elem = schema["data"].dataType["list"].dataType.elementType
        items = F.coalesce(
            env.getField("data").getField("list"), F.array().cast(T.ArrayType(elem))
        )
        return F.when(
            good & env_ok, F.transform(items, lambda x: x.getField("id"))
        ).otherwise(F.array().cast("array<string>"))

    def run(name, fn, reps=3):
        spark.sparkContext.setJobDescription(f"probe:{name}")
        fn()  # warm-up (JIT, identical to bench methodology)
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        print(f"{name:14s} min={min(ts):.3f}  all={[round(t, 3) for t in ts]}", flush=True)

    run(
        "sched_noop",
        lambda: noop(
            schedule_round(
                seen_anti_join(frontier, seen), default_budget=budget, salt_n=bench.SALT_N
            ).drop("sched_rank")
        ),
    )
    run("fetched_noop", lambda: noop(fetched_df()))
    run("parsed_noop", lambda: noop(parse_stage(fetched_df()).select("docs")))
    run(
        "full",
        lambda: parse_stage(fetched_df())
        .select(F.explode("docs").alias("d"))
        .select("d.doc_id")
        .count(),
    )
    run(
        "ids_only",
        lambda: fetched_df()
        .select(F.explode(ids_expr(ENVELOPE_SCHEMA)).alias("doc_id"))
        .count(),
    )
    run(
        "ids_pruned",
        lambda: fetched_df()
        .select(F.explode(ids_expr(pruned_env)).alias("doc_id"))
        .count(),
    )

    if "--dump-plan" in sys.argv:
        plan = (
            parse_stage(fetched_df())
            .select(F.explode("docs").alias("d"))
            .select("d.doc_id")
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r06",
            "crawl_round_docs_leg_plan.txt",
        )
        with open(out, "w") as f:
            f.write(plan)
        print(f"optimized plan -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
