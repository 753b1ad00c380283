"""spark-submit entry point for a crawl (north_rule launch path).

    python -m spiders_for_all_spark.submit  # or tools/submit_crawl.sh
    spark-submit --master local[8] \
        --py-files /tmp/spiders_for_all_spark.zip \
        jobs/crawl_job.py --site /path/pages.parquet --warehouse /path/wh \
        --seeds /path/seeds.txt --budget 3 --rounds 20

Seeds file: one URL per line (S8 id-list source parses it).  With
``--synthetic`` the job builds its own deterministic site + seeds first.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--site", help="parquet site for the synthetic fetcher")
    ap.add_argument("--seeds", help="text file of seed URLs")
    ap.add_argument("--warehouse", default=None)
    ap.add_argument("--budget", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=30)
    ap.add_argument("--bloom", action="store_true")
    ap.add_argument("--bloom-partitioned", action="store_true",
                    help="cogrouped bloom probe (no driver broadcast)")
    ap.add_argument("--cuckoo", action="store_true",
                    help="deletable cuckoo seen-prefilter (re-crawl eviction)")
    ap.add_argument("--salt-n", type=int, default=1)
    ap.add_argument("--synthetic", action="store_true",
                    help="generate a deterministic site + seeds")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("spiders_for_all_spark-crawl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # one Arrow batch per fetch task (measured +26% on the bench round)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        # local-mode default: shuffle on tmpfs, not the shared virtio disk
        # (cluster deploys override with node-local NVMe dirs)
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_LOCAL_DIRS",
                "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
            ),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from spiders_for_all_spark import fixtures as FX
    from spiders_for_all_spark.engine import Crawler, CrawlConfig
    from spiders_for_all_spark.sources.fetcher import SyntheticFetcher
    from spiders_for_all_spark.sources.idlist import ids_from_text_file
    from spiders_for_all_spark.storage import SnapshotStorage

    if args.synthetic:
        rows, seeds = FX.build_site(n_hosts=4, pages_per_chain=3, seed=42)
        site = os.path.join(tempfile.mkdtemp(prefix="sfas_job_"), "pages.parquet")
        FX.write_site(rows, site)
    else:
        site = args.site
        seed_urls = [r["id"] for r in ids_from_text_file(spark, args.seeds).collect()]
        seeds = [{"url": u, "priority": 0} for u in seed_urls]

    warehouse = args.warehouse or tempfile.mkdtemp(prefix="sfas_wh_")
    storage = SnapshotStorage(spark, warehouse)
    crawler = Crawler(
        spark,
        storage,
        SyntheticFetcher(site),
        CrawlConfig(
            max_rounds=args.rounds,
            default_budget=args.budget,
            use_bloom=args.bloom or args.bloom_partitioned,
            bloom_partitioned=args.bloom_partitioned,
            use_cuckoo=args.cuckoo,
            salt_n=args.salt_n,
        ),
    )
    stats = crawler.run(seeds=seeds)
    print(
        json.dumps(
            {
                "rounds": len(stats.rounds),
                "fetched": stats.total_fetched,
                "documents": storage.read("documents").count(),
                "warehouse": warehouse,
            }
        )
    )


if __name__ == "__main__":
    main()
