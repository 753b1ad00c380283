"""spark-submit entry point for a crawl (north_rule launch path).

    python -m spiders_for_all_spark.submit  # or tools/submit_crawl.sh
    spark-submit --master local[8] \
        --py-files /tmp/spiders_for_all_spark.zip \
        jobs/crawl_job.py --site /path/pages.parquet --warehouse /path/wh \
        --seeds /path/seeds.txt --budget 3 --rounds 20

Seeds file: one URL per line (S8 id-list source parses it).  With
``--synthetic`` the job builds its own deterministic site + seeds first.
Argument surface and round loop live in spiders_for_all_spark.cli (shared
with ``python -m spiders_for_all_spark crawl``).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    from spiders_for_all_spark.cli import add_crawl_args, build_session, run_crawl

    ap = argparse.ArgumentParser()
    add_crawl_args(ap)
    args = ap.parse_args()

    spark = build_session("spiders_for_all_spark-crawl")
    spark.sparkContext.setLogLevel("WARN")
    print(json.dumps(run_crawl(spark, args)))


if __name__ == "__main__":
    main()
