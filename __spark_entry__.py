"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship training-data enrichment pipeline on
sf0.001; ``queries()``/``oracle_sql()`` expose the operator catalog
(spiders_for_all_spark/plans/catalog.py) — one (PySpark plan, DuckDB SQL
oracle) pair per implemented operator from SURVEY.md §2 plus the
training-data ops (dedup / similarity / text analysis / multimodal).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spiders_for_all_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: enriched + dedup-annotated corpus over sf0.001 documents."""
    return catalog.flagship_enriched_corpus(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(catalog.ORACLES)
