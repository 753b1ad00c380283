"""ID-list source (S8): parse ids from strings/files, dedupe + sort.

Reference: ``read_ids_to_list`` splits on ``[\\s,\\t\\n]+``, dedups and
sorts (utils/helper.py:52-75).  Spark-native: text scan -> split ->
explode -> distinct -> sort; works identically on a literal string, a
text file, or a whole directory of seed lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEP = r"[\s,\t\n]+"


def ids_from_df(df: DataFrame, col: str = "value") -> DataFrame:
    return (
        df.select(F.explode(F.split(F.col(col), SEP)).alias("id"))
        .filter(F.col("id") != "")
        .distinct()
        .orderBy("id")
    )


def ids_from_string(spark: SparkSession, raw: str) -> DataFrame:
    return ids_from_df(spark.createDataFrame([(raw,)], "value string"))


def ids_from_text_file(spark: SparkSession, path: str) -> DataFrame:
    return ids_from_df(spark.read.text(path))
