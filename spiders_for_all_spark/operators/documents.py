"""Document assembly: parsed docs -> the canonical interleaved span table.

Output shape is fixed by BASELINE.json's input_hint:
``documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``.
Span order (text, then media in list order) is produced upstream by the
parser (operators/parse.py — reference semantics at
spiders/xhs/downloader.py:56-72,110-112); assembly here only has to keep it
stable through shuffles: explode -> groupBy doc_id ->
``array_sort(collect_list(struct(offset, ...)))``, i.e. order is carried by
data (offset), never by partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def docs_from_parsed(parsed_ok: DataFrame) -> DataFrame:
    """Explode per-fetch doc arrays into the documents table, doc_id-unique.

    A doc re-emitted within one round (e.g. the same note linked from two
    pages) collapses to one row; which copy wins is deterministic
    (max by span count then doc content) though in a consistent world all
    copies are identical.
    """
    by_offset = lambda l, r: F.when(l.offset < r.offset, -1).when(  # noqa: E731
        l.offset > r.offset, 1
    ).otherwise(0)
    exploded = parsed_ok.select(F.explode("docs").alias("d")).select(
        F.col("d.doc_id").alias("doc_id"),
        F.array_sort(F.col("d.spans"), by_offset).alias("spans"),
    )
    return exploded.groupBy("doc_id").agg(F.max("spans").alias("spans"))
