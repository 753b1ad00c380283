from __future__ import annotations

from pyspark.sql import functions as F

from spiders_for_all_spark.streaming.rounds import (
    streaming_document_quality,
    streaming_incremental_dedup,
)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_streaming_quality_equals_batch(spark, tmp_path):
    """The cleaning projection runs unchanged on readStream and produces
    exactly the batch result (stateless expressions, append mode)."""
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "spam spam spam spam spam"),
        ("c", "mail me at x@y.io or 10.0.0.1"),
    ]
    src = _docs_df(spark, rows)
    path = str(tmp_path / "docs_parquet")
    src.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    q = (
        streaming_document_quality(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("clean_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: (
                r["quality"],
                r["lang_guess"],
                r["dup_word_frac"],
                r["text_scrubbed"],
            )
            for r in spark.sql("SELECT * FROM clean_stream").collect()
        }
    finally:
        q.stop()
    want = {
        r["doc_id"]: (
            r["quality"],
            r["lang_guess"],
            r["dup_word_frac"],
            r["text_scrubbed"],
        )
        for r in streaming_document_quality(src).collect()
    }
    assert got == want and len(got) == 3
    assert "<EMAIL>" in got["c"][3] and "<IP>" in got["c"][3]


def test_streaming_incremental_dedup_equals_one_shot(spark, tmp_path):
    """Micro-batched ingestion through the committed MinHash index finds
    the same candidate pairs as the one-shot LSH over the full corpus
    (each pair discovered exactly once, in the batch that completes it)."""
    from spiders_for_all_spark.operators.textdedup import (
        minhash_candidate_pairs,
    )
    from spiders_for_all_spark.storage import SnapshotStorage

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        ("d0", base),
        ("d1", base + " extra tail"),          # near-dup of d0
        ("d2", "totally different words here entirely unrelated text"),
        ("d3", base),                          # exact dup of d0
        ("d4", "another unrelated document of fresh content words"),
    ]
    # one-shot ground truth over the full corpus
    full = _docs_df(spark, rows)
    want = {
        (r["a"], r["b"])
        for r in minhash_candidate_pairs(full).collect()
    }
    assert want, "fixture must produce candidate pairs"

    # stream the same docs in 3 micro-batches (one parquet file each)
    path = str(tmp_path / "stream_src")
    for i, chunk in enumerate([rows[:2], rows[2:4], rows[4:]]):
        _docs_df(spark, chunk).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    storage = SnapshotStorage(spark, str(tmp_path / "wh"))
    stream = spark.readStream.schema(full.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(path)
    q = streaming_incremental_dedup(
        stream, storage, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got_rows = storage.read("minhash_pairs").collect()
    got = {(r["a"], r["b"]) for r in got_rows}
    assert got == want
    # no pair reported twice across batches
    assert len(got_rows) == len(got)
    # the committed index covers every doc
    assert (
        storage.read("minhash_index").select("doc_id").distinct().count()
        == len(rows)
    )
