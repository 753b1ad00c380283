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


def test_incremental_dedup_batch_replay_is_skipped(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-committed
    batch_id (crash after commit_multi, before the streaming checkpoint)
    must be a no-op — index/pairs rows are appended exactly once."""
    from spiders_for_all_spark.storage import SnapshotStorage
    from spiders_for_all_spark.streaming.rounds import (
        incremental_dedup_batch,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b0 = _docs_df(spark, [("d0", base), ("d1", base + " tail")])
    b1 = _docs_df(spark, [("d2", base), ("d3", "unrelated fresh words")])
    storage = SnapshotStorage(spark, str(tmp_path / "wh"))

    assert incremental_dedup_batch(storage, b0, 0) is True
    idx0 = storage.read("minhash_index").count()
    prs0 = storage.read("minhash_pairs").count()
    # replay of batch 0: skipped, tables unchanged
    assert incremental_dedup_batch(storage, b0, 0) is False
    assert storage.read("minhash_index").count() == idx0
    assert storage.read("minhash_pairs").count() == prs0
    # the next batch still applies
    assert incremental_dedup_batch(storage, b1, 1) is True
    assert storage.read("minhash_index").count() > idx0
    # and a replay of it is skipped too
    assert incremental_dedup_batch(storage, b1, 1) is False


def test_sessionize_boundary_matches_session_window(spark):
    """Boundary semantics, twin-verified: session_window MERGES windows
    that touch, so an event at exactly last+gap EXTENDS the session —
    the batch form's `gap > threshold` rule matches it; `>=` would not
    (it was tried and diverged on exactly this fixture)."""
    from spiders_for_all_spark.streaming.rounds import sessionize

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:30:00"),
         (1, "2024-01-01 01:30:01")],
        "user_id int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    batch_sessions = (
        sessionize(df, gap_minutes=30)
        .select("session_no").distinct().count()
    )
    sw_sessions = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count().count()
    )
    # boundary event (00:30) stays in session 1; 01:30:01 (gap 3601s) opens
    # session 2 in both forms
    assert batch_sessions == sw_sessions == 2


def test_host_budget_timeout_armed_runs(spark, tmp_path):
    """ProcessingTimeTimeout path: state arms a timeout per update and the
    hasTimedOut branch exists — with a long duration the single-batch
    result is identical to NoTimeout."""
    from spiders_for_all_spark.streaming.rounds import streaming_host_budget

    src = spark.range(0, 12).select(
        F.when(F.col("id") % 2 == 0, "a.com").otherwise("b.com").alias("host"),
    )
    path = str(tmp_path / "fetches_parquet")
    src.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    q = (
        streaming_host_budget(
            stream, budget_total=4,
            timeout="ProcessingTimeTimeout", timeout_duration_ms=3_600_000,
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("host_budget_to")
        .start()
    )
    try:
        # processAllAvailable() never idles under ProcessingTimeTimeout
        # (Spark keeps scheduling batches to check timers) — poll the sink.
        import time

        rows = []
        for _ in range(120):
            rows = spark.sql("SELECT * FROM host_budget_to").collect()
            if len({r["host"] for r in rows}) == 2:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    by_host = {r["host"]: r for r in rows}
    assert by_host["a.com"]["n_total"] == 6
    assert by_host["a.com"]["admitted"] == 4
    assert by_host["b.com"]["n_total"] == 6


def test_streaming_recrawl_schedule_matches_batch_twin(spark, tmp_path):
    """The stateful streaming recrawl scheduler, fed the same fetch
    history across micro-batches, converges to exactly the batch
    operator's schedule (same integer-space values)."""
    from datetime import datetime

    from spiders_for_all_spark.operators.recrawl import recrawl_schedule
    from spiders_for_all_spark.streaming.rounds import (
        streaming_recrawl_schedule,
    )

    rows = [
        # url 1: change then 3 stable; url 2: changes every fetch;
        # url 3: appears only in the last batch; url 4: NULL fingerprints
        # crossing micro-batch boundaries — batch semantics are "prev NULL
        # => change, current NULL after non-null => NO change" (Catalyst
        # fp != lag(fp) null-propagation), and the stateful twin must
        # reproduce them exactly (ADVICE r4).
        (1, datetime(2024, 1, 1, 0, 0, 0), 0, "a"),
        (2, datetime(2024, 1, 1, 0, 0, 0), 1, "x"),
        (4, datetime(2024, 1, 1, 0, 0, 0), 2, "m"),
        (1, datetime(2024, 1, 1, 0, 1, 0), 3, "a"),
        (2, datetime(2024, 1, 1, 0, 1, 0), 4, "y"),
        (4, datetime(2024, 1, 1, 0, 1, 0), 5, None),
        (1, datetime(2024, 1, 1, 0, 2, 0), 6, "a"),
        (2, datetime(2024, 1, 1, 0, 2, 0), 7, "z"),
        (4, datetime(2024, 1, 1, 0, 2, 0), 8, None),
        (1, datetime(2024, 1, 1, 0, 3, 0), 9, "a"),
        (3, datetime(2024, 1, 1, 0, 3, 0), 10, "q"),
        (4, datetime(2024, 1, 1, 0, 3, 0), 11, "m"),
    ]
    schema = "url_id bigint, ts timestamp, fetch_id bigint, fingerprint string"
    full = spark.createDataFrame(rows, schema)
    want = {
        r["url_id"]: (
            r["n_fetches"],
            r["n_changes"],
            r["unchanged_streak"],
            r["interval_s"],
            r["next_fetch_us"],
        )
        for r in recrawl_schedule(full, base_s=60).collect()
    }

    path = str(tmp_path / "fetch_stream")
    for chunk in (rows[:3], rows[3:6], rows[6:9], rows[9:]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    stream = spark.readStream.schema(full.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(path)
    q = (
        streaming_recrawl_schedule(stream, base_s=60)
        .writeStream.format("memory")
        .queryName("recrawl_sched")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = spark.sql("SELECT * FROM recrawl_sched").collect()
    # n_fetches grows monotonically per url -> max row is the final state
    got = {}
    for r in emitted:
        cur = got.get(r["url_id"])
        if cur is None or r["n_fetches"] > cur[0]:
            got[r["url_id"]] = (
                r["n_fetches"],
                r["n_changes"],
                r["unchanged_streak"],
                r["interval_s"],
                r["next_fetch_us"],
            )
    assert got == want
