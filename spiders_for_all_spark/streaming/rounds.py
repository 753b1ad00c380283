"""Structured-Streaming expressions of the engine's streaming-shaped pieces.

The crawl loop itself is deliberately round-based (closed-world rounds,
state in snapshot tables — SURVEY §2.10 chose this over a Structured
Streaming port because cursor chains force strict round barriers).  What
*is* stream-shaped is telemetry: fetch-log/event monitoring with windowed
aggregation and sessionization.  These run identically on a batch
DataFrame or a ``readStream`` source; tests drive them through the memory
sink with ``processAllAvailable``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling/sliding windowed counts+sums; watermark bounds late data.

    ``value_col=None`` (or a source without the column) emits counts only —
    the ts/key columns are parameterized, so the summed measure must be too.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    aggs = [F.count("*").alias("n")]
    if value_col is not None and value_col in src.columns:
        aggs.append(F.sum(value_col).alias("total_value"))
    return src.groupBy(win.alias("win"), F.col(key_col)).agg(*aggs)


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization: gap > threshold starts a new session.

    lag + cumulative-sum-over-window — the standard Spark idiom; the
    streaming twin is ``session_window`` (used in
    ``streaming_sessionize``).  The boundary is ``>`` to match
    ``session_window`` exactly: Spark MERGES sessions whose windows touch
    (an event at precisely last+gap extends the session, verified by
    tests/test_streaming_clean.py::
    test_sessionize_boundary_matches_session_window), so the twins agree
    on boundary-timed events."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    sess_no = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_no", sess_no)


def streaming_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming-native session windows (state handled by Spark)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), F.col(user_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )


def streaming_url_dedup(
    discoveries: DataFrame,
    ts_col: str = "ts",
    key_col: str = "url_hash",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of the J1 seen anti-join for a discovery FEED: emit
    each url_hash once; duplicates arriving within the watermark horizon
    are dropped by Spark-managed state (dropDuplicatesWithinWatermark).

    The batch engine keeps the authoritative seen set in snapshot tables;
    this is the idiomatic Structured-Streaming form for the continuous
    ingest shape (a discovery firehose feeding frontier bootstrap).
    """
    src = discoveries
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
        return src.dropDuplicatesWithinWatermark([key_col])
    return src.dropDuplicates([key_col])


def streaming_host_budget(
    fetches: DataFrame,
    budget_total: int = 100,
    host_col: str = "host",
    timeout: str = "NoTimeout",
    timeout_duration_ms: int = 3_600_000,
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState, §2.11): a running
    per-host admission counter with a TOTAL budget cap — the streaming form
    of the reference's per-spider `count >= total` stop condition
    (core/spider.py:299-311) enforced per host.

    Per trigger it emits one row per host seen in that batch:
    (host, n_batch, n_total, admitted) where `admitted` counts the rows
    that fit under the remaining budget.  State is one long per host,
    managed by Spark's state store (checkpointable, rescalable).

    With ``timeout="ProcessingTimeTimeout"`` a host idle for
    ``timeout_duration_ms`` has its counter EVICTED (state removed, no row
    emitted) — without eviction, crawl-scale host cardinality grows the
    state store unboundedly; a host seen again after eviction restarts
    from a zero counter (fresh budget).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "host string, n_batch long, n_total long, admitted long"
    arm_timeout = timeout == "ProcessingTimeTimeout"

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            # idle-host eviction: drop the counter, emit nothing.
            state.remove()
            return
        n_before = state.get[0] if state.exists else 0
        n_batch = 0
        for pdf in pdfs:
            n_batch += len(pdf)
        admitted = max(min(budget_total - n_before, n_batch), 0)
        n_total = n_before + n_batch
        state.update((n_total,))
        if arm_timeout:
            state.setTimeoutDuration(timeout_duration_ms)
        import pandas as pd

        yield pd.DataFrame(
            {
                "host": [key[0]],
                "n_batch": [n_batch],
                "n_total": [n_total],
                "admitted": [admitted],
            }
        )

    return fetches.groupBy(host_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="n long",
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def streaming_recrawl_schedule(
    fetches: DataFrame,
    base_s: int = 3600,
    max_doublings: int = 6,
    timeout: str = "NoTimeout",
    timeout_duration_ms: int = 86_400_000,
) -> DataFrame:
    """Custom stateful operator: the streaming twin of
    operators/recrawl.recrawl_schedule — per-URL change detection +
    integer exponential backoff, maintained incrementally so a live crawl
    updates next-fetch times per trigger instead of recomputing the whole
    fetch history.

    State per URL is five scalars (last fingerprint, unchanged streak,
    fetch/change counters, last fetch micros) in Spark's state store
    (checkpointable, rescalable).  Per trigger it emits one schedule row
    per URL seen in that batch — same columns, same integer-space values
    as the batch operator over the same prefix of history (verified by
    test_streaming_clean.py).  Batch rows are processed in (ts, fetch_id)
    order inside the group, vectorized with numpy (no per-row loop).

    With ``timeout="ProcessingTimeTimeout"`` an idle URL's state is
    evicted after ``timeout_duration_ms`` — at 10^10-URL scale the state
    store holds only the actively-recrawled working set; an evicted URL
    re-enters as a fresh first fetch (counts restart, which only shortens
    its backoff — safe).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "url_id long, n_fetches long, n_changes long, "
        "unchanged_streak long, interval_s long, next_fetch_us long"
    )
    arm_timeout = timeout == "ProcessingTimeTimeout"

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        import numpy as np
        import pandas as pd

        if state.exists:
            last_fp, streak, n_f, n_c, last_us = state.get
        else:
            last_fp, streak, n_f, n_c, last_us = None, 0, 0, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "fetch_id"], kind="mergesort")
        # Normalize missing fingerprints to None (pandas may surface
        # parquet NULLs as NaN, which would break `is None` checks).
        fp_s = rows["fingerprint"].astype(object)
        fps = fp_s.where(fp_s.notna(), None).to_numpy(dtype=object)
        prev = np.empty_like(fps)
        prev[0] = last_fp
        prev[1:] = fps[:-1]
        # Exactly the batch operator's null semantics (recrawl.py:51-53):
        # prev NULL => change; Catalyst `fp != lag(fp)` yields NULL (no
        # change) when the CURRENT fingerprint is NULL, so a null fp after
        # a non-null one must NOT count as a change here either.
        changed = np.array(
            [
                p is None or (f is not None and f != p)
                for f, p in zip(fps, prev)
            ],
            dtype=bool,
        )
        n = len(fps)
        n_f += n
        n_c += int(changed.sum())
        if changed.any():
            streak = n - int(np.flatnonzero(changed)[-1]) - 1
        else:
            streak += n
        last_fp = fps[-1]
        last_us = int(rows["ts"].iloc[-1].value // 1_000)
        state.update((last_fp, streak, n_f, n_c, last_us))
        if arm_timeout:
            state.setTimeoutDuration(timeout_duration_ms)
        interval_s = base_s << min(streak, max_doublings)
        yield pd.DataFrame(
            {
                "url_id": [key[0]],
                "n_fetches": [n_f],
                "n_changes": [n_c],
                "unchanged_streak": [streak],
                "interval_s": [interval_s],
                "next_fetch_us": [last_us + interval_s * 1_000_000],
            }
        )

    return fetches.groupBy("url_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=(
            "last_fp string, streak long, n_fetches long, "
            "n_changes long, last_us long"
        ),
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def streaming_document_quality(docs: DataFrame) -> DataFrame:
    """Streaming corpus-clean projection: quality score, language guess,
    repetition signals, PII scrub — all stateless Catalyst expressions,
    so the SAME operator code runs unchanged on a ``readStream`` source
    (no shuffle, no state store, append-mode safe).  The streaming twin
    of the curate pipeline's expression-only stages."""
    from spiders_for_all_spark.functions.text import lang_id, quality_score
    from spiders_for_all_spark.operators.cleaning import (
        dup_word_fraction,
        gopher_keep,
        pii_scrub,
        top_bigram_fraction,
    )

    t = F.col("text")
    return docs.select(
        "doc_id",
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_guess"),
        dup_word_fraction(t).alias("dup_word_frac"),
        top_bigram_fraction(t).alias("top_bigram_frac"),
        gopher_keep(t).alias("gopher_keep"),
        pii_scrub(t).alias("text_scrubbed"),
    )


def streaming_incremental_dedup(
    stream_docs: DataFrame,
    storage,
    checkpoint_dir: str,
    pairs_table: str = "minhash_pairs",
    index_table: str = "minhash_index",
    **lsh_kw,
):
    """Streaming ingestion into the incremental MinHash-LSH corpus index:
    each micro-batch is one ``incremental_dedup_round`` — O(batch)
    shingling, staged append to the committed index, broadcast-pruned
    probe against everything indexed so far — with the batch's candidate
    pairs and its index rows flipped in ONE ``commit_multi`` (the same
    atomic-visibility rule the crawl round uses; a crash between batches
    leaves both tables at the last committed batch, and Structured
    Streaming's checkpoint replays the rest).

    Replay safety: ``foreachBatch`` is at-least-once — a crash AFTER the
    ``commit_multi`` flip but BEFORE the streaming checkpoint records the
    batch re-delivers the same ``batch_id`` on restart.  Each flip
    therefore also commits the batch_id to a one-column watermark table
    (``{index_table}__batches``) in the SAME atomic flip; a replayed
    batch_id at or below the committed watermark is skipped, so index and
    pairs rows are appended exactly once.

    Returns the started ``StreamingQuery``.
    """
    def _one_batch(batch_df: DataFrame, batch_id: int) -> None:
        incremental_dedup_batch(
            storage, batch_df, batch_id, pairs_table, index_table, **lsh_kw
        )

    return (
        stream_docs.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def incremental_dedup_batch(
    storage,
    batch_df: DataFrame,
    batch_id: int,
    pairs_table: str = "minhash_pairs",
    index_table: str = "minhash_index",
    **lsh_kw,
) -> bool:
    """One idempotent micro-batch of the incremental dedup ingestion.

    Returns True if the batch was applied, False if it was a replay of an
    already-committed batch_id (skipped).  Module-level so the replay
    contract is directly unit-testable outside a StreamingQuery.
    """
    from spiders_for_all_spark.operators.textdedup import (
        incremental_dedup_round,
    )

    batches_table = f"{index_table}__batches"
    if not batch_df.take(1):
        return False
    if storage.latest_snapshot(batches_table) is not None:
        done = (
            storage.read(batches_table)
            .agg(F.max("batch_id").alias("m"))
            .collect()[0]["m"]
        )
        if done is not None and batch_id <= done:
            return False  # checkpoint replay of an already-committed batch
    pairs, staged_index = incremental_dedup_round(
        storage, batch_df, table=index_table, **lsh_kw
    )
    staged_pairs = storage.stage_append(
        pairs_table, pairs.withColumn("batch_id", F.lit(batch_id))
    )
    staged_mark = storage.stage_append(
        batches_table,
        batch_df.sparkSession.createDataFrame([(batch_id,)], "batch_id long"),
    )
    storage.commit_multi([staged_index, staged_pairs, staged_mark])
    return True
