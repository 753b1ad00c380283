"""Corpus export: the last leg of the training-data pipeline — turn a
curated corpus into the artifact a trainer actually consumes.

Four operators, all deterministic (md5-derived draws compared in integer
space, the repo-wide convention from ``curation.mixture_resample``): a
training run must be exactly reproducible from (corpus snapshot, seed),
and a retried Spark task or a different partition layout must never
change which document lands in which split, shard, or position.

* :func:`split_assign` — train/val/test assignment.  Pure expression
  (one CASE over a 32-bit md5 draw), no shuffle, no join: at 100 TB the
  split column costs the same as any other projection.
* :func:`shard_assign` — deterministic shard id + within-shard training
  order.  The within-shard position is a window over the shard key;
  shards are SIZED TO A TASK by construction (choose ``n_shards`` so a
  shard is a few hundred MB — the standard export shape), so the
  per-shard sort is a single bounded task, not a global sort.
* :func:`shard_manifest` — per-shard row/token counts plus an order
  fingerprint (md5 of the ordered doc ids), the integrity record a
  loader checks before training.
* :func:`vocab_topk` — corpus-level token frequency top-k (tokenizer
  vocabulary induction / corpus drift monitoring).  explode -> partial
  count agg -> TakeOrderedAndProject: one shuffle of (word, partial
  count) pairs, never of the corpus.

The reference engine stops at "rows in SQLite" (reference core/db.py,
spiders/*/analysis.py expose list/dump only); this module is part of the
SURVEY §2.12 training-data extension inventory.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spiders_for_all_spark.functions.text import token_count, words

_SCALE = 4294967296.0  # 2^32 — draw32 lives in [0, 2^32)


def _draw32(tag: str, id_col: str, seed: str) -> Column:
    """Uniform 32-bit integer from md5(seed:tag:id) — bit-identical on
    any engine (DuckDB twin: ('0x' || substr(md5(...), 1, 8))::BIGINT)."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed), F.lit(f":{tag}:"), F.col(id_col).cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")


def split_assign(
    df: DataFrame,
    weights: list[tuple[str, float]] | None = None,
    id_col: str = "doc_id",
    seed: str = "s0",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment.

    ``weights`` is an ORDERED list of (name, fraction) — order defines
    the interval layout [0, w1), [w1, w1+w2), ... so the same weights in
    the same order always carve the same docs.  Thresholds are integer
    (floor(cum * 2^32), computed driver-side from literals) and the doc's
    32-bit draw is compared against them in integer space — no float
    boundary, no RNG state, no partition-order dependence.  The last
    split absorbs the rounding remainder (its upper bound is +inf), so
    every row is assigned.  Expression-only: no shuffle, no join.
    """
    weights = weights or [("train", 0.90), ("val", 0.05), ("test", 0.05)]
    draw = _draw32("split", id_col, seed)
    cum = 0.0
    expr = None
    for name, frac in weights[:-1]:
        cum += frac
        thr = int(cum * _SCALE)
        branch = (
            F.when(draw < F.lit(thr), F.lit(name))
            if expr is None
            else expr.when(draw < F.lit(thr), F.lit(name))
        )
        expr = branch
    last = F.lit(weights[-1][0])
    assigned = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, assigned)


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Deterministic shard id + within-shard training order.

    shard = draw32 % n_shards (uniform, engine-portable); shard_pos =
    rank of a SECOND independent draw within the shard, so the intra-
    shard order is itself a seeded shuffle (loaders stream shards
    sequentially — the shuffle must already be baked in).  The position
    window sorts one shard per task: callers size ``n_shards`` so a
    shard is a task-sized unit (100–500 MB), which is also what the
    downstream one-file-per-shard writer needs — this is NOT a global
    sort and never funnels the corpus through one partition.
    """
    shard = (_draw32("shard", id_col, seed) % n_shards).cast("int")
    order = _draw32("ord", id_col, seed)
    out = df.withColumn("shard", shard).withColumn("_ord", order)
    w = Window.partitionBy("shard").orderBy("_ord", id_col)
    return out.withColumn("shard_pos", F.row_number().over(w)).drop("_ord")


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Per-shard integrity record: (shard, n_docs, n_tokens, order_fp).

    order_fp = md5 of the comma-joined doc ids IN TRAINING ORDER — the
    loader recomputes it over the shard file it read and refuses to
    train on a torn/reordered shard.  One groupBy(shard): counts are
    partial-aggregated; the id list is bounded by the task-sized-shard
    invariant (same bound the writer already relies on).
    """
    order = _draw32("ord", id_col, seed)
    shard = (_draw32("shard", id_col, seed) % n_shards).cast("int")
    # width guard: the per-row md5 draws + token_count dominate; a
    # single-file scan otherwise runs them on one task (see
    # functions/partitioning.py — no-op when already wide)
    from spiders_for_all_spark.functions.partitioning import ensure_width

    df = ensure_width(df, id_col)
    return (
        df.select(
            shard.alias("shard"),
            F.col(id_col).cast("string").alias("_id"),
            order.alias("_ord"),
            token_count(F.col(text_col)).alias("_tok"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("_ord", "_id"))
                        ),
                        lambda s: s["_id"],
                    ),
                )
            ).alias("order_fp"),
        )
    )


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> None:
    """Materialize the export: one parquet directory per shard, rows in
    training order inside each file.

    repartition BY THE PARTITION COLUMN before the dynamic-partition
    write (the repo-wide rule — otherwise every task writes a sliver of
    every shard and the export explodes into n_tasks × n_shards files);
    with it, each shard is one task -> one file per shard directory.
    """
    order = _draw32("ord", id_col, seed)
    sharded = shard_assign(df, n_shards, id_col, seed)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", order, id_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def vocab_topk(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus token frequency top-k: (word, n) — vocabulary induction /
    corpus drift monitoring.  explode(words) -> groupBy(word) count
    (map-side partial agg shrinks the shuffle to distinct-words ×
    partitions) -> orderBy(n desc, word).limit(k), which Spark executes
    as TakeOrderedAndProject — no global sort materializes.
    """
    return (
        df.select(F.explode(words(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(k)
    )
