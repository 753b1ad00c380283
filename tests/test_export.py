"""Corpus export operators (operators/export.py): deterministic split /
shard / training order, the shard writer, and vocab top-k."""
from __future__ import annotations

import glob

from pyspark.sql import functions as F

from spiders_for_all_spark.operators import export as E


def _corpus(spark, n=400):
    return spark.range(n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("some text body number "), F.col("id")).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def test_split_assign_total_and_deterministic(spark):
    df = _corpus(spark)
    out = E.split_assign(df, [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 400  # every row assigned
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # deterministic: same assignment under a different partition layout
    again = E.split_assign(df.repartition(13), [("train", 0.8), ("val", 0.1),
                                                ("test", 0.1)])
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in again.collect()}
    assert a == b


def test_split_assign_is_expression_only(spark):
    plan = (
        E.split_assign(_corpus(spark))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_shard_assign_positions_contiguous_and_seed_sensitive(spark):
    df = _corpus(spark, 200)
    out = E.shard_assign(df, n_shards=4).collect()
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # a different seed reshuffles the intra-shard order
    other = E.shard_assign(df, n_shards=4, seed="s1").collect()
    assert {(r["doc_id"], r["shard"], r["shard_pos"]) for r in out} != {
        (r["doc_id"], r["shard"], r["shard_pos"]) for r in other
    }


def test_shard_manifest_matches_assignment(spark):
    df = _corpus(spark, 120)
    man = {r["shard"]: r for r in E.shard_manifest(df, n_shards=4).collect()}
    assigned = E.shard_assign(df, n_shards=4).collect()
    import hashlib

    by_shard: dict[int, list[tuple[int, str]]] = {}
    for r in assigned:
        by_shard.setdefault(r["shard"], []).append((r["shard_pos"], r["doc_id"]))
    for shard, rows in by_shard.items():
        ids = [d for _, d in sorted(rows)]
        fp = hashlib.md5(",".join(ids).encode()).hexdigest()
        assert man[shard]["n_docs"] == len(ids)
        assert man[shard]["order_fp"] == fp  # manifest == real training order


def test_write_shards_one_file_per_shard_in_training_order(spark, tmp_path):
    df = _corpus(spark, 150)
    path = str(tmp_path / "export")
    E.write_shards(df, path, n_shards=3)
    for shard in range(3):
        files = glob.glob(f"{path}/shard={shard}/*.parquet")
        assert len(files) == 1, f"shard {shard}: {len(files)} files"
        rows = spark.read.parquet(files[0]).collect()
        pos = [r["shard_pos"] for r in rows]
        assert pos == sorted(pos) == list(range(1, len(rows) + 1))
    # nothing lost
    assert spark.read.parquet(path).count() == 150


def test_vocab_topk(spark):
    df = spark.createDataFrame(
        [("a", "apple banana apple"), ("b", "apple cherry"), ("c", None)],
        "doc_id string, text string",
    )
    top = E.vocab_topk(df, k=2).collect()
    assert [(r["word"], r["n"]) for r in top] == [("apple", 3), ("banana", 1)]
