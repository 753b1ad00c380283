from __future__ import annotations

from pyspark.sql import functions as F

from spiders_for_all_spark.operators.packing import (
    pack_manifest,
    pack_sequences,
)


def _corpus(spark, n=60):
    rows = [(i, " ".join(f"w{i}x{k}" for k in range(1 + i % 17))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pack_offsets_are_a_permutation_prefix_sum(spark):
    """global_offsets must tile the token stream exactly: sorted by
    offset, each doc starts where the previous ended."""
    packed = pack_sequences(_corpus(spark), seq_len=64).collect()
    rows = sorted(packed, key=lambda r: r["global_offset"])
    expect = 0
    for r in rows:
        assert r["global_offset"] == expect
        expect += r["n_tok"]
    total = expect
    assert rows[-1]["seq_last"] == (total - 1) // 64


def test_pack_deterministic_and_seeded(spark):
    a = {
        r["doc_id"]: r["global_offset"]
        for r in pack_sequences(_corpus(spark), 64).collect()
    }
    b = {
        r["doc_id"]: r["global_offset"]
        for r in pack_sequences(_corpus(spark), 64).collect()
    }
    assert a == b
    c = {
        r["doc_id"]: r["global_offset"]
        for r in pack_sequences(_corpus(spark), 64, seed="other").collect()
    }
    assert a != c  # different seed -> different packing order


def test_pack_manifest_conserves_tokens(spark):
    seq_len = 64
    packed = pack_sequences(_corpus(spark), seq_len)
    man = pack_manifest(packed, seq_len)
    # per-document: slices across sequences sum to the doc's tokens
    per_doc = {
        r["doc_id"]: r["s"]
        for r in man.groupBy("doc_id")
        .agg(F.sum("n_tok_in_seq").alias("s"))
        .collect()
    }
    toks = {r["doc_id"]: r["n_tok"] for r in packed.collect()}
    assert per_doc == toks
    # per-sequence: every sequence except the last is exactly full
    per_seq = sorted(
        (r["seq_id"], r["s"])
        for r in man.groupBy("seq_id")
        .agg(F.sum("n_tok_in_seq").alias("s"))
        .collect()
    )
    *full, last = per_seq
    assert all(s == seq_len for _, s in full)
    assert 0 < last[1] <= seq_len
    # sequence ids are dense 0..N
    assert [sid for sid, _ in per_seq] == list(range(len(per_seq)))


def test_pack_no_global_sort_in_plan(spark):
    """Scale shape: the cumsum must NOT run through a single-partition
    global Sort — only bucket-partitioned window sorts + one broadcast."""
    plan = (
        pack_sequences(_corpus(spark), 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    # a global window sort shows as 'Sort [... ASC ...], false, 0' with a
    # SinglePartition exchange feeding it; assert no SinglePartition
    # exchange on the corpus path (the 256-row bases window is driver-tiny
    # but rides the broadcast side)
    corpus_side = plan.split("BroadcastExchange")[0]
    assert "SinglePartition" not in corpus_side
