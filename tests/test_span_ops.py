from __future__ import annotations

from pyspark.sql import functions as F

from spiders_for_all_spark.operators import documents as D

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (
                "d1",
                [
                    ("text", "hello world", None, 0),
                    ("image", None, "m://d1/0", 1),
                    ("text", "tail part", None, 2),
                ],
            ),
            (
                "d2",
                [
                    ("video", None, "m://d2/0", 0),
                    ("text", "only text after media", None, 1),
                ],
            ),
            ("d3", [("text", "plain", None, 0)]),
            ("d4", [("image", None, "m://d4/0", 0)]),
        ],
        SPAN_SCHEMA,
    )


def test_strip_media_renumbers_offsets(spark):
    out = {
        r["doc_id"]: [(s["kind"], s["text"], s["offset"]) for s in r["spans"]]
        for r in D.strip_media(_docs(spark)).collect()
    }
    assert out["d1"] == [("text", "hello world", 0), ("text", "tail part", 1)]
    assert out["d2"] == [("text", "only text after media", 0)]
    assert out["d3"] == [("text", "plain", 0)]
    assert out["d4"] == []


def test_media_manifest(spark):
    rows = {
        (r["doc_id"], r["offset"], r["kind"], r["media_ref"])
        for r in D.media_manifest(_docs(spark)).collect()
    }
    assert rows == {
        ("d1", 1, "image", "m://d1/0"),
        ("d2", 0, "video", "m://d2/0"),
        ("d4", 0, "image", "m://d4/0"),
    }


def test_span_stats_interleaving(spark):
    out = {
        r["doc_id"]: (
            r["n_text"],
            r["n_media"],
            r["text_chars"],
            r["interleaved"],
        )
        for r in D.span_stats(_docs(spark)).collect()
    }
    # d1: media strictly between two text spans -> interleaved
    assert out["d1"] == (2, 1, len("hello world") + len("tail part"), True)
    # d2: media BEFORE the only text span -> not interleaved
    assert out["d2"] == (1, 1, len("only text after media"), False)
    assert out["d3"] == (1, 0, len("plain"), False)
    assert out["d4"] == (0, 1, 0, False)


def test_filter_spans_no_shuffle(spark):
    """The rewrite path is a pure projection: no Exchange in the plan."""
    plan = (
        D.strip_media(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_docs_from_parsed_collision_keeps_fullest_copy(spark):
    """doc_id re-emitted within a round: the copy with MORE spans wins,
    even when the sparser copy compares lexicographically larger
    (plain F.max over the array would pick the 1-span 'zzz' copy)."""
    parsed = spark.createDataFrame(
        [
            ("u1", [("dX", [("text", "zzz late copy", None, 0)])]),
            (
                "u2",
                [
                    (
                        "dX",
                        [
                            ("text", "aaa first", None, 0),
                            ("image", None, "m://dX/0", 1),
                            ("text", "aaa tail", None, 2),
                        ],
                    )
                ],
            ),
        ],
        "url string, docs array<struct<doc_id:string,"
        "spans:array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>>>",
    )
    out = D.docs_from_parsed(parsed).collect()
    assert len(out) == 1
    spans = out[0]["spans"]
    assert len(spans) == 3
    assert spans[0]["text"] == "aaa first"
