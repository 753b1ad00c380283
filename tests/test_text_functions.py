from __future__ import annotations

from pyspark.sql import functions as F

from spiders_for_all_spark.functions import text as TX


def test_shingles_and_token_count(spark):
    df = spark.createDataFrame([("the quick brown fox jumps",), ("a b",)], "text string")
    out = df.select(
        TX.token_count(F.col("text")).alias("n"),
        TX.shingles(F.col("text"), 3).alias("sh"),
    ).collect()
    assert out[0]["n"] == 5
    assert out[0]["sh"] == ["the quick brown", "quick brown fox", "brown fox jumps"]
    assert out[1]["sh"] == []  # shorter than n -> no shingles


def test_bpe_token_count(spark):
    df = spark.createDataFrame([("hello, world! x2",)], "text string")
    # tokens: hello , world ! x 2
    assert df.select(TX.bpe_token_count(F.col("text")).alias("n")).collect()[0]["n"] == 6


def test_quality_and_ratios_deterministic(spark):
    df = spark.createDataFrame([("the cat and the hat!!!",)], "text string")
    row = df.select(
        TX.stopword_ratio(F.col("text")).alias("sw"),
        TX.punct_ratio(F.col("text")).alias("p"),
        TX.quality_score(F.col("text")).alias("q"),
    ).collect()[0]
    assert 0 <= row["sw"] <= 1 and 0 <= row["p"] <= 1 and 0 <= row["q"] <= 1
    # stopwords: the, and, the -> 3/5... words = the cat and the hat!!! (5 words)
    assert row["sw"] == 0.6


def test_lang_id_picks_profile(spark):
    df = spark.createDataFrame(
        [("the cat and the dog of a house",), ("el que la de los otros",)],
        "text string",
    )
    got = [r[0] for r in df.select(TX.lang_id(F.col("text"))).collect()]
    assert got == ["en", "es"]


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",)], "text string"
    )
    fps = df.select(TX.fingerprint(F.col("text")).alias("f")).distinct().collect()
    assert len(fps) == 1
