from __future__ import annotations

from pyspark.sql import functions as F

from spiders_for_all_spark.operators import curation as CU


def test_decontaminate_flags_eval_overlap(spark):
    eval_docs = spark.createDataFrame(
        [("e1", "alpha beta gamma delta")], "doc_id string, text string"
    )
    corpus = spark.createDataFrame(
        [
            ("c1", "zzz alpha beta gamma delta yyy"),  # shares both eval 3-grams
            ("c2", "alpha beta something else entirely"),  # no full 3-gram
            ("c3", "totally clean document here"),
            ("c4", "xx"),  # shorter than one shingle
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in CU.decontaminate(corpus, eval_docs, shingle_n=3).collect()
    }
    assert out == {
        "c1": (2, True),
        "c2": (0, False),
        "c3": (0, False),
        "c4": (0, False),
    }


def test_decontaminate_broadcast_off_same_answer(spark):
    eval_docs = spark.createDataFrame(
        [("e1", "alpha beta gamma delta")], "doc_id string, text string"
    )
    corpus = spark.createDataFrame(
        [("c1", "zzz alpha beta gamma yyy"), ("c3", "totally clean doc here")],
        "doc_id string, text string",
    )
    a = CU.decontaminate(corpus, eval_docs, shingle_n=3).collect()
    b = CU.decontaminate(
        corpus, eval_docs, shingle_n=3, broadcast_eval=False
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_mixture_weights_reshapes_to_target(spark):
    # en: 2 docs x 3 tokens = 6; zh: 1 doc x 2 tokens = 2 -> shares .75/.25
    docs = spark.createDataFrame(
        [
            ("d1", "one two three", "en"),
            ("d2", "four five six", "en"),
            ("d3", "qi ba", "zh"),
        ],
        "doc_id string, text string, lang string",
    )
    out = {
        r["lang"]: r
        for r in CU.mixture_weights(docs, {"en": 0.5, "zh": 0.5}).collect()
    }
    assert out["en"]["tokens"] == 6 and out["en"]["n_docs"] == 2
    assert abs(out["en"]["token_share"] - 0.75) < 1e-12
    assert abs(out["en"]["weight"] - 0.5 / 0.75) < 1e-12
    assert abs(out["zh"]["token_share"] - 0.25) < 1e-12
    assert abs(out["zh"]["weight"] - 2.0) < 1e-12
    # a group absent from the target gets weight 0 (dropped at sampling)
    out2 = {
        r["lang"]: r["weight"]
        for r in CU.mixture_weights(docs, {"en": 1.0}).collect()
    }
    assert out2["zh"] == 0.0


def test_stratified_sample_exact_k_and_deterministic(spark):
    rows = [(f"d{i}", "text", "en" if i % 2 else "zh") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id string, text string, lang string")
    s1 = CU.stratified_sample(docs, 3).collect()
    s2 = CU.stratified_sample(docs, 3).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))  # seeded => stable
    per_lang = {}
    for r in s1:
        per_lang.setdefault(r["lang"], []).append(r["rn"])
    assert all(sorted(v) == [1, 2, 3] for v in per_lang.values())
    # k beyond stratum size keeps the whole stratum
    small = docs.filter(F.col("lang") == "zh").limit(2)
    assert CU.stratified_sample(small, 99).count() == 2
    # a different seed draws a different sample
    s3 = CU.stratified_sample(docs, 3, seed="other").collect()
    assert {r["doc_id"] for r in s3} != {r["doc_id"] for r in s1}


def test_mixture_resample_downsamples_to_target(spark):
    """Overrepresented group shrinks toward the target share; groups at or
    under target keep every document (weight >= 1 -> threshold 2^32)."""
    rows = [(f"a{i}", "en", "common words " * 5) for i in range(400)]
    rows += [(f"b{i}", "de", "andere worte " * 5) for i in range(100)]
    corpus = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    out = CU.mixture_resample(corpus, {"en": 0.5, "de": 0.5})
    kept = {r["lang"]: 0 for r in out.collect()}
    for r in out.collect():
        kept[r["lang"]] += 1
    # de is underrepresented (20% actual vs 50% target): keeps all 100
    assert kept["de"] == 100
    # en (80% actual vs 50% target, weight 0.625): binomial(400, .625)
    assert 200 < kept["en"] < 300
    # deterministic across runs
    again = sorted(r["doc_id"] for r in CU.mixture_resample(
        corpus, {"en": 0.5, "de": 0.5}).collect())
    assert again == sorted(r["doc_id"] for r in out.collect())


def test_mixture_resample_null_text_group_dropped(spark):
    """A group whose texts are all NULL has a null weight (0/0 share);
    least() skips nulls, so without the coalesce-to-0 the whole group
    would silently be kept with p=1.0.  Rule: not-in-target / untokenizable
    groups are DROPPED."""
    from spiders_for_all_spark.operators.curation import mixture_resample

    df = spark.createDataFrame(
        [("a", "some english words here", "en"), ("b", None, "xx"),
         ("c", None, "xx")],
        "doc_id string, text string, lang string",
    )
    kept = mixture_resample(df, {"en": 1.0}).select("doc_id").collect()
    assert {r["doc_id"] for r in kept} == {"a"}


def test_dsir_scores_rank_target_like_docs_higher(spark):
    from spiders_for_all_spark.operators.curation import dsir_scores

    target = spark.createDataFrame(
        [
            ("t1", "spark shuffle partitions spill to disk"),
            ("t2", "spark shuffle exchange hash partitions"),
            ("t3", "broadcast join avoids the shuffle exchange"),
        ],
        "doc_id string, text string",
    )
    raw = spark.createDataFrame(
        [
            ("r1", "spark shuffle partitions spill under memory pressure"),
            ("r2", "quick brown fox jumps over the lazy sleeping dog"),
            ("r3", "x"),  # <2 words: no bigrams, no score row
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in dsir_scores(raw, target).collect()}
    assert set(out) == {"r1", "r2"}
    assert out["r1"]["logratio_per_token"] > out["r2"]["logratio_per_token"]
    assert out["r1"]["n_bigrams"] == 6


def test_dsir_scores_scratch_spill_identical(spark, tmp_path):
    from spiders_for_all_spark.operators.curation import dsir_scores

    target = spark.createDataFrame(
        [("t1", "alpha beta gamma delta alpha beta")],
        "doc_id string, text string",
    )
    raw = spark.createDataFrame(
        [("r1", "alpha beta gamma"), ("r2", "epsilon zeta eta")],
        "doc_id string, text string",
    )
    a = sorted(map(tuple, dsir_scores(raw, target).collect()))
    b = sorted(map(tuple, dsir_scores(
        raw, target, scratch_dir=str(tmp_path / "dsir")
    ).collect()))
    assert a == b
