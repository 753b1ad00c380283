from __future__ import annotations

from pyspark.sql import functions as F

from spiders_for_all_spark.operators import cleaning as CL


def test_passage_dedup_first_occurrence_wins(spark):
    # p1 = 4-word passage "a b c d"; doc 1 and doc 3 share it; doc 1 wins
    # (min (doc_id, pos)); doc 3's later unique passage survives.
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "x y z w q r s t"),
            (3, "a b c d only here tail words"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["n_passages"], r["n_kept"], r["text_kept"])
        for r in CL.passage_dedup(corpus, n_words=4).collect()
    }
    assert out[1] == (2, 2, "a b c d e f g h")
    assert out[2] == (2, 2, "x y z w q r s t")
    assert out[3] == (2, 1, "only here tail words")


def test_passage_dedup_within_doc_repeat(spark):
    # the same passage repeated inside ONE document also dedups (pos order)
    corpus = spark.createDataFrame(
        [(7, "a b a b a b")], "doc_id bigint, text string"
    )
    row = CL.passage_dedup(corpus, n_words=2).collect()[0]
    assert (row["n_passages"], row["n_kept"], row["text_kept"]) == (
        3,
        1,
        "a b",
    )


def test_passage_array_tail_chunk(spark):
    df = spark.createDataFrame([("a b c d e",)], "text string")
    arr = df.select(
        CL.passage_array(F.col("text"), 2).alias("p")
    ).collect()[0]["p"]
    assert arr == ["a b", "c d", "e"]


def test_pii_scrub_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server at 192.168.001.5 port"),
            (3, "call 555-867-5309 twice: 555-867-5309"),
            (4, "clean text with no pii at all"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (
            r["n_emails"],
            r["n_ips"],
            r["n_phones"],
            r["text_scrubbed"],
        )
        for r in CL.scrub_documents(df).collect()
    }
    assert out[1] == (1, 0, 0, "mail <EMAIL> now")
    assert out[2] == (0, 1, 0, "server at <IP> port")
    assert out[3] == (0, 0, 2, "call <PHONE> twice: <PHONE>")
    assert out[4] == (0, 0, 0, "clean text with no pii at all")


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # 1 word, 1 bigram
            (2, "all words here are fully distinct tokens"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (
            r["dup_word_frac"],
            r["top_bigram_frac"],
            r["repetition_ok"],
        )
        for r in CL.repetition_signals(df).collect()
    }
    # doc 1: 6 words, 1 distinct -> dup 5/6; bigrams all "spam spam"
    assert out[1] == (round(1 - 1 / 6, 6), 1.0, False)
    assert out[2] == (0.0, round(1 / 6, 6), True)


def test_blocklist_filter_suffix_semantics(spark):
    frontier = spark.createDataFrame(
        [
            ("u1", "ads.tracker.net"),
            ("u2", "sub.ads.tracker.net"),
            ("u3", "tracker.net"),
            ("u4", "nottracker.net"),  # no dot boundary -> NOT blocked
            ("u5", "fine.example.org"),
        ],
        "url string, host string",
    )
    bl = spark.createDataFrame([("tracker.net",)], ["domain"])
    kept = {
        r["url"] for r in CL.blocklist_filter(frontier, bl).collect()
    }
    assert kept == {"u4", "u5"}
    blocked = {
        r["url"]
        for r in CL.blocklist_filter(
            frontier, bl, keep_blocked=True
        ).collect()
    }
    assert blocked == {"u1", "u2", "u3"}


def test_blocklist_filter_null_host_and_no_collision(spark):
    """NULL hosts can never match a blocklist entry: kept by the default
    drop-blocked pass, dropped by keep_blocked=True.  A frontier column
    named like the old internal aliases (_host) must not collide."""
    frontier = spark.createDataFrame(
        [
            ("u1", "ads.net", "x"),
            ("u2", None, "y"),
            ("u3", "fine.org", "z"),
        ],
        "url string, host string, _host string",
    )
    bl = spark.createDataFrame([("ads.net",)], ["domain"])
    kept = {r["url"] for r in CL.blocklist_filter(frontier, bl).collect()}
    assert kept == {"u2", "u3"}
    blocked = {
        r["url"]
        for r in CL.blocklist_filter(frontier, bl, keep_blocked=True).collect()
    }
    assert blocked == {"u1"}


def test_blocklist_filter_corpus_not_shuffled(spark):
    """Plan shape: with the default broadcast_blocked, the corpus leg joins
    via BroadcastHashJoin — no exchange on the frontier side."""
    frontier = spark.createDataFrame(
        [("u1", "a.net"), ("u2", "b.org")], "url string, host string"
    )
    bl = spark.createDataFrame([("a.net",)], ["domain"])
    plan = CL.blocklist_filter(frontier, bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_corpus_stats_buckets(spark):
    df = spark.createDataFrame(
        [
            ("en", "one"),  # 1 token -> bucket 0
            ("en", "a b c"),  # 3 tokens -> bucket 1
            ("en", "a b c d"),  # 4 tokens -> bucket 2 (exact power of two)
            ("de", "w x y z u v q r"),  # 8 tokens -> bucket 3
        ],
        "lang string, text string",
    )
    out = {
        (r["lang"], r["len_bucket"]): (
            r["n_docs"],
            r["total_tokens"],
            r["min_tok"],
            r["max_tok"],
        )
        for r in CL.corpus_stats(df).collect()
    }
    assert out[("en", 0)] == (1, 1, 1, 1)
    assert out[("en", 1)] == (1, 3, 3, 3)
    assert out[("en", 2)] == (1, 4, 4, 4)
    assert out[("de", 3)] == (1, 8, 8, 8)


def test_curate_corpus_with_cleaning_stages(spark):
    """curate_corpus composes the cleaning stages: blocklist drops a host,
    repetition filter drops spam, passage dedup rewrites text, pii scrub
    redacts — and the surviving docs keep their ids."""
    from spiders_for_all_spark.operators.curation import curate_corpus

    docs = spark.createDataFrame(
        [
            ("1", "good.org", "alpha beta gamma delta mail me a@b.io ok"),
            ("2", "spam.net", "normal words in here totally fine text"),
            ("3", "good.org", "spam spam spam spam spam spam spam spam"),
            ("4", "good.org", "alpha beta gamma delta trailing unique part"),
        ],
        "doc_id string, host string, text string",
    )
    bl = spark.createDataFrame([("spam.net",)], ["domain"])
    out = curate_corpus(
        docs,
        blocklist=bl,
        repetition_filter=True,
        passage_n=4,
        scrub_pii=True,
    )
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    # doc 2 blocked by domain, doc 3 dropped as repetitious
    assert set(rows) == {"1", "4"}
    # doc 1 kept the shared passage (first occurrence) + its scrubbed email
    assert "<EMAIL>" in rows["1"] and "a@b.io" not in rows["1"]
    # doc 4 lost the passage doc 1 already owns
    assert "alpha" not in rows["4"] and "trailing unique part" in rows["4"]


def test_pii_counts_reconcile_with_scrubbed_tags(spark):
    """Counts are sequential (each pattern counted on the text the scrub
    stage actually sees), so per-type counts equal the number of typed
    tags in text_scrubbed — an IP embedded in an email address is not
    double-counted."""
    from spiders_for_all_spark.operators.cleaning import scrub_documents

    df = spark.createDataFrame(
        [
            ("d1", "mail john@1.2.3.4.example.com now"),  # email wraps an IP-looking run
            ("d2", "host 10.0.0.1 and phone 555-123-4567"),
            ("d3", "clean text"),
        ],
        "doc_id string, text string",
    )
    for r in scrub_documents(df).collect():
        t = r["text_scrubbed"]
        assert r["n_emails"] == t.count("<EMAIL>")
        assert r["n_ips"] == t.count("<IP>")
        assert r["n_phones"] == t.count("<PHONE>")


# ---------------------------------------------------------------------------
# sliding-window exact-substring dedup (Lee-et-al-style, any word offset)


def test_substring_spans_unaligned_duplicate(spark):
    # the duplicated 4-gram "c d e f" sits at word offset 2 in doc 1 and
    # offset 0 in doc 2 — a passage GRID would miss it; the sliding pass
    # must not.  Keeper = min (id, pos) = doc "1" pos 2, so only doc 2's
    # occurrence becomes a removal span.
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "c d e f q r s t"),
        ],
        "doc_id bigint, text string",
    )
    spans = CL.substring_spans(corpus, k=4).collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"], r["n_grams"]) for r in spans] == [
        ("2", 0, 3, 1)
    ]


def test_substring_spans_merge_overlapping_islands(spark):
    # doc 2 repeats doc 1's words 0..5 → three overlapping dup 4-grams at
    # pos 0,1,2 merge into ONE maximal span [0, 5]
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f x1 x2 x3"),
            (2, "a b c d e f y1 y2 y3"),
        ],
        "doc_id bigint, text string",
    )
    spans = CL.substring_spans(corpus, k=4).collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"], r["n_grams"]) for r in spans] == [
        ("2", 0, 5, 3)
    ]


def test_substring_spans_disjoint_islands_stay_separate(spark):
    # two duplicated regions separated by unique words → two spans
    corpus = spark.createDataFrame(
        [
            (1, "a b c d u1 u2 u3 p q r s"),
            (2, "a b c d v1 v2 v3 p q r s"),
        ],
        "doc_id bigint, text string",
    )
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"]) for r in CL.substring_spans(corpus, k=4).collect()
    )
    assert spans == [("2", 0, 3), ("2", 7, 10)]


def test_substring_spans_short_docs_produce_no_grams(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id bigint, text string"
    )
    assert CL.substring_spans(corpus, k=4).count() == 0


def test_scrub_substring_dups_removes_span_words_only(spark):
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "c d e f q r s t"),
            (3, "totally unique words here only once ever seen"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["text_kept"])
        for r in CL.scrub_substring_dups(corpus, k=4).collect()
    }
    assert out["1"] == (8, 0, "a b c d e f g h")  # keeper copy untouched
    assert out["2"] == (8, 4, "q r s t")
    assert out["3"] == (8, 0, "totally unique words here only once ever seen")


def test_scrub_substring_dups_whole_doc_duplicate(spark):
    # doc 2 is a byte-identical copy → fully covered, empty text_kept
    corpus = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["text_kept"])
        for r in CL.scrub_substring_dups(corpus, k=4).collect()
    }
    assert out["1"] == (6, 0, "a b c d e f")
    assert out["2"] == (6, 6, "")


# ---------------------------------------------------------------------------
# bigram-LM perplexity (CCNet-style quality signal)


def test_lm_perplexity_hand_computed(spark):
    # corpus bigram counts: (a,b)=2, (b,a)=1, (a,c)=1; starts: a=3, b=1;
    # bigram-start vocab V = {a, b} = 2.  Laplace: p = (c12+1)/(c1+V).
    # doc 1 "a b a b": bigrams (a,b),(b,a),(a,b)
    #   bits = mean(-log2(3/5), -log2(2/3), -log2(3/5))
    # doc 2 "a c": bits = -log2(2/5)
    corpus = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id bigint, text string"
    )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["bits_per_token"])
        for r in CL.lm_perplexity(corpus).collect()
    }
    import math

    ab = -math.log2(3 / 5)
    ba = -math.log2(2 / 3)
    assert out["1"] == (3, round((2 * ab + ba) / 3, 4))
    assert out["2"] == (1, round(-math.log2(2 / 5), 4))


def test_lm_perplexity_repetitive_doc_scores_lower(spark):
    # predictable boilerplate under the corpus LM scores fewer bits/token
    # than a doc of corpus-rare transitions
    corpus = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "spam spam spam spam spam spam spam spam"),
            (3, "spam unusual spam weird spam strange"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r["bits_per_token"] for r in CL.lm_perplexity(corpus).collect()
    }
    assert out["1"] < out["3"]


def test_lm_perplexity_single_word_docs_have_no_bigrams(spark):
    corpus = spark.createDataFrame(
        [(1, "lonely"), (2, "a b")], "doc_id bigint, text string"
    )
    rows = CL.lm_perplexity(corpus).collect()
    assert [r["doc_id"] for r in rows] == ["2"]


def test_curate_corpus_substring_and_lm_stages(spark):
    """curate_corpus's new stages compose: the sliding substring scrub
    removes an unaligned duplicated region (keeper untouched), a
    whole-doc duplicate scrubs to empty and drops, and the LM band drops
    the pure-boilerplate doc."""
    from spiders_for_all_spark.operators.curation import curate_corpus

    docs = spark.createDataFrame(
        [
            ("1", "alpha beta gamma delta echo foxtrot golf hotel"),
            ("2", "pad1 alpha beta gamma delta tail1 tail2 tail3"),
            ("3", "alpha beta gamma delta echo foxtrot golf hotel"),
            ("4", "spam spam spam spam spam spam spam spam"),
            ("5", "india juliet kilo lima mike november oscar papa"),
        ],
        "doc_id string, text string",
    )
    out = curate_corpus(docs, substring_k=4)
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    # near-dedup drops doc 3 (exact copy of 1 -> same minhash cluster);
    # doc 2 loses the duplicated 'alpha beta gamma delta' run but keeps
    # its unique pad/tail words; docs 1/4/5 survive intact.
    assert "1" in rows and "5" in rows and "3" not in rows
    assert "alpha" not in rows["2"]
    assert "pad1" in rows["2"] and "tail3" in rows["2"]


def test_curate_corpus_lm_band_drops_rare_noise(spark):
    from spiders_for_all_spark.operators.curation import curate_corpus

    docs = spark.createDataFrame(
        [
            ("1", "the cat sat on the mat near the door"),
            ("2", "the cat sat on the mat near the door"),
            ("3", "the dog ran up my very old oak tree"),
        ],
        "doc_id string, text string",
    )
    # docs 1/2 are mutually predictable; doc 3's transitions from shared
    # words ('the dog' vs 'the cat') are corpus-rare -> higher bits
    from spiders_for_all_spark.operators.cleaning import lm_perplexity

    bits = {
        r["doc_id"]: r["bits_per_token"]
        for r in lm_perplexity(docs).collect()
    }
    assert bits["3"] > bits["1"]
    out = curate_corpus(docs, max_lm_bits=(bits["1"] + bits["3"]) / 2)
    assert "3" not in {r["doc_id"] for r in out.collect()}


def test_substring_and_lm_scratch_spill_identical(spark, tmp_path):
    """With scratch_dir set, the exploded gram/bigram stream materializes
    once to parquet (so the corpus text is shingled exactly once at
    scale) and results are bit-identical to the no-spill plans."""
    import os

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "c d e f q r s t"),
            (3, "a b a b a b a b"),
        ],
        "doc_id bigint, text string",
    )
    sd = str(tmp_path / "scratch")

    def key_spans(df):
        return sorted(tuple(r) for r in df.collect())

    def spill_dirs(prefix):
        return [d for d in os.listdir(sd) if d.startswith(prefix)]

    assert key_spans(CL.substring_spans(corpus, k=4, scratch_dir=sd)) == key_spans(
        CL.substring_spans(corpus, k=4)
    )
    assert len(spill_dirs("substring-occ-k4-")) == 1
    assert key_spans(CL.scrub_substring_dups(corpus, k=4, scratch_dir=sd)) == key_spans(
        CL.scrub_substring_dups(corpus, k=4)
    )
    assert key_spans(CL.lm_perplexity(corpus, scratch_dir=sd)) == key_spans(
        CL.lm_perplexity(corpus)
    )
    assert len(spill_dirs("lm-bigrams-")) == 1
    # two ops of the same kind sharing one scratch_dir spill to DISTINCT
    # subdirs — a second k=4 pass must not clobber the first's parquet
    # before its lazy read-back executes (ADVICE r4)
    before = len(spill_dirs("substring-occ-k4-"))
    lazy1 = CL.substring_spans(corpus, k=4, scratch_dir=sd)
    lazy2 = CL.substring_spans(corpus.filter("doc_id <= 2"), k=4, scratch_dir=sd)
    assert len(spill_dirs("substring-occ-k4-")) == before + 2
    assert key_spans(lazy1) == key_spans(CL.substring_spans(corpus, k=4))
    assert key_spans(lazy2) == key_spans(
        CL.substring_spans(corpus.filter("doc_id <= 2"), k=4)
    )


def test_gopher_signals_rules_and_metrics(spark):
    from spiders_for_all_spark.operators.cleaning import gopher_signals

    filler = " ".join(
        "the data and model have text with tokens of that kind".split()
    )
    good = " ".join([filler] * 6)  # 66 words, stopword-rich, all alpha
    docs = [
        ("good", good),
        ("short", "the and of that have with be to"),  # 8 words < 50
        ("bullets", "\n".join("• " + filler for _ in range(8))),
        ("symbols", good + " " + "#" * 40),
        ("numbers", " ".join(["123"] * 60) + " the and"),
        ("ellipsis", "\n".join(filler + " ..." for _ in range(8))),
        ("nostop", " ".join(["alpha beta gamma delta epsilon"] * 12)),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = {r["doc_id"]: r for r in gopher_signals(df).collect()}

    assert out["good"]["gopher_keep"] is True
    assert out["good"]["n_words"] == 66
    assert out["good"]["stop_hits"] >= 5
    assert out["good"]["alpha_word_frac"] == 1.0
    assert out["good"]["bullet_line_frac"] == 0.0

    assert out["short"]["gopher_keep"] is False  # word-count floor

    assert out["bullets"]["bullet_line_frac"] == 1.0
    assert out["bullets"]["gopher_keep"] is False

    assert out["symbols"]["symbol_word_ratio"] > 0.1
    assert out["symbols"]["gopher_keep"] is False

    assert out["numbers"]["alpha_word_frac"] < 0.8
    assert out["numbers"]["gopher_keep"] is False

    assert out["ellipsis"]["ellipsis_line_frac"] == 1.0
    assert out["ellipsis"]["gopher_keep"] is False

    assert out["nostop"]["stop_hits"] == 0
    assert out["nostop"]["gopher_keep"] is False


def test_gopher_signals_thresholds_parameterized(spark):
    from spiders_for_all_spark.operators.cleaning import gopher_signals

    df = spark.createDataFrame(
        [("d", "the model and data have text with that be of")],
        "doc_id string, text string",
    )
    strict = gopher_signals(df).first()
    relaxed = gopher_signals(df, min_words=5).first()
    assert strict["gopher_keep"] is False  # 10 words < default 50
    assert relaxed["gopher_keep"] is True


def test_gopher_keep_column_matches_signals_verdict(spark):
    """The single-Column rule conjunction (gopher_keep) must agree with
    gopher_signals' emitted verdict on every crafted doc."""
    from spiders_for_all_spark.operators.cleaning import (
        gopher_keep,
        gopher_signals,
    )

    filler = " ".join(
        "the data and model have text with tokens of that kind".split()
    )
    docs = [
        ("good", " ".join([filler] * 6)),
        ("short", "the and of"),
        ("bullets", "\n".join("• " + filler for _ in range(8))),
        ("numbers", " ".join(["123"] * 60) + " the and"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    verdicts = {r["doc_id"]: r["gopher_keep"]
                for r in gopher_signals(df).collect()}
    kept = {r["doc_id"] for r in df.filter(
        gopher_keep(F.col("text"))).collect()}
    assert kept == {k for k, v in verdicts.items() if v} == {"good"}


def test_winnow_fingerprints_coverage_and_shared_run(spark):
    """Winnowing invariants: consecutive selected positions within a doc
    are at most w apart (full coverage), and two docs sharing a
    >= w+k-1-word run share at least one fingerprint hash; a doc shorter
    than w+k-1 words yields no fingerprints."""
    from spiders_for_all_spark.operators.cleaning import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
    docs = [
        ("a", shared + " unique tail words for doc a here now"),
        ("b", "totally different head words lead in " + shared),
        ("tiny", "too short for any window"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = winnow_fingerprints(df, k=5, w=4).collect()
    by_doc: dict[str, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    assert "tiny" not in by_doc
    for d in ("a", "b"):
        sel = sorted(p for p, _ in by_doc[d])
        assert all(b - a <= 4 for a, b in zip(sel, sel[1:]))
    fps_a = {fp for _, fp in by_doc["a"]}
    fps_b = {fp for _, fp in by_doc["b"]}
    assert fps_a & fps_b, "shared 8-word run must share a fingerprint"


def test_winnow_fingerprints_deterministic_positions(spark):
    """Same text -> identical (pos, fp) set on re-run; selected position
    always lies inside its window (pos in [rpos-w+1, rpos])."""
    from spiders_for_all_spark.operators.cleaning import winnow_fingerprints

    df = spark.createDataFrame(
        [("d", " ".join(f"w{i % 11}" for i in range(40)))],
        "doc_id string, text string",
    )
    a = sorted((r["pos"], r["fp"]) for r in winnow_fingerprints(df).collect())
    b = sorted((r["pos"], r["fp"]) for r in winnow_fingerprints(df).collect())
    assert a == b and len(a) > 0
    n_grams = 40 - 5 + 1
    assert all(0 <= p <= n_grams - 1 for p, _ in a)


def test_winnow_candidate_pairs_star_reduced(spark):
    """A phrase planted in n docs emits n-1 star edges per bucket (not
    n²/2), the sharing docs connect through the min-id representative,
    and unrelated docs stay edge-free."""
    from spiders_for_all_spark.operators.cleaning import (
        winnow_candidate_pairs,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [(f"c{i:02d}", shared + f" filler tail {i} pad pad pad")
            for i in range(12)]
    docs.append(("zz", "entirely unrelated words with no overlap at all"))
    df = spark.createDataFrame(docs, "doc_id string, text string")
    edges = [(r["a"], r["b"]) for r in winnow_candidate_pairs(df).collect()]
    assert all(a < b for a, b in edges)
    assert not any("zz" in e for e in edges)
    # star shape: every sharing doc reachable from c00 via one hop
    touched = {x for e in edges for x in e}
    assert {f"c{i:02d}" for i in range(12)} <= touched
    # O(n) bound: far fewer edges than the 12*11/2 = 66 all-pairs form
    assert len(edges) <= 3 * 11
