"""Corpus-cleaning operators: passage-level exact-substring dedup, PII
scrubbing, repetition-based quality signals, domain-blocklist filtering,
corpus shape statistics.

First-class training-data-pipeline components (the reference stores raw
scraped rows and never cleans them — core/spider.py:196-236); these are
the cleaning stages a 100 TB pre-training corpus runs between crawl and
freeze.  Design constraints at scale:

* Passage dedup (the Lee-et-al-style "exact substring" pass, done at
  passage granularity) shuffles only (hash, id, pos) triples — never the
  passage text twice: the keeper election is a partial-aggregatable
  ``min(struct)`` per passage hash (map-side combine absorbs the
  boilerplate-passage skew that would hot-spot a window's sort), and the
  reassembly groupBy rides the same doc-keyed shuffle every per-doc agg
  uses.
* PII scrubbing and repetition signals are pure Catalyst expressions —
  zero shuffles, zero Python; they run inside whole-stage codegen at
  scan speed.
* Blocklist filtering broadcasts the blocklist (UT1-class lists are a
  few million short strings — comfortably under the broadcast limit) and
  resolves matches with one map-side hash join over exploded host
  suffixes plus one partial-agg bool_or; the corpus is never shuffled on
  a non-key column.  If the blocklist outgrows broadcast, swap the hash
  join for a bloom-filter map-side prefilter (operators/dedup.py) and
  exact-confirm the survivors.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spiders_for_all_spark.functions.partitioning import ensure_width
from spiders_for_all_spark.functions.text import (
    let,
    normalize_text,
    shingles,
    token_count,
    words,
)

# PII patterns written in the Java-regex / RE2 common dialect (no
# backreferences, no lookaround) so the DuckDB oracle runs the very same
# strings.
# Gopher-rule repetition thresholds — the single source both
# repetition_signals and curation.curate_corpus default to.
MAX_DUP_WORD_FRAC = 0.8
MAX_TOP_BIGRAM_FRAC = 0.18

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


# ---------------------------------------------------------------------------
# Passage-level exact-substring dedup


def passage_array(text: Column, n_words: int = 12) -> Column:
    """Split a document into fixed ``n_words``-word passages (array<string>).

    The deterministic passage grid makes "exact substring" dedup a pure
    equality problem: two documents sharing a duplicated region produce
    byte-identical passage strings, which dedup by hash without any
    alignment search.
    """

    def build(w: Column) -> Column:
        n_chunks = F.ceil(F.size(w) / F.lit(float(n_words))).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(w, (i * n_words + 1).cast("int"), n_words)
            ),
        )

    # let-bind the words array: slice(w) inside the lambda would otherwise
    # re-run the whole normalize+split chain once per chunk (see text.let)
    return let(words(text), build)


def passage_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_words: int = 12,
) -> DataFrame:
    """Corpus-wide passage-level exact dedup: keep each distinct passage's
    first occurrence (min (id, pos) order), drop every later copy, and
    reassemble the surviving text per document.

    Returns (id, n_passages, n_kept, text_kept).  The keeper election is
    ``min(struct(id, pos))`` over a window keyed by passage hash: every
    occurrence must reach the flagging stage anyway (the old
    stats-agg+join shuffled all of them by hash too, and re-ran the
    passage build + md5 once per join side), so the single-pass window
    costs the same exchange with half the compute.  The unbounded
    min/count frames evaluate once per hash partition (linear, not
    per-row), so a boilerplate passage repeated a billion times is O(n)
    in one task — identical to what its join-side occurrence stream
    already was.
    """
    # width guard: the passage build + md5 runs twice (keeper agg + join
    # side) and would otherwise run on ONE task off a single-file scan
    paras = ensure_width(df, id_col).select(
        F.col(id_col).alias("_id"),
        F.posexplode(passage_array(F.col(text_col), n_words)).alias(
            "pos", "passage"
        ),
    ).withColumn("h", F.md5("passage"))
    # r06: keeper election via ONE window pass instead of a keepers
    # aggregation joined back to the passage stream (the join re-ran the
    # passage build + md5 for each side; same rows, one exchange)
    flagged = paras.withColumn(
        "k", F.min(F.struct("_id", "pos")).over(Window.partitionBy("h"))
    ).withColumn(
        "kept",
        (F.col("_id") == F.col("k._id")) & (F.col("pos") == F.col("k.pos")),
    )
    return flagged.groupBy("_id").agg(
        F.count("*").alias("n_passages"),
        F.sum(F.col("kept").cast("int")).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("kept"), F.struct("pos", "passage")
                        )
                    )
                ),
                lambda s: s.getField("passage"),
            ),
        ).alias("text_kept"),
    ).withColumnRenamed("_id", id_col)


# ---------------------------------------------------------------------------
# Sliding-window exact-substring dedup (Lee et al. 2021, "Deduplicating
# Training Data Makes Language Models Better" — public algorithm).  The
# passage grid above only catches duplicates ALIGNED to the grid; the
# sliding k-gram pass catches a duplicated region at ANY word offset, the
# way the suffix-array pass in the paper does — re-expressed as a pure
# equality problem so it runs as groupBy/join instead of a global sort:
# every k-word window is hashed, a window duplicated anywhere in the
# corpus marks all its occurrences except the globally-first, and the
# marked word ranges are merged per document into maximal removal spans
# (gaps-and-islands).  Shuffle discipline: only (hash, id, pos) triples
# ride the gram shuffle — never text; the keeper election is a
# single-pass count+min window over the hash (every occurrence reaches
# the marking stage regardless, so the one exchange is shared instead of
# re-shingling the corpus per join side; unbounded frames evaluate once
# per hash partition, linear under boilerplate skew); the island merge
# windows over doc_id, the same key every per-doc agg shuffles on.


def gram_array(text: Column, k: int = 8) -> Column:
    """All sliding ``k``-word windows of a document (array<string>, one
    entry per word offset; empty for documents shorter than ``k`` words).
    """

    def build(w: Column) -> Column:
        n = F.size(w) - (k - 1)
        return F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.concat_ws(" ", F.slice(w, i, k)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # let-bind words: slice(w) inside the per-gram lambda would otherwise
    # re-run the normalize+split chain once per gram (see text.let)
    return let(words(text), build)


_SPILL_SEQ = itertools.count()


def _maybe_spill(df: DataFrame, scratch_dir: str | None, name: str) -> DataFrame:
    """Materialize a narrow intermediate to scratch parquet and read it
    back (the engine's round-spill pattern, engine.py).

    The text operators below consume their exploded gram/bigram stream
    2-3 times (count tables + the join-back); without a spill each
    consumer re-shingles the full corpus text from the scan.  Locally
    that is two cheap passes, but at 100 TB the spill inverts: writing
    the (hash, id, pos) stream once — a few % of corpus bytes — is far
    cheaper than re-reading and re-exploding 100 TB of text per
    consumer.  Opt-in via ``scratch_dir`` because the caller owns the
    scratch lifecycle (same contract as the engine's warehouse/_scratch).

    Each invocation spills to a UNIQUE subdir (``name`` + a process-wide
    sequence number): two ops of the same kind sharing one scratch_dir —
    e.g. substring passes with different ``k`` — must not clobber each
    other's spill before the lazy read-back executes (ADVICE r4).
    """
    if scratch_dir is None:
        return df
    path = os.path.join(scratch_dir, f"{name}-{next(_SPILL_SEQ):04d}")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def duplicated_gram_positions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    scratch_dir: str | None = None,
) -> DataFrame:
    """(_id, pos) of every sliding ``k``-gram occurrence that duplicates
    an earlier one anywhere in the corpus (keeper = min (id, pos), the
    occurrence the dedup pass preserves).  ``pos`` is the 0-based word
    offset of the gram's first word."""
    # width guard: the gram build + md5 is the expensive per-row stage;
    # a single-file scan would otherwise run it on ONE task (no-op when
    # the source is already wide — see functions/partitioning.py)
    occ = ensure_width(df, id_col).select(
        F.col(id_col).cast("string").alias("_id"),
        F.posexplode(gram_array(F.col(text_col), k)).alias("pos", "gram"),
    ).select("_id", "pos", F.md5("gram").alias("h"))
    occ = _maybe_spill(occ, scratch_dir, f"substring-occ-k{k}")
    # r06: per-hash count + keeper via ONE window pass instead of a
    # stats aggregation joined back to the occurrence stream — the
    # join's two consumers each re-ran the gram build + md5 from the
    # scan (the agg side's exchange subtree differs, so no reuse); the
    # window needs one exchange of the narrow (h, id, pos) triples and
    # selects exactly the same rows.
    w = Window.partitionBy("h")
    return (
        occ.withColumn("n", F.count("*").over(w))
        .withColumn("k0", F.min(F.struct("_id", "pos")).over(w))
        .filter(
            (F.col("n") > 1)
            & ~(
                (F.col("_id") == F.col("k0._id"))
                & (F.col("pos") == F.col("k0.pos"))
            )
        )
        .select("_id", "pos")
    )


def substring_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Maximal duplicated-substring removal spans per document.

    Returns (id, span_start, span_end, n_grams): inclusive 0-based word
    ranges covering every non-keeper occurrence of a corpus-duplicated
    ``k``-gram, with overlapping/adjacent gram ranges merged
    (gaps-and-islands over the per-doc position stream).  This is the
    removal manifest a Lee-et-al exact-substring pass feeds to the
    scrubber — kept separate so a pipeline can audit before destroying.
    """
    dup = duplicated_gram_positions(df, text_col, id_col, k, scratch_dir)
    w = Window.partitionBy("_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + (k - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "f",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "isl",
        F.sum("f").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("_id", "isl")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + (k - 1)).cast("int").alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select(F.col("_id").alias(id_col), "span_start", "span_end", "n_grams")
    )


def scrub_substring_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Apply the :func:`substring_spans` manifest: per document, drop every
    word inside a removal span and reassemble the survivors in order.

    Returns (id, n_words, n_removed, text_kept) for EVERY document.  The
    corpus text never rides a shuffle: only the span manifest (docs that
    actually contain a duplicated region) is aggregated and equi-joined
    back on the doc key — AQE broadcasts it when small — and the word
    filtering happens expression-side (an index-lambda ``filter`` against
    the let-bound span array), not by exploding words through an exchange.
    """
    span_struct = "array<struct<span_start:int,span_end:int>>"
    per_doc = (
        substring_spans(df, text_col, id_col, k, scratch_dir)
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
        )
    )
    joined = df.select(
        F.col(id_col).cast("string").alias(id_col),
        F.col(text_col).alias("_text"),
    ).join(per_doc, id_col, "left")

    def body(sp: Column) -> Column:
        def with_words(w: Column) -> Column:
            kept_expr = F.filter(
                w,
                lambda wd, i: ~F.exists(
                    sp,
                    lambda s: (i >= s.getField("span_start"))
                    & (i <= s.getField("span_end")),
                ),
            )
            return let(
                kept_expr,
                lambda kept: F.struct(
                    F.size(w).cast("bigint").alias("n_words"),
                    (F.size(w) - F.size(kept)).cast("bigint").alias("n_removed"),
                    F.concat_ws(" ", kept).alias("text_kept"),
                ),
            )

        return let(words(F.col("_text")), with_words)

    return joined.select(
        id_col,
        let(
            F.coalesce(F.col("_spans"), F.array().cast(span_struct)), body
        ).alias("_r"),
    ).select(id_col, "_r.*")


# ---------------------------------------------------------------------------
# Bigram-LM perplexity scoring (the CCNet-style quality signal: score each
# document by how predictable its text is under an n-gram LM trained on
# the corpus itself — Wenzek et al. 2020, "CCNet: Extracting high quality
# monolingual datasets from web crawl data", public algorithm.  Low
# bits/token = repetitive boilerplate, high = rare noise; the filter keeps
# the middle band).  Scale shape: bigram counts are partial-aggregatable
# groupBys on the bigram key; scoring joins each doc's bigrams back to the
# count tables on the same key — only (id, w1, w2) triples shuffle, never
# document text.  Float discipline: every aggregation under the logs is an
# integer count; the single float reduction (mean of per-bigram surprisal)
# is rounded to 4 decimals so a last-ulp libm/summation-order difference
# between engines cannot flip the comparison.


def bigram_structs(text: Column) -> Column:
    """Adjacent word pairs of a document (array<struct<w1,w2>>, empty for
    documents with fewer than 2 words)."""

    def build(w: Column) -> Column:
        n = F.size(w) - 1
        return F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.struct(
                    F.element_at(w, i).alias("w1"),
                    F.element_at(w, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    return let(words(text), build)


def lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scratch_dir: str | None = None,
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document bigram surprisal under a bigram LM, Laplace-smoothed.

    Returns (id, n_bigrams, bits_per_token) for every document with at
    least one bigram: ``bits_per_token = mean(-log2((c(w1,w2) + 1) /
    (c(w1·) + V)))`` with V the training bigram-start vocabulary.  The
    add-one smoothing is what gives the score its filtering power: an
    UNSMOOTHED self-scored LM assigns 0 bits to any once-seen transition
    (c12 = c1 = 1 — rare garbage looks perfectly predictable); smoothed,
    a rare transition costs ~log2(V) bits while corpus boilerplate stays
    cheap.

    ``train_df`` (default: ``df`` itself — CCNet-style self-scoring)
    trains the count tables on a DIFFERENT corpus: scoring bigrams join
    the training counts LEFT, so a transition never seen in training
    costs the smoothing floor -log2(1 / (c(w1·)+V)) (and -log2(1/V) when
    even w1 is unseen) — the held-out setup a quality classifier wants
    (Wenzek 2020 trains on Wikipedia, scores Common Crawl).
    """
    # width guard on both streams: the normalize+split+bigram explode is
    # the heavy per-row stage and (unspilled) feeds several consumers —
    # single-file scans would run every one of them on ONE task
    bg = ensure_width(df, id_col).select(
        F.col(id_col).cast("string").alias("_id"),
        F.explode(bigram_structs(F.col(text_col))).alias("b"),
    ).select("_id", "b.w1", "b.w2")
    bg = _maybe_spill(bg, scratch_dir, "lm-bigrams")
    if train_df is None:
        tb = bg
    else:
        tb = ensure_width(train_df, id_col).select(
            F.explode(bigram_structs(F.col(text_col))).alias("b")
        ).select("b.w1", "b.w2")
        # the training stream feeds three consumers (c12/c1/vocab)
        tb = _maybe_spill(tb, scratch_dir, "lm-train-bigrams")
    c12 = tb.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = tb.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = tb.agg(F.countDistinct("w1").alias("v"))
    # LEFT joins + coalesce(0): identical to inner joins when self-trained
    # (every scoring bigram is in its own counts), and the Laplace floor
    # for training-unseen bigrams in the held-out case.
    scored = (
        bg.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(
                    -F.log2(
                        (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
                        / (
                            F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")
                        ).cast("double")
                    )
                ),
                4,
            ).alias("bits_per_token"),
        )
        .withColumnRenamed("_id", id_col)
    )


# ---------------------------------------------------------------------------
# PII scrubbing


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type redaction counts matching ``pii_scrub``'s SEQUENTIAL
    passes: each pattern is counted on the text as the scrub stage sees
    it (IPs after emails are gone, phones after both), so the counts
    reconcile exactly with the tags in the scrubbed output — counting
    every pattern on the original text would double-count regions (an IP
    embedded in an email address) and report redactions that never
    happened."""
    after_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)),
        "n_ips": F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), 0)),
        "n_phones": F.size(
            F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0)
        ),
    }


def pii_scrub(text: Column) -> Column:
    """Replace emails / IPv4s / NANP-style phone numbers with typed tags.

    Order matters: emails first (an address can embed digit runs), then
    IPs, then phones.  All three patterns are RE2-safe so the DuckDB
    oracle is the same regex text.
    """
    scrubbed = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, IPV4_RE, "<IP>")
    return F.regexp_replace(scrubbed, PHONE_RE, "<PHONE>")


def scrub_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document scrub + per-type redaction counts (audit columns a
    compliance pass needs).  Pure projection — runs at scan speed."""
    t = F.col(text_col)
    c = pii_counts(t)
    # width guard: the sequential regex passes are the heavy per-row
    # stage; single-file scans otherwise run them on one task
    df = ensure_width(df, id_col)
    return df.select(
        F.col(id_col),
        pii_scrub(t).alias("text_scrubbed"),
        c["n_emails"].alias("n_emails"),
        c["n_ips"].alias("n_ips"),
        c["n_phones"].alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality rules)


def dup_word_fraction(text: Column) -> Column:
    return let(
        words(text),
        lambda w: F.round(
            1
            - F.size(F.array_distinct(w))
            / F.greatest(F.size(w), F.lit(1)).cast("double"),
            6,
        ),
    )


def top_bigram_fraction(text: Column) -> Column:
    """Fraction of all word bigrams taken by the single most frequent one.

    Computed entirely expression-side (no explode, no shuffle) in
    O(L log L) per row: ``array_sort`` the bigram array, then ONE
    ``aggregate`` pass tracking the longest equal-adjacent run — the run
    length of the most frequent bigram.  The earlier per-distinct-bigram
    filtered-array-scan was O(distinct × total) per document — quadratic
    in doc length, ~2.5·10⁹ comparisons for one 50k-word page, and a web
    crawl is exactly where unbounded documents show up (VERDICT r4 #4).
    The bigram array is let-bound: referenced twice (aggregate + size), an
    unbound ``shingles(text, 2)`` would re-shingle the document per use.
    """

    def frac(bg: Column) -> Column:
        top = F.aggregate(
            F.array_sort(bg),
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                        F.lit(1)
                    ),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        )
        return F.when(F.size(bg) <= 0, F.lit(0.0)).otherwise(
            F.round(top / F.size(bg).cast("double"), 6)
        )

    return let(shingles(text, 2), frac)


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_word_frac: float = MAX_DUP_WORD_FRAC,
    max_top_bigram_frac: float = MAX_TOP_BIGRAM_FRAC,
) -> DataFrame:
    """Per-document repetition metrics + the Gopher-rule keep flag
    (C4/Gopher-style repetitious-text filters; thresholds parameterized).
    """
    t = F.col(text_col)
    dwf = dup_word_fraction(t)
    tbf = top_bigram_fraction(t)
    # width guard: per-row HOF arithmetic; a single-file scan otherwise
    # runs the whole corpus on one task (per-row map — values unchanged)
    df = ensure_width(df, id_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_words"),
        dwf.alias("dup_word_frac"),
        tbf.alias("top_bigram_frac"),
        (
            (dwf <= F.lit(max_dup_word_frac))
            & (tbf <= F.lit(max_top_bigram_frac))
        ).alias("repetition_ok"),
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): hash every ``k``-word shingle, slide a ``w``-hash window
    over the sequence and select each window's minimum (ties -> leftmost,
    a deterministic variant of the paper's rightmost rule); the DISTINCT
    selected (position, hash) pairs are the document's fingerprint set.
    Guarantee: any run of ``w + k - 1`` identical words shared by two
    documents contributes at least one identical selected fingerprint —
    the local-selection robustness exact-sampling (0 mod p) lacks.
    Documents with fewer than ``w + k - 1`` words yield no full window
    and hence no fingerprints.

    Returns exploded ``(id, pos, fp)`` rows.  Scale shape: ONE shuffle
    of (id, pos, h) triples (text never leaves the scan stage), a
    per-doc ROWS window, then a distinct partial agg.  The hash is 28
    bits and packs with the position into a single bigint
    (``h * 2^32 + pos``, 60 bits), so the window min is a plain integer
    min — no struct comparison, engine-invariant, and the same md5-conv
    idiom every seeded draw in this repo uses.
    """
    # width guard: shingling + md5 is the heavy per-row stage (see
    # functions/partitioning.py; no-op on an already-wide scan)
    grams = ensure_width(df, id_col).select(
        F.col(id_col).cast("string").alias("_id"),
        F.posexplode(shingles(F.col(text_col), k)).alias("_rpos", "_g"),
    )
    h = F.conv(F.substring(F.md5(F.col("_g")), 1, 7), 16, 10).cast("bigint")
    packed = grams.select(
        "_id",
        "_rpos",
        (h * F.lit(4294967296).cast("bigint") + F.col("_rpos")).alias("_c"),
    )
    wspec = (
        Window.partitionBy("_id").orderBy("_rpos").rowsBetween(-(w - 1), 0)
    )
    sel = (
        packed.withColumn("_m", F.min("_c").over(wspec))
        .filter(F.col("_rpos") >= w - 1)
        .select(
            "_id",
            (F.col("_m") % F.lit(4294967296)).cast("bigint").alias("pos"),
            F.expr("_m div 4294967296").alias("fp"),
        )
        .distinct()
    )
    return sel.select(F.col("_id").alias(id_col), "pos", "fp")


def winnow_candidate_pairs(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate containment/plagiarism pairs from shared winnowing
    fingerprints: two documents sharing ANY selected fingerprint (hence
    any ``w + k - 1``-word run) become an edge.  Pair emission is
    STAR-REDUCED like the MinHash path (textdedup
    minhash_candidate_pairs): each fingerprint bucket emits
    (bucket-min, member) edges — O(n) per bucket, connected-components-
    equal to the all-pairs form, so a boilerplate phrase shared by a
    million pages yields 10^6 edges, not 5·10^11.  Feed the edges to
    ``textdedup.connected_components`` for clusters; verify true overlap
    pair-locally if exact spans are needed (dedup_substring_spans).
    """
    fps = (
        winnow_fingerprints(df, k, w, text_col, id_col)
        .select(id_col, "fp")
        .distinct()
    )
    # r06: bucket-min via a window instead of a rep-agg joined back to
    # the fingerprint rows — the join's two consumers re-ran the whole
    # shingle+winnow subtree (same fix as minhash_candidate_pairs)
    wspec = Window.partitionBy("fp")
    return (
        fps.withColumn("a", F.min(id_col).over(wspec))
        .filter(F.col(id_col) != F.col("a"))
        .select("a", F.col(id_col).alias("b"))
        .distinct()
    )


# the Gopher/MassiveWeb required-word list (Rae et al. 2021 table A1)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _gopher_word_struct(t: Column) -> Column:
    """Word-array-derived Gopher metrics as one let-bound struct."""
    n_symbols = (
        F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    ) + (F.length(t) - F.length(F.regexp_replace(t, "…", "")))

    def from_words(w: Column) -> Column:
        n = F.size(w)
        safe_n = F.greatest(n, F.lit(1)).cast("double")
        total_len = F.aggregate(
            w, F.lit(0), lambda acc, x: acc + F.length(x)
        )
        stop_hits = None
        for s in GOPHER_STOPWORDS:
            hit = F.array_contains(w, s).cast("int")
            stop_hits = hit if stop_hits is None else stop_hits + hit
        return F.struct(
            n.alias("n_words"),
            F.round(total_len / safe_n, 4).alias("mean_word_len"),
            F.round(n_symbols / safe_n, 4).alias("symbol_word_ratio"),
            F.round(
                F.size(F.filter(w, lambda x: x.rlike("[a-z]"))) / safe_n, 4
            ).alias("alpha_word_frac"),
            stop_hits.alias("stop_hits"),
        )

    return let(words(t), from_words)


def _gopher_line_struct(t: Column) -> Column:
    """Raw-line-derived Gopher metrics as one let-bound struct."""

    def from_lines(ls: Column) -> Column:
        safe_n = F.greatest(F.size(ls), F.lit(1)).cast("double")
        bullet = F.filter(
            ls,
            lambda x: let(
                F.ltrim(x),
                lambda l: l.startswith("•")
                | l.startswith("-")
                | l.startswith("*"),
            ),
        )
        ellipsis = F.filter(
            ls,
            lambda x: let(
                F.rtrim(x),
                lambda l: l.endswith("...") | l.endswith("…"),
            ),
        )
        return F.struct(
            F.round(F.size(bullet) / safe_n, 4).alias("bullet_line_frac"),
            F.round(F.size(ellipsis) / safe_n, 4).alias("ellipsis_line_frac"),
        )

    return let(F.split(t, "\n"), from_lines)


def gopher_keep(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """The Gopher rule conjunction as a single filter Column (each metric
    struct evaluated once via nested lets) — for expression-only pruning
    in a pipeline that doesn't need the per-metric breakdown
    :func:`gopher_signals` emits."""
    return let(
        _gopher_word_struct(text),
        lambda w: let(
            _gopher_line_struct(text),
            lambda l: (
                w.getField("n_words").between(min_words, max_words)
                & w.getField("mean_word_len").between(
                    min_mean_word_len, max_mean_word_len
                )
                & (w.getField("symbol_word_ratio") <= max_symbol_word_ratio)
                & (l.getField("bullet_line_frac") <= max_bullet_line_frac)
                & (
                    l.getField("ellipsis_line_frac")
                    <= max_ellipsis_line_frac
                )
                & (w.getField("alpha_word_frac") >= min_alpha_word_frac)
                & (w.getField("stop_hits") >= min_stop_hits)
            ),
        ),
    )


def gopher_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher/MassiveWeb quality-rule signals (Rae et al.
    2021, arXiv:2112.11446 §A1.1) plus the conjunctive ``gopher_keep``
    verdict: word-count band, mean-word-length band, symbol-to-word
    ratio (# and …), bullet-started and ellipsis-ended line fractions,
    alphabetic-word fraction, and the >=2-required-stopwords rule.

    All pure Catalyst expressions over two let-bound arrays (the
    normalized word array and the raw line array) — zero shuffle, zero
    UDF, O(doc length) per row; the verdict compares the ROUNDED metric
    columns so the keep flag is bit-identical to any engine recomputing
    it from the emitted metrics.  Thresholds are the paper's defaults,
    parameterized.  Filters here prune BEFORE any dedup shuffle in
    curate_corpus-style compositions (cheap-first ordering);
    :func:`gopher_keep` packages the verdict as a single filter Column
    for exactly that use.
    """
    t = F.col(text_col)
    # width guard: per-row HOF arithmetic over the word/line arrays; a
    # single-file scan otherwise runs the corpus on one task
    base = ensure_width(df, id_col).select(
        F.col(id_col),
        _gopher_word_struct(t).alias("_w"),
        _gopher_line_struct(t).alias("_l"),
    )
    g = lambda f: F.col(f"_w.{f}")  # noqa: E731
    ln = lambda f: F.col(f"_l.{f}")  # noqa: E731
    keep = (
        g("n_words").between(min_words, max_words)
        & g("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (g("symbol_word_ratio") <= max_symbol_word_ratio)
        & (ln("bullet_line_frac") <= max_bullet_line_frac)
        & (ln("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (g("alpha_word_frac") >= min_alpha_word_frac)
        & (g("stop_hits") >= min_stop_hits)
    )
    return base.select(
        id_col,
        g("n_words").alias("n_words"),
        g("mean_word_len").alias("mean_word_len"),
        g("symbol_word_ratio").alias("symbol_word_ratio"),
        ln("bullet_line_frac").alias("bullet_line_frac"),
        ln("ellipsis_line_frac").alias("ellipsis_line_frac"),
        g("alpha_word_frac").alias("alpha_word_frac"),
        g("stop_hits").alias("stop_hits"),
        keep.alias("gopher_keep"),
    )


# ---------------------------------------------------------------------------
# Domain-blocklist filtering


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a hostname: a.b.example.com ->
    [a.b.example.com, b.example.com, example.com, com]."""
    return let(
        F.split(host, r"\."),
        lambda parts: F.transform(
            F.sequence(F.lit(1), F.size(parts)),
            lambda i: F.array_join(
                F.slice(parts, i.cast("int"), F.size(parts) - i + 1), "."
            ),
        ),
    )


def blocklist_filter(
    frontier: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    domain_col: str = "domain",
    keep_blocked: bool = False,
    broadcast_blocked: bool = True,
) -> DataFrame:
    """Drop (or select, with ``keep_blocked=True``) rows whose host falls
    under any blocklisted domain suffix (UT1-blocklist semantics: blocking
    example.com blocks every subdomain).

    Blocking is a property of the HOST, so the match runs over distinct
    hosts, never rows: distinct hosts (a bounded column-only partial-agg
    shuffle) -> explode suffixes -> map-side broadcast hash join against
    the blocklist -> the (small) set of blocked hosts -> broadcast
    semi/anti join back onto the corpus.  With ``broadcast_blocked`` on
    (default) the corpus itself is never shuffled; turn it off if the
    blocklist matches an unbounded host set and let AQE pick the strategy.

    NULL-host rows can never match a blocklist entry: they are KEPT by
    the default drop-blocked pass and DROPPED by ``keep_blocked=True``
    (standard equi-join null semantics, asserted in tests).  Internal
    join columns are ``__bl_``-prefixed so a pre-existing frontier column
    can't collide (ADVICE r4).
    """
    host = F.col(host_col)
    bl = F.broadcast(blocklist.select(F.col(domain_col).alias("__bl_suf")))
    blocked_hosts = (
        frontier.select(host.alias("__bl_host"))
        .filter(F.col("__bl_host").isNotNull())
        .distinct()
        .select(
            "__bl_host",
            F.explode(host_suffixes(F.col("__bl_host"))).alias("__bl_suf"),
        )
        .join(bl, "__bl_suf", "left_semi")
        .select("__bl_host")
        .distinct()
    )
    if broadcast_blocked:
        blocked_hosts = F.broadcast(blocked_hosts)
    how = "left_semi" if keep_blocked else "left_anti"
    return frontier.join(
        blocked_hosts, on=host == F.col("__bl_host"), how=how
    )


# ---------------------------------------------------------------------------
# Corpus shape statistics


def corpus_stats(
    df: DataFrame, text_col: str = "text", group_cols: tuple[str, ...] = ("lang",)
) -> DataFrame:
    """Token-length histogram per group: power-of-two length buckets with
    doc/token tallies — the corpus-shape summary a mixture planner reads.
    One partial-aggregatable groupBy over #groups x #buckets cells."""
    n_tok = token_count(F.col(text_col))
    # binary magnitude, not floor(log2): integer-exact on every engine,
    # immune to float-ulp edges at exact powers of two
    bucket = (
        F.length(F.bin(F.greatest(n_tok, F.lit(1)).cast("bigint"))) - 1
    ).cast("int")
    return (
        df.select(*group_cols, n_tok.alias("n_tok"), bucket.alias("len_bucket"))
        .groupBy(*group_cols, "len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
        )
    )
