"""Corpus-curation operators: eval-set decontamination, mixture
weighting, stratified sampling.

First-class training-data-pipeline components (no reference counterpart —
the reference stores raw scraped rows only, core/spider.py:196-236).
Design constraints at 100 TB:

* Decontamination never shuffles the corpus: the eval set's shingle set
  is bounded (eval benchmarks are thousands of documents), so it rides a
  broadcast and the corpus side is a streamed scan + map-side explode.
* Mixture weighting aggregates to one row per group before any window:
  the whole-table share window runs over #groups rows, not the corpus.
* Sampling is seeded and engine-independent (md5-derived order), so a
  sample drawn today is bit-identical on resume, backfill, or re-run —
  the reproducibility property a training-data freeze needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spiders_for_all_spark.functions.text import shingles, token_count


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 13,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per corpus document: how many of its distinct word ``shingle_n``-grams
    appear anywhere in the eval set (n_hits), plus the contaminated flag.

    The GPT-3 decontamination recipe (13-gram collision against eval
    benchmarks), expressed as: distinct eval shingles -> BROADCAST ->
    map-side equi-join against the corpus's exploded distinct shingles ->
    per-doc count.  The corpus is streamed once; only per-doc hit counts
    (tiny) reach a shuffle.  Set ``broadcast_eval=False`` if the eval
    shingle set outgrows the broadcast limit.
    """
    ev = eval_docs.select(
        F.explode(
            F.array_distinct(shingles(F.col(text_col), shingle_n))
        ).alias("sh")
    ).distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    sh = corpus.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles(F.col(text_col), shingle_n))
        ).alias("sh"),
    )
    hits = sh.join(ev, on="sh").groupBy(id_col).agg(
        F.count("*").alias("n_hits")
    )
    return (
        corpus.select(id_col)
        .join(hits, on=id_col, how="left")
        .na.fill({"n_hits": 0})
        .select(
            id_col, "n_hits", (F.col("n_hits") > 0).alias("contaminated")
        )
    )


def mixture_weights(
    corpus: DataFrame,
    target: dict[str, float],
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Per-group token share and the resampling weight that reshapes the
    corpus to a target mixture: weight = target_share / actual_share.

    The LLM-pretraining mixture step (sample source s with probability
    proportional to weight_s to hit the target token distribution).  One
    partial-aggregatable groupBy over the corpus; the total-share window
    runs over the #groups result rows only.
    """
    tok = corpus.groupBy(group_col).agg(
        F.sum(token_count(F.col(text_col))).alias("tokens"),
        F.count("*").alias("n_docs"),
    )
    share = F.col("tokens") / F.sum("tokens").over(Window.partitionBy())
    tgt = F.create_map(
        *[F.lit(x) for kv in sorted(target.items()) for x in kv]
    )[F.col(group_col)]
    return tok.select(
        group_col,
        "tokens",
        "n_docs",
        share.alias("token_share"),
        (F.coalesce(tgt, F.lit(0.0)) / share).alias("weight"),
    )


def curate_corpus(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    min_quality: float | None = None,
    sample_k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    decon_shingle_n: int = 13,
    blocklist: DataFrame | None = None,
    host_col: str = "host",
    repetition_filter: bool = False,
    max_dup_word_frac: float | None = None,
    max_top_bigram_frac: float | None = None,
    passage_n: int | None = None,
    scrub_pii: bool = False,
    substring_k: int | None = None,
    min_lm_bits: float | None = None,
    max_lm_bits: float | None = None,
    lm_train_df: DataFrame | None = None,
    dsir_target_df: DataFrame | None = None,
    min_dsir_logratio: float | None = None,
    gopher: bool = False,
) -> DataFrame:
    """The corpus-freeze composition every pretraining pipeline runs:
    domain blocklist -> repetition filter -> near-dedup (keep cluster
    representatives) -> passage-level exact dedup -> sliding-window
    exact-substring scrub -> eval-set decontamination -> quality floor ->
    LM-perplexity band -> DSIR importance floor -> PII scrub -> optional
    stratified sample.

    Each stage is one of this module's / textdedup's / cleaning's
    oracle-checked operators; the composition stays lazy (one DataFrame
    out — callers write it once).  Stage order is the cheap-first order a
    100 TB freeze wants: expression-only filters (blocklist, repetition)
    prune before any shuffle, document-level dedup prunes before the
    wider passage-level pass, and the text rewrites (passage reassembly,
    PII scrub) run on the smallest surviving set.  Docs dropped at each
    stage are dropped by left-anti joins on bounded id sets, so the
    corpus is never shuffled wider than the dedup pair graph.
    """
    from spiders_for_all_spark.functions.text import lang_id, quality_score
    from spiders_for_all_spark.operators.cleaning import (
        blocklist_filter,
        dup_word_fraction,
        passage_dedup,
        pii_scrub,
        top_bigram_fraction,
    )
    from spiders_for_all_spark.operators.textdedup import minhash_dup_clusters

    out = docs
    if blocklist is not None:
        out = blocklist_filter(out, blocklist, host_col=host_col)
    if repetition_filter:
        from spiders_for_all_spark.operators.cleaning import (
            MAX_DUP_WORD_FRAC,
            MAX_TOP_BIGRAM_FRAC,
        )

        dwf_max = MAX_DUP_WORD_FRAC if max_dup_word_frac is None else max_dup_word_frac
        tbf_max = (
            MAX_TOP_BIGRAM_FRAC if max_top_bigram_frac is None else max_top_bigram_frac
        )
        t = F.col(text_col)
        out = out.filter(
            (dup_word_fraction(t) <= dwf_max) & (top_bigram_fraction(t) <= tbf_max)
        )
    if gopher:
        # Gopher/MassiveWeb rule conjunction — expression-only, so it
        # prunes in the cheap-first block before any dedup shuffle
        from spiders_for_all_spark.operators.cleaning import gopher_keep

        out = out.filter(gopher_keep(F.col(text_col)))
    clusters = minhash_dup_clusters(out, text_col, id_col)
    non_reps = clusters.filter(F.col(id_col) != F.col("component")).select(
        id_col
    )
    out = out.join(non_reps, on=id_col, how="left_anti")
    if passage_n is not None:
        kept = passage_dedup(out, text_col, id_col, passage_n).select(
            id_col, F.col("text_kept"), F.col("n_kept")
        )
        out = (
            out.drop(text_col)
            .join(kept, on=id_col)
            .filter(F.col("n_kept") > 0)
            .withColumnRenamed("text_kept", text_col)
            .drop("n_kept")
        )
    if substring_k is not None:
        # sliding-window exact-substring scrub (any word offset — catches
        # what the passage grid misses); docs scrubbed to nothing drop
        from spiders_for_all_spark.operators.cleaning import (
            scrub_substring_dups,
        )

        kept = scrub_substring_dups(out, text_col, id_col, substring_k)
        out = (
            out.withColumn("_sid", F.col(id_col).cast("string"))
            .drop(text_col)
            .join(kept.withColumnRenamed(id_col, "_sid"), on="_sid")
            .filter(F.col("n_removed") < F.col("n_words"))
            .withColumnRenamed("text_kept", text_col)
            .drop("_sid", "n_removed", "n_words")
        )
    if eval_docs is not None:
        bad = (
            decontaminate(
                out, eval_docs, text_col, id_col, decon_shingle_n
            )
            .filter(F.col("contaminated"))
            .select(id_col)
        )
        out = out.join(bad, on=id_col, how="left_anti")
    if min_quality is not None:
        out = out.filter(quality_score(F.col(text_col)) >= min_quality)
    if min_lm_bits is not None or max_lm_bits is not None:
        # CCNet-style perplexity band: keep the middle, drop boilerplate
        # (low bits) and noise (high bits).  Inner join also drops docs
        # with no bigrams (<2 words) — they carry no LM signal.
        # With ``lm_train_df`` the band scores against a held-out LM
        # (train elsewhere, score this corpus) instead of self-scoring.
        from spiders_for_all_spark.operators.cleaning import lm_perplexity

        scores = lm_perplexity(
            out, text_col, id_col, train_df=lm_train_df
        ).withColumnRenamed(id_col, "_sid")
        out = out.withColumn("_sid", F.col(id_col).cast("string")).join(
            scores, on="_sid"
        )
        if min_lm_bits is not None:
            out = out.filter(F.col("bits_per_token") >= min_lm_bits)
        if max_lm_bits is not None:
            out = out.filter(F.col("bits_per_token") <= max_lm_bits)
        out = out.drop("_sid", "n_bigrams", "bits_per_token")
    if dsir_target_df is not None and min_dsir_logratio is not None:
        # DSIR floor: keep docs whose bigrams look at least this much
        # more target-like than raw-pool-like.  Inner join also drops
        # docs with no bigrams, like the LM band.
        scores = dsir_scores(
            out, dsir_target_df, text_col, id_col
        ).withColumnRenamed(id_col, "_sid")
        out = (
            out.withColumn("_sid", F.col(id_col).cast("string"))
            .join(scores, on="_sid")
            .filter(F.col("logratio_per_token") >= min_dsir_logratio)
            .drop("_sid", "n_bigrams", "logratio_per_token")
        )
    if scrub_pii:
        out = out.withColumn(text_col, pii_scrub(F.col(text_col)))
    if sample_k is not None:
        if group_col not in out.columns:
            out = out.withColumn(group_col, lang_id(F.col(text_col)))
        out = stratified_sample(out, sample_k, group_col, id_col).drop("rn")
    return out


def dsir_scores(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scratch_dir: str | None = None,
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, arXiv:2302.03169):
    per document, the mean log2 importance ratio of its bigrams under two
    Laplace-smoothed bigram models — ``target`` (the distribution you
    want, e.g. a curated reference corpus) over ``corpus`` (the raw pool
    being scored).  Returns ``(id, n_bigrams, logratio_per_token)``;
    higher = more target-like.  Selection is a separate, cheap step:
    top-k on the score, a threshold filter, or a seeded Gumbel draw via
    the md5 pattern :func:`mixture_resample` uses.

    Same engine shape as ``cleaning.lm_perplexity`` (which this shares
    its bigram builder with), run twice: both models are one
    partial-aggregatable groupBy over (w1, w2) triples; the corpus text
    never rides a shuffle — only ``(id, w1, w2)`` does; vocab scalars
    ride a broadcast.  Smoothing is load-bearing for the same reason as
    the LM filter: unsmoothed, a bigram seen once in the raw pool and
    never in target would send the ratio to -inf and one rare token
    would dominate the document mean.
    """
    from spiders_for_all_spark.operators.cleaning import (
        _maybe_spill,
        bigram_structs,
    )

    from spiders_for_all_spark.functions.partitioning import ensure_width

    # width guard on both streams: the normalize+split+bigram explode is
    # re-run by every unspilled consumer, each serially off a
    # single-file scan (see functions/partitioning.py)
    sb = ensure_width(corpus, id_col).select(
        F.col(id_col).cast("string").alias("_id"),
        F.explode(bigram_structs(F.col(text_col))).alias("b"),
    ).select("_id", "b.w1", "b.w2")
    # the scoring stream feeds five consumers (score rows + the raw
    # model's c12/c1/vocab) — spill once when a scratch dir is given
    sb = _maybe_spill(sb, scratch_dir, "dsir-bigrams")
    tb = ensure_width(target, id_col).select(
        F.explode(bigram_structs(F.col(text_col))).alias("b")
    ).select("b.w1", "b.w2")
    tb = _maybe_spill(tb, scratch_dir, "dsir-target-bigrams")

    ct12 = tb.groupBy("w1", "w2").agg(F.count("*").alias("t12"))
    ct1 = tb.groupBy("w1").agg(F.count("*").alias("t1"))
    vt = tb.agg(F.countDistinct("w1").alias("vt"))
    cr12 = sb.groupBy("w1", "w2").agg(F.count("*").alias("r12"))
    cr1 = sb.groupBy("w1").agg(F.count("*").alias("r1"))
    vr = sb.agg(F.countDistinct("w1").alias("vr"))

    scored = (
        sb.join(ct12, ["w1", "w2"], "left")
        .join(ct1, "w1", "left")
        .join(cr12, ["w1", "w2"])
        .join(cr1, "w1")
        .crossJoin(F.broadcast(vt))
        .crossJoin(F.broadcast(vr))
    )
    lr = F.log2(
        (F.coalesce(F.col("t12"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("t1"), F.lit(0)) + F.col("vt")).cast("double")
    ) - F.log2(
        (F.col("r12") + 1).cast("double")
        / (F.col("r1") + F.col("vr")).cast("double")
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(lr), 4).alias("logratio_per_token"),
        )
        .withColumnRenamed("_id", id_col)
    )


def stratified_sample(
    corpus: DataFrame,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Seeded exact-k-per-stratum sample: rank by md5(seed || id) within
    each stratum, keep the first k.

    md5 of the id is a uniform draw that any engine reproduces bit-for-bit
    (no RNG state, no partition-order dependence — unlike
    ``DataFrame.sample``, which is seed-stable only for a fixed partition
    layout).  The per-stratum window sort is O(|stratum| log k) with
    Spark's TopK window optimization; for fraction (not exact-k) sampling
    at extreme scale prefer a threshold filter on the same md5 draw,
    which needs no window at all (see f8_seeded_fingerprint).
    """
    order = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(order, id_col)
    return (
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def mixture_resample(
    corpus: DataFrame,
    target: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    seed: str = "s0",
) -> DataFrame:
    """Materialize a target mixture: keep each document with probability
    ``min(weight, 1)`` where weight = target_share / actual_share per
    group (downsampling overrepresented groups toward the target; groups
    needing upsampling keep everything — repetition epochs are a loader
    concern, not a corpus one).

    The accept/reject draw is md5-derived and compared in INTEGER space
    (draw32 < floor(p * 2^32)) — reproducible bit-for-bit on any engine,
    partition layout, or retry, unlike ``DataFrame.sample``.  Plan: one
    corpus groupBy (token totals, #groups rows) -> broadcast weights back
    -> expression-only filter; the corpus is never shuffled.
    """
    w = mixture_weights(corpus, target, text_col, group_col)
    # weight is NULL for a group whose texts are all NULL (0/0 share);
    # least() SKIPS nulls, so without the coalesce p would silently become
    # 1.0 and keep the whole group — coalesce to 0 = drop, matching the
    # "groups not in target are dropped" rule.
    p = F.least(F.coalesce(F.col("weight"), F.lit(0.0)), F.lit(1.0))
    thresholds = F.broadcast(
        w.select(
            group_col,
            F.floor(p * F.lit(4294967296.0)).cast("bigint").alias("_thr"),
        )
    )
    draw = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed),
                    F.lit(":mix:"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        corpus.join(thresholds, group_col)
        .filter(draw < F.col("_thr"))
        .drop("_thr")
    )
