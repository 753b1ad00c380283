"""Text-analysis column functions for large-scale training-data pipelines.

All pure Catalyst expressions (JVM-side, codegen'd — no Python in the hot
path), each with an ANSI-SQL twin used for the DuckDB oracle in
``__spark_entry__.py``.  These extend the reference's scalar surface
(SURVEY §2.9) with the operations a 100 TB corpus pipeline needs:
language-ID, quality scoring, token counting, shingling, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
    "zh": ["de", "shi", "le", "zai", "he"],
}


def normalize_text(text: Column) -> Column:
    """lowercase + collapse whitespace (shared by fingerprint/shingles)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(normalize_text(text), " "))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count via the pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def words(text: Column) -> Column:
    return F.split(normalize_text(text), " ")


def let(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE per row and hand ``body`` an O(1) slot
    reference (a bound lambda variable).

    Catalyst has no LET; ``transform`` over a one-element array is the
    idiomatic encoding.  It matters whenever an expensive subexpression
    (normalize+split of the whole text) is referenced inside a
    higher-order lambda: HOFs run outside whole-stage codegen, where each
    outer-expression reference is re-walked PER ARRAY ELEMENT — measured
    10× on the MinHash shingle stage (13.2s -> 1.25s per task at sf0.1)
    before this binding."""
    return F.element_at(F.transform(F.array(value), body), 1)


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles: array of space-joined n-grams (MinHash input)."""

    def build(w: Column) -> Column:
        idx = F.when(
            F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, (i + k + 1).cast("int")) for k in range(n)]
            ),
        )

    return let(words(text), build)


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or LANG_PROFILES["en"]

    def ratio(w: Column) -> Column:
        hits = F.size(F.filter(w, lambda x: x.isin(sw)))
        return F.round(hits / F.greatest(F.size(w), F.lit(1)), 6)

    return let(words(text), ratio)


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.round(n_punct / F.greatest(F.length(text), F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + low punctuation + word variety.

    Deterministic arithmetic only (rounded) so the DuckDB oracle hashes
    match.  The words array is let-bound: token count + distinct ratio
    would otherwise re-run the normalize+split chain 3x per row.
    """

    def score(w: Column) -> Column:
        n_tok = F.size(w)
        len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
        distinct_ratio = F.size(F.array_distinct(w)) / F.greatest(
            n_tok, F.lit(1)
        )
        return F.round(
            (len_score + (1 - punct_ratio(text)) + distinct_ratio) / 3.0, 6
        )

    return let(words(text), score)


def lang_scores(text: Column) -> dict[str, Column]:
    w = words(text)
    return {
        lang: F.size(F.filter(w, lambda x: x.isin(prof)))
        for lang, prof in LANG_PROFILES.items()
    }


def lang_id(text: Column) -> Column:
    """Stopword-profile language guess: argmax lang score, tie -> lexicographic.

    Expressed as a single max-over-structs so Catalyst evaluates it in one
    projection: max(struct(score, neg_lang)) picks highest score, then the
    lexicographically smallest language on ties.  One let-bound words
    array feeds all per-language counters (split once, not once per
    language).
    """

    def pick(w: Column) -> Column:
        scored = [
            F.struct(
                F.size(F.filter(w, lambda x: x.isin(prof))).alias("s"),
                F.lit(lang).alias("lang"),
            )
            for lang, prof in sorted(LANG_PROFILES.items(), reverse=True)
        ]
        return F.greatest(*scored).getField("lang")

    return let(words(text), pick)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of normalized text (exact-dup key)."""
    return F.md5(normalize_text(text))
