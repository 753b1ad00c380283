"""URL-seen set: exact anti-join + partitioned-bloom prefilter (J1).

The reference dedups via DB unique constraints and ``sorted(set(ids))``
(reference: core/spider.py:218-236, utils/helper.py:55,
spiders/bilibili/downloader.py:295).  At 10^10 URLs the exact seen table is
hash-bucketed by ``pmod(url_hash, n_buckets)`` and fronted by per-bucket
bloom bitmaps built in an Arrow-batched ``applyInPandas`` aggregation
(Spark's ``bloom_filter_agg`` is JVM-internal and not persistable, SURVEY
§4.3.1).  Bloom *pass* (possibly-seen) rows are always exact-confirmed
against their bucket before being dropped, so false positives can never
lose a URL — the bloom only shrinks the exact join's probe side.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64


def with_bucket(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int"))


def seen_anti_join(frontier: DataFrame, seen: DataFrame) -> DataFrame:
    """Exact path: frontier ⟕̸ seen on the 64-bit canonical-URL hash."""
    return frontier.join(seen.select("url_hash"), on="url_hash", how="left_anti")


# ---------------------------------------------------------------------------
# Partitioned bloom filter.
#
# Layout: one row per bucket — (bucket int, n_bits int, n_hashes int,
# bits binary).  k probe positions are derived from the 64-bit url_hash by
# double hashing: pos_i = (h1 + i*h2) mod n_bits with h1 = high 32 bits,
# h2 = low 32 bits | 1 (Kirsch–Mitzenmacher; public-domain construction).


def _positions(hashes: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    u = hashes.astype(np.uint64)
    h1 = (u >> np.uint64(32)).astype(np.int64)
    h2 = ((u & np.uint64(0xFFFFFFFF)) | np.uint64(1)).astype(np.int64)
    i = np.arange(n_hashes, dtype=np.int64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % n_bits).astype(np.int64)


def bloom_params(expected_per_bucket: int, fpp: float = 0.01) -> tuple[int, int]:
    n = max(expected_per_bucket, 1)
    n_bits = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    n_bits = ((n_bits + 7) // 8) * 8
    n_hashes = max(1, round(n_bits / n * math.log(2)))
    return n_bits, min(n_hashes, 16)


def build_bloom(
    seen: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    expected_per_bucket: int = 10_000,
    fpp: float = 0.01,
) -> DataFrame:
    """Per-bucket bloom bitmaps over seen.url_hash (applyInPandas UDAF)."""
    n_bits, n_hashes = bloom_params(expected_per_bucket, fpp)

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        pos = _positions(pdf["url_hash"].to_numpy(np.int64), n_bits, n_hashes)
        flat = pos.ravel()
        np.bitwise_or.at(bits, flat // 8, (1 << (flat % 8)).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "n_bits": [n_bits],
                "n_hashes": [n_hashes],
                "bits": [bits.tobytes()],
            }
        )

    bucketed = with_bucket(seen.select("url_hash"), n_buckets)
    return bucketed.groupBy("bucket").applyInPandas(
        agg, schema="bucket int, n_bits int, n_hashes int, bits binary"
    )


def bloom_prefilter(
    frontier: DataFrame, bloom: DataFrame, n_buckets: int = DEFAULT_BUCKETS
) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (definitely_new, maybe_seen) via the bloom bitmaps.

    Broadcast the bitmap table (n_buckets rows, ~n_bits/8 bytes each) and
    probe inside mapInPandas — no shuffle of the frontier at all.
    """
    probed_schema = frontier.withColumn("_maybe", F.lit(True)).schema

    bloom_rows = {
        int(r["bucket"]): (int(r["n_bits"]), int(r["n_hashes"]), np.frombuffer(r["bits"], np.uint8))
        for r in bloom.collect()
    }
    spark = frontier.sparkSession
    bc = spark.sparkContext.broadcast(bloom_rows)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        filters = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h = pdf["url_hash"].to_numpy(np.int64)
            bucket = np.mod(h, n_buckets)
            maybe = np.zeros(len(pdf), dtype=bool)
            for b in np.unique(bucket):
                f = filters.get(int(b))
                if f is None:
                    continue
                n_bits, n_hashes, bits = f
                idx = np.nonzero(bucket == b)[0]
                pos = _positions(h[idx], n_bits, n_hashes)
                hit = (bits[pos // 8] & (1 << (pos % 8)).astype(np.uint8)) != 0
                maybe[idx] = hit.all(axis=0)
            yield pdf.assign(_maybe=maybe)

    probed = frontier.mapInPandas(probe, schema=probed_schema)
    definitely_new = probed.filter(~F.col("_maybe")).drop("_maybe")
    maybe_seen = probed.filter(F.col("_maybe")).drop("_maybe")
    return definitely_new, maybe_seen


def seen_anti_join_bloom(
    frontier: DataFrame,
    seen: DataFrame,
    bloom: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Bloom-accelerated anti-join: exact-confirm only the bloom-pass rows.

    Output is row-identical to :func:`seen_anti_join` — the bloom can only
    send extra rows to the exact confirm, never skip one.
    """
    definitely_new, maybe_seen = bloom_prefilter(frontier, bloom, n_buckets)
    confirmed_new = maybe_seen.join(
        seen.select("url_hash"), on="url_hash", how="left_anti"
    )
    return definitely_new.unionByName(confirmed_new)
