"""Request-signing functions (F5/F11 in SURVEY §2.9).

WBI signing (bilibili ``w_rid``): md5 of the sorted-urlencoded params plus a
"mixin key" — a fixed 64-entry permutation of the concatenated img_key +
sub_key, truncated to 32 chars.  The algorithm and permutation table are
public (documented by the bilibili-API-collect community; the reference
implements it at spiders/bilibili/sign.py:86-129 and
spiders/bilibili/spiders.py:463-534).  Here it is a pure Catalyst
expression: the permutation is a literal array gather, the signature a
``md5(concat_ws(...))`` — no Python per row.

The xhs ``X-s/X-t`` signer in the reference executes a vendored 111 KB JS
blob via execjs (spiders/xhs/sign.py:25-48) — out of scope per SURVEY §7.4.
:func:`xhs_sign_udf` is the pluggable seam: an Arrow-batched pandas UDF
wrapping any python callable; the default is a deterministic stub for tests.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

# public WBI mixin permutation (bilibili-API-collect / reference sign.py)
MIXIN_KEY_ENC_TAB = [
    46, 47, 18, 2, 53, 8, 23, 32, 15, 50, 10, 31, 58, 3, 45, 35, 27, 43, 5,
    49, 33, 9, 42, 19, 29, 28, 14, 39, 12, 38, 41, 13, 37, 48, 7, 16, 24, 55,
    40, 61, 26, 17, 0, 1, 60, 51, 30, 4, 22, 25, 54, 21, 56, 59, 6, 63, 57,
    62, 11, 36, 20, 34, 44, 52,
]


def mixin_key(img_key: Column, sub_key: Column) -> Column:
    """Permute (img_key || sub_key) by the fixed table, truncate to 32."""
    raw = F.concat(img_key, sub_key)
    picked = [F.substring(raw, i + 1, 1) for i in MIXIN_KEY_ENC_TAB[:32]]
    return F.concat(*picked)


def sorted_query_string(params: Column) -> Column:
    """urlencode(sorted(params)) for a map<string,string> column.

    Mirrors the reference's ``urlencode(sorted(params.items()))``
    (spiders/bilibili/spiders.py:574-580) for url-safe values.
    """
    entries = F.map_entries(params)  # array<struct<key,value>>
    sorted_entries = F.array_sort(entries)
    return F.array_join(
        F.transform(sorted_entries, lambda e: F.concat_ws("=", e.key, e.value)),
        "&",
    )


def wbi_sign(params: Column, img_key: Column, sub_key: Column) -> Column:
    """w_rid = md5(sorted_query_string(params) + mixin_key)."""
    return F.md5(F.concat(sorted_query_string(params), mixin_key(img_key, sub_key)))


# ---------------------------------------------------------------------------
def _default_stub_signer(url: str, a1: str) -> tuple[str, str]:
    import hashlib

    h = hashlib.md5(f"{url}|{a1}".encode()).hexdigest()
    return f"XYW_{h}", h[:13]


def xhs_sign_udf(signer: Callable[[str, str], tuple[str, str]] | None = None):
    """Pluggable X-s/X-t signer as a mapInPandas-compatible transform.

    Returns a function DataFrame -> DataFrame appending ``x_s`` and ``x_t``
    string columns.  ``signer(url, a1) -> (x_s, x_t)`` runs batched inside
    the Arrow worker; swap in a real JS-engine-backed callable outside the
    sandbox.
    """
    fn = signer or _default_stub_signer

    def transform(df):
        from pyspark.sql import types as T

        schema = T.StructType(
            list(df.schema.fields)
            + [
                T.StructField("x_s", T.StringType(), True),
                T.StructField("x_t", T.StringType(), True),
            ]
        )
        cols = [f.name for f in schema.fields]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pairs = [fn(u, a) for u, a in zip(pdf["url"], pdf["a1"])]
                yield pdf.assign(
                    x_s=[p[0] for p in pairs], x_t=[p[1] for p in pairs]
                )[cols]

        return df.mapInPandas(run, schema=schema)

    return transform
