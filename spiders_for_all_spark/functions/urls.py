"""URL canonicalization + hashing as pure Catalyst column expressions.

The reference dedups URLs implicitly via DB unique constraints and
``sorted(set(ids))`` (reference: spiders_for_all/utils/helper.py:55,
spiders/bilibili/downloader.py:295) and builds query strings with
``urlencode(sorted(params))`` (spiders/bilibili/spiders.py:574-580).
Here canonicalization is explicit and entirely JVM-side (regexp/array
builtins — whole-stage-codegen friendly, no Python in the hot path):

  * strip fragment
  * lowercase scheme and host
  * drop default ports (:80 http, :443 https)
  * sort query parameters lexicographically
  * empty path -> '/'

The same transform is expressible in ANSI SQL (see __spark_entry__.py
oracle pairs), which is how it is oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOSTPORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _no_fragment(url: Column) -> Column:
    return F.regexp_replace(F.trim(url), "#.*$", "")


def url_scheme(url: Column) -> Column:
    u = _no_fragment(url)
    s = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    return F.when(s == "", F.lit("http")).otherwise(s)


def url_host(url: Column) -> Column:
    """Lowercased host with default port stripped."""
    u = _no_fragment(url)
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    return F.regexp_replace(hostport, ":(80|443)$", "")


def url_path(url: Column) -> Column:
    u = _no_fragment(url)
    p = F.regexp_extract(u, _PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query_sorted(url: Column) -> Column:
    u = _no_fragment(url)
    q = F.regexp_extract(u, _QUERY_RE, 1)
    return F.when(q == "", F.lit("")).otherwise(
        F.array_join(F.array_sort(F.split(q, "&")), "&")
    )


def canonicalize_url(url: Column) -> Column:
    q = url_query_sorted(url)
    return F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        url_path(url),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def url_hash(url: Column, *, canonical: bool = True) -> Column:
    """64-bit seen-set key: xxhash64 of the canonical URL (F9 in SURVEY §2.9).

    xxhash64 is a JVM builtin — safe at 10^10 keys (collision odds ~3e-3 at
    1e10 via birthday bound on 64 bits; the seen-set anti-join is exact on
    the hash, and the bloom path always exact-confirms, so a collision can
    only cause a skipped re-crawl, never a wrong document).
    """
    c = canonicalize_url(url) if canonical else url
    return F.xxhash64(c)


# ---------------------------------------------------------------------------
# Pure-python twin used by the reference-semantics simulator (tests must see
# the identical canonical form the Catalyst expressions produce).
import re as _re

_PY_SCHEME = _re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://")
_PY_HOSTPORT = _re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)")
_PY_PATH = _re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)")
_PY_QUERY = _re.compile(r"\?([^#]*)")


def canonicalize_url_py(url: str) -> str:
    u = _re.sub(r"#.*$", "", url.strip())
    m = _PY_SCHEME.search(u)
    scheme = m.group(1).lower() if m else "http"
    m = _PY_HOSTPORT.search(u)
    host = _re.sub(r":(80|443)$", "", (m.group(1).lower() if m else ""))
    m = _PY_PATH.search(u)
    path = m.group(1) if m and m.group(1) else "/"
    m = _PY_QUERY.search(u)
    query = "&".join(sorted(m.group(1).split("&"))) if m and m.group(1) else ""
    return f"{scheme}://{host}{path}" + (f"?{query}" if query else "")


def host_of_url_py(url: str) -> str:
    u = _re.sub(r"#.*$", "", url.strip())
    m = _PY_HOSTPORT.search(u)
    return _re.sub(r":(80|443)$", "", (m.group(1).lower() if m else ""))


def with_url_columns(df, url_col: str = "url"):
    """Append canonical_url / url_hash / host derived columns."""
    u = F.col(url_col)
    return (
        df.withColumn("canonical_url", canonicalize_url(u))
        .withColumn("url_hash", F.xxhash64(F.col("canonical_url")))
        .withColumn("host", url_host(u))
    )
