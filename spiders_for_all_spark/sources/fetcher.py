"""Fetch stage: batched, partition-pooled URL fetching as mapInPandas.

Replaces the reference's synchronous ``HttpClient.request`` + retry +
UA-rotation loop (reference: core/client.py:83,100-117,142-190) with one
Arrow-batched stage: the scheduled frontier is repartitioned by host, each
Python worker keeps a per-process resource (the parquet site index in test
mode; a pooled ``requests.Session`` in HTTP mode — the Session-reuse analog
of core/client.py:83), and fetches a whole batch per invocation.  No
per-row Python UDFs, no executor sleeps.

Fetchers are pluggable (SURVEY §4.3.4): tests and benches use
:class:`SyntheticFetcher` (deterministic, closed-world); a real crawl would
use :class:`HttpFetcher` (gated behind an import-try; not exercised in the
sandbox).
"""

from __future__ import annotations

import functools
from collections.abc import Iterator

import pandas as pd

from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from spiders_for_all_spark import schemas as S
from spiders_for_all_spark.fixtures import synthetic_response

FETCH_FIELDS = [
    T.StructField("status", T.IntegerType(), True),
    T.StructField("body", T.StringType(), True),
    T.StructField("latency_ms", T.IntegerType(), True),
    T.StructField("error", T.StringType(), True),
    T.StructField("partition_id", T.IntegerType(), True),
]


def fetched_schema(input_schema: T.StructType) -> T.StructType:
    names = {f.name for f in FETCH_FIELDS}
    return T.StructType(
        [f for f in input_schema.fields if f.name not in names] + FETCH_FIELDS
    )


@functools.lru_cache(maxsize=4)
def _load_site(path: str) -> dict[str, dict]:
    """Per-python-worker site index (the connection-pool analog)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    rows = tbl.to_pylist()
    return {r["url"]: r for r in rows}


class SyntheticFetcher:
    """Deterministic fetcher over a parquet 'site' (FIXTURES.md §2).

    Failure injection is attempt-indexed (see fixtures.synthetic_response),
    so retried rows deterministically succeed/fail — reproducing the
    reference retry matrix (utils/decorator.py:13-47) without wall-clock.
    """

    def __init__(self, site_path: str, partitions: int | None = None):
        self.site_path = site_path
        self.partitions = partitions

    def fetch(self, scheduled: DataFrame) -> DataFrame:
        out_schema = fetched_schema(scheduled.schema)
        out_cols = [f.name for f in out_schema.fields]
        site_path = self.site_path

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            site = _load_site(site_path)
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx else -1
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                statuses, bodies, lats, errs = [], [], [], []
                for url, attempt in zip(pdf["url"], pdf["attempt"]):
                    page = site.get(url)
                    status, body, err = synthetic_response(page, int(attempt))
                    statuses.append(status)
                    bodies.append(body)
                    lats.append(int(page["latency_ms"]) if page else 0)
                    errs.append(err)
                yield pdf.assign(
                    status=pd.array(statuses, dtype="int32"),
                    body=pd.array(bodies, dtype="object"),
                    latency_ms=pd.array(lats, dtype="int32"),
                    error=pd.array(errs, dtype="object"),
                    partition_id=pid,
                )[out_cols]

        # co-locate a host's URLs in one task (politeness accounting stays
        # local, per-host connections are reused).  partitions=None trusts
        # the upstream partitioning — the politeness window already
        # hash-partitioned by host, so adding a repartition here would be a
        # pure extra shuffle.
        if self.partitions:
            scheduled = scheduled.repartition(self.partitions, "host")
        return scheduled.mapInPandas(run, schema=out_schema)


class HttpFetcher:
    """Real-HTTP fetcher (NOT exercised in the sandbox — no network).

    Mirrors the reference client semantics: pooled Session per worker
    (core/client.py:83), rotating User-Agent (core/client.py:100-112),
    optional proxies (conf/settings.py:63).  Import-gated so the package
    never hard-depends on ``requests``.
    """

    def __init__(self, timeout_s: float = 10.0, user_agents: list[str] | None = None,
                 partitions: int | None = None):
        self.timeout_s = timeout_s
        self.user_agents = user_agents or ["spiders-for-all-spark/0.1"]
        self.partitions = partitions

    def fetch(self, scheduled: DataFrame) -> DataFrame:
        try:
            import requests  # noqa: F401
        except ImportError as exc:  # pragma: no cover
            raise NotImplementedError(
                "HttpFetcher requires the 'requests' package; use "
                "SyntheticFetcher in offline environments"
            ) from exc
        out_schema = fetched_schema(scheduled.schema)
        out_cols = [f.name for f in out_schema.fields]
        timeout, uas = self.timeout_s, self.user_agents

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
            import time

            import requests

            session = requests.Session()
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx else -1
            for pdf in batches:
                statuses, bodies, lats, errs = [], [], [], []
                for i, url in enumerate(pdf["url"]):
                    t0 = time.monotonic()
                    try:
                        resp = session.get(
                            url,
                            timeout=timeout,
                            headers={"User-Agent": uas[i % len(uas)]},
                        )
                        statuses.append(resp.status_code)
                        bodies.append(resp.text)
                        errs.append(None)
                    except requests.RequestException as exc:
                        statuses.append(None)
                        bodies.append(None)
                        errs.append(f"{type(exc).__name__}: {exc}")
                    lats.append(int((time.monotonic() - t0) * 1000))
                yield pdf.assign(
                    status=pd.array(statuses, dtype="Int32"),
                    body=pd.array(bodies, dtype="object"),
                    latency_ms=pd.array(lats, dtype="int32"),
                    error=pd.array(errs, dtype="object"),
                    partition_id=pid,
                )[out_cols]

        if self.partitions:
            scheduled = scheduled.repartition(self.partitions, "host")
        return scheduled.mapInPandas(run, schema=out_schema)


class ProceduralFetcher:
    """Deterministic fetcher that synthesizes the response from the URL
    itself inside the Arrow worker — no site table, no I/O.

    The bench stand-in for network fetch at 10^6..10^10 frontier scale:
    every URL yields a valid two-item JSON envelope (parse does real work),
    cost is pure CPU, and results are reproducible at any N.
    """

    def __init__(self, items_per_page: int = 2, partitions: int | None = None):
        self.items_per_page = items_per_page
        self.partitions = partitions

    def fetch(self, scheduled: DataFrame) -> DataFrame:
        out_schema = fetched_schema(scheduled.schema)
        out_cols = [f.name for f in out_schema.fields]
        k = self.items_per_page

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx else -1
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                bodies = [
                    '{"code": 0, "message": "ok", "data": {"list": ['
                    + ", ".join(
                        f'{{"id": "{u}#item{i}", "title": "t{i}", '
                        f'"desc": "desc of {u} item {i}", '
                        f'"images": ["{u}/img{i}.jpg"], "videos": []}}'
                        for i in range(k)
                    )
                    + '], "out_links": []}}'
                    for u in pdf["url"]
                ]
                yield pdf.assign(
                    status=pd.array([200] * len(pdf), dtype="int32"),
                    body=bodies,
                    latency_ms=pd.array([1] * len(pdf), dtype="int32"),
                    error=pd.array([None] * len(pdf), dtype="object"),
                    partition_id=pid,
                )[out_cols]

        if self.partitions:
            scheduled = scheduled.repartition(self.partitions, "host")
        return scheduled.mapInPandas(run, schema=out_schema)
