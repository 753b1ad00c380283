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
    # S6 media: failover winner + chunk-streamed payload accounting
    # (reference core/downloader.py:184-218, core/media.py:36-42)
    T.StructField("media_ref", T.StringType(), True),
    T.StructField("media_bytes", T.BinaryType(), True),
    T.StructField("n_chunks", T.IntegerType(), True),
    # set when the fetcher runs with a media sink: bytes were streamed to
    # this file DURING the fetch (media_bytes stays null) — the scale path
    # per SURVEY §2 S6 ("never materialize bytes in a column")
    T.StructField("media_path", T.StringType(), True),
    # explicit payload byte count, set in BOTH inline and sink modes —
    # fetch_log lineage must not lose byte accounting exactly on the
    # at-scale sink path (ADVICE r02)
    T.StructField("bytes_fetched", T.LongType(), True),
]


def media_filename(url: str) -> str:
    """Collision-safe sink filename: short url-hash prefix + sanitized
    basename (reference sanitty: utils/helper.py:15, naming:
    core/downloader.py:48-49)."""
    import hashlib
    import re as _re

    base = url.rstrip("/").rsplit("/", 1)[-1] or "media"
    base = _re.sub(r'[\\/:*?"<>|]', "_", base)[:80]
    return f"{hashlib.md5(url.encode()).hexdigest()[:10]}_{base}"

DEFAULT_CHUNK_SIZE = 16  # bytes, test-scale stand-in for the 10MB/1MB
# CHUNK_SIZE constants (reference const.py:1, spiders/bilibili/const.py:10)


def _fetch_media_chunked(
    read_candidate, candidates: list[str], attempt: int, chunk_size: int
) -> tuple[int | None, str | None, str | None, bytes | None, int | None]:
    """Ordered failover + chunked streaming, shared by all fetchers.

    Tries each candidate URL in order within ONE attempt; on the first
    HTTP-200, streams its payload in ``chunk_size`` slices (the reference's
    iter_content loop).  Returns (status, error, media_ref, media_bytes,
    n_chunks) — status/error reflect the LAST candidate tried on total
    failure, so retry classification matches the single-URL path.
    """
    status, err = None, None
    for cu in candidates:
        status, payload, err = read_candidate(cu, attempt)
        if status == 200:
            chunks = [
                payload[i : i + chunk_size]
                for i in range(0, max(len(payload), 1), chunk_size)
            ]
            return status, err, cu, b"".join(chunks), len(chunks)
    return status, err, None, None, None


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


def partition_for_fetch(
    scheduled, partitions: int | None, colocate_hosts: bool = True
):
    """Partitioning policy for the fetch stage.

    ``partitions=None`` trusts upstream (the politeness window already
    hash-partitioned by host — adding a repartition would be a pure extra
    shuffle).  With a partition count, ``colocate_hosts=True`` keeps each
    host's URLs in one task (per-host connection reuse, locally-observable
    politeness accounting); ``colocate_hosts=False`` round-robins for
    perfectly even task sizes instead — a correctness-free choice because
    the per-host budget is enforced UPSTREAM by the window, and the right
    trade when hot-host skew makes the fetch stage straggler-bound
    (pinned-host A/B at local[8]/4M: 23.1 s colocated vs 22.2 s balanced;
    results are fetch-identical either way — golden-tested).
    """
    if not partitions:
        return scheduled
    if colocate_hosts:
        return scheduled.repartition(partitions, "host")
    # balanced spread WITHOUT round-robin: a keyless repartition(n) first
    # pays a local sort of its whole input (sortBeforeRepartition, needed
    # so retries reproduce the row→partition map); hashing the already-
    # deterministic url_hash spreads ~as evenly (10^6 distinct keys into
    # n partitions), is retry-stable by construction, and skips the sort.
    from pyspark.sql import functions as F

    return scheduled.repartition(partitions, F.xxhash64("url_hash"))


class SyntheticFetcher:
    """Deterministic fetcher over a parquet 'site' (FIXTURES.md §2).

    Failure injection is attempt-indexed (see fixtures.synthetic_response),
    so retried rows deterministically succeed/fail — reproducing the
    reference retry matrix (utils/decorator.py:13-47) without wall-clock.
    """

    def __init__(self, site_path: str, partitions: int | None = None,
                 chunk_size: int = DEFAULT_CHUNK_SIZE,
                 media_sink_dir: str | None = None,
                 colocate_hosts: bool = True):
        """``media_sink_dir``: when set, media payloads are chunk-streamed
        to files in that directory INSIDE the fetch worker (K3-style file
        sink; the object-store path at scale) and ``media_bytes`` stays
        null — only the reference travels through the plan."""
        self.site_path = site_path
        self.partitions = partitions
        self.chunk_size = chunk_size
        self.media_sink_dir = media_sink_dir
        self.colocate_hosts = colocate_hosts

    def fetch(self, scheduled: DataFrame) -> DataFrame:
        out_schema = fetched_schema(scheduled.schema)
        out_cols = [f.name for f in out_schema.fields]
        site_path = self.site_path
        chunk_size = self.chunk_size
        sink_dir = self.media_sink_dir
        has_backups = "backup_urls" in scheduled.columns

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            site = _load_site(site_path)
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx else -1

            def read_candidate(u: str, attempt: int):
                page = site.get(u)
                status, body, err = synthetic_response(page, attempt)
                return status, (body or "").encode("utf-8"), err

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                statuses, bodies, lats, errs = [], [], [], []
                mrefs, mbytes, mchunks, mpaths, nbytes = [], [], [], [], []
                backups = (
                    pdf["backup_urls"] if has_backups else [None] * len(pdf)
                )
                for url, attempt, kind, backup in zip(
                    pdf["url"], pdf["attempt"], pdf["kind"], backups
                ):
                    page = site.get(url)
                    if kind == "media":
                        cands = [url] + (list(backup) if backup is not None else [])
                        status, err, mref, mb, nch = _fetch_media_chunked(
                            read_candidate, cands, int(attempt), chunk_size
                        )
                        nbytes.append(len(mb) if mb is not None else None)
                        path = None
                        if sink_dir is not None and mb is not None:
                            # stream to the file sink inside the worker;
                            # only the path travels through the plan
                            import os

                            os.makedirs(sink_dir, exist_ok=True)
                            path = os.path.join(sink_dir, media_filename(url))
                            with open(path, "wb") as fh:
                                for i in range(0, len(mb), chunk_size):
                                    fh.write(mb[i : i + chunk_size])
                            mb = None
                        statuses.append(status)
                        bodies.append(None)
                        mrefs.append(mref)
                        mbytes.append(mb)
                        mchunks.append(nch)
                        mpaths.append(path)
                        win = site.get(mref) if mref else page
                        lats.append(int(win["latency_ms"]) if win else 0)
                        errs.append(err)
                        continue
                    status, body, err = synthetic_response(page, int(attempt))
                    statuses.append(status)
                    bodies.append(body)
                    lats.append(int(page["latency_ms"]) if page else 0)
                    errs.append(err)
                    mrefs.append(None)
                    mbytes.append(None)
                    mchunks.append(None)
                    mpaths.append(None)
                    nbytes.append(None)
                yield pdf.assign(
                    status=pd.array(statuses, dtype="int32"),
                    body=pd.array(bodies, dtype="object"),
                    latency_ms=pd.array(lats, dtype="int32"),
                    error=pd.array(errs, dtype="object"),
                    partition_id=pid,
                    media_ref=pd.array(mrefs, dtype="object"),
                    media_bytes=pd.array(mbytes, dtype="object"),
                    n_chunks=pd.array(mchunks, dtype="Int32"),
                    media_path=pd.array(mpaths, dtype="object"),
                    bytes_fetched=pd.array(nbytes, dtype="Int64"),
                )[out_cols]

        # co-locate a host's URLs in one task (politeness accounting stays
        # local, per-host connections are reused).  partitions=None trusts
        # the upstream partitioning — the politeness window already
        # hash-partitioned by host, so adding a repartition here would be a
        # pure extra shuffle.
        scheduled = partition_for_fetch(
            scheduled, self.partitions, self.colocate_hosts
        )
        return scheduled.mapInPandas(run, schema=out_schema)


def _http_request_kwargs(
    ua: str, timeout_s: float, proxies: dict | None
) -> dict:
    """Per-request keyword merge mirroring the reference client
    (core/client.py:86,100-117,142-177): User-Agent header always set,
    proxies attached per request when configured.  Pure function so the
    merge is unit-testable without a network or a real Session."""
    kw: dict = {"timeout": timeout_s, "headers": {"User-Agent": ua}}
    if proxies:
        kw["proxies"] = dict(proxies)
    return kw


def _install_cookies(session, cookies: dict | None) -> None:
    """Install configured cookies on the per-worker session — sent with
    every request, matching the reference's cookie merge
    (core/client.py:86,142)."""
    if cookies:
        session.cookies.update(cookies)


class HttpFetcher:
    """Real-HTTP fetcher (NOT exercised in the sandbox — no network).

    Mirrors the reference client semantics: pooled Session per worker
    (core/client.py:83), rotating User-Agent (core/client.py:100-112),
    per-request proxies and session cookies (core/client.py:86,142-177;
    conf/settings.py:63).  Import-gated so the package never hard-depends
    on ``requests``.
    """

    def __init__(self, timeout_s: float = 10.0, user_agents: list[str] | None = None,
                 partitions: int | None = None, media_sink_dir: str | None = None,
                 colocate_hosts: bool = True, proxies: dict | None = None,
                 cookies: dict | None = None):
        self.timeout_s = timeout_s
        self.user_agents = user_agents or ["spiders-for-all-spark/0.1"]
        self.partitions = partitions
        self.colocate_hosts = colocate_hosts
        # None = let the engine default this to the warehouse media sink
        self.media_sink_dir = media_sink_dir
        self.proxies = dict(proxies) if proxies else None
        self.cookies = dict(cookies) if cookies else None

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
        sink_dir = self.media_sink_dir
        proxies, cookies = self.proxies, self.cookies

        chunk_size = 10 * 1024 * 1024  # reference const.py:1 CHUNK_SIZE
        has_backups = "backup_urls" in scheduled.columns

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
            import time

            import requests

            session = requests.Session()
            _install_cookies(session, cookies)
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx else -1

            def read_candidate(u: str, attempt: int):
                try:
                    resp = session.get(
                        u,
                        stream=True,
                        **_http_request_kwargs(
                            uas[attempt % len(uas)], timeout, proxies
                        ),
                    )
                    payload = b"".join(resp.iter_content(chunk_size=chunk_size))
                    return resp.status_code, payload, None
                except requests.RequestException as exc:
                    return None, b"", f"{type(exc).__name__}: {exc}"

            for pdf in batches:
                statuses, bodies, lats, errs = [], [], [], []
                mrefs, mbytes, mchunks, nbytes, mpaths = [], [], [], [], []
                backups = pdf["backup_urls"] if has_backups else [None] * len(pdf)
                kinds = pdf["kind"] if "kind" in pdf.columns else [""] * len(pdf)
                for i, (url, kind, backup) in enumerate(zip(pdf["url"], kinds, backups)):
                    t0 = time.monotonic()
                    if kind == "media":
                        cands = [url] + (list(backup) if backup is not None else [])
                        status, err, mref, mb, nch = _fetch_media_chunked(
                            read_candidate, cands, 0, chunk_size
                        )
                        nbytes.append(len(mb) if mb is not None else None)
                        path = None
                        if sink_dir is not None and mb is not None:
                            import os

                            os.makedirs(sink_dir, exist_ok=True)
                            path = os.path.join(sink_dir, media_filename(url))
                            with open(path, "wb") as fh:
                                for ci in range(0, len(mb), chunk_size):
                                    fh.write(mb[ci : ci + chunk_size])
                            mb = None
                        statuses.append(status)
                        bodies.append(None)
                        errs.append(err)
                        mrefs.append(mref)
                        mbytes.append(mb)
                        mchunks.append(nch)
                        mpaths.append(path)
                        lats.append(int((time.monotonic() - t0) * 1000))
                        continue
                    try:
                        resp = session.get(
                            url,
                            **_http_request_kwargs(
                                uas[i % len(uas)], timeout, proxies
                            ),
                        )
                        statuses.append(resp.status_code)
                        bodies.append(resp.text)
                        errs.append(None)
                    except requests.RequestException as exc:
                        statuses.append(None)
                        bodies.append(None)
                        errs.append(f"{type(exc).__name__}: {exc}")
                    mrefs.append(None)
                    mbytes.append(None)
                    mchunks.append(None)
                    nbytes.append(None)
                    mpaths.append(None)
                    lats.append(int((time.monotonic() - t0) * 1000))
                yield pdf.assign(
                    status=pd.array(statuses, dtype="Int32"),
                    body=pd.array(bodies, dtype="object"),
                    latency_ms=pd.array(lats, dtype="int32"),
                    error=pd.array(errs, dtype="object"),
                    partition_id=pid,
                    media_ref=pd.array(mrefs, dtype="object"),
                    media_bytes=pd.array(mbytes, dtype="object"),
                    n_chunks=pd.array(mchunks, dtype="Int32"),
                    media_path=pd.array(mpaths, dtype="object"),
                    bytes_fetched=pd.array(nbytes, dtype="Int64"),
                )[out_cols]

        scheduled = partition_for_fetch(
            scheduled, self.partitions, self.colocate_hosts
        )
        return scheduled.mapInPandas(run, schema=out_schema)


class ProceduralFetcher:
    """Deterministic fetcher that synthesizes the response from the URL
    itself inside the Arrow worker — no site table, no I/O.

    The bench stand-in for network fetch at 10^6..10^10 frontier scale:
    every URL yields a valid two-item JSON envelope (parse does real work),
    cost is pure CPU, and results are reproducible at any N.
    """

    def __init__(self, items_per_page: int = 2, partitions: int | None = None,
                 colocate_hosts: bool = True):
        self.items_per_page = items_per_page
        self.partitions = partitions
        self.colocate_hosts = colocate_hosts

    def fetch(self, scheduled: DataFrame) -> DataFrame:
        out_schema = fetched_schema(scheduled.schema)
        out_cols = [f.name for f in out_schema.fields]
        k = self.items_per_page

        # the body template around each of the k url references, flattened
        # so the whole batch synthesizes as ONE native Arrow element-wise
        # join (guide §4.2: vectorized kernels, not per-row Python) —
        # byte-identical to the original per-row f-string construction
        pieces: list[str] = ['{"code": 0, "message": "ok", "data": {"list": [']
        for i in range(k):
            if i:
                pieces[-1] += ", "
            pieces[-1] += '{"id": "'
            pieces += [
                f'#item{i}", "title": "t{i}", "desc": "desc of ',
                f" item {i}\", \"images\": [\"",
                f'/img{i}.jpg"], "videos": []}}',
            ]
        pieces[-1] += '], "out_links": []}}'

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import pyarrow as pa
            import pyarrow.compute as pc

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx else -1
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                u = pa.array(pdf["url"], type=pa.string())
                args: list = [pieces[0]]
                for tail in pieces[1:]:
                    args += [u, tail]
                bodies = pc.binary_join_element_wise(*args, "").to_pandas()
                yield pdf.assign(
                    status=pd.array([200] * len(pdf), dtype="int32"),
                    body=bodies,
                    latency_ms=pd.array([1] * len(pdf), dtype="int32"),
                    error=pd.array([None] * len(pdf), dtype="object"),
                    partition_id=pid,
                    media_ref=pd.array([None] * len(pdf), dtype="object"),
                    media_bytes=pd.array([None] * len(pdf), dtype="object"),
                    n_chunks=pd.array([None] * len(pdf), dtype="Int32"),
                    media_path=pd.array([None] * len(pdf), dtype="object"),
                    bytes_fetched=pd.array([None] * len(pdf), dtype="Int64"),
                )[out_cols]

        scheduled = partition_for_fetch(
            scheduled, self.partitions, self.colocate_hosts
        )
        return scheduled.mapInPandas(run, schema=out_schema)
