"""Property-based tests (hypothesis) for the deterministic core.

These cover the invariants the golden tests rely on: canonicalization
idempotence + python/Catalyst agreement, frontier successor round-trips,
and engine≍simulator equality on randomized sites.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spiders_for_all_spark.functions.urls import canonicalize_url_py, host_of_url_py
from spiders_for_all_spark.operators.frontier import (
    next_cursor_url_py,
    next_page_url_py,
    url_page_no_py,
)

scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS"])
host = st.from_regex(r"[a-zA-Z0-9][a-zA-Z0-9.-]{0,20}", fullmatch=True)
path = st.from_regex(r"(/[a-zA-Z0-9._~-]{0,8}){0,4}", fullmatch=True)
qkey = st.from_regex(r"[a-z]{1,6}", fullmatch=True)
qval = st.from_regex(r"[a-zA-Z0-9_-]{0,8}", fullmatch=True)
query = st.lists(st.tuples(qkey, qval), min_size=0, max_size=5)
fragment = st.sampled_from(["", "#frag", "#a/b?c=1"])


@st.composite
def urls(draw):
    s = draw(scheme)
    h = draw(host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    p = draw(path)
    q = draw(query)
    qs = "&".join(f"{k}={v}" for k, v in q)
    f = draw(fragment)
    return f"{s}://{h}{port}{p}" + (f"?{qs}" if qs else "") + f


@given(urls())
@settings(max_examples=300, suppress_health_check=[HealthCheck.too_slow])
def test_canonicalize_idempotent(u):
    c = canonicalize_url_py(u)
    assert canonicalize_url_py(c) == c
    # canonical form always has a path and no default port / fragment
    assert "#" not in c
    assert ":80/" not in c and ":443/" not in c
    assert host_of_url_py(c) == host_of_url_py(u)


@given(st.integers(min_value=1, max_value=10**6), st.integers(1, 99))
def test_page_succession_roundtrip(page, size):
    u = f"https://h.com/api/list?chain=3&page={page}&size={size}"
    nxt = next_page_url_py(u)
    assert url_page_no_py(nxt) == page + 1
    assert nxt.replace(f"page={page + 1}", "") == u.replace(f"page={page}", "")


@given(st.from_regex(r"[a-zA-Z0-9]{0,12}", fullmatch=True),
       st.from_regex(r"[a-zA-Z0-9]{1,12}", fullmatch=True))
def test_cursor_succession(cur, nxt):
    u = f"https://h.com/api/comments?chain=0&cursor={cur}"
    out = next_cursor_url_py(u, nxt)
    assert out == f"https://h.com/api/comments?chain=0&cursor={nxt}"


def test_cursor_replacement_literal_spark(spark):
    """A cursor containing '$' or '\\' must be substituted LITERALLY by the
    Catalyst next_cursor_url (Java regex replacement escaping), matching the
    python twin exactly (ADVICE r01)."""
    from pyspark.sql import functions as F
    from spiders_for_all_spark.operators.frontier import (
        next_cursor_url,
        next_cursor_url_py,
    )

    cursors = ["$2", "a$b", "back\\slash", "$", "\\1", "plain", "$$\\$"]
    url = "https://h.com/api/comments?chain=0&cursor=old"
    df = spark.createDataFrame([(url, c) for c in cursors], "url string, cur string")
    got = [
        r[0]
        for r in df.select(next_cursor_url(F.col("url"), F.col("cur"))).collect()
    ]
    assert got == [next_cursor_url_py(url, c) for c in cursors]


def test_canonicalize_spark_agrees_on_random_urls(spark):
    import random

    rng = random.Random(123)
    examples = []
    for _ in range(200):
        s = rng.choice(["http", "HTTP", "https"])
        h = "".join(rng.choice("abcXYZ09.-") for _ in range(rng.randint(1, 12))).strip("-.") or "h"
        port = rng.choice(["", ":80", ":443", ":9090"])
        p = rng.choice(["", "/", "/a/b", "/A%20b"])
        q = "&".join(
            f"{rng.choice('abc')}={rng.randint(0, 99)}" for _ in range(rng.randint(0, 4))
        )
        u = f"{s}://{h}{port}{p}" + (f"?{q}" if q else "") + rng.choice(["", "#z"])
        examples.append(u)
    from pyspark.sql import functions as F
    from spiders_for_all_spark.functions.urls import canonicalize_url

    df = spark.createDataFrame([(u,) for u in examples], "url string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [canonicalize_url_py(u) for u in examples]


@pytest.mark.parametrize("seed", [101, 202])
def test_engine_equals_simulator_on_random_sites(spark, tmp_path, seed):
    """Randomized-world golden equality (smaller than the main golden suite)."""
    import random

    from spiders_for_all_spark import fixtures as FX
    from spiders_for_all_spark.engine import Crawler, CrawlConfig
    from spiders_for_all_spark.functions.urls import canonicalize_url
    from spiders_for_all_spark.simulator import simulate
    from spiders_for_all_spark.sources.fetcher import SyntheticFetcher
    from spiders_for_all_spark.storage import SnapshotStorage
    from pyspark.sql import functions as F

    rng = random.Random(seed)
    rows, seeds = FX.build_site(
        n_hosts=rng.randint(1, 3),
        page_chains=rng.randint(1, 2),
        pages_per_chain=rng.randint(1, 4),
        page_size=rng.randint(1, 3),
        cursor_pages=rng.randint(1, 3),
        notes_per_host=rng.randint(0, 2),
        seed=seed,
    )
    fail_candidates = sorted(r["url"] for r in rows)
    fail_specs = {
        u: (rng.randint(1, 4), rng.choice(["http", "code", "parse"]))
        for u in rng.sample(fail_candidates, min(3, len(fail_candidates)))
    }
    rows, seeds = FX.build_site(
        n_hosts=rng.randint(1, 3), page_chains=1, pages_per_chain=3,
        page_size=2, cursor_pages=2, notes_per_host=1, seed=seed,
        fail_specs={u: s for u, s in fail_specs.items()},
        alias_note_seed=bool(seed % 2),
    )
    site = str(tmp_path / "p.parquet")
    FX.write_site(rows, site)
    budget = rng.randint(1, 4)
    storage = SnapshotStorage(spark, str(tmp_path / "wh"))
    Crawler(
        spark, storage, SyntheticFetcher(site, partitions=4),
        CrawlConfig(max_rounds=40, default_budget=budget, max_attempts=3),
    ).run(seeds=seeds)
    sim = simulate(FX.site_index(rows), seeds, max_rounds=40,
                   default_budget=budget, max_attempts=3)
    log = storage.read("fetch_log")
    eng = sorted(
        (int(r["round"]), r["c"])
        for r in log.select("round", canonicalize_url(F.col("url")).alias("c")).collect()
    )
    assert eng == sorted((rnd, c) for rnd, c, _ in sim.visits)
    docs = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in storage.read("documents").collect()
    }
    simdocs = {
        k: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in v]
        for k, v in sim.documents.items()
    }
    assert docs == simdocs


# ---------------------------------------------------------------------------
# robots.txt: Catalyst parser vs an independent pure-python RFC 9309 model


def _robots_model(body: str, agent: str = "*"):
    """Independent reference: consecutive User-agent lines form one group;
    a group matches if ANY of its agents equals `agent`; disallow rules in
    file order; crawl_delay = max over matched groups; None if no group
    matches."""
    import re

    sec, prev_is_ua = 0, False
    agents: dict[int, set] = {}
    rows = []
    for i, raw in enumerate(body.split("\n")):
        line = re.sub(r"#.*$", "", raw).strip()
        m = re.match(r"(?i)^user-agent:\s*(\S+)", line)
        is_ua = bool(m)
        if is_ua and not prev_is_ua:
            sec += 1
        prev_is_ua = is_ua
        if is_ua:
            agents.setdefault(sec, set()).add(m.group(1).lower())
        rows.append((sec, i, line))
    matched = {s for s, ags in agents.items() if agent.lower() in ags}
    if not matched:
        return None
    dis, delay = [], None
    for s, _i, line in rows:
        if s not in matched:
            continue
        dm = re.match(r"(?i)^disallow:\s*(\S+)", line)
        if dm:
            dis.append(dm.group(1))
        cm = re.match(r"(?i)^crawl-delay:\s*([0-9.]+)", line)
        if cm:
            v = float(cm.group(1))
            delay = v if delay is None else max(delay, v)
    return dis, delay


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_robots_parser_matches_model(spark, seed):
    import random

    from spiders_for_all_spark.operators.politeness import (
        robots_table_from_bodies,
    )

    rng = random.Random(seed)
    pieces = [
        lambda: f"User-agent: {rng.choice(['*', 'googlebot', 'BingBot'])}",
        lambda: f"Disallow: /{rng.choice(['a', 'b/c', 'tmp'])}",
        lambda: "Disallow:",  # empty path -> not a rule
        lambda: f"Crawl-delay: {rng.choice(['1', '2.5', '10'])}",
        lambda: "# comment only",
        lambda: "",
        lambda: "Allow: /open",  # ignored directive
        lambda: f"Disallow: /x{rng.randrange(9)} # inline comment",
    ]
    bodies = {}
    for h in range(25):
        n = rng.randrange(0, 12)
        bodies[f"h{h}.example.com"] = "\n".join(
            rng.choice(pieces)() for _ in range(n)
        )
    df = spark.createDataFrame(
        list(bodies.items()), "host string, body string"
    )
    got = {
        r["host"]: (list(r["disallow"]), r["crawl_delay"])
        for r in robots_table_from_bodies(df).collect()
    }
    want = {
        h: (m[0], m[1])
        for h, b in bodies.items()
        if (m := _robots_model(b)) is not None
    }
    assert got == want


# ---------------------------------------------------------------------------
# Cleaning family vs independent Python models


def _passage_dedup_model(docs: list[tuple[int, str]], n: int):
    """Independent model of cleaning.passage_dedup: normalize, chunk into
    n-word passages, first (doc_id, pos) occurrence of each distinct
    passage wins, survivors reassemble in pos order."""
    import re

    chunks = []  # (doc_id, pos, passage)
    for doc_id, text in docs:
        words = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        n_chunks = -(-len(words) // n)
        for i in range(n_chunks):
            chunks.append((doc_id, i, " ".join(words[i * n : i * n + n])))
    first: dict[str, tuple[int, int]] = {}
    for doc_id, pos, p in sorted(chunks, key=lambda c: (c[0], c[1])):
        first.setdefault(p, (doc_id, pos))
    out = {}
    for doc_id, _ in docs:
        mine = [(pos, p) for d, pos, p in chunks if d == doc_id]
        kept = [p for pos, p in sorted(mine) if first[p] == (doc_id, pos)]
        out[doc_id] = (len(mine), len(kept), " ".join(kept))
    return out


@pytest.mark.parametrize("seed", [11, 23])
def test_passage_dedup_matches_model(spark, seed):
    import random

    from spiders_for_all_spark.operators.cleaning import passage_dedup

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for doc_id in range(40):
        n_words = rng.randint(1, 30)
        words = [rng.choice(vocab) for _ in range(n_words)]
        docs.append((doc_id, " ".join(words)))
    # inject verbatim duplicated regions (the case the operator exists for)
    for dup in range(5):
        src_id, src_text = docs[rng.randrange(len(docs))]
        tgt = rng.randrange(len(docs))
        docs[tgt] = (docs[tgt][0], src_text + " " + docs[tgt][1])

    model = _passage_dedup_model(docs, n=4)
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_passages"], r["n_kept"], r["text_kept"])
        for r in passage_dedup(df, n_words=4).collect()
    }
    assert got == model


def _suffixes_model(host: str) -> list[str]:
    parts = host.split(".")
    return [".".join(parts[i:]) for i in range(len(parts))]


@given(
    st.lists(
        st.from_regex(r"[a-z]{1,3}(\.[a-z]{1,3}){0,3}", fullmatch=True),
        min_size=1,
        max_size=12,
        unique=True,
    ),
    st.lists(
        st.from_regex(r"[a-z]{1,3}(\.[a-z]{1,3}){0,2}", fullmatch=True),
        min_size=1,
        max_size=4,
        unique=True,
    ),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_blocklist_matches_model(spark, hosts, domains):
    from spiders_for_all_spark.operators.cleaning import blocklist_filter

    frontier = spark.createDataFrame(
        [(f"u{i}", h) for i, h in enumerate(hosts)], "url string, host string"
    )
    bl = spark.createDataFrame([(d,) for d in domains], ["domain"])
    got = {r["url"] for r in blocklist_filter(frontier, bl).collect()}
    want = {
        f"u{i}"
        for i, h in enumerate(hosts)
        if not any(s in domains for s in _suffixes_model(h))
    }
    assert got == want


def _export_model(doc_ids, weights, n_shards, seed="s0"):
    """Pure-Python spec of export.split_assign + shard_assign: the same
    md5 draws and the same integer thresholds, computed independently."""
    import hashlib

    def draw32(tag, did):
        h = hashlib.md5(f"{seed}:{tag}:{did}".encode()).hexdigest()
        return int(h[:8], 16)

    thrs, cum = [], 0.0
    for name, frac in weights[:-1]:
        cum += frac
        thrs.append((int(cum * 4294967296.0), name))
    out = {}
    for did in doc_ids:
        d = draw32("split", did)
        split = next((n for t, n in thrs if d < t), weights[-1][0])
        shard = draw32("shard", did) % n_shards
        out[did] = (split, shard, draw32("ord", did))
    # within-shard positions: rank of the ord draw (ties broken by id)
    by_shard = {}
    for did, (_, shard, o) in out.items():
        by_shard.setdefault(shard, []).append((o, did))
    pos = {}
    for rows in by_shard.values():
        for i, (_, did) in enumerate(sorted(rows), start=1):
            pos[did] = i
    return {d: (s, sh, pos[d]) for d, (s, sh, _) in out.items()}


@pytest.mark.parametrize("seed", [7, 19])
def test_export_split_shard_matches_model(spark, seed):
    """Spark split/shard/order assignment == the independent Python md5
    model, including non-ASCII ids (utf-8 byte agreement in the concat ->
    md5 path) — the determinism the training-export contract rests on."""
    import random

    from spiders_for_all_spark.operators.export import (
        shard_assign,
        split_assign,
    )

    rng = random.Random(seed)
    ids = [f"doc-{rng.randrange(10**6)}" for _ in range(50)]
    ids += ["ünïcode-1", "文档-2", "d with space", ""]
    weights = [("train", 0.7), ("val", 0.2), ("test", 0.1)]
    model = _export_model(ids, weights, n_shards=3)
    df = spark.createDataFrame([(d, "txt") for d in ids],
                               "doc_id string, text string")
    got = {
        r["doc_id"]: (r["split"], r["shard"], r["shard_pos"])
        for r in shard_assign(split_assign(df, weights), n_shards=3).collect()
    }
    assert got == model


def _substring_model(docs, k):
    """Pure-Python spec of cleaning.substring_spans/scrub_substring_dups:
    the same normalize -> sliding k-grams -> min-(id,pos)-keeper ->
    gaps-and-islands merge -> word removal, computed independently."""
    import re
    from collections import defaultdict

    words_by = {}
    groups = defaultdict(list)
    for did, text in docs:
        sid = str(did)
        w = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        words_by[sid] = w
        for p in range(max(len(w) - k + 1, 0)):
            groups[" ".join(w[p : p + k])].append((sid, p))
    dup = defaultdict(list)
    for lst in groups.values():
        if len(lst) > 1:
            keeper = min(lst)  # (str id, pos) — matches Spark min(struct)
            for sid, p in lst:
                if (sid, p) != keeper:
                    dup[sid].append(p)
    spans = {}
    for sid, ps in dup.items():
        ps.sort()
        out = []
        for p in ps:
            if out and p <= out[-1][1] + 1:
                out[-1] = [out[-1][0], max(out[-1][1], p + k - 1), out[-1][2] + 1]
            else:
                out.append([p, p + k - 1, 1])
        spans[sid] = [tuple(s) for s in out]
    scrub = {}
    for sid, w in words_by.items():
        covered = set()
        for a, b, _ in spans.get(sid, []):
            covered.update(range(a, b + 1))
        kept = [x for i, x in enumerate(w) if i not in covered]
        scrub[sid] = (len(w), len(w) - len(kept), " ".join(kept))
    return spans, scrub


@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=18),
        min_size=1,
        max_size=10,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_substring_dedup_matches_model(spark, word_lists):
    """Spark sliding-substring spans + scrub == the independent Python
    model on adversarial word salads from a 3-word vocabulary (maximal
    k-gram collision pressure, unaligned overlaps, whole-doc dups)."""
    from collections import defaultdict

    from spiders_for_all_spark.operators.cleaning import (
        scrub_substring_dups,
        substring_spans,
    )

    docs = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    model_spans, model_scrub = _substring_model(docs, k=3)
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got_spans = defaultdict(list)
    for r in substring_spans(df, k=3).collect():
        got_spans[r["doc_id"]].append(
            (r["span_start"], r["span_end"], r["n_grams"])
        )
    assert {s: sorted(v) for s, v in got_spans.items()} == {
        s: sorted(v) for s, v in model_spans.items() if v
    }
    got_scrub = {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["text_kept"])
        for r in scrub_substring_dups(df, k=3).collect()
    }
    assert got_scrub == model_scrub
