"""Reference-semantics simulator: the sequential golden model (SURVEY §5.2).

A tiny pure-python re-implementation of the crawl semantics the reference
realizes with sequential loops — FIFO per source with ascending page_no
(reference: core/spider.py:295-327,321), cursor chains in server order
(spiders/xhs/spiders.py:155-190,276-308), set-dedup (utils/helper.py:55),
retry-to-dead-letter (utils/decorator.py:13-47, core/exception.py:1-4) —
expressed at round granularity with per-host politeness budgets.  The Spark
engine must reproduce this model's visit order, final URL-seen set, and
per-document span sequences exactly (north_rule equality gates).

Shares the parser (operators/parse.py) and the world
(fixtures.synthetic_response) with the engine; what it does NOT share is
everything under test: scheduling, dedup, retry, merge, and ordering are
re-derived here with plain dicts/sorts instead of DataFrames.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from spiders_for_all_spark.functions.urls import canonicalize_url_py, host_of_url_py
from spiders_for_all_spark.operators.frontier import (
    kind_of_url_py,
    next_cursor_url_py,
    next_page_url_py,
)
from spiders_for_all_spark.operators.parse import parse_body
from spiders_for_all_spark.fixtures import synthetic_response


@dataclass
class SimResult:
    visits: list[tuple[int, str, int]] = field(default_factory=list)  # (round, canon, rank)
    seen: set[str] = field(default_factory=set)  # canonical urls
    documents: dict[str, list[dict]] = field(default_factory=dict)  # doc_id -> spans
    dead_letters: list[str] = field(default_factory=list)
    rounds: int = 0


def simulate(
    site: dict[str, dict],
    seeds: list[dict],
    max_rounds: int = 50,
    default_budget: int = 2,
    host_budget: dict[str, int] | None = None,
    robots: dict[str, list[str]] | None = None,
    max_attempts: int = 3,
    max_depth: int = 3,
    total_doc_cap: int | None = None,
) -> SimResult:
    host_budget = host_budget or {}
    robots = robots or {}
    res = SimResult()

    # frontier entry: (url, canon, host, priority, discovery_round, depth, attempt, kind)
    def entry(url: str, priority: int, disc: int, depth: int, attempt: int,
              kind: str | None, backup_urls: list[str] | None = None):
        return {
            "url": url,
            "canon": canonicalize_url_py(url),
            "host": host_of_url_py(url),
            "priority": priority,
            "discovery_round": disc,
            "depth": depth,
            "attempt": attempt,
            "kind": kind or kind_of_url_py(url),
            "backup_urls": backup_urls,
        }

    def dedup_key(e: dict) -> tuple:
        # mirrors the engine's min(struct(priority, discovery_round, attempt,
        # canonical_url, url, host, depth, cursor, page_no, kind)) ordering
        # (operators/frontier.py:dedup_frontier) — Spark struct comparison
        # sorts NULL field values first, encoded here as (is_not_null, value)
        return (
            e["priority"],
            e["discovery_round"],
            e["attempt"],
            e["canon"],
            e["url"],
            e["host"],
            e["depth"],
            (e.get("cursor") is not None, e.get("cursor") or ""),
            (e.get("page_no") is not None, e.get("page_no") or 0),
            e["kind"],
            (e.get("backup_urls") is not None, tuple(e.get("backup_urls") or ())),
        )

    def dedup(entries: list[dict]) -> list[dict]:
        best: dict[str, dict] = {}
        for e in entries:
            k = e["canon"]
            cur = best.get(k)
            if cur is None or dedup_key(e) < dedup_key(cur):
                best[k] = e
        return list(best.values())

    frontier = dedup(
        [
            entry(s["url"], int(s.get("priority", 0)), 0, 0, 0, s.get("kind"),
                  s.get("backup_urls"))
            for s in seeds
        ]
    )

    for round_no in range(max_rounds):
        candidates = [e for e in frontier if e["canon"] not in res.seen]
        # robots gate
        def allowed(e: dict) -> bool:
            dis = robots.get(e["host"]) or []
            path = e["canon"].split(e["host"], 1)[1].split("?")[0] if e["host"] in e["canon"] else "/"
            return not any(path.startswith(d) for d in dis)

        candidates = [e for e in candidates if allowed(e)]
        # politeness: top-budget per host by (priority, discovery_round, canon)
        by_host: dict[str, list[dict]] = {}
        for e in candidates:
            by_host.setdefault(e["host"], []).append(e)
        scheduled: list[dict] = []
        for h, es in by_host.items():
            es.sort(key=lambda e: (e["priority"], e["discovery_round"], e["canon"]))
            b = host_budget.get(h, default_budget)
            for rank, e in enumerate(es[:b], start=1):
                e = dict(e, rank=rank)
                scheduled.append(e)
        if not scheduled:
            break
        res.rounds = round_no + 1

        succ: list[dict] = []
        retries: list[dict] = []
        sched_canons = {e["canon"] for e in scheduled}
        for e in sorted(scheduled, key=lambda x: (x["host"], x["rank"])):
            res.visits.append((round_no, e["canon"], e["rank"]))
            if e["kind"] == "media":
                # S6 failover: try [url] + backup_urls in order within ONE
                # attempt (reference core/media.py:36-42); the winner becomes
                # the doc's media_ref
                winner, status, body = None, None, None
                for cu in [e["url"]] + list(e.get("backup_urls") or []):
                    status, body, _err = synthetic_response(site.get(cu), e["attempt"])
                    if status == 200:
                        winner = cu
                        break
                p = parse_body("media", e["url"], status, body, media_ref=winner)
            else:
                status, body, _err = synthetic_response(site.get(e["url"]), e["attempt"])
                p = parse_body(e["kind"], e["url"], status, body)
            ok = (
                status == 200
                and p["code"] == 0
                and bool(p["success"])
                and p["parse_error"] is None
            )
            if ok:
                res.seen.add(e["canon"])
                for d in p["docs"]:
                    res.documents[d["doc_id"]] = d["spans"]  # upsert
                if (
                    e["kind"] == "page"
                    and p["items_count"] > 0
                    and p["items_count"] == p["page_size"]
                ):
                    succ.append(
                        entry(next_page_url_py(e["url"]), e["priority"], round_no + 1,
                              e["depth"], 0, "page")
                    )
                if e["kind"] == "cursor" and p["has_more"] and p["next_cursor"]:
                    succ.append(
                        entry(next_cursor_url_py(e["url"], p["next_cursor"]), e["priority"],
                              round_no + 1, e["depth"], 0, "cursor")
                    )
                if e["depth"] < max_depth:
                    for link in p["out_links"]:
                        succ.append(
                            entry(link, e["priority"], round_no + 1, e["depth"] + 1, 0, None)
                        )
            else:
                if e["attempt"] + 1 < max_attempts:
                    retries.append(dict(e, attempt=e["attempt"] + 1))
                else:
                    res.seen.add(e["canon"])
                    res.dead_letters.append(e["canon"])

        remainder = [e for e in frontier if e["canon"] not in sched_canons]
        frontier = [
            e
            for e in dedup(remainder + succ + retries)
            if e["canon"] not in res.seen
        ]
        if total_doc_cap is not None and len(res.documents) >= total_doc_cap:
            break
    return res
