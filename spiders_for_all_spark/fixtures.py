"""Deterministic synthetic site generator (FIXTURES.md §2).

Builds a closed-world fake web: paginated JSON APIs (bilibili-style page
loops — reference: core/spider.py:295-327), cursor feeds (xhs-style —
spiders/xhs/spiders.py:276-308), HTML pages with embedded
``window.__INITIAL_STATE__`` JSON including ``undefined`` tokens
(utils/helper.py:46-49), and media byte URLs.  Seeded, no wall clock, no
network.  Both the Spark engine's test fetcher and the pure-python
reference-semantics simulator consume exactly this world.
"""

from __future__ import annotations

import json
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

WORDS = (
    "spark frontier crawl fetch parse span media note comment page cursor "
    "host budget priority window rank bloom seen robots merge snapshot"
).split()


def _text(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _page_row(url: str, kind: str, body: str | None, status: int = 200,
              latency_ms: int = 10, fail_times: int = 0,
              fail_kind: str = "http") -> dict:
    return {
        "url": url,
        "kind": kind,
        "status": status,
        "body": body,
        "latency_ms": latency_ms,
        "fail_times": fail_times,
        "fail_kind": fail_kind,
    }


def build_site(
    n_hosts: int = 3,
    page_chains: int = 1,
    pages_per_chain: int = 3,
    page_size: int = 2,
    cursor_chains: int = 1,
    cursor_pages: int = 3,
    comments_per_page: int = 2,
    notes_per_host: int = 2,
    images_per_note: int = 2,
    fail_specs: dict[str, tuple[int, str]] | None = None,
    hot_host_extra_chains: int = 0,
    alias_note_seed: bool = False,
    seed: int = 42,
) -> tuple[list[dict], list[dict]]:
    """Return (pages_rows, seed_rows).

    ``fail_specs`` maps url -> (fail_times, fail_kind in http|code|parse):
    the first ``fail_times`` fetch attempts of that URL fail that way
    (retry-matrix semantics per FIXTURES.md §7; reference retry wrapper at
    utils/decorator.py:13-47).  ``hot_host_extra_chains`` adds extra page
    chains to host 0 to manufacture frontier skew (the single-hot-API-host
    pattern, SURVEY §4.4).  ``alias_note_seed`` seeds the first note TWICE
    under distinct raw URLs with the identical canonical form (uppercase
    scheme + fragment) — exercising the frontier-dedup tiebreak between
    identical-canonical rows (engine min(struct) ≍ simulator rule).
    """
    rng = random.Random(seed)
    rows: list[dict] = []
    seeds: list[dict] = []
    fail_specs = fail_specs or {}

    def host(i: int) -> str:
        return f"h{i}.example.com"

    for i in range(n_hosts):
        h = host(i)
        chains = page_chains + (hot_host_extra_chains if i == 0 else 0)
        # ---- paginated API chains (S1) --------------------------------
        for c in range(chains):
            for p in range(1, pages_per_chain + 1):
                url = f"https://{h}/api/list?chain={c}&page={p}&size={page_size}"
                # short last page terminates the loop (core/spider.py:301)
                n_items = page_size if p < pages_per_chain else max(page_size - 1, 0)
                items = []
                for k in range(n_items):
                    iid = f"it-h{i}-c{c}-p{p}-{k}"
                    items.append(
                        {
                            "id": iid,
                            "title": f"title {iid}",
                            "desc": _text(rng, 6),
                            "images": [f"https://{h}/media/{iid}-{m}.jpg" for m in range(2)],
                            "videos": [f"https://{h}/media/{iid}.mp4"],
                        }
                    )
                out_links = (
                    [f"https://{h}/note/n{p % max(notes_per_host, 1)}"]
                    if notes_per_host
                    else []
                )
                body = json.dumps(
                    {
                        "code": 0,
                        "message": "ok",
                        "data": {"list": items, "out_links": out_links},
                    }
                )
                rows.append(_page_row(url, "page", body, latency_ms=5 + rng.randrange(20)))
            seeds.append(
                {
                    "url": f"https://{h}/api/list?chain={c}&page=1&size={page_size}",
                    "priority": 0,
                    "kind": "page",
                }
            )
        # ---- cursor chains (S2) ----------------------------------------
        for c in range(cursor_chains):
            for n in range(cursor_pages):
                tok = "" if n == 0 else f"cur{n}"
                url = f"https://{h}/api/comments?chain={c}&cursor={tok}"
                comments = []
                for k in range(comments_per_page):
                    cid = f"cm-h{i}-c{c}-n{n}-{k}"
                    comments.append(
                        {
                            "id": cid,
                            "content": _text(rng, 5),
                            "pictures": (
                                [f"https://{h}/media/{cid}.jpg"] if k % 2 == 0 else []
                            ),
                        }
                    )
                body = json.dumps(
                    {
                        "code": 0,
                        "success": True,
                        "message": "ok",
                        "data": {
                            "comments": comments,
                            "cursor": f"cur{n + 1}",
                            "has_more": n < cursor_pages - 1,
                        },
                    }
                )
                rows.append(_page_row(url, "cursor", body, latency_ms=5 + rng.randrange(20)))
            seeds.append(
                {
                    "url": f"https://{h}/api/comments?chain={c}&cursor=",
                    "priority": 1,
                    "kind": "cursor",
                }
            )
        # ---- HTML note pages (S4) with undefined tokens ------------------
        for j in range(notes_per_host):
            nid = f"note-h{i}-n{j}"
            imgs = [
                {"url": f"https://{h}/media/{nid}-{m}.jpg"} for m in range(images_per_note)
            ]
            video = (
                f'{{"masterUrl": "https://{h}/media/{nid}.mp4"}}'
                if j % 2 == 0
                else "undefined"
            )
            # newlines BETWEEN JSON tokens and inside <title>: the state blob
            # and title span lines, so the Catalyst (?s)/re.S regexes are
            # exercised on genuinely multiline bodies (ADVICE r01)
            state = (
                f'{{"note": {{\n"id": "{nid}", "title": "note {j} of {h}", '
                f'"desc": "{_text(rng, 8)}", "imageList": {json.dumps(imgs)},\n'
                f'"video": {video}}}}}'
            )
            body = (
                f"<html><head><title>note {j} |\n{h}</title></head><body>\n"
                f"<script>window.__INITIAL_STATE__ =\n{state};</script></body></html>"
            )
            rows.append(
                _page_row(f"https://{h}/note/n{j}", "html", body, latency_ms=5 + rng.randrange(20))
            )

    # ---- media rows for every media_ref mentioned anywhere ----------------
    media_urls: set[str] = set()
    for r in rows:
        if r["body"]:
            for part in r["body"].replace('\\"', '"').split('"'):
                if "/media/" in part and part.startswith("https://"):
                    media_urls.add(part)
    for u in sorted(media_urls):
        # deterministic chunked payload (S6): length derived from the URL so
        # every media file spans multiple DEFAULT_CHUNK_SIZE chunks
        payload = f"MEDIA:{u}:" + "x" * (17 + (len(u) * 7) % 48)
        rows.append(_page_row(u, "media", payload, latency_ms=1))

    # ---- identical-canonical alias seeds (frontier tiebreak coverage) -----
    if alias_note_seed and notes_per_host:
        h0 = host(0)
        orig = f"https://{h0}/note/n0"
        orig_row = next(r for r in rows if r["url"] == orig)
        # distinct raw forms, identical canonical form; the uppercase-scheme
        # alias sorts lexicographically BEFORE the original raw URL, so the
        # min-by-url tiebreak must pick it over first-seen insertion order
        alias = f"HTTPS://{h0}/note/n0#dup"
        # the alias serves a DIFFERENT title, so which raw URL the scheduler
        # picks is observable through the doc's span text — a tiebreak
        # divergence between engine and simulator fails the span equality
        rows.append(
            dict(orig_row, url=alias, body=orig_row["body"].replace(
                '"title": "note 0 of', '"title": "ALIAS note 0 of'
            ))
        )
        seeds.append({"url": orig, "priority": 0, "kind": "html"})
        seeds.append({"url": alias, "priority": 0, "kind": "html"})

    for r in rows:
        if r["url"] in fail_specs:
            ft, fk = fail_specs[r["url"]]
            r["fail_times"], r["fail_kind"] = ft, fk
    return rows, seeds


PAGES_ARROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("kind", pa.string()),
        ("status", pa.int32()),
        ("body", pa.string()),
        ("latency_ms", pa.int32()),
        ("fail_times", pa.int32()),
        ("fail_kind", pa.string()),
    ]
)


def write_site(rows: list[dict], path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cols = {name: [r[name] for r in rows] for name in PAGES_ARROW_SCHEMA.names}
    pq.write_table(pa.table(cols, schema=PAGES_ARROW_SCHEMA), path)
    return path


def site_index(rows: list[dict]) -> dict[str, dict]:
    return {r["url"]: r for r in rows}


def synthetic_response(page: dict | None, attempt: int) -> tuple[int, str | None, str | None]:
    """Deterministic fetch outcome: (status, body, error).

    Failure injection is attempt-indexed so retries are reproducible without
    shared state: attempts < fail_times fail per fail_kind (http 503 /
    business code -352 à la bilibili risk control — reference
    spiders/bilibili/spiders.py:45-51 / unparseable body).
    """
    if page is None:
        return 404, None, "http_404"
    if attempt < (page.get("fail_times") or 0):
        fk = page.get("fail_kind") or "http"
        if fk == "http":
            return 503, None, "http_503"
        if fk == "code":
            return (
                200,
                '{"code": -352, "message": "risk control", "success": false, "data": null}',
                None,
            )
        return 200, "<<<not json<<<", None
    return int(page["status"]), page["body"], None
