"""Parse stage: response body -> envelope fields + documents + out-links.

The pure-python :func:`parse_body` implements the reference's extraction
semantics —

  * JSON envelope validation: bilibili ``{code,data,message}`` with
    ``code != 0`` as failure (reference: spiders/bilibili/models.py:12-21),
    xhs ``{code,data,message,success}`` (spiders/xhs/models.py:11-19);
    HTTP + business-code + parse failures all classified under one umbrella,
    mirroring the single retry envelope at core/spider.py:169-189.
  * item extraction / projection (P2): ``data.list`` / ``data.comments``
    (spiders/bilibili/spiders.py:60-64, spiders/xhs/spiders.py:248-251).
  * embedded-JSON HTML extraction (S4): ``window.__INITIAL_STATE__`` regex +
    ``undefined -> null`` patch (spiders/xhs/patterns.py:3,
    utils/helper.py:46-49).
  * span-sequence assembly: text first, then images in list order, then
    videos/audios (spiders/xhs/downloader.py:41-72,110-112;
    spiders/bilibili/downloader.py:195-226); ``offset`` = list position.

The vectorized Spark wrapper :func:`parse_stage` applies it over Arrow
batches via ``mapInPandas`` — batch-at-a-time Python, never a row-at-a-time
Spark UDF.  The golden-test simulator calls :func:`parse_body` directly, so
span-sequence equality between the distributed engine and the sequential
reference semantics is checked end-to-end through shuffle/Arrow plumbing.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from spiders_for_all_spark import schemas as S

PAGE_PARAM_RE = re.compile(r"[?&]page=(\d+)")
SIZE_PARAM_RE = re.compile(r"[?&]size=(\d+)")
CURSOR_PARAM_RE = re.compile(r"[?&]cursor=([^&#]*)")
# window.__INITIAL_STATE__ extraction (reference: spiders/xhs/patterns.py:3,
# spiders/bilibili/patterns.py:3-4)
INITIAL_STATE_RE = re.compile(
    r"window\.__INITIAL_STATE__\s*=\s*(\{.*?\})\s*;?\s*</script>", re.S
)
TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
UNDEFINED_RE = re.compile(r"\bundefined\b")


def _span(kind: str, text: str | None, media_ref: str | None, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _doc(doc_id: str, raw_spans: list[tuple[str, str | None, str | None]]) -> dict:
    return {
        "doc_id": doc_id,
        "spans": [_span(k, t, m, i) for i, (k, t, m) in enumerate(raw_spans)],
    }


def item_to_doc(item: dict) -> dict:
    """Paginated-API item -> document (text desc, then images, videos, audios)."""
    spans: list[tuple[str, str | None, str | None]] = [
        ("text", item.get("desc") or item.get("title") or "", None)
    ]
    for u in item.get("images") or []:
        spans.append(("image", None, u))
    for u in item.get("videos") or []:
        spans.append(("video", None, u))
    for u in item.get("audios") or []:
        spans.append(("audio", None, u))
    return _doc(str(item["id"]), spans)


def comment_to_doc(comment: dict) -> dict:
    """Cursor-feed comment -> document (text content, then pictures).

    Mirrors xhs comment shape: content + optional picture list
    (reference: spiders/xhs/spiders.py:310-330, models.py:51-65).
    """
    spans: list[tuple[str, str | None, str | None]] = [
        ("text", comment.get("content") or "", None)
    ]
    for u in comment.get("pictures") or []:
        spans.append(("image", None, u))
    return _doc(str(comment["id"]), spans)


def note_to_doc(note: dict) -> dict:
    """HTML-embedded note -> document (title+desc text, imageList, video)."""
    title = note.get("title") or ""
    desc = note.get("desc") or ""
    text = f"{title}\n{desc}" if title and desc else (title or desc)
    spans: list[tuple[str, str | None, str | None]] = [("text", text, None)]
    for img in note.get("imageList") or []:
        spans.append(("image", None, img.get("url")))
    video = note.get("video")
    if video:
        spans.append(("video", None, video.get("masterUrl")))
    return _doc(str(note["id"]), spans)


def parse_body(kind: str, url: str, status: int | None, body: str | None) -> dict[str, Any]:
    """Pure extraction: one fetched row -> envelope + docs + out_links."""
    out: dict[str, Any] = {
        "code": None,
        "success": None,
        "docs": [],
        "out_links": [],
        "has_more": False,
        "next_cursor": None,
        "items_count": 0,
        "page_size": None,
        "parse_error": None,
    }
    if status != 200:
        return out
    out["code"], out["success"] = 0, True
    if kind == "media":
        return out
    try:
        if kind in ("page", "cursor"):
            env = json.loads(body or "")
            out["code"] = int(env.get("code", 0))
            out["success"] = bool(env.get("success", True))
            if out["code"] != 0 or not out["success"]:
                return out
            data = env.get("data") or {}
            if kind == "page":
                items = data.get("list") or []
                out["items_count"] = len(items)
                m = SIZE_PARAM_RE.search(url)
                out["page_size"] = int(m.group(1)) if m else None
                out["docs"] = [item_to_doc(it) for it in items]
                out["out_links"] = list(data.get("out_links") or [])
            else:
                comments = data.get("comments") or []
                out["items_count"] = len(comments)
                out["docs"] = [comment_to_doc(c) for c in comments]
                out["has_more"] = bool(data.get("has_more"))
                out["next_cursor"] = data.get("cursor")
        elif kind == "html":
            m = INITIAL_STATE_RE.search(body or "")
            if not m:
                raise ValueError("no __INITIAL_STATE__ blob")
            state = json.loads(UNDEFINED_RE.sub("null", m.group(1)))
            note = state.get("note") or {}
            out["docs"] = [note_to_doc(note)]
            out["out_links"] = [
                img["url"] for img in (note.get("imageList") or []) if img.get("url")
            ]
    except Exception as exc:  # classified, not raised: dead-letter semantics
        out["parse_error"] = f"{type(exc).__name__}: {exc}"
        out["docs"], out["out_links"] = [], []
    return out


# ---------------------------------------------------------------------------
# Spark side

DOC_FIELD = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(S.SPAN), False),
    ]
)

PARSE_FIELDS = [
    T.StructField("code", T.IntegerType(), True),
    T.StructField("success", T.BooleanType(), True),
    T.StructField("docs", T.ArrayType(DOC_FIELD), True),
    T.StructField("out_links", T.ArrayType(T.StringType()), True),
    T.StructField("has_more", T.BooleanType(), True),
    T.StructField("next_cursor", T.StringType(), True),
    T.StructField("items_count", T.IntegerType(), True),
    T.StructField("page_size", T.IntegerType(), True),
    T.StructField("parse_error", T.StringType(), True),
]


def parsed_schema(input_schema: T.StructType) -> T.StructType:
    drop = {f.name for f in PARSE_FIELDS}
    base = [f for f in input_schema.fields if f.name not in drop and f.name != "body"]
    return T.StructType(base + PARSE_FIELDS)


def parse_stage(fetched: DataFrame) -> DataFrame:
    """Vectorized parse over fetch results (mapInPandas, Arrow-batched)."""
    out_schema = parsed_schema(fetched.schema)
    out_cols = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            parsed = [
                parse_body(k, u, s, b)
                for k, u, s, b in zip(
                    pdf["kind"], pdf["url"], pdf["status"], pdf["body"]
                )
            ]
            res = pdf.drop(columns=["body"]).reset_index(drop=True)
            pp = pd.DataFrame(parsed)
            for f in PARSE_FIELDS:
                res[f.name] = pp[f.name]
            yield res[out_cols]

    return fetched.mapInPandas(run, schema=out_schema)
