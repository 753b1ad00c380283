"""Driver-contract tests: __spark_entry__ queries vs DuckDB oracles.

A compact in-CI replica of the driver's correctness gate (full sweep:
``python tools/oracle_check.py``).  Runs a representative subset at
sf0.001 to keep the suite fast.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SUBSET = [
    "o1_priority_queue_rank",
    "j1_seen_antijoin",
    "f6_canonicalize_url",
    "k2_merge_upsert",
    "tpch_q1",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_brute_force_topk",
    "text_quality",
    "sessionize_events",
    "export_split_counts",
    "export_shard_manifest",
]


def canon_val(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_val(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_val(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as mod

    return mod


def test_every_oracle_key_has_a_query(contract):
    q, o = contract.queries(), contract.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20


def test_entry_returns_rows(spark, contract):
    df = contract.entry(spark)
    assert df.count() > 0
    assert "doc_id" in df.columns


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, ddb, contract, name):
    q, o = contract.queries(), contract.oracle_sql()
    sdf = q[name](spark, SF)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(o[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert canon_rows(sdf.columns, s_rows) == canon_rows(d_cols, d_rows)


def test_catalog_no_module_level_shadowing():
    """Oracle SQL strings are f-strings baked at definition time, but the
    Spark function bodies read module globals at call time — a later
    re-assignment of the same name silently desynchronizes the two sides
    (the _MIX_TARGET shadowing bug caught in round 4).  Reject duplicate
    top-level assignments in catalog.py."""
    import ast
    import inspect

    from spiders_for_all_spark.plans import catalog

    # The ONLY sanctioned rebinds: the end-of-module driver-gate reorder
    # rebuilds QUERIES/ORACLES with identical contents in a new key order
    # (values and oracle strings untouched, so the two sides can't desync).
    allowed_rebinds = {"QUERIES", "ORACLES"}

    tree = ast.parse(inspect.getsource(catalog))
    seen: dict[str, int] = {}
    for node in tree.body:
        targets = []
        if isinstance(node, ast.Assign):
            targets = [t.id for t in node.targets if isinstance(t, ast.Name)]
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            targets = [node.target.id]
        for name in targets:
            if name in allowed_rebinds and name in seen:
                continue
            assert name not in seen, (
                f"catalog.py assigns module-level {name!r} twice "
                f"(lines {seen[name]} and {node.lineno}) — the oracle/Spark "
                "sides can desync; rename one."
            )
            seen[name] = node.lineno
