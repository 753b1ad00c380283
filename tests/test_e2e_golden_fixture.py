"""The checked-in golden e2e spans parquet must match a FRESH simulator
run — a stale fixture after an engine/simulator semantics change fails
here loudly instead of silently red-ing the driver's crawl_e2e_spans
oracle.  Pure python (no Spark)."""

from __future__ import annotations

import pyarrow.parquet as pq

from tools.export_golden_spans import OUT, golden_rows


def test_golden_spans_fixture_is_fresh():
    fresh = golden_rows()
    assert fresh, "simulator produced no documents"
    stored = pq.read_table(OUT).to_pylist()
    assert stored == fresh, (
        "tests/fixtures/golden_e2e_spans.parquet is stale — regenerate "
        "with `python tools/export_golden_spans.py`"
    )
