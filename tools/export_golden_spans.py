"""Export the simulator's golden e2e span fingerprints to the fixture dir.

The ``crawl_e2e_spans`` catalog query runs the LIVE engine over the
deterministic seed=11 fixture site and emits one (doc_id, n_spans,
spans_fp) row per document; its DuckDB oracle reads the parquet this
script writes — the reference-semantics simulator's answer for the SAME
site and crawl config.  That turns the last no-oracle driver row into a
hash-checked one (VERDICT r4 item 8): engine == simulator is exactly the
north_rule's span-sequence-equality invariant, now enforced by the
driver's gate as well as tests/test_crawl_golden.py.

Pure python (fixtures + simulator + pyarrow) — no Spark session.  Rerun
after ANY engine-semantics change that test_crawl_golden.py covers:

    python tools/export_golden_spans.py

tests/test_e2e_golden_fixture.py fails loudly if the checked-in parquet
goes stale relative to the simulator.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spiders_for_all_spark import fixtures as FX  # noqa: E402
from spiders_for_all_spark.operators.documents import (  # noqa: E402
    span_fingerprint_py,
)
from spiders_for_all_spark.simulator import simulate  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden_e2e_spans.parquet",
)

# MUST mirror plans/catalog.py:crawl_e2e_spans exactly.
SITE_KW = dict(
    n_hosts=3, pages_per_chain=3, page_size=2, cursor_pages=3,
    notes_per_host=2, seed=11,
)
CRAWL_KW = dict(default_budget=3, max_rounds=30)


def golden_rows() -> list[dict]:
    rows, seeds = FX.build_site(**SITE_KW)
    sim = simulate(FX.site_index(rows), seeds, **CRAWL_KW)
    return sorted(
        (
            {
                "doc_id": doc_id,
                "n_spans": len(spans),
                "spans_fp": span_fingerprint_py(spans),
            }
            for doc_id, spans in sim.documents.items()
        ),
        key=lambda r: r["doc_id"],
    )


def main() -> None:
    rows = golden_rows()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    table = pa.table(
        {
            "doc_id": [r["doc_id"] for r in rows],
            "n_spans": [r["n_spans"] for r in rows],
            "spans_fp": [r["spans_fp"] for r in rows],
        },
        schema=pa.schema(
            [
                ("doc_id", pa.string()),
                ("n_spans", pa.int64()),
                ("spans_fp", pa.string()),
            ]
        ),
    )
    pq.write_table(table, OUT)
    print(f"{len(rows)} golden docs -> {OUT}")


if __name__ == "__main__":
    main()
