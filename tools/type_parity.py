"""Final-projection type parity between each catalog query's Spark schema
and its DuckDB oracle — the check the r05 driver gate failures demanded.

The driver's result hasher is type-sensitive (DuckDB HUGEINT arrives as
arrow decimal128(38,0), not int64), while tools/oracle_check.py
stringifies values — so a type-family skew is invisible locally but red
in the driver.  This tool runs every oracle with LIMIT 0, maps both
sides' column types into families, and fails on any mismatch.

Usage: python tools/type_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


# Families encode the DRIVER-OBSERVED equivalences from the r05 gate:
# integer widths hash equal (int32 Spark vs BIGINT oracle rows were all
# green), but DuckDB HUGEINT/DECIMAL reach the hasher as float64 via the
# pandas path (5000.0 != 5000) and VARCHAR-vs-integer differs — exactly
# the three red rows.  So: every integer width -> "int"; every decimal
# -> "float" (what DuckDB's .df() coerces them to).


def duck_family(t) -> str:
    """pyarrow type -> family string (driver-equivalence families)."""
    import pyarrow as pa

    if pa.types.is_decimal(t):
        return "float"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{duck_family(t.value_type)}>"
    return str(t)


def spark_family(dt: str) -> str:
    dt = dt.lower()
    if dt.startswith("decimal"):
        return "float"
    if dt in ("tinyint", "smallint", "int", "integer", "bigint"):
        return "int"
    if dt in ("double", "float"):
        return "float"
    if dt == "boolean":
        return "bool"
    if dt == "string":
        return "str"
    if dt.startswith("timestamp"):
        return "ts"
    if dt.startswith("array<"):
        return f"list<{spark_family(dt[6:-1])}>"
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if (only and name not in only) or name not in oracles:
            continue
        sdf = fn(spark, sf_dir)
        s_types = {f.name: spark_family(f.dataType.simpleString()) for f in sdf.schema.fields}
        try:
            tbl = con.execute(
                f"SELECT * FROM ({oracles[name]}) LIMIT 0"
            ).arrow()
        except Exception as exc:  # pragma: no cover - oracle must run
            failures.append(name)
            print(f"{name:32s} ORACLE SQL ERROR: {exc}")
            continue
        d_types = {f.name: duck_family(f.type) for f in tbl.schema}
        mismatches = {
            c: (s_types.get(c), d_types.get(c))
            for c in d_types
            if s_types.get(c) != d_types.get(c)
        }
        if mismatches:
            failures.append(name)
            print(f"{name:32s} TYPE SKEW: {mismatches}")
        else:
            print(f"{name:32s} types OK")
    print()
    if failures:
        print("TYPE-PARITY FAILURES:", failures)
        sys.exit(1)
    print("all oracled queries type-parity clean")


if __name__ == "__main__":
    main()
