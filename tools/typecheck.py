"""Oracle result-type audit.

The driver's value-hash compares serialized row values from Spark
(`df.collect()`) against DuckDB.  Even when both engines compute
identical values, a *type* divergence can change the serialization and
fail the hash: DuckDB's `sum(BIGINT)` returns HUGEINT (int128 — exported
to Arrow as double), bare decimal arithmetic returns DECIMAL where Spark
has DOUBLE, and `TIMESTAMP_NS` strings carry nanosecond digits Spark
never prints.  `tools/check.py` can't see this class of bug because it
normalizes through Python scalars.

This tool compares, for every registry entry with an oracle:
  - Spark result dtypes (schema only — no job is run for batch entries)
  - DuckDB `DESCRIBE <oracle sql>` types (never executes the query)
and flags any column whose normalized type category differs.

Usage: python tools/typecheck.py [sf_dir] [query ...]
Exit 1 if any hazard is found.
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_INTS = {
    "tinyint", "smallint", "int", "integer", "bigint",
    "utinyint", "usmallint", "uinteger", "ubigint",
}


def norm_type(t: str) -> str:
    """Map a Spark dtype or DuckDB type string to a hash-relevant category."""
    t = t.strip().lower()
    m = re.fullmatch(r"(array|list)<(.+)>", t) or re.fullmatch(r"(.+)\[\]", t)
    if m:
        inner = m.group(2) if m.lastindex == 2 else m.group(1)
        return f"array<{norm_type(inner)}>"
    m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
    if m:
        return f"decimal(s={m.group(2)})"  # scale drives the serialized text
    if t in _INTS:
        return "int"
    if t == "hugeint":
        return "HUGEINT!"  # int128: Arrow export becomes double — always a hazard
    if t in ("double", "float", "real"):
        return "float"
    if t in ("varchar", "string", "text"):
        return "str"
    if t in ("timestamp", "timestamp_ntz"):
        # Spark TIMESTAMP/TIMESTAMP_NTZ and DuckDB TIMESTAMP all collect as
        # naive µs datetimes — serialization-identical (driver-verified r2).
        return "ts"
    if t in ("timestamp_ns", "timestamp_ms", "timestamp_s"):
        return f"{t.upper()}!"  # sub-second precision differs from Spark's µs
    if t in ("boolean", "bool"):
        return "bool"
    if t == "date":
        return "date"
    return t


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("typecheck")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    hazards: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    n = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        n += 1
        try:
            sdtypes = dict(fn(spark, sf).dtypes)
        except Exception as e:  # noqa: BLE001
            errs[name] = f"spark: {type(e).__name__}: {e}"
            continue
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001
            errs[name] = f"duckdb: {type(e).__name__}: {e}"
            continue
        odtypes = {r[0]: r[1] for r in rows}
        probs = []
        for col, ot in odtypes.items():
            st = sdtypes.get(col)
            if st is None:
                probs.append(f"{col}: missing on spark side")
                continue
            a, b = norm_type(st), norm_type(ot)
            if a != b:
                probs.append(f"{col}: spark={st} ({a}) vs duckdb={ot} ({b})")
        if probs:
            hazards[name] = probs
            print(f"{name:32s} HAZARD  " + "; ".join(probs))
        else:
            print(f"{name:32s} ok")
    for name, e in errs.items():
        print(f"{name:32s} ERR {e[:160]}")
    print(
        json.dumps(
            {"checked": n, "hazards": list(hazards), "errs": list(errs)}, indent=0
        )
    )
    spark.stop()
    return 1 if hazards or errs else 0


if __name__ == "__main__":
    sys.exit(main())
