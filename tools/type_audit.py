"""Cross-engine result-type audit: pair every oracle's DuckDB result
types against the Spark schema of its `queries()` twin and flag any
column whose materialization is collector-dependent.

Why this exists: the driver's comparator collects both sides and
value-hashes them, but HOW it materializes values is not observable
from here.  DuckDB HUGEINT (the type of any uncast integer SUM) is
the known trap — `fetchall()` yields plain Python ints, `.df()`
float64, `.arrow()` decimal128 — so an oracle emitting HUGEINT can
hash 60.0 / Decimal('60') against Spark's int64 60 on every row under
one comparator and be byte-identical under another.  That skew kept
`msg_fit` driver-red for two rounds while green under the local
fetchall()-based gate (SURVEY.md §12, continuation 3).

Severities:
  FAIL  — HUGEINT/UHUGEINT on the oracle side (always fix: cast to
          BIGINT at the source aggregate);
  WARN  — width-only integer gaps (duck BIGINT vs spark int) and
          DECIMAL-vs-double: tolerated by the driver on every stamped
          query, listed so a new query adding one is a conscious
          choice;
  (silent) — exact pairs (BIGINT/bigint, DOUBLE/double, VARCHAR/
          string, BOOLEAN/boolean, TIMESTAMP/timestamp, ...).

Usage: python tools/type_audit.py [sf_dir]     (default sf0.01)
Exit 1 on any FAIL.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# duckdb type -> spark simpleString types that materialize identically
# under every collector (fetchall / pandas / arrow)
EXACT = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "SMALLINT": {"smallint", "int"},
    "TINYINT": {"tinyint", "int"},
    "DOUBLE": {"double"},
    "FLOAT": {"float", "double"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "TIMESTAMP": {"timestamp"},
    "DATE": {"date"},
    "BLOB": {"binary"},
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import os

    import __spark_entry__ as entrymod
    from ragflow_spark.job.session import get_spark

    spark = get_spark(
        master=os.environ.get("CHECK_MASTER", "local[8]"),
        shuffle_partitions=int(os.environ.get("CHECK_SHUFFLE", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = warns = 0
    for name, sql in oracles.items():
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        dtypes = dict(zip(rel.columns, map(str, rel.types)))
        stypes = {f.name: f.dataType.simpleString()
                  for f in qs[name](spark, sf_dir).schema.fields}
        for col, dt in dtypes.items():
            st = stypes.get(col)
            if st is None:
                fails += 1
                print(f"FAIL {name}.{col}: oracle column missing on "
                      f"the Spark side (duck={dt})")
            elif dt in ("HUGEINT", "UHUGEINT"):
                fails += 1
                print(f"FAIL {name}.{col}: duck={dt} spark={st} — "
                      f"cast the aggregate to BIGINT")
            elif st in EXACT.get(dt, ()):
                pass
            elif (dt == "BIGINT" and st == "int") or \
                    (dt == "INTEGER" and st == "bigint") or \
                    (dt.startswith("DECIMAL") and st == "double"):
                warns += 1
                print(f"WARN {name}.{col}: duck={dt} spark={st} "
                      f"(width-only; driver-tolerated on stamped "
                      f"queries)")
            else:
                fails += 1
                print(f"FAIL {name}.{col}: unclassified pair "
                      f"duck={dt} spark={st}")
    spark.stop()
    print(f"type audit: {fails} FAIL, {warns} WARN over "
          f"{len(oracles)} oracles")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
