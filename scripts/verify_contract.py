"""Driver-style verification of __spark_entry__.py.

Mimics what the round driver does: run ``entry(spark)`` as a smoke check,
then run every ``queries()[name]`` at the given sf dir and compare against
``oracle_sql()[name]`` via DuckDB — row count, column names, and
order-insensitive values (columns sorted by name, rows sorted, floats
rounded). Prints one line per query and a final summary; exit code 1 on any
mismatch.

Usage: python scripts/verify_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows: list[dict], round_floats: int = 6):
    out = []
    for r in rows:
        items = sorted(r.items())
        vals = []
        for _, v in items:
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, round_floats)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-contract")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(sf_dir, t + '.parquet')}'"
        )

    import __spark_entry__ as entrymod

    t0 = time.monotonic()
    smoke = entrymod.entry(spark)
    rows = smoke.collect()
    print(f"entry(): {len(rows)} rows in {time.monotonic()-t0:.1f}s "
          f"schema={smoke.columns} first={rows[0] if rows else None}")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t1 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        dt = time.monotonic() - t1
        if name not in oracles:
            print(f"ok   {name}: {len(srows)} rows in {dt:.1f}s (rows-only, no oracle)")
            if not isinstance(srows, list):
                failures.append(name)
            continue
        try:
            orc = con.execute(oracles[name])
            ocols = [d[0] for d in orc.description]
            orows = [dict(zip(ocols, row, strict=True)) for row in orc.fetchall()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        scols, ocols_s = sorted(sdf.columns), sorted(ocols)
        if scols != ocols_s:
            print(f"FAIL {name}: schema {scols} != {ocols_s}")
            failures.append(name)
            continue
        ns, no = normalize(srows), normalize(orows)
        if len(ns) != len(no):
            print(f"FAIL {name}: rowcount {len(ns)} != {len(no)}")
            failures.append(name)
            continue
        bad = [(a, b) for a, b in zip(ns, no, strict=True) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(ns)} rows differ; first: "
                  f"spark={bad[0][0]} duckdb={bad[0][1]}")
            failures.append(name)
            continue
        print(f"ok   {name}: {len(ns)} rows match in {dt:.1f}s")

    print(f"\n{'FAILED: ' + ', '.join(failures) if failures else 'ALL OK'} "
          f"({time.monotonic()-t0:.0f}s total)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
