"""Local stand-in for the driver's t2 correctness gate.

Runs every `queries()` entry on Spark and the matching `oracle_sql()`
on DuckDB over the same sf dir, then compares row count, sorted column
names, and the order-insensitive multiset of values (exact equality —
stricter than any hash).

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def norm_cell(x):
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        return repr(x)
    if hasattr(x, "item"):
        return repr(x.item())
    return repr(x)


def run(sf_dir: str, only: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-oracle")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            continue
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            failures.append((name, f"schema {s_cols} != {o_cols}"))
            print(f"FAIL {name}: schema {s_cols} != {o_cols}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rows {len(sdf)} != {len(odf)}"))
            print(f"FAIL {name}: rows {len(sdf)} != {len(odf)}")
            continue
        s_vals = sorted(
            tuple(norm_cell(v) for v in row)
            for row in sdf[s_cols].itertuples(index=False)
        )
        o_vals = sorted(
            tuple(norm_cell(v) for v in row)
            for row in odf[o_cols].itertuples(index=False)
        )
        if s_vals != o_vals:
            diff = [
                (a, b) for a, b in zip(s_vals, o_vals) if a != b
            ][:3]
            failures.append((name, f"values differ: {diff}"))
            print(f"FAIL {name}: values differ (first 3): {diff}")
            continue
        print(f"ok   {name}: {len(sdf)} rows match")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[n for n, _ in failures]}")
        return 1
    print("all queries match the oracle")
    return 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    raise SystemExit(run(sf, only))
