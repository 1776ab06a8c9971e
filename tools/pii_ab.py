"""Interleaved A/B of the r8 fused PII scrub (3 regex traversals,
counts from literal-token deltas) against the r7 shape (count+replace
per rule — 6 regex traversals), and against counts=False (the floor:
replace-only). One session, alternating reps, minima compared
(PERF §10).

Usage: STRESS_DOCS=5000000 python tools/pii_ab.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def legacy_scrub(df, text_col="text"):
    """The r7 implementation, verbatim shape: per-rule
    regexp_extract_all count on the running text + regexp_replace."""
    from pyspark.sql import functions as F

    from timbala_spark.pipeline.text import PII_RULES

    cur = F.col(text_col)
    count_cols = []
    for name, pat, token in PII_RULES:
        count_cols.append(
            (
                f"n_pii_{name}",
                F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).cast(
                    "long"
                ),
            )
        )
        cur = F.regexp_replace(cur, pat, token)
    out = df.withColumn("text_scrubbed", cur)
    total = F.lit(0).cast("long")
    for cname, cexpr in count_cols:
        out = out.withColumn(cname, cexpr)
        total = total + F.col(cname)
    return out.withColumn("n_pii_total", total)


def main() -> None:
    n_docs = int(os.environ.get("STRESS_DOCS", "5000000"))
    from pyspark.sql import SparkSession, functions as F

    from timbala_spark.pipeline.text import scrub_pii

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("pii-ab")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(n_docs)
        .withColumn(
            "text",
            F.concat(
                F.repeat(F.lit("lorem ipsum dolor sit amet "), 7),
                F.when(
                    F.pmod("id", F.lit(50)) == 0,
                    F.concat(
                        F.lit(" user"),
                        F.col("id"),
                        F.lit("@example.com and 10.1.2.3 and 123456789 "),
                    ),
                ).otherwise(F.lit(" plain tail ")),
            ),
        )
        .select(F.col("id").alias("doc_id"), "text")
        .persist()
    )
    df.count()

    def agg(out):
        return out.agg(
            F.sum("n_pii_total"), F.sum(F.length("text_scrubbed"))
        ).collect()[0]

    def agg_nocounts(out):
        return out.agg(F.sum(F.length("text_scrubbed"))).collect()[0]

    variants = {
        "fused_counts": lambda: agg(scrub_pii(df)),
        "legacy_counts": lambda: agg(legacy_scrub(df)),
        "no_counts": lambda: agg_nocounts(scrub_pii(df, counts=False)),
    }
    walls: dict[str, list[float]] = {k: [] for k in variants}
    checks: dict[str, tuple] = {}
    for rep in range(4):
        for name, fn in variants.items():
            t0 = time.monotonic()
            r = fn()
            walls[name].append(round(time.monotonic() - t0, 2))
            checks[name] = tuple(r)
    # identical outputs between fused and legacy (counts AND bytes)
    assert checks["fused_counts"] == checks["legacy_counts"], checks
    assert checks["no_counts"][0] == checks["fused_counts"][1], checks
    for name, w in walls.items():
        print(
            f"pii-ab {name}: min {min(w)}s median {statistics.median(w)}s"
            f" of {w}",
            flush=True,
        )
    print(
        f"pii-ab speedup fused-vs-legacy (min): "
        f"{min(walls['legacy_counts']) / min(walls['fused_counts']):.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
