"""Wide-seed sweep of the metamorphic properties in
``tests/test_metamorphic.py`` — the committed test pins 24 seeds as a
regression gate; this tool hunts NEW divergences across an arbitrary
seed range before they get pinned.

Usage: python tools/metamorphic_sweep.py [start] [end]
"""

from __future__ import annotations

import random
import re
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main(start: int, end: int) -> int:
    from pyspark.sql import SparkSession

    import test_metamorphic as tm

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("metamorphic-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    # reuse the fixture body directly
    engine = tm.engine.__wrapped__(spark)
    fails = 0
    for seed in range(start, end):
        expr, clock = tm.gen_expr(seed)
        # P1
        rng = random.Random(seed * 7919 + 13)
        t = rng.randrange(900, 2100)
        step = rng.choice([30, 60, 75])
        a = t - rng.randrange(0, 3) * step
        b = t + rng.randrange(0, 3) * step
        try:
            inst = tm.canon(engine.query(expr, t).collect())
        except Exception:
            inst = None
            try:
                engine.query_range(expr, a, b, step).collect()
                print(f"FAIL P1 seed={seed}: instant errored, range did not: {expr}")
                fails += 1
            except Exception:
                pass
        if inst is not None:
            try:
                grid = engine.query_range(expr, a, b, step).collect()
                at_t = tm.canon([r for r in grid if r["t"] == t * 1000])
                try:
                    tm.assert_rows_match(inst, at_t, (expr, t, step))
                except AssertionError as e:
                    print(f"FAIL P1 seed={seed}: {e}")
                    fails += 1
            except Exception:
                pass
        # P2
        if not clock:
            for d in (90, 420):
                shifted, _ = tm.gen_expr(seed, extra_offset_s=d)
                rng2 = random.Random(seed * 104729 + d)
                t2 = rng2.randrange(900, 2100)
                eb = es = rb = rs = None
                try:
                    rb = engine.query(expr, t2).collect()
                except Exception as e:
                    eb = str(e)
                try:
                    rs = engine.query(shifted, t2 + d).collect()
                except Exception as e:
                    es = str(e)
                is_parse = lambda s: (s or "").startswith("parse error")
                if is_parse(eb) or is_parse(es):
                    if (eb is None) != (es is None):
                        print(f"FAIL P2 seed={seed} d={d}: parse parity {eb!r} vs {es!r}")
                        fails += 1
                elif (eb is None) != (es is None) or (
                    eb is not None and eb != es
                ):
                    print(f"FAIL P2 seed={seed} d={d}: err {eb!r} vs {es!r}: {expr}")
                    fails += 1
                elif eb is None:
                    try:
                        tm.assert_rows_match(
                            tm.canon(rb),
                            tm.canon(rs, shift_ms=d * 1000),
                            (expr, t2, d),
                        )
                    except AssertionError as e:
                        print(f"FAIL P2 seed={seed} d={d}: {e}")
                        fails += 1
        if (seed - start + 1) % 10 == 0:
            print(f"...{seed - start + 1}/{end - start} seeds, {fails} fails")
    print(f"done: {end - start} seeds, {fails} failures")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    a = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    raise SystemExit(main(a, b))
