"""One-command wide-seed sweep of every metamorphic family.

The committed tests gate a couple dozen seeds each; this tool re-runs
the same properties across arbitrary seed ranges for regression
hunting between rounds:

  python tools/fuzz_all.py                 # default ranges (~20 min)
  python tools/fuzz_all.py expr 0 300      # one family, custom range
  FUZZ_SCALE=3 python tools/fuzz_all.py    # default ranges x3

Families: expr (per-step + offset-shift, tools/metamorphic_sweep.py's
logic), store (physical-source invariance), rollup (routed == raw),
frontend (cache transparency), compact (interleaving invariance),
regex (dialect translation), curation (sampling composability, cap
invariants, packing shift/append stability). Exit code 1 on any failure.
"""

from __future__ import annotations

import os
import random
import re as pyre
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)

SCALE = int(os.environ.get("FUZZ_SCALE", "1"))


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("fuzz-all")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )


def sweep_expr(spark, a, b) -> int:
    import test_metamorphic as tm

    engine = tm.engine.__wrapped__(spark)
    fails = 0
    for seed in range(a, b):
        expr, clock = tm.gen_expr(seed)
        rng = random.Random(seed * 7919 + 13)
        t = rng.randrange(900, 2100)
        step = rng.choice([30, 60, 75])
        lo = t - rng.randrange(0, 3) * step
        hi = t + rng.randrange(0, 3) * step
        try:
            inst = tm.canon(engine.query(expr, t).collect())
        except Exception:
            inst = None
            try:
                engine.query_range(expr, lo, hi, step).collect()
                print(f"FAIL expr/P1 seed={seed}: instant errored, range did not")
                fails += 1
            except Exception:
                pass
        if inst is not None:
            try:
                grid = engine.query_range(expr, lo, hi, step).collect()
                at_t = tm.canon([r for r in grid if r["t"] == t * 1000])
                tm.assert_rows_match(inst, at_t, (expr, t))
            except AssertionError as e:
                print(f"FAIL expr/P1 seed={seed}: {str(e)[:200]}")
                fails += 1
            except Exception:
                pass
        if clock:
            continue
        for d in (90, 420):
            shifted, _c = tm.gen_expr(seed, extra_offset_s=d)
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
            try:
                if is_parse(eb) or is_parse(es):
                    assert eb is not None and es is not None
                elif eb is not None or es is not None:
                    assert eb == es
                else:
                    tm.assert_rows_match(
                        tm.canon(rb), tm.canon(rs, shift_ms=d * 1000), (expr, d)
                    )
            except AssertionError as e:
                print(f"FAIL expr/P2 seed={seed} d={d}: {str(e)[:200]}")
                fails += 1
    return fails


def sweep_store(spark, a, b) -> int:
    import test_metamorphic as tm
    import test_metamorphic_store as tms

    gen = tms.engines.__wrapped__(spark)
    memory, stored, dirty = next(gen)
    fails = 0
    try:
        for seed in range(a, b):
            expr, _ = tm.gen_expr(seed)
            rng = random.Random(seed * 31337 + 5)
            t = rng.randrange(900, 2100)

            def run(eng):
                try:
                    return tm.canon(eng.query(expr, t).collect()), None
                except Exception as e:
                    return None, str(e)

            m, em = run(memory)
            s, es = run(stored)
            d, ed = run(dirty)
            try:
                assert (em is None) == (es is None) == (ed is None)
                if em is None:
                    tm.assert_rows_match(m, s, (expr, "stored"))
                    tm.assert_rows_match(m, d, (expr, "dirty"))
                else:
                    assert em == es == ed
            except AssertionError as e:
                print(f"FAIL store seed={seed}: {str(e)[:200]}")
                fails += 1
    finally:
        try:
            next(gen)  # run the fixture's cleanup
        except StopIteration:
            pass
    return fails


def sweep_rollup(spark, a, b) -> int:
    import test_rollup_metamorphic as trm

    raw, routed, routed2 = trm.engines.__wrapped__(spark)
    fails = 0
    for seed in range(a, b):
        (q, fn, rng_ms, off_ms, start, step_ms, n_steps, dense,
         stable) = trm.gen_shape(seed)
        end = start + (n_steps - 1) * step_ms
        va = trm._canon(raw.query_range(q, start / 1000, end / 1000, step_ms / 1000))
        vb = trm._canon(routed2.query_range(q, start / 1000, end / 1000, step_ms / 1000))
        cmp = trm._assert_same if stable else trm._assert_same_values
        try:
            cmp(va, vb, (q,))
        except AssertionError as e:
            print(f"FAIL rollup seed={seed}: {str(e)[:200]}")
            fails += 1
    return fails


def sweep_frontend(spark, a, b) -> int:
    import test_frontend_fuzz as tf
    import test_metamorphic as tm

    cached, direct = tf.apis.__wrapped__(spark)
    fails = 0
    for seed in range(a, b):
        expr, _clock, unstable = tm.gen_expr_full(seed)
        if unstable:
            continue
        rng = random.Random(seed * 7001 + 3)
        step = rng.choice([15, 30, 60])
        extent = rng.choice([600, 1200, 1800])
        now = rng.randrange(1200, 1500)
        for _ in range(3):
            va = cached.query_range(expr, now - extent, now, step)
            vb = direct.query_range(expr, now - extent, now, step)
            if va != vb:
                print(f"FAIL frontend seed={seed}: {expr}")
                fails += 1
                break
            now += step
        else:
            ia, ib = cached.query(expr, now), direct.query(expr, now)
            if ia != ib:
                print(f"FAIL frontend/instant seed={seed}: {expr}")
                fails += 1
    return fails


def sweep_compact(spark, a, b) -> int:
    import test_compact_fuzz as tc

    t = tc.TestCompactInterleavingFuzz()
    fails = 0
    for seed in range(a, b):
        try:
            t.test_any_interleaving_equals_from_scratch(spark, seed)
        except AssertionError as e:
            print(f"FAIL compact seed={seed}: {str(e)[:200]}")
            fails += 1
    return fails


def sweep_regex(spark, a, b) -> int:
    import test_regex_fuzz as tr

    from pyspark.sql import functions as F
    from timbala_spark.compiler import _anchored
    from timbala_spark.promql.re2 import re2_to_host

    rows = []
    for seed in range(a, b):
        rng = random.Random(seed * 37 + 1)
        for _ in range(120):
            p = tr.gen_pattern(rng)
            try:
                pc = pyre.compile(re2_to_host(p, "python"))
            except pyre.error:
                continue
            for _ in range(20):
                s = tr.gen_subject(rng)
                rows.append((p, _anchored(p), s, pc.fullmatch(s) is not None))
    df = spark.createDataFrame(
        rows, "pattern string, anchored string, subject string, want boolean"
    )
    bad = (
        df.withColumn("got", F.expr("subject RLIKE anchored"))
        .filter(F.col("got") != F.col("want"))
        .collect()
    )
    for r in bad[:10]:
        print(f"FAIL regex: {r['pattern']!r} on {r['subject']!r}")
    return len(bad)


def sweep_curation(spark, a, b) -> int:
    import test_curation_metamorphic as tcm

    fails = 0
    for seed in range(a, b):
        for prop in (
            tcm.test_sample_union_composability_and_monotonicity,
            tcm.test_sample_stratum_isolation,
            tcm.test_cap_invariants,
            tcm.test_pack_prepend_shift_and_append_stability,
        ):
            try:
                prop(spark, seed)
            except AssertionError as e:
                print(f"FAIL curation {prop.__name__} seed={seed}: {str(e)[:200]}")
                fails += 1
    return fails


def sweep_objstore(spark, a, b) -> int:
    """Not a seed sweep: re-runs the maintenance test suites in a
    fresh TIMBALA_STORE_BACKEND=objectstore process (the r8 backend
    seam contract — conditional PUT CAS, lease mutex, key-copy carry,
    no flock/hardlink). One pass regardless of the range args."""
    import subprocess

    env = dict(os.environ, TIMBALA_STORE_BACKEND="objectstore")
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "-q",
            "tests/test_object_store_backend.py",
            "tests/test_incremental_compact.py",
            "tests/test_snapshot.py",
            "tests/test_compact_fuzz.py",
            "tests/test_retention_tiers.py",
        ],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return 1 if r.returncode else 0


def sweep_objcrash(spark, a, b) -> int:
    """Crash-point fuzz for the object-store maintenance protocol:
    writer killed at the N-th backend op (lease left held), recovery
    writer must steal the expired lease and converge — see
    tools/crash_fuzz.py."""
    from tools.crash_fuzz import sweep as _sweep

    return _sweep(spark, a, b)


def sweep_idxcrash(spark, a, b) -> int:
    """Crash-point fuzz for the curation-index generation protocol
    (r10): index writer killed at the N-th backend op (lease left
    held), a live-lease append must fail fast, and a recovery
    reconcile must steal the expired lease and converge to a
    fresh-built control index — see tools/idx_crash_fuzz.py."""
    from tools.idx_crash_fuzz import sweep as _sweep

    return _sweep(spark, a, b)


FAMILIES = {
    # family: (sweep fn, default seed range)
    "expr": (sweep_expr, (0, 120 * SCALE)),
    "objstore": (sweep_objstore, (0, 1)),
    "objcrash": (sweep_objcrash, (0, 24)),
    "idxcrash": (sweep_idxcrash, (0, 24)),
    "store": (sweep_store, (0, 40 * SCALE)),
    "rollup": (sweep_rollup, (0, 60 * SCALE)),
    "frontend": (sweep_frontend, (0, 40 * SCALE)),
    "compact": (sweep_compact, (0, 12 * SCALE)),
    "regex": (sweep_regex, (0, 30 * SCALE)),
    "curation": (sweep_curation, (0, 25 * SCALE)),
}


def main(argv) -> int:
    picks = (
        {argv[0]: (FAMILIES[argv[0]][0], (int(argv[1]), int(argv[2])))}
        if len(argv) == 3
        else {k: v for k, v in FAMILIES.items() if not argv or k in argv}
    )
    spark = _spark()
    total = 0
    for name, (fn, (a, b)) in picks.items():
        print(f"== {name}: seeds [{a}, {b}) ==", flush=True)
        n = fn(spark, a, b)
        print(f"== {name}: {n} failures ==", flush=True)
        total += n
    print(f"TOTAL: {total} failures")
    spark.stop()
    return 1 if total else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
