"""Physical-plan regression gates for the scale properties PERF.md
relies on: filter pushdown, column pruning, day-partition pruning, and
the absence of a global sort on the programmatic path. These were
previously verified by hand (`.explain("formatted")` transcripts in
PERF.md §1/§3); a plan regression should fail CI, not a round review.
"""

import contextlib
import io
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from timbala_spark import Engine, prepare_samples


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


DAY_MS = 86_400_000
BASE_MS = 1_700_000_000_000


@pytest.fixture(scope="module")
def stored_engine(spark):
    from timbala_spark.streaming.ingest import (
        read_samples_table,
        write_samples_batch,
    )

    rows = [
        (
            {"__name__": "m", "job": "a"},
            BASE_MS + d * DAY_MS + i * 60_000,
            float(i),
        )
        for d in range(5)
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "labels map<string,string>, t long, v double")
    tmp = tempfile.mkdtemp(prefix="timbala_plans_")
    write_samples_batch(prepare_samples(df), tmp)
    yield Engine(spark, read_samples_table(spark, tmp))
    shutil.rmtree(tmp, ignore_errors=True)


class TestStoredScanPlans:
    def test_day_partition_pruning(self, stored_engine):
        """A one-lookback instant query must scan ONE day partition of
        five, via PartitionFilters on the derived day column."""
        ts = (BASE_MS + 4 * DAY_MS + 49 * 60_000) / 1000
        plan = _plan(stored_engine.query("m", ts))
        assert "PartitionFilters" in plan
        pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
        assert "day" in pf and ">= 20231118" in pf and "<= 20231118" in pf, pf

    def test_time_bounds_reach_samples_scan(self, stored_engine):
        ts = (BASE_MS + 4 * DAY_MS + 49 * 60_000) / 1000
        plan = _plan(stored_engine.query("m", ts))
        assert "GreaterThanOrEqual(t," in plan and "LessThanOrEqual(t," in plan

    def test_name_filter_reaches_series_dict_scan(self, stored_engine):
        ts = (BASE_MS + 4 * DAY_MS + 49 * 60_000) / 1000
        plan = _plan(stored_engine.query("m", ts))
        assert "EqualTo(name,m)" in plan

    def test_samples_scan_schema_pruned(self, stored_engine):
        """The narrow samples scan must read exactly (series_id, t, v) —
        labels ride only on the series-dict side."""
        ts = (BASE_MS + 4 * DAY_MS + 49 * 60_000) / 1000
        plan = _plan(stored_engine.query("m", ts))
        assert "struct<series_id:bigint,t:bigint,v:double>" in plan

    def test_no_global_sort_on_programmatic_path(self, stored_engine):
        ts = (BASE_MS + 4 * DAY_MS + 49 * 60_000) / 1000
        plan = _plan(stored_engine.query("m", ts))
        # a global orderBy compiles to Exchange rangepartitioning —
        # the one all-to-one stage the engine must not emit by default
        assert "rangepartitioning" not in plan


class TestEventsPivotPlans:
    def test_selector_pushdown_and_pruning(self, spark):
        from timbala_spark.sources.events import events_to_samples

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        samples = events_to_samples(spark, "/root/testdata/sf0.001")
        t_max = samples.agg(F.max("t")).first()[0]
        eng = Engine(spark, samples, lookback_ms=12 * 3_600_000)
        plan = _plan(eng.query("click", t_max / 1000))
        assert "EqualTo(event_type,click)" in plan
        # column pruning: the events table's unused columns must not be
        # read (event_id, session fields, etc.)
        rs = next(
            l for l in plan.splitlines() if "ReadSchema" in l and "event_type" in l
        )
        assert "event_id" not in rs, rs
        assert "rangepartitioning" not in plan


class TestRateKernelPlan:
    def test_single_exchange_no_python(self, stored_engine):
        """r5 lag-aggregate rate kernel: ONE exchange
        (hashpartitioning on series_id for the per-series lag window);
        the (series_id, step_t) aggregation reuses that partitioning —
        a second exchange would mean the no-reshuffle property
        regressed. No interpreted `aggregate` HOF and no Python
        anywhere in the kernel."""
        ts = (BASE_MS + 4 * DAY_MS + 49 * 60_000) / 1000
        plan = _plan(
            stored_engine.query_range("rate(m[30m])", ts - 3600, ts, 60)
        )
        # formatted plans list each Exchange's partitioning on an
        # `Arguments: hashpartitioning(...)` detail line; the kernel's
        # shuffle keys on series_id ALONE (the store's dict-attach side
        # may add a small (series_id, name) exchange plus a broadcast —
        # those are not the kernel)
        import re as _re

        kernel_exchanges = _re.findall(
            r"Arguments: hashpartitioning\(series_id#\d+L?, \d+\)", plan
        )
        assert len(kernel_exchanges) == 1, kernel_exchanges
        assert "rangepartitioning" not in plan
        assert "Python" not in plan
        # the extrapolation runs as plain column projection, not as an
        # interpreted lambda fold over collected arrays
        assert "collect_list" not in plan
