"""Metamorphic properties of the curation operators (pipeline/sample.py).

Same discipline as the PromQL/store fuzz families: generate random
corpora from a seed, assert algebraic identities that any correct
implementation must satisfy — no oracle re-implementation needed.

* sampling — membership is a pure per-row function, so the sample of a
  union IS the union of the samples (the property that makes the gate
  monotone/resumable at 100 TB); fraction monotonicity; stratum
  isolation (a stratum's members don't change when OTHER strata's
  fractions change).
* caps — output ⊆ input, per-group counts == min(cap, group size),
  idempotence (capping a capped frame is a no-op), and the kept rows
  are exactly the order_col-smallest of each group.
* packing — shard/offset assignment is invariant to the bucket count
  (tested in test_sample.py); here: PREPEND-SHIFT (adding one doc that
  orders before all others shifts every offset by its token count) and
  APPEND-STABILITY (adding docs that order after all others leaves
  existing assignments untouched — the property that lets a grown
  corpus extend its shards without rewriting them).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from timbala_spark.pipeline import cap_per_group, pack_greedy, stratified_sample

N_SEEDS = 4  # CI gate; tools/fuzz_all.py sweeps wider


def _corpus(spark, rng, n=None):
    n = n or int(rng.randint(50, 500))
    ids = rng.choice(10_000, size=n, replace=False)
    rows = [
        (
            int(i),
            int(rng.choice([0, 1, 5, 40, 300])),
            str(rng.choice(["en", "de", "fr", "zh"])),
            "g%d" % rng.zipf(1.7),
        )
        for i in ids
    ]
    return spark.createDataFrame(
        rows, "doc_id long, n_tokens long, lang string, grp string"
    )


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_sample_union_composability_and_monotonicity(spark, seed):
    rng = np.random.RandomState(seed)
    df = _corpus(spark, rng)
    a = df.filter(F.col("doc_id") % 2 == 0)
    b = df.filter(F.col("doc_id") % 2 == 1)
    frac = float(rng.choice([0.1, 0.4, 0.8]))
    s = int(rng.randint(0, 100))
    whole = {r.doc_id for r in stratified_sample(df, frac, "doc_id", seed=s).collect()}
    parts = {
        r.doc_id
        for part in (a, b)
        for r in stratified_sample(part, frac, "doc_id", seed=s).collect()
    }
    assert whole == parts
    smaller = {
        r.doc_id
        for r in stratified_sample(df, frac / 2, "doc_id", seed=s).collect()
    }
    assert smaller <= whole


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_sample_stratum_isolation(spark, seed):
    rng = np.random.RandomState(100 + seed)
    df = _corpus(spark, rng)
    s = int(rng.randint(0, 100))
    en_a = {
        r.doc_id
        for r in stratified_sample(
            df, {"en": 0.5, "de": 0.9}, "doc_id", strata_col="lang", seed=s
        ).collect()
        if r.lang == "en"
    }
    en_b = {
        r.doc_id
        for r in stratified_sample(
            df, {"en": 0.5, "de": 0.1, "fr": 1.0}, "doc_id", strata_col="lang", seed=s
        ).collect()
        if r.lang == "en"
    }
    assert en_a == en_b


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_cap_invariants(spark, seed):
    rng = np.random.RandomState(200 + seed)
    df = _corpus(spark, rng)
    cap = int(rng.choice([1, 3, 10]))
    out = cap_per_group(df, "grp", cap, "doc_id")
    rows = out.collect()
    in_rows = df.collect()
    in_ids = {r.doc_id for r in in_rows}
    assert {r.doc_id for r in rows} <= in_ids
    by_grp_in: dict = {}
    for r in in_rows:
        by_grp_in.setdefault(r.grp, []).append(r.doc_id)
    by_grp_out: dict = {}
    for r in rows:
        by_grp_out.setdefault(r.grp, []).append(r.doc_id)
    for g, ids in by_grp_in.items():
        kept = sorted(by_grp_out.get(g, []))
        assert kept == sorted(ids)[: min(cap, len(ids))], g
    # idempotence
    again = cap_per_group(out, "grp", cap, "doc_id").collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in rows)


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_pack_prepend_shift_and_append_stability(spark, seed):
    rng = np.random.RandomState(300 + seed)
    df = _corpus(spark, rng)
    budget = int(rng.choice([7, 64, 1000]))
    base = {
        r.doc_id: (r.token_offset, r.shard_id)
        for r in pack_greedy(df, budget, "n_tokens", "doc_id").collect()
    }
    # prepend one doc ordering before everything: every offset shifts
    # by its token count (shards re-derive from the shifted offsets)
    t0 = int(rng.randint(1, 50))
    pre = df.unionByName(
        df.sparkSession.createDataFrame(
            [(-1, t0, "en", "g1")], df.schema
        )
    )
    shifted = {
        r.doc_id: (r.token_offset, r.shard_id)
        for r in pack_greedy(pre, budget, "n_tokens", "doc_id").collect()
    }
    assert shifted[-1] == (0, 0)
    for doc_id, (off, _) in base.items():
        s_off, s_shard = shifted[doc_id]
        assert s_off == off + t0
        assert s_shard == (off + t0) // budget
    # append docs ordering after everything: existing rows untouched
    app = df.unionByName(
        df.sparkSession.createDataFrame(
            [(100_000 + k, 11, "de", "g2") for k in range(5)], df.schema
        )
    )
    appended = {
        r.doc_id: (r.token_offset, r.shard_id)
        for r in pack_greedy(app, budget, "n_tokens", "doc_id").collect()
    }
    for doc_id, pair in base.items():
        assert appended[doc_id] == pair
