"""Bloom pre-join pruning (operators/bloom.py): the no-false-negative
guarantee, the FPR bound, exact-join equivalence, and real selectivity.
(The bloom_decontaminate catalog query also hash-matches DuckDB in
test_oracle_parity.py — the oracle is the plain exact join, because the
filter is semantically transparent.)"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from openskidata_processor_spark.operators.bloom import (
    bloom_semi_join, build_bloom_bits, might_contain)


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k string")


def test_bloom_no_false_negatives(spark):
    members = [f"key-{i}" for i in range(500)]
    bits = build_bloom_bits(_keys(spark, members), F.col("k"))
    hits = (_keys(spark, members)
            .filter(might_contain(F.col("k"), bits)).count())
    assert hits == len(members)          # EVERY member passes — always


def test_bloom_fpr_within_bound(spark):
    """A deliberately tight filter (1024 bits, 200 keys, k=5): measured
    FPR on 2000 disjoint probes stays within 2× the analytic bound
    (1 − e^{−kn/m})^k ≈ 9.4%."""
    n_bits, n_hashes, n_keys = 1024, 5, 200
    members = [f"m{i}" for i in range(n_keys)]
    bits = build_bloom_bits(_keys(spark, members), F.col("k"),
                            n_bits=n_bits, n_hashes=n_hashes)
    probes = 2000
    fp = (_keys(spark, [f"other{i}" for i in range(probes)])
          .filter(might_contain(F.col("k"), bits, n_hashes)).count())
    analytic = (1 - math.exp(-n_hashes * n_keys / n_bits)) ** n_hashes
    assert fp / probes <= 2 * analytic, (fp / probes, analytic)


def test_bloom_default_filter_is_selective(spark):
    """With the default 128K-bit filter, 500 members vs 20k disjoint
    probes: virtually everything non-member is pruned BEFORE any join
    (the whole point — the verify join's input is tiny)."""
    members = [f"m{i}" for i in range(500)]
    bits = build_bloom_bits(_keys(spark, members), F.col("k"))
    passed = (_keys(spark, [f"x{i}" for i in range(20_000)])
              .filter(might_contain(F.col("k"), bits)).count())
    assert passed <= 20          # fpr ≈ 1e-7 at this load; 20 = 1000×

def test_bloom_semi_join_equals_exact(spark):
    big = spark.range(0, 5000).select(
        F.concat(F.lit("k"), (F.col("id") % 700).cast("string"))
        .alias("k"), F.col("id"))
    small = _keys(spark, [f"k{i}" for i in range(0, 700, 3)])
    got = bloom_semi_join(big, small, "k")
    want = big.join(small.distinct(), "k", "left_semi")
    assert got.schema == want.schema
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_decontaminate_plan_prefilters_before_join(spark):
    """The verify join must see the bloom expression as a FILTER below
    it (element_at probes in the plan), and the scan stays pruned to
    doc_id+text."""
    from conftest import SF_SMOKE
    from openskidata_processor_spark.plans import QUERIES

    plan = (QUERIES["bloom_decontaminate"](spark, SF_SMOKE)
            ._jdf.queryExecution().executedPlan().toString())
    assert "element_at" in plan          # the probe expression exists
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for unused in ("source", "lang", "n_chars"):
        assert unused not in read_schema
