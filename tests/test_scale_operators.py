"""Scale-path operators: bucketed co-located joins (zero-shuffle plan
audit) and explicit skew salting (result parity with unsalted plans)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from openskidata_processor_spark.operators import bucketing as bk
from openskidata_processor_spark.operators import skew


class TestBucketing:
    def test_co_located_join_has_no_shuffle(self, spark, tmp_path):
        left = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
        bk.write_bucketed(left, "t_left_b", str(tmp_path / "l"),
                          ["k"], 8, sort_cols=["k"])
        bk.write_bucketed(right, "t_right_b", str(tmp_path / "r"),
                          ["k"], 8, sort_cols=["k"])
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # force SMJ so the check exercises bucket alignment, not a
            # broadcast that would trivially have no shuffle
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = bk.co_located_join(spark, "t_left_b", "t_right_b", "k")
            bk.assert_no_shuffle(joined)          # the point of bucketing
            assert joined.count() == 1000
            # sanity: the same join on unbucketed frames DOES shuffle
            with pytest.raises(AssertionError):
                bk.assert_no_shuffle(left.join(right, "k"))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.sql("DROP TABLE IF EXISTS t_left_b")
            spark.sql("DROP TABLE IF EXISTS t_right_b")


@pytest.fixture()
def skewed(spark):
    # 2000 rows of key 0 (hot), 10 rows each of keys 1..9
    hot = spark.range(2000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = (spark.range(90).select(
        (F.col("id") % 9 + 1).alias("k"), F.col("id").alias("v")))
    return hot.unionByName(cold)


class TestSkew:
    def test_salted_join_matches_plain(self, spark, skewed):
        dim = spark.createDataFrame(
            [(i, f"name{i}") for i in range(10)], "k bigint, name string")
        plain = skewed.join(dim, ["k"]).groupBy("k", "name").count()
        salted = (skew.salted_join(skewed, dim, ["k"], n_salts=8)
                  .groupBy("k", "name").count())
        assert sorted(plain.collect()) == sorted(salted.collect())

    def test_salted_join_scatters_hot_key(self, spark, skewed):
        out = skew.salted_join(
            skewed, skewed.select("k").distinct(), ["k"], n_salts=8)
        salts = (skewed.withColumn(
            "__salt", skew._row_salt(skewed, 8))
            .filter(F.col("k") == 0)
            .select("__salt").distinct().count())
        assert salts > 1          # the hot key really spreads over salts
        assert out.count() == skewed.count()

    def test_salted_join_rejects_outer(self, spark, skewed):
        """Right/full outer would emit each unmatched dim row n_salts
        times (the dim side is replicated per salt) — must raise, not
        silently violate the equality contract."""
        dim = spark.createDataFrame([(0, "a")], "k bigint, name string")
        for how in ("right", "rightouter", "full", "outer", "full_outer"):
            with pytest.raises(ValueError, match="unsupported"):
                skew.salted_join(skewed, dim, ["k"], n_salts=8, how=how)
        # left-family joins still accepted and correct
        left = (skew.salted_join(skewed, dim, ["k"], n_salts=8, how="left")
                .groupBy("k", "name").count())
        plain = skewed.join(dim, ["k"], "left").groupBy("k", "name").count()
        assert sorted(left.collect()) == sorted(plain.collect())
        semi = skew.salted_join(skewed, dim, ["k"], n_salts=8,
                                how="left_semi")
        assert semi.count() == 2000
        anti = skew.salted_join(skewed, dim, ["k"], n_salts=8,
                                how="left_anti")
        assert anti.count() == 90

    def test_salted_aggregate_matches_plain(self, spark, skewed):
        plain = (skewed.groupBy("k")
                 .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
                      F.min("v").alias("lo"), F.max("v").alias("hi")))
        salted = skew.salted_aggregate(
            skewed, ["k"],
            {"n": ("count", "*"), "s": ("sum", "v"),
             "lo": ("min", "v"), "hi": ("max", "v")}, n_salts=8)
        assert sorted(plain.collect()) == sorted(salted.collect())

    def test_salted_aggregate_rejects_non_decomposable(self, spark, skewed):
        with pytest.raises(ValueError):
            skew.salted_aggregate(skewed, ["k"], {"a": ("avg", "v")})


class TestRuntimeFilter:
    """operators/runtime_filter.py — explicit semi-join reduction."""

    @pytest.fixture()
    def posting(self, spark):
        from conftest import SF_SMOKE
        from openskidata_processor_spark.functions import text as T
        from openskidata_processor_spark.sources.tables import load_table
        docs = load_table(spark, SF_SMOKE, "documents").select(
            "doc_id", T.words(F.col("text")).alias("ws"))
        sh = docs.select(
            "doc_id",
            F.explode(F.array_distinct(
                T.word_shingles(F.col("ws"), 3))).alias("shingle"))
        bench = (sh.filter(F.col("doc_id") % 29 == 0)
                 .select(F.col("doc_id").alias("bench_id"), "shingle"))
        train = sh.filter(F.col("doc_id") % 29 != 0)
        return train, bench

    def _scan(self, train, bench):
        return (train.join(bench, "shingle")
                .groupBy("doc_id")
                .agg(F.countDistinct("shingle").alias("n_shared"),
                     F.countDistinct("bench_id").alias("n_bench")))

    def test_prefiltered_scan_matches_plain(self, spark, posting):
        """The contamination result is IDENTICAL with the probe side
        pre-reduced — the filter never drops a true match."""
        from openskidata_processor_spark.operators.runtime_filter import \
            bucket_semi_filter
        train, bench = posting
        plain = sorted(map(tuple, self._scan(train, bench).collect()))
        reduced = bucket_semi_filter(train, bench, "shingle")
        pre = sorted(map(tuple, self._scan(reduced, bench).collect()))
        assert plain == pre and len(plain) > 0

    def test_prefilter_reduces_probe_side(self, spark, posting):
        """Mostly-disjoint corpora: the probe shrinks by >90% (the join
        then shuffles only the sliver)."""
        from openskidata_processor_spark.operators.runtime_filter import \
            bucket_semi_filter
        train, bench = posting
        n_before = train.count()
        n_after = bucket_semi_filter(train, bench, "shingle").count()
        assert n_after < n_before * 0.1
        # and it is still a superset of the true matches
        true_matches = train.join(
            bench.select("shingle").distinct(), "shingle").count()
        assert n_after >= true_matches

    def test_prefilter_is_broadcast_semi_join(self, spark, posting):
        from openskidata_processor_spark.operators.runtime_filter import \
            bucket_semi_filter
        train, bench = posting
        plan = bucket_semi_filter(train, bench, "shingle") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
        assert "BatchEvalPython" not in plan
