"""Differential fuzz for the round-6 training operators: random small
corpora (odd shapes the fixed sf0.01 parity data never hits — empty
texts, one-word docs, unicode, duplicate ids' worth of identical
content) run through the ENGINE and through the same catalog ORACLE SQL
in DuckDB over a registered temp table.  Fixed seeds — failures
reproduce."""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from openskidata_processor_spark.plans import ORACLES

WORDS = ["alpha", "beta", "gamma", "delta", "zug", "год", "x1",
         "the", "of", "and", "", "a", "Ωmega", "beta"]


def _random_docs(seed: int, n: int):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        kind = rnd.random()
        if kind < 0.1:
            text = ""                              # token-less
        elif kind < 0.2:
            text = rnd.choice(string.punctuation) * rnd.randint(1, 30)
        elif kind < 0.3:
            text = rows[rnd.randrange(len(rows))][2] if rows else "dup"
        else:
            text = " ".join(rnd.choice(WORDS)
                            for _ in range(rnd.randint(1, 40)))
        rows.append((i, f"src{i % 3}", text,
                     rnd.choice(["en", "de", "zh"]), len(text)))
    return rows


def _compare(spark, rows):
    import pandas as pd

    sdf = spark.createDataFrame(
        rows, "doc_id long, source string, text string, lang string, "
              "n_chars long")
    # catalog queries read parquet paths, so each test drives the
    # OPERATOR directly and runs the catalog's oracle SQL over the same
    # rows registered as the documents view
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        rows, columns=["doc_id", "source", "text", "lang", "n_chars"]))
    return sdf, con


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_lm_perplexity_fuzz(spark, seed):
    from openskidata_processor_spark.operators.lm_score import \
        bigram_logprob
    rows = _random_docs(seed, 40)
    sdf, con = _compare(spark, rows)
    got = sorted(map(tuple, bigram_logprob(sdf).collect()))
    want = sorted(map(tuple,
                      con.execute(ORACLES["lm_perplexity_docs"])
                      .fetchall()))
    assert got == want


@pytest.mark.parametrize("seed", [5, 17])
def test_dup_ngram_fuzz(spark, seed):
    from openskidata_processor_spark.operators.dupstats import \
        dup_ngram_stats
    rows = _random_docs(seed, 40)
    sdf, con = _compare(spark, rows)
    got = sorted(map(tuple, dup_ngram_stats(sdf, n=5).collect()))
    want = sorted(map(tuple,
                      con.execute(ORACLES["dup_ngram_docs"]).fetchall()))
    assert got == want


@pytest.mark.parametrize("seed", [7, 29])
def test_dsir_fuzz(spark, seed):
    from pyspark.sql import functions as F

    from openskidata_processor_spark.operators.dsir import dsir_select
    rows = _random_docs(seed, 40)
    sdf, con = _compare(spark, rows)
    got = sorted(map(tuple,
                     dsir_select(sdf, F.col("lang") == "en",
                                 k=100).collect()))
    want = sorted(map(tuple,
                      con.execute(ORACLES["dsir_select_docs"])
                      .fetchall()))
    assert got == want


@pytest.mark.parametrize("seed", [3, 41])
def test_curate_fuzz(spark, seed):
    from openskidata_processor_spark.pipeline.curation import curate
    rows = _random_docs(seed, 60)
    sdf, con = _compare(spark, rows)
    got = sorted(map(tuple, curate(sdf).collect()))
    want = sorted(map(tuple,
                      con.execute(ORACLES["curate_corpus"]).fetchall()))
    assert got == want
