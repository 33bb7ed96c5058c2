"""Bloom-filter pre-join pruning, hand-rolled in pure Catalyst.

The classic 100 TB decontamination shape: the benchmark side is small
(millions of shingles), the training side is enormous (trillions).  An
exact semi-join must shuffle BOTH sides on the shingle; a Bloom filter
built from the benchmark side and evaluated as a per-row EXPRESSION on
the training side drops ~99.9%% of training shingles before the shuffle,
so only candidates ship — Spark's own runtime bloom-filter join
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) made explicit and
predictable (the built-in rule only fires on selective creation-side
filters; this operator applies it by contract).

No false negatives (a member always passes — Bloom guarantee), so the
exact verify join AFTER the filter returns exactly the unfiltered
answer; false positives only cost wasted candidate rows, bounded by
``fpr ≈ (1 − e^{−k·n/m})^k``.

Mechanics: the filter is ``m`` bits packed into ``m/64`` longs.  Build =
one partial-aggregated pass over the keys (explode k positions →
groupBy(word) → bit_or — at most m/64 groups), collected to the driver
(bounded by the BITMAP size, never the key count) and re-shipped as an
array<long> literal.  Probe = k xxhash64 + element_at + bitwiseAND per
row — whole-stage codegen, no Python, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULT_BITS = 1 << 17        # 131072 bits = 2048 longs = 16 KiB
_DEFAULT_HASHES = 5


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    # xxhash64(key, seed_i): the extra literal column acts as the seed
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits))
            for i in range(n_hashes)]


def build_bloom_bits(df: DataFrame, key: Column,
                     n_bits: int = _DEFAULT_BITS,
                     n_hashes: int = _DEFAULT_HASHES) -> list[int]:
    """One aggregation pass over ``df``'s keys → the filter's backing
    longs (length n_bits/64).  The collect is bounded by the bitmap
    size (≤ n_bits/64 rows), NOT the key count."""
    assert n_bits % 64 == 0
    pos = F.explode(F.array(*_positions(key, n_bits, n_hashes)))
    words = (df.select(pos.alias("__pos"))
             .select((F.col("__pos") / 64).cast("int").alias("__word"),
                     F.call_function(
                         "shiftleft", F.lit(1).cast("long"),
                         F.pmod(F.col("__pos"), 64).cast("int"))
                     .alias("__mask"))
             .groupBy("__word")
             .agg(F.bit_or("__mask").alias("__bits"))
             .collect())
    bits = [0] * (n_bits // 64)
    for r in words:
        bits[r["__word"]] = r["__bits"]
    return bits


def might_contain(key: Column, bits: list[int],
                  n_hashes: int = _DEFAULT_HASHES) -> Column:
    """Membership-test EXPRESSION against a built filter: true for every
    inserted key (no false negatives), true for a non-member with
    probability ≈ fpr.  Pure Catalyst — evaluate it in a .filter()
    BEFORE an exact join to prune the big side's shuffle."""
    n_bits = len(bits) * 64
    arr = F.array(*[F.lit(w).cast("long") for w in bits])
    cond = None
    for p in _positions(key, n_bits, n_hashes):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        mask = F.call_function("shiftleft", F.lit(1).cast("long"),
                               F.pmod(p, 64).cast("int"))
        hit = word.bitwiseAND(mask) != 0
        cond = hit if cond is None else cond & hit
    return cond


def bloom_semi_join(big: DataFrame, small: DataFrame, key_col: str,
                    n_bits: int = _DEFAULT_BITS,
                    n_hashes: int = _DEFAULT_HASHES) -> DataFrame:
    """EXACT left-semi join of ``big`` against ``small`` on ``key_col``,
    with a bloom pre-filter pruning big's shuffle to candidates.  The
    result equals ``big.join(small, key_col, "left_semi")`` exactly —
    the filter admits every true member and the verify join removes the
    false positives."""
    bits = build_bloom_bits(small, F.col(key_col), n_bits, n_hashes)
    candidates = big.filter(might_contain(F.col(key_col), bits, n_hashes))
    return candidates.join(small.select(key_col).distinct(), key_col,
                           "left_semi")
