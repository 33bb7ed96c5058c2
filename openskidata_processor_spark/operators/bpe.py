"""Distributed byte-pair-encoding tokenizer training (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

The reference pipeline ships its documents to downstream consumers that
tokenize them (SURVEY §2 text path); training the tokenizer itself is the
canonical corpus-scale job a 100 TB training-data pipeline adds on top.
Scale design:

1. **Corpus → vocab collapse.**  BPE statistics depend only on the
   multiset of distinct words, so ONE map-side-combining ``groupBy(word)``
   turns the corpus into a ``(word, freq)`` frame that is orders of
   magnitude smaller (Heaps' law: ~1M–100M distinct words for a 100 TB
   corpus).  Every merge iteration runs on this frame — the corpus is
   scanned exactly once, ever.
2. **Incremental pair-count maintenance.**  Merging pair ``(a, b)``
   changes the adjacent-pair statistics ONLY of words that contain the
   pair.  Each iteration (i) reads the 1-row argmax from the standing
   pair-count frame, (ii) computes a ±delta over the affected words
   alone (old pairs negative, post-merge pairs positive), and (iii)
   outer-merges the delta into the standing counts.  Shuffled rows per
   iteration ∝ affected words — the distributed analogue of the
   indexed-heap update every single-node BPE trainer uses.  The naive
   full-recount twin (``incremental=False``) is retained as the pytest
   equality pin (tests/test_tokenizer_ops.py).
3. **Bounded driver traffic.**  The only collect is the 1-row argmax per
   merge; lineage is cut per merge (standing counts) and every
   ``checkpoint_every`` merges (word state) via
   ``operators.barrier.truncate_lineage`` — localCheckpoint locally,
   reliable ``checkpoint()`` on a cluster with
   ``SPARK_GRAFT_RELIABLE_CHECKPOINT=1`` so executor loss cannot kill a
   long training run.

The within-word merge is a greedy left-to-right scan expressed as a
pure-Catalyst ``aggregate()`` fold (no Python in the hot path):
``"aaa"`` + pair ``(a, a)`` → ``[aa, a]``, matching the reference scan
semantics (a freshly merged symbol is never re-used as the LEFT side of
another merge in the same pass — guaranteed because ``a + b != a`` for a
non-empty ``b``).  Ties in the argmax break to the lexicographically
smallest ``(left, right)`` pair, mirrored by the pure-Python reference
implementation in the test suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .barrier import truncate_lineage


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq): corpus word frequencies — the one corpus-scale pass."""
    from ..functions.text import words

    return (df.select(F.explode(words(F.col(text_col))).alias("w"))
            .groupBy("w").agg(F.count("*").alias("freq")))


def chars(col: Column) -> Column:
    """Array of single characters (empty string entries dropped)."""
    return F.filter(F.split(col, ""), lambda c: c != "")


def adjacent_pairs(syms: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs, with multiplicity.

    Built as ``arrays_zip`` of two shifted slices (the vectorized idiom
    from functions/text.py::zip_ngrams); a 0- or 1-element input yields
    an empty array because both slices are empty.
    """
    k = F.greatest(F.size(syms) - 1, F.lit(0))
    zipped = F.arrays_zip(F.slice(syms, 1, k), F.slice(syms, 2, k))
    return F.transform(
        zipped, lambda s: F.struct(s["0"].alias("l"), s["1"].alias("r")))


def contains_pair(syms: Column, left: str, right: str) -> Column:
    """True when ``syms`` has ``right`` immediately after ``left``."""
    return F.exists(
        adjacent_pairs(syms),
        lambda p: (p["l"] == F.lit(left)) & (p["r"] == F.lit(right)))


def merge_pair(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (left, right).

    Fold invariant: merge when the accumulator's last element equals
    ``left`` and the current element equals ``right``.  A fresh merge
    result ``left + right`` can never equal ``left`` (``right`` is
    non-empty), so a merged symbol is never re-consumed as the left side
    within the same pass — exactly the reference scan.
    """
    merged = left + right
    return F.aggregate(
        syms, F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(x))))


def pair_stats_over_vocab(vocab: DataFrame, topk: int) -> DataFrame:
    """(pair, pair_count, n_words): deterministic top-``topk``
    freq-weighted adjacent character-pair counts over a (w, freq) vocab
    frame — the argmax input of BPE's first merge.  Shared by the batch
    catalog query and its streaming twin (the standing vocab ledger
    drains into exactly this computation at re-train time)."""
    from ..functions.text import zip_ngrams

    pairs = vocab.select(
        "w", "freq",
        F.explode(zip_ngrams(chars(F.col("w")), 2,
                             lambda x, y: F.concat(x, y))).alias("pair"))
    return (pairs.groupBy("pair")
            .agg(F.sum("freq").alias("pair_count"),
                 F.countDistinct("w").alias("n_words"))
            .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
            .limit(topk))


def pair_counts(word_syms: DataFrame) -> DataFrame:
    """(l, r, cnt): freq-weighted adjacent-pair counts over the vocab
    frame (with within-word multiplicity, per the reference trainer)."""
    return (word_syms
            .select("freq",
                    F.explode(adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt")))


def learn_bpe(vocab: DataFrame, n_merges: int, min_count: int = 2,
              incremental: bool = True,
              checkpoint_every: int = 4) -> list[dict]:
    """Learn up to ``n_merges`` BPE merges from a (w, freq) vocab frame.

    Returns ``[{merge_rank, left, right, merged, pair_count}, ...]`` in
    learning order; stops early when the best pair's weighted count
    drops below ``min_count``.  ``incremental=False`` recomputes the
    pair counts from scratch each iteration (the equality-pin twin).
    """
    cur = truncate_lineage(
        vocab.select("w", "freq", chars(F.col("w")).alias("syms")))
    pc = truncate_lineage(pair_counts(cur)) if incremental else None

    merges: list[dict] = []
    for rank in range(n_merges):
        counts = pc if incremental else pair_counts(cur)
        top = (counts
               .orderBy(F.col("cnt").desc(), F.col("l").asc(),
                        F.col("r").asc())
               .limit(1).collect())                     # bounded: 1 row
        if not top or top[0]["cnt"] < min_count:
            break
        a, b, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append({"merge_rank": rank, "left": a, "right": b,
                       "merged": a + b, "pair_count": cnt})

        hit = contains_pair(F.col("syms"), a, b)
        if incremental:
            affected = cur.filter(hit)
            old_p = (affected
                     .select("freq", F.explode(
                         adjacent_pairs(F.col("syms"))).alias("p"))
                     .select(F.col("p.l").alias("l"),
                             F.col("p.r").alias("r"),
                             (-F.col("freq")).alias("cnt")))
            new_p = (affected
                     .select("freq", F.explode(adjacent_pairs(
                         merge_pair(F.col("syms"), a, b))).alias("p"))
                     .select(F.col("p.l").alias("l"),
                             F.col("p.r").alias("r"),
                             F.col("freq").alias("cnt")))
            # Fold the ±delta into the standing counts with ONE shuffle
            # (union + re-group; map-side partial agg absorbs the raw
            # pair explode) and materialize the result, so the next
            # argmax reads a local snapshot instead of re-running a
            # compounding delta chain.  Per-merge cost: one shuffle over
            # |standing pairs| + |affected-word pairs| rows.
            pc = (pc.unionByName(old_p).unionByName(new_p)
                  .groupBy("l", "r").agg(F.sum("cnt").alias("cnt"))
                  .filter(F.col("cnt") > 0))
            pc = truncate_lineage(pc)
        cur = cur.withColumn(
            "syms",
            F.when(hit, merge_pair(F.col("syms"), a, b))
            .otherwise(F.col("syms")))
        if (rank + 1) % checkpoint_every == 0:
            cur = truncate_lineage(cur, eager=False)
    return merges


def encode_words(word_syms: DataFrame, merges: list[dict]) -> DataFrame:
    """Apply a learned merge table to a (w, freq, syms) frame, in rank
    order — the 'tokenize the corpus' half of the train/apply pair.
    Each merge is one pure-Catalyst fold; lineage is cut every few
    merges to keep the expression tree bounded."""
    cur = word_syms
    for i, m in enumerate(merges):
        hit = contains_pair(F.col("syms"), m["left"], m["right"])
        cur = cur.withColumn(
            "syms",
            F.when(hit, merge_pair(F.col("syms"), m["left"], m["right"]))
            .otherwise(F.col("syms")))
        if (i + 1) % 4 == 0:
            cur = truncate_lineage(cur, eager=False)
    return cur
