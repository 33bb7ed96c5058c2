"""Distributed WordPiece tokenizer training (Schuster & Nakajima 2012;
the BERT tokenizer) — the third major subword algorithm beside BPE
(operators/bpe.py) and the unigram LM (operators/unigram.py).

WordPiece is BPE with a different argmax: each round merges the
adjacent pair maximizing the LIKELIHOOD score

    score(a, b) = pair_count(a, b) / (sym_count(a) * sym_count(b))

instead of the raw pair count, and encoding is greedy
longest-match-first over the final vocabulary (not merge replay).
Continuation symbols carry the ``##`` prefix: a word's first character
is plain, every later character is ``##c``, and merging ``(a, ##b)``
yields ``a + b`` with the left side's prefix preserved.

Scale shape is identical to the BPE deep path: ONE corpus→vocab
collapse (the only corpus-scale pass), then the inherently sequential
merge loop runs inside a single ``applyInPandas`` task over the
(w, freq) frame — zero driver round trips at any depth.  Scores are
compared as EXACT integer fractions (cross-multiplication — no float
drift anywhere), so training is bit-reproducible and equality-pinned
against a pure-Python reference (tests/test_wordpiece_ops.py).

Reference anchor: the reference pipeline feeds downstream consumers
that tokenize its text outputs (openskidata-processor README pipeline
diagram); SURVEY.md §2 training-data extension.
"""

from __future__ import annotations

from fractions import Fraction

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_symbols(word: str) -> list[str]:
    """BERT-style initial symbols: first char plain, rest ##-prefixed."""
    return [word[0]] + ["##" + c for c in word[1:]] if word else []


def merge_symbol(a: str, b: str) -> str:
    """Concatenate symbols, stripping the right side's ## continuation."""
    return a + (b[2:] if b.startswith("##") else b)


def learn_wordpiece_local(vocab: DataFrame, n_merges: int,
                          min_count: int = 2) -> DataFrame:
    """Learn ``n_merges`` WordPiece merges inside ONE applyInPandas task
    (the deep-path twin of ``learn_bpe_local``).

    Returns (merge_rank, left, right, merged, pair_count, score_num,
    score_den) — the score reported as the exact integer fraction
    pair_count / (sym_count(left)*sym_count(right)) at selection time.
    Argmax: highest score, ties to the lexicographically smallest
    (left, right).  Stops early when the best pair's count drops below
    ``min_count``.  Memory contract: the vocab frame must fit one
    executor task (Heaps'-law bounded; same contract as
    learn_bpe_local)."""
    schema = ("merge_rank INT, left STRING, right STRING, "
              "merged STRING, pair_count LONG, "
              "score_num LONG, score_den LONG")

    def train(pdf):
        import heapq

        words = [word_symbols(w) for w in pdf["w"]]
        freqs = [int(f) for f in pdf["freq"]]

        # Incremental state — the WordPiece analogue of the BPE deep
        # learner's indexed heap.  Key observation making the heap work
        # despite score = pc/(sc_l*sc_r) coupling pairs to unigram
        # counts: merging (a, b) -> m changes the symbol counts of a, b
        # and m ONLY (no other symbol's multiplicity moves), so exactly
        # the pairs touching {a, b, m} plus the pairs whose own count
        # changed need fresh heap entries — never the whole table.
        pc: dict[tuple[str, str], int] = {}
        sc: dict[str, int] = {}
        pair_where: dict[tuple[str, str], set[int]] = {}
        sym_pairs: dict[str, set[tuple[str, str]]] = {}
        for i, (syms, f) in enumerate(zip(words, freqs)):
            for s in syms:
                sc[s] = sc.get(s, 0) + f
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                pc[p] = pc.get(p, 0) + f
                pair_where.setdefault(p, set()).add(i)
                sym_pairs.setdefault(p[0], set()).add(p)
                sym_pairs.setdefault(p[1], set()).add(p)

        def score(p):
            return Fraction(pc[p], sc[p[0]] * sc[p[1]])

        # lazy-deletion heap keyed (-score, l, r): max score first, lex
        # tie-break; an entry is valid iff it matches the LIVE score
        heap = [(-score(p), p[0], p[1]) for p, c in pc.items()
                if c >= min_count]
        heapq.heapify(heap)

        def push(p):
            if pc.get(p, 0) >= min_count:
                heapq.heappush(heap, (-score(p), p[0], p[1]))

        def apply_one(syms, a, b, m):
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(m)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        out_rows = []
        for rank in range(n_merges):
            best = None
            while heap:
                negs, a, b = heap[0]
                p = (a, b)
                if pc.get(p, 0) >= min_count and -negs == score(p):
                    best = p
                    break
                heapq.heappop(heap)            # stale or dead entry
            if best is None:
                break
            a, b = best
            m = merge_symbol(a, b)
            s = score(best)
            out_rows.append((rank, a, b, m, int(pc[best]),
                             int(s.numerator), int(s.denominator)))

            touched_pairs: set[tuple[str, str]] = set()
            for i in list(pair_where.get(best, ())):
                old = words[i]
                new = apply_one(old, a, b, m)
                f = freqs[i]
                for s_ in old:
                    sc[s_] -= f
                for s_ in new:
                    sc[s_] = sc.get(s_, 0) + f
                for j in range(len(old) - 1):
                    p = (old[j], old[j + 1])
                    pc[p] = pc.get(p, 0) - f
                    touched_pairs.add(p)
                new_pairs = set()
                for j in range(len(new) - 1):
                    p = (new[j], new[j + 1])
                    pc[p] = pc.get(p, 0) + f
                    touched_pairs.add(p)
                    new_pairs.add(p)
                    pair_where.setdefault(p, set()).add(i)
                    sym_pairs.setdefault(p[0], set()).add(p)
                    sym_pairs.setdefault(p[1], set()).add(p)
                for j in range(len(old) - 1):
                    p = (old[j], old[j + 1])
                    if p not in new_pairs:
                        pair_where.get(p, set()).discard(i)
                words[i] = new
            # drop dead pairs, then refresh scores: pairs with changed
            # counts, plus every live pair touching a symbol whose
            # unigram count moved ({a, b, m})
            for p in touched_pairs:
                if pc.get(p, 0) <= 0:
                    pc.pop(p, None)
                    pair_where.pop(p, None)
                    sym_pairs.get(p[0], set()).discard(p)
                    sym_pairs.get(p[1], set()).discard(p)
            refresh = set(touched_pairs)
            for s_ in (a, b, m):
                refresh |= sym_pairs.get(s_, set())
            for p in refresh:
                if p in pc:
                    push(p)
        return pd.DataFrame(
            out_rows,
            columns=["merge_rank", "left", "right", "merged",
                     "pair_count", "score_num", "score_den"])

    return (vocab.select("w", "freq")
            .withColumn("__g", F.lit(1))
            .groupBy("__g")
            .applyInPandas(lambda _, pdf: train(pdf), schema=schema))


def wordpiece_vocab(merges: list[dict],
                    alphabet: set[str]) -> set[str]:
    """Final token vocabulary: the BERT-style alphabet (plain + ##
    continuation forms) plus every merged token."""
    vocab = set(alphabet) | {"##" + a for a in alphabet}
    vocab |= {m["merged"] for m in merges}
    return vocab


def encode_wordpiece_udf(word_frame: DataFrame, vocab: set[str],
                         max_token_len: int = 32,
                         word_col: str = "w") -> DataFrame:
    """Add a ``pieces`` array column: BERT greedy longest-match-first
    encoding of ``word_col`` under the token vocabulary.  A word with an
    unmatchable position encodes to ``["[UNK]"]`` (the whole word, per
    the BERT tokenizer contract).  The vocab ships via the UDF once per
    executor (it is the trained artifact, ≤ a few 10k strings)."""
    vocab_list = sorted(vocab)

    @F.pandas_udf("array<string>")
    def _enc(col: pd.Series) -> pd.Series:
        vs = set(vocab_list)

        def one(w):
            out, i, n = [], 0, len(w)
            while i < n:
                end = min(n, i + max_token_len)
                piece = None
                for j in range(end, i, -1):    # longest match first
                    cand = w[i:j] if i == 0 else "##" + w[i:j]
                    if cand in vs:
                        piece = cand
                        break
                if piece is None:
                    return ["[UNK]"]
                out.append(piece)
                i += len(piece) - 2 if piece.startswith("##") \
                    else len(piece)
            return out
        return col.map(one)

    return word_frame.withColumn("pieces", _enc(F.col(word_col)))
