"""Distributed BPE tokenizer TRAINING (byte-level, GPT-2 family).

The reference only *applies* pretrained HF tokenizers
(wimbd/es/decontamination.py); training one over your own corpus is
the missing prerequisite for a full training-data pipeline, so this is
a beyond-reference extension pairing with functions/bpe.py (the
applier): ``train_bpe`` produces the exact (merge ranks, vocab) shape
``make_encoder`` consumes, and ``save_bpe_assets`` writes the standard
``merges.txt`` + ``vocab.json`` pair that ``load_bpe_assets`` (and any
HF BPE tokenizer) reads back — train here, tokenize anywhere.

Algorithm (public: Sennrich et al. 2016 "Neural Machine Translation of
Rare Words with Subword Units"; byte-level variant per Radford et al.
2019): count pre-tokenized words over the corpus, then greedily merge
the most frequent adjacent symbol pair until the vocab budget is
spent.

Spark-first split of the work:

* **corpus-scale half — ONE aggregation.** Pre-tokenization (the
  GPT-2 regex + reversible byte→unicode map, shared with bpe.py) runs
  as an Arrow-batched iterator pandas_udf — Python is unavoidable for
  the \\p-class regex + byte mapping, and this is a train-time map in
  the same class as the model/codec UDFs, not a query hot path — then
  ONE JVM groupBy(word) with map-side partial aggregation. Only the
  surviving word-count table (capped by ``min_frequency`` +
  ``max_words``, NOT corpus size) reaches the driver; on web corpora
  the top ~1M word types carry ~all token mass.

* **driver half — the merge loop.** Incremental pair bookkeeping
  (pair→count and pair→occurrences maps, only re-scanning words a
  merge touched), the same strategy HF `tokenizers` uses — O(types ×
  word length) total, independent of corpus size. Determinism: ties on
  pair count break to the lexicographically smallest pair, and word
  selection ties break on the word string, so the trained tokenizer is
  identical across runs, partitionings, and cluster sizes.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from wimbd_spark.functions.bpe import _PRETOK, _bytes_to_unicode


def _pretokenize_words() -> "pandas_udf":
    b2u = _bytes_to_unicode()

    @pandas_udf("array<string>")
    def _words(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        def one(t):
            if t is None:
                return []
            return [
                "".join(b2u[b] for b in w.encode("utf-8"))
                for w in _PRETOK.findall(t)
            ]

        for s in it:
            yield s.map(one)

    return _words


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    min_frequency: int = 2,
    max_words: int | None = 1_000_000,
) -> DataFrame:
    """(word, count) in byte→unicode space, GPT-2 pre-tokenization;
    words below ``min_frequency`` dropped, optionally capped to the
    ``max_words`` most frequent (ties → lexicographically smaller
    word). The cap compiles to TakeOrderedAndProject — no full sort."""
    w = (
        df.select(
            F.explode(_pretokenize_words()(F.col(text_col))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") >= min_frequency)
    )
    if max_words is not None:
        w = w.orderBy(F.col("count").desc(), F.col("word").asc()).limit(
            max_words
        )
    return w


def _merge_word(
    syms: tuple[str, ...], a: str, b: str
) -> tuple[str, ...]:
    """Left-to-right merge of every non-overlapping (a, b) occurrence."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    min_frequency: int = 2,
    max_words: int | None = 1_000_000,
) -> tuple[dict[tuple[str, str], int], dict[str, int]]:
    """Learn a byte-level BPE tokenizer over ``df[text_col]``; returns
    (ranks, vocab) directly usable by ``bpe.make_encoder`` /
    ``bpe.bpe_tokenize``.

    The vocab is the base alphabet (sorted) + one token per merge, in
    merge order; merging stops when ``vocab_size`` is reached or no
    pair occurs ``min_frequency`` times.
    """
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    rows = word_counts(df, text_col, min_frequency, max_words).collect()
    words = [
        (tuple(r["word"]), int(r["count"]))
        for r in sorted(rows, key=lambda r: (-r["count"], r["word"]))
    ]

    alphabet = sorted({s for syms, _ in words for s in syms})
    vocab: dict[str, int] = {s: i for i, s in enumerate(alphabet)}
    ranks: dict[tuple[str, str], int] = {}
    if not words:
        return ranks, vocab

    # incremental pair bookkeeping
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    syms_by_word = [syms for syms, _ in words]
    counts = [c for _, c in words]
    for wi, syms in enumerate(syms_by_word):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + counts[wi]
            pair_words.setdefault(p, set()).add(wi)

    while len(vocab) < vocab_size and pair_counts:
        best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        if pair_counts[best] < min_frequency:
            break
        a, b = best
        for wi in sorted(pair_words.get(best, ())):
            old = syms_by_word[wi]
            new = _merge_word(old, a, b)
            if new == old:
                continue
            c = counts[wi]
            for p in zip(old, old[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                    pair_words.pop(p, None)
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)
            # stale word refs are tolerated: _merge_word no-ops when
            # the pair no longer occurs, and counts were already moved
            syms_by_word[wi] = new
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
        ranks[best] = len(ranks)
        vocab[a + b] = len(vocab)
    return ranks, vocab


def save_bpe_assets(
    path: str, ranks: dict[tuple[str, str], int], vocab: dict[str, int]
) -> None:
    """Write ``merges.txt`` + ``vocab.json`` (the standard asset pair;
    round-trips through ``bpe.load_bpe_assets`` and loads in HF
    tokenizers)."""
    os.makedirs(path, exist_ok=True)
    ordered = sorted(ranks.items(), key=lambda kv: kv[1])
    with open(
        os.path.join(path, "merges.txt"), "w", encoding="utf-8"
    ) as f:
        f.write("#version: 0.2\n")
        for (a, b), _ in ordered:
            f.write(f"{a} {b}\n")
    with open(
        os.path.join(path, "vocab.json"), "w", encoding="utf-8"
    ) as f:
        json.dump(vocab, f, ensure_ascii=False)
