"""Bounded-shuffle heavy-hitter top-k n-grams (two-pass recount).

Parity target (file:line relative to /root/reference):
- topk  src/cmd/topk.rs:106-343 — the reference bounds a single
  machine's memory with a counting-Bloom sketch whose counts are
  approximate ("count <= true count", src/cmd/topk.rs:318-326).

Spark-first design: the exact path (operators/topk.py) is a hash
aggregation whose SHUFFLE carries every distinct n-gram — exact and
fine up to ~1e9 distinct grams, but at 100 TB the distinct-gram count
(trillions) makes that shuffle the bottleneck. This module is the
scale path, the distributed analogue of the reference's per-worker
sketch + channel merge (src/cmd/topk.rs:244-287):

  pass 1  per-partition Misra-Gries summaries (``capacity`` counters,
          Arrow-batched ``mapInPandas`` — a bounded-memory heavy-hitter
          summary is not expressible with built-in aggregates) —
          NO shuffle; each partition emits <= capacity (ngram,
          lower-bound) rows;
  merge   groupBy(ngram).sum(lb) over <= partitions x capacity rows —
          a shuffle BOUNDED by the summary size, not the corpus — then
          TakeOrderedAndProject keeps the top ``candidate_factor * k``
          candidates by merged lower bound;
  pass 2  exact recount of ONLY the candidates: re-scan, broadcast
          hash semi-join on the tiny candidate set, exact count, exact
          top-k.  Returned counts are therefore EXACT; the only
          approximation is candidate RECALL.

Guarantees (standard Misra-Gries merge bounds):
- every per-partition summary undercounts any gram by at most
  N_p / capacity (N_p = grams in that partition), so the merged lower
  bound undercounts by at most N / capacity globally;
- hence the result equals the exact top-k whenever the true k-th
  count exceeds the (candidate_factor*k+1)-th merged bound by more
  than N / capacity — and is IDENTICAL to the exact operator
  (partition-layout independent) whenever ``capacity`` >= the
  per-partition distinct-gram count, because then no counter is ever
  evicted and candidates cover every gram.

Two scans of the input vs one: deliberate — at scale a columnar
re-scan of one projected column is far cheaper than shuffling every
distinct gram once (the exact path's cost).
"""

from __future__ import annotations

from itertools import chain, islice
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wimbd_spark.functions.text import ngram_strings, tokenize
from wimbd_spark.operators.topk import _ranked


def _misra_gries_partition(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """One Misra-Gries summary per partition over arrays of gram strings.

    Chunked compaction (ADVICE r7): grams are absorbed in chunks of
    ``capacity`` items with a compaction after each chunk, so the peak
    counter-table size is <= 2 * capacity (capacity survivors + one
    chunk's <= capacity new keys) REGARDLESS of Arrow batch size — the
    bounded-memory claim is a function of capacity alone. Each
    compaction subtracts the excess-th smallest value ``d`` from every
    counter and drops the non-positive ones — survivors number <=
    capacity, and each compaction removes >= capacity * d total mass,
    so the cumulative decrement (the undercount of any key) stays
    <= N_p / capacity however often compaction runs.
    """
    from collections import Counter

    import numpy as np

    counts: Counter = Counter()
    for pdf in batches:
        stream = chain.from_iterable(pdf["grams"])
        while True:
            chunk = list(islice(stream, capacity))
            if not chunk:
                break
            counts.update(chunk)
            excess = len(counts) - capacity
            if excess > 0:
                vals = np.fromiter(
                    counts.values(), dtype="int64", count=len(counts)
                )
                d = int(np.partition(vals, excess - 1)[excess - 1])
                counts = Counter(
                    {g: c - d for g, c in counts.items() if c > d}
                )
    if counts:
        yield pd.DataFrame(
            {"ngram": list(counts.keys()), "lb": list(counts.values())}
        )


def ngram_summary(
    df: DataFrame,
    n: int,
    capacity: int,
    text_col: str = "text",
) -> DataFrame:
    """Merged Misra-Gries summary → (ngram, lb) with lb a lower bound
    undercounting the true global frequency by at most N / capacity.

    The ONLY shuffle is over the per-partition summaries
    (<= partitions x capacity rows), never the raw gram stream.
    """
    grams = df.select(
        ngram_strings(tokenize(F.col(text_col)), n).alias("grams")
    )
    partials = grams.mapInPandas(
        lambda it: _misra_gries_partition(it, capacity),
        schema="ngram string, lb long",
    )
    return partials.groupBy("ngram").agg(F.sum("lb").alias("lb"))


def topk_ngrams_2pass(
    df: DataFrame,
    n: int,
    k: int,
    capacity: int = 100_000,
    candidate_factor: int = 10,
    text_col: str = "text",
    threshold: int | None = None,
) -> DataFrame:
    """Heavy-hitter top-k n-grams → (ngram, count, rank), counts EXACT.

    Candidate generation via :func:`ngram_summary`, exact recount via a
    broadcast semi-join (candidates <= candidate_factor * k rows — the
    broadcast is bounded by construction, independent of corpus size).
    Same ordering/tie-break as the exact operator: (count desc, ngram
    asc) — with ``capacity`` >= per-partition distinct grams the output
    is bit-identical to ``topk_ngrams`` at any partition layout.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if capacity < k:
        raise ValueError(
            f"capacity ({capacity}) must be >= k ({k}) or candidates "
            "cannot cover the answer"
        )
    summary = ngram_summary(df, n, capacity, text_col=text_col)
    cand_k = max(candidate_factor * k, k)
    candidates = (
        summary.orderBy(F.col("lb").desc(), F.col("ngram").asc())
        .limit(cand_k)
        .select("ngram")
    )
    grams = df.select(
        F.explode(ngram_strings(tokenize(F.col(text_col)), n)).alias("ngram")
    )
    exact = (
        grams.join(F.broadcast(candidates), "ngram")
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if threshold is not None:
        # same count-floor semantics as the exact operator
        # (src/cmd/topk.rs:226-235) — applied to the EXACT recounts
        exact = exact.filter(F.col("count") >= threshold)
    return _ranked(exact, k, ascending=False)


def _misra_gries_partition_by(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """Per-(partition, group) Misra-Gries summaries over (g, grams)
    rows — one ``capacity``-counter table per group value seen in the
    partition, same chunked-compaction bound as the global pass (peak
    <= 2 * capacity counters PER GROUP; the grouped operator documents
    the groups × capacity memory envelope)."""
    from collections import Counter

    import numpy as np

    tables: dict = {}
    for pdf in batches:
        for g, grams in zip(pdf["g"], pdf["grams"]):
            counts = tables.get(g)
            if counts is None:
                counts = tables[g] = Counter()
            stream = iter(grams)
            while True:
                chunk = list(islice(stream, capacity))
                if not chunk:
                    break
                counts.update(chunk)
                excess = len(counts) - capacity
                if excess > 0:
                    vals = np.fromiter(
                        counts.values(), dtype="int64", count=len(counts)
                    )
                    d = int(np.partition(vals, excess - 1)[excess - 1])
                    counts = Counter(
                        {k: c - d for k, c in counts.items() if c > d}
                    )
                    tables[g] = counts
    for g, counts in tables.items():
        if counts:
            yield pd.DataFrame(
                {
                    "g": g,
                    "ngram": list(counts.keys()),
                    "lb": list(counts.values()),
                }
            )


def topk_ngrams_2pass_by(
    df: DataFrame,
    n: int,
    k: int,
    by: str = "source",
    capacity: int = 100_000,
    candidate_factor: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Grouped heavy-hitter top-k n-grams → (by, ngram, count, rank),
    counts EXACT — the bounded-shuffle twin of `topk.topk_ngrams_by`
    exactly as `topk_ngrams_2pass` is the twin of `topk.topk_ngrams`:
    run "wimbd topk once per dataset" in one job WITHOUT shuffling the
    per-group distinct-gram stream.

    Plan: pass 1 keeps one Misra-Gries table per (partition, group)
    (memory envelope: groups × 2 × capacity counters per partition —
    ``by`` is a LOW-CARDINALITY partition key like source/lang by
    contract); the merge shuffle carries <= partitions × groups ×
    capacity summary rows; per-group candidates come from a rank
    window over that bounded summary (<= candidate_factor * k each);
    pass 2 recounts ONLY candidates via a broadcast (by, ngram)
    semi-join. Same exactness condition as the global operator:
    capacity >= per-(partition, group) distinct grams ⇒ bit-identical
    to the exact grouped operator at any partition layout.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if capacity < k:
        raise ValueError(
            f"capacity ({capacity}) must be >= k ({k}) or candidates "
            "cannot cover the answer"
        )
    from pyspark.sql import Window

    grams_arr = df.select(
        F.col(by).alias("g"),
        ngram_strings(tokenize(F.col(text_col)), n).alias("grams"),
    )
    partials = grams_arr.mapInPandas(
        lambda it: _misra_gries_partition_by(it, capacity),
        schema=f"g {df.schema[by].dataType.simpleString()}, "
        "ngram string, lb long",
    )
    summary = partials.groupBy("g", "ngram").agg(F.sum("lb").alias("lb"))
    cand_k = max(candidate_factor * k, k)
    wc = Window.partitionBy("g").orderBy(
        F.col("lb").desc(), F.col("ngram").asc()
    )
    candidates = (
        summary.withColumn("_r", F.row_number().over(wc))
        .filter(F.col("_r") <= cand_k)
        .select("g", "ngram")
    )
    grams = df.select(
        F.col(by).alias("g"),
        F.explode(ngram_strings(tokenize(F.col(text_col)), n)).alias(
            "ngram"
        ),
    )
    exact = (
        grams.join(F.broadcast(candidates), ["g", "ngram"])
        .groupBy("g", "ngram")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    w = Window.partitionBy("g").orderBy(
        F.col("count").desc(), F.col("ngram").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumnRenamed("g", by)
    )
