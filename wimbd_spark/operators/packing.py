"""Sequence packing: assign documents to fixed-token-budget packs.

Beyond-reference training-data operator: LLM pretraining consumes
fixed-length sequences, so curated documents must be grouped into
"packs" whose token totals approach the sequence budget. The classic
greedy/FFD packers are sequential; the engine uses contiguous-fill
packing — documents ordered deterministically, a running token total,
pack id = floor((cumsum − doc_tokens) / budget), i.e. each document
joins the pack where its first token would land. Slightly less tight
than FFD (a doc can straddle a boundary and start a new pack) but:

- deterministic: order is (group, order_col) — reruns and engines agree
  (SQL-oracle-able, unlike heuristic packers);
- distributed: the cumulative sum is a window PARTITIONED by
  ``group_col`` (source/shard by default) — never an unpartitioned
  global window (the ship-everything-to-one-task scale killer). Packs
  are therefore per-group, which is what a sharded writer wants anyway.

At 100 TB: one shuffle on group_col; group cardinality should be ≥
cluster parallelism (shards, files, or a hash-bucket column — pass
``group_col=F.pmod(F.hash("doc_id"), lit(k))`` style column for
uniform groups when sources are few).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wimbd_spark.operators.textqc import token_count


def pack_documents(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    order_col: str | None = None,
    n_tokens: Column | None = None,
) -> DataFrame:
    """Assign each document a (group, pack_id) under a token budget →
    input columns + ``n_tokens``, ``pack_id``, ``pack_pos``.

    ``n_tokens`` defaults to the engine tokenizer's count, with NULL
    text counted as 0 tokens (the row keeps its pack slot; its text
    contributes nothing to packed_sequences); pass a precomputed
    column (e.g. BPE counts) to pack under a model's real budget.
    A document longer than the budget spans multiple pack
    boundaries but is assigned wholly to the pack where its first
    token lands (contiguous fill) — a trainer chunks any over-budget
    pack downstream. ``pack_pos`` is the document's 0-based position
    within its pack.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    # id_col tie-break + an explicit ROWS frame: the default window
    # frame is RANGE, which sums ALL peer rows of a tied order value
    # into each row's cumulative total — corrupting pack assignment
    # and making pack_pos nondeterministic whenever order_col ties
    # (e.g. ordering by a timestamp). The tie-break only references
    # id_col when the column exists, so order_col-only DataFrames
    # (no doc id) still work — but then order_col must be unique.
    order = []
    if order_col:
        order.append(F.col(order_col))
    if id_col in df.columns:
        order.append(F.col(id_col))
    if not order:
        raise ValueError(
            f"pack_documents needs an ordering: column {id_col!r} is "
            "absent and no order_col was given"
        )
    nt = n_tokens if n_tokens is not None else F.coalesce(
        token_count(F.col(text_col)), F.lit(0)
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("n_tokens", nt.cast("long"))
        .withColumn(
            "_cum", F.sum("n_tokens").over(w)
        )
        .withColumn(
            "pack_id",
            F.floor((F.col("_cum") - F.col("n_tokens")) / budget_tokens).cast(
                "long"
            ),
        )
    )
    wp = Window.partitionBy(group_col, "pack_id").orderBy(*order)
    return (
        out.withColumn(
            "pack_pos", (F.row_number().over(wp) - 1).cast("long")
        )
        .drop("_cum")
    )


def pack_stats(
    packed: DataFrame, group_col: str = "source"
) -> DataFrame:
    """Per-pack (group, pack_id, n_docs, total_tokens) — audit the
    packing efficiency (total_tokens / budget is the fill rate)."""
    return packed.groupBy(group_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def packed_sequences(
    packed: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    sep: str = "\n\n",
) -> DataFrame:
    """Materialize packs as training sequences: one row per
    (group, pack_id) with the member texts joined in pack_pos order →
    (group, pack_id, n_docs, n_tokens, text). This is the artifact a
    trainer actually reads; deterministic because the concatenation
    order is the packing order (collect_list is unordered, so members
    are gathered as (pack_pos, text) structs and array_sort puts them
    back in sequence — never rely on collect_list order)."""
    members = F.array_sort(
        F.collect_list(F.struct(F.col("pack_pos"), F.col(text_col)))
    )
    return packed.groupBy(group_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.array_join(
            F.transform(members, lambda m: m[text_col]), sep
        ).alias("text"),
    )
