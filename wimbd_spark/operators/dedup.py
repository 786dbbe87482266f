"""Exact dedup / decontamination / overlap — the hash-join family.

Parity targets (file:line relative to /root/reference, all under
wimbd/text_and_url_overlaps/ unless noted):
- J1 overlap        helper_scripts/merge_and_get_overlap.sh:3;
                    helper_scripts/run_combinations.py:17-45
- J2 decontaminate  decontaminate.py:10-22; deduplicate_by_hash.py:40-47
- J3 keep-first     deduplicate.py:10-22; deduplicate_by_hash.py:48-62
- J4 example lookup helper_scripts/get_examples.py:8-33
- A11 dup stats     helper_scripts/get_duplicate_counts.py:9-28

Spark-first notes:
- The reference's sorted-merge shell pipelines become sort-merge /
  broadcast joins picked by Catalyst+AQE; blocklists that fit in memory
  are broadcast explicitly.
- Keep-first in the reference depends on process scheduling order
  (deduplicate_by_hash.py:50-62 shared seen-array); we pin a
  deterministic order column instead (SURVEY.md §7.4(5)).
- Multi-dataset overlap: ONE groupBy(hash).collect_set(dataset) pass
  replaces the reference's powerset of pairwise merges
  (run_combinations.py) — O(N) instead of O(2^N) scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wimbd_spark.functions.text import doc_hash


def dedup_keep_first(
    df: DataFrame,
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Drop exact-duplicate texts, keeping the first occurrence in
    (order_cols) order. Deterministic replacement for the reference's
    scheduling-order "first" (deduplicate_by_hash.py:48-62).
    """
    w = Window.partitionBy(doc_hash(F.col(text_col))).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def mark_duplicates(
    df: DataFrame,
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("doc_id",),
    flag_col: str = "duplicate",
) -> DataFrame:
    """Attribute mode: keep every row, flag non-first duplicates.

    Parity: deduplicate_by_hash.py:22,46 emits `{id, source,
    contaminated}` attributes instead of dropping rows.
    """
    w = Window.partitionBy(doc_hash(F.col(text_col))).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    return df.withColumn(flag_col, F.row_number().over(w) > 1)


def decontaminate(
    train: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    blocklist_col: str | None = None,
    broadcast_blocklist: bool = True,
) -> DataFrame:
    """Remove every train doc whose md5(text) appears in the blocklist.

    ``blocklist`` is either a corpus (hash derived from its text_col)
    or a hash list (pass blocklist_col). Eval sets are small → default
    broadcast anti-join, no shuffle of the 100 TB side.

    Parity: decontaminate.py:10-22.
    """
    if blocklist_col is None:
        keys = blocklist.select(doc_hash(F.col(text_col)).alias("_h")).distinct()
    else:
        keys = blocklist.select(F.col(blocklist_col).alias("_h")).distinct()
    if broadcast_blocklist:
        keys = F.broadcast(keys)
    return train.join(
        keys, on=doc_hash(F.col(text_col)) == keys["_h"], how="left_anti"
    )


def overlap(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Distinct text-hash intersection of two corpora → (hash).

    Parity: merge_and_get_overlap.sh:3 (`sort -m | uniq -c | awk $1>1`
    over distinct hash lists) ≙ set intersection.
    """
    ha = a.select(doc_hash(F.col(text_col)).alias("hash"))
    hb = b.select(doc_hash(F.col(text_col)).alias("hash"))
    return ha.intersect(hb)


def multi_overlap(
    df: DataFrame,
    dataset_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """All-subsets overlap in ONE pass: for each text hash, the sorted
    set of datasets containing it → (hash, datasets, n_datasets).

    Downstream, any subset S's overlap size = count of rows whose
    `datasets` ⊇ S — replaces run_combinations.py:17-45's powerset of
    pairwise sort-merges.
    """
    return (
        df.select(
            doc_hash(F.col(text_col)).alias("hash"),
            F.col(dataset_col).alias("_ds"),
        )
        .groupBy("hash")
        .agg(F.sort_array(F.collect_set("_ds")).alias("datasets"))
        .withColumn("n_datasets", F.size("datasets"))
    )


def duplicate_stats(
    df: DataFrame,
    group_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Duplicate summary per dataset: duplicates (Σ count where
    count>1), uniq_duplicates, total, uniq_total.

    Parity: get_duplicate_counts.py:9-28.
    """
    keys = [group_col] if group_col else []
    counts = (
        df.select(*keys, doc_hash(F.col(text_col)).alias("_h"))
        .groupBy(*keys, "_h")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    gb = counts.groupBy(*keys) if keys else counts.groupBy()
    return gb.agg(
        F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0)).alias(
            "duplicates"
        ),
        F.count(F.when(F.col("_c") > 1, 1)).alias("uniq_duplicates"),
        F.sum("_c").alias("total"),
        F.count(F.lit(1)).alias("uniq_total"),
    )


def find_examples(
    df: DataFrame,
    wanted_hashes: DataFrame | list[str],
    k: int,
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """First k docs (in deterministic order) whose text hash is in the
    wanted set. Parity: get_examples.py:8-33.
    """
    if isinstance(wanted_hashes, list):
        spark = df.sparkSession
        wanted = spark.createDataFrame(
            [(h,) for h in wanted_hashes], ["_h"]
        )
    else:
        wanted = wanted_hashes.toDF("_h")
    return (
        df.join(
            F.broadcast(wanted.distinct()),
            on=doc_hash(F.col(text_col)) == F.col("_h"),
            how="left_semi",
        )
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .limit(k)
    )


def contamination_rate(
    eval_df: DataFrame,
    corpus: DataFrame,
    phrase_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Fraction of eval rows whose phrase appears (substring) in ≥1
    corpus doc → single row (contaminated, total, rate).

    Parity: wimbd/es/corpus_contamination.py:28-58 (per-row phrase
    count > 0, then mean). Eval side is small → broadcast it against
    the corpus scan, count distinct hit phrases, divide.
    """
    phrases = eval_df.select(F.col(phrase_col).alias("_p")).distinct()
    hits = (
        corpus.join(
            F.broadcast(phrases),
            on=F.col(text_col).contains(F.col("_p")),
            how="inner",
        )
        .select("_p")
        .distinct()
    )
    n_hit = hits.count()
    n_tot = phrases.count()
    spark = eval_df.sparkSession
    return spark.createDataFrame(
        [(n_hit, n_tot, float(n_hit) / n_tot if n_tot else 0.0)],
        ["contaminated", "total", "rate"],
    )
