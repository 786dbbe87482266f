"""Streaming twins of the dedup family: dedupe-on-ingest and
decontaminate-on-ingest for document streams.

The reference runs dedup/decontamination as batch jobs over finished
corpora (wimbd/es/decontamination.py); a training-data pipeline at
100 TB wants the same semantics applied while data ARRIVES. These reuse
the exact expressions of operators.dedup (doc_hash = md5 of text), so a
batch backfill and the streaming path agree row-for-row.

State/scale notes:
- exact dedup keys state on the 32-hex md5 — one state row per distinct
  document ever seen; with an event-time column + watermark,
  `dropDuplicatesWithinWatermark` bounds that state to the watermark
  horizon (the right call when duplicates cluster in time, e.g. crawl
  re-fetches).
- decontamination is a stream-static broadcast anti-join: the eval-set
  hash list broadcasts once per micro-batch plan, the stream never
  shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from wimbd_spark.functions.text import doc_hash

DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
    ]
)


def read_doc_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "json",
    schema: StructType = DOC_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source document stream (each new file = one micro-batch of
    crawled/ingested docs)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def streaming_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-arriving copy of each distinct text.

    Without ``ts_col`` the dedup state grows with distinct documents
    (exact global dedup — fine when the distinct count fits the state
    store, e.g. hash-only rows). With ``ts_col``, state is bounded to
    the watermark horizon via dropDuplicatesWithinWatermark.
    """
    out = docs.withColumn("hash", doc_hash(F.col(text_col)))
    if ts_col is not None:
        return out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["hash"]
        )
    return out.dropDuplicates(["hash"])


def streaming_decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    eval_text_col: str = "text",
) -> DataFrame:
    """Drop stream docs whose exact text appears in a STATIC eval set
    (stream-static left-anti join on md5, eval side broadcast)."""
    bl = F.broadcast(
        eval_df.select(doc_hash(F.col(eval_text_col)).alias("hash")).distinct()
    )
    return (
        docs.withColumn("hash", doc_hash(F.col(text_col)))
        .join(bl, "hash", "left_anti")
        .drop("hash")
    )


def reference_band_table(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Distinct LSH band hashes of a STATIC reference corpus →
    (band, bh) — the blocklist side of streaming_neardup_filter.
    Materialize it once (parquet) per reference snapshot; its size is
    ≤ bands × corpus rows and usually far less after distinct."""
    from wimbd_spark.operators.neardup import (
        _banded_buckets,
        minhash_signatures,
    )

    sigs = minhash_signatures(
        corpus, id_col, text_col, num_hashes, shingle_n
    )
    return (
        _banded_buckets(sigs, id_col, num_hashes, bands)
        .select("band", "bh")
        .distinct()
    )


def streaming_neardup_filter(
    docs: DataFrame,
    reference_bands: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """NEAR-dup gate on ingest: drop stream docs sharing ≥1 MinHash-LSH
    band with a static reference corpus (reference_band_table, built
    with the SAME num_hashes/bands/shingle_n — band hashes only align
    between identical configurations).

    The streaming twin of lsh_candidate_pairs' candidate test, with
    batch semantics: a doc is dropped exactly when the batch pipeline
    would have emitted a candidate pair against the reference. MinHash
    signatures and band hashes are pure per-row expressions (stateless,
    stream-safe), and the gate is ``bands`` stream-static LEFT joins on
    narrow band-hash keys with the broadcast reference — one join per
    band rather than an explode + per-doc aggregation, because
    streaming aggregation would drag in a state store; this stays
    STATELESS (no watermark) and composes before the stateful
    exact-dedup stage. Like any LSH test it is probabilistic: tune
    num_hashes/bands for the similarity-threshold curve, and audit the
    reference side's bucket skew with lsh_bucket_sizes before trusting
    a new corpus.
    """
    from wimbd_spark.functions.text import hash32
    from wimbd_spark.operators.neardup import minhash_signature

    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be a multiple of bands")
    rows_per_band = num_hashes // bands
    sigs = minhash_signature(F.col(text_col), num_hashes, shingle_n)
    cur = docs.select("*", *sigs)
    band_hash_cols = []
    for b in range(bands):
        bh = hash32(
            F.concat_ws(
                ":",
                *[
                    F.col(f"mh{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
        )
        band_hash_cols.append(bh.alias(f"_bh{b}"))
    cur = cur.select("*", *band_hash_cols)
    for b in range(bands):
        ref_b = F.broadcast(
            reference_bands.filter(F.col("band") == b)
            .select(F.col("bh").alias(f"_bh{b}"))
            .distinct()
            .withColumn(f"_hit{b}", F.lit(1))
        )
        cur = cur.join(ref_b, f"_bh{b}", "left")
    no_hit = None
    for b in range(bands):
        c = F.col(f"_hit{b}").isNull()
        no_hit = c if no_hit is None else (no_hit & c)
    return cur.filter(no_hit).select(*docs.columns)


def streaming_quality_gate(
    docs: DataFrame,
    text_col: str = "text",
    **thresholds,
) -> DataFrame:
    """Gopher-gate-on-ingest: keep stream docs passing every quality
    rule (textqc.gopher_quality_filter semantics, identical
    expressions — a batch backfill agrees row-for-row). Surviving rows
    by definition fired no rule, so no reasons column is emitted —
    route the stream through gopher_quality_filter directly to inspect
    rejected documents' drop_reasons.

    The gate is a pure per-row projection (STATELESS — no watermark,
    no state store), so it composes freely before the stateful dedup/
    decontamination stages; run it first to keep junk out of the dedup
    state.
    """
    from wimbd_spark.operators.textqc import gopher_quality_filter

    return (
        gopher_quality_filter(
            docs, text_col=text_col, keep_reasons=False, **thresholds
        )
        .filter(F.col("keep"))
        .drop("keep")
    )
