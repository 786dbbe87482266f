"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Beyond-reference operators (the reference only does exact md5 dedup,
deduplicate_by_hash.py) — these are the standard near-dup stack for
training-data pipelines at corpus scale.

Design for 100 TB:
- Signatures are computed per-row as pure Column expressions over the
  document's own shingle array (array_min/transform/aggregate) — ZERO
  shuffle; the only shuffles are the LSH band groupBy (keyed on small
  band hashes) and the candidate-pair self-join (bounded by bucket
  sizes, the whole point of LSH).
- All hashes derive from md5 (hash32) so a DuckDB oracle reproduces
  signatures bit-for-bit.
- Jaccard verification joins the two shingle arrays only for CANDIDATE
  pairs (post-LSH), never all-pairs.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf type-hint resolution

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wimbd_spark.functions.text import hash32, ngram_strings, tokenize


def shingle_set(text: Column | str, n: int = 3) -> Column:
    """Sorted distinct token n-gram strings of a document."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_sort(F.array_distinct(ngram_strings(tokenize(c), n)))


def shingle_hashes(text: Column | str, n: int = 3) -> Column:
    """Sorted distinct hash32 values of a document's shingles.

    The near-dup pipeline runs on these instead of shingle strings:
    one md5 per shingle here, then every downstream op (minhash
    permutations, band hashes, Jaccard intersections) is integer
    arithmetic. Hash collisions would fold two shingles — at 32 bits
    and ≤10^4 shingles/doc the per-doc collision odds are ~1e-2 of a
    single shingle pair, shifting Jaccard by <1/|set|; both engines
    fold identically so oracles still match exactly.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.array_sort(
        F.array_distinct(
            F.transform(ngram_strings(tokenize(c), n), lambda s: hash32(s))
        )
    )


# Universal-hash MinHash family over a prime > 2^32. Base hash is one
# md5-derived hash32 per shingle; permutations are integer arithmetic
# (a_j·h + b_j) mod P — coefficients < 2^20 keep products < 2^52 (exact
# in BIGINT on both engines). One md5 per shingle instead of one per
# (shingle × hash) — ~num_hashes× cheaper.
MINHASH_P = 4_294_967_311


def minhash_coeffs(j: int) -> tuple[int, int]:
    return 2 * j + 1, (j * 7919 + 13) % 1_048_576


def _minhash_from_hashes(hashes: Column, num_hashes: int) -> list[Column]:
    def _perm(j):
        a, b = minhash_coeffs(j)
        # single-arg lambda only: F.transform treats 2-arg lambdas as
        # (element, index) — bind coefficients via closure.
        return lambda h: (h * a + b) % MINHASH_P

    return [
        F.array_min(F.transform(hashes, _perm(j))).alias(f"mh{j}")
        for j in range(num_hashes)
    ]


def minhash_signature(
    text: Column | str, num_hashes: int = 8, shingle_n: int = 3
) -> list[Column]:
    """MinHash signature as ``num_hashes`` BIGINT columns mh0..mhK.

    mh_j(doc) = min over shingles s of (a_j·hash32(s) + b_j) mod P.
    NULL when the doc has no shingles. Reproducible in SQL.
    """
    return _minhash_from_hashes(shingle_hashes(text, shingle_n), num_hashes)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, mh0..mhK) per document — one narrow projection, no shuffle."""
    return df.select(
        F.col(id_col), *minhash_signature(F.col(text_col), num_hashes, shingle_n)
    ).filter(F.col("mh0").isNotNull())


#: Per-process memo of gram string → hash32 for the Arrow shingle
#: engine — same rationale as _SIMHASH_HASH_CACHE (md5 is pure, worker
#: processes are reused, vocabulary is Zipfian). No salt dimension:
#: shingle hashes are unsalted hash32, so the gram string alone keys.
_SHINGLE_HASH_CACHE: dict = {}
_SHINGLE_HASH_CACHE_MAX = 1 << 20


def _shingle_table_arrow(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """(id, hs) built map-side in one mapInArrow stage — ZERO shuffle.

    The expression/explode forms trade differently: per-row HOF md5 is
    interpreted (measured 3.4× slower than codegen), and the explode
    form gets codegen'd md5 back only by paying a corpus-wide
    (id, hash) shuffle + collect_set. Hashing the grams in Python
    (memoized per process — one md5 per vocabulary gram, not per
    occurrence) removes both: each document's sorted distinct hash set
    is built in-process (np.unique) and the stage stays map-only.
    Values are identical by construction: same whitespace tokenize,
    same " "-joined gram strings (the simhash Arrow engine's
    parity-pinned recipe), same md5-prefix hash32.
    """
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    src = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("__t")
    )
    id_field = src.schema.fields[0]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("hs", ArrayType(LongType(), False), False),
        ]
    )
    n = int(shingle_n)

    def gen(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        cache = _SHINGLE_HASH_CACHE

        def h32(g: str) -> int:
            v = cache.get(g)
            if v is None:
                if len(cache) >= _SHINGLE_HASH_CACHE_MAX:
                    cache.clear()
                v = int.from_bytes(
                    hashlib.md5(g.encode()).digest()[:4], "big"
                )
                cache[g] = v
            return v

        for batch in batches:
            ids = batch.column(0)
            tl = batch.column(1).to_pylist()
            take_idx: list = []
            sets: list = []
            lens: list = []
            for i, arr in enumerate(tl):
                if arr is None:
                    continue
                toks = [t for t in arr if t != ""]
                if len(toks) < n:
                    continue
                if n == 1:
                    uniq = set(toks)
                else:
                    uniq = {
                        " ".join(toks[j : j + n])
                        for j in range(len(toks) - n + 1)
                    }
                hs = np.unique(
                    np.fromiter(
                        (h32(g) for g in uniq), dtype=np.int64,
                        count=len(uniq),
                    )
                )
                take_idx.append(i)
                sets.append(hs)
                lens.append(hs.size)
            if not take_idx:
                continue
            offsets = np.zeros(len(lens) + 1, dtype=np.int32)
            np.cumsum(lens, out=offsets[1:])
            values = (
                np.concatenate(sets)
                if sets
                else np.empty(0, dtype=np.int64)
            )
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(pa.array(take_idx, type=pa.int64())),
                    pa.ListArray.from_arrays(
                        pa.array(offsets, type=pa.int32()),
                        pa.array(values, type=pa.int64()),
                    ),
                ],
                names=[id_col, "hs"],
            )

    return src.mapInArrow(gen, out_schema)


def _shingle_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    engine: str = "auto",
) -> DataFrame:
    """(id, hs: sorted distinct shingle hashes).

    ``engine="arrow"`` builds each document's hash set map-side in
    one mapInArrow stage — no shuffle at all (see
    _shingle_table_arrow). ``engine="expr"`` keeps the classic
    explode → codegen'd hash32 → collect_set plan: one shuffle of
    (id, hash64) pairs, which leaves the table hash-partitioned on id
    (useful when a downstream join keys on id and the corpus dwarfs
    executor Python throughput). ``"auto"`` (default) picks by input
    size (session.resolve_text_engine): the Arrow stage's fixed
    Python cost loses on tiny corpora (measured +0.7 s/query at
    sf0.1) and the removed corpus-token exchange is what matters at
    scale. Identical rows any engine (parity-pinned). For a
    pure-expression signature-only pass use `minhash_signatures`
    (per-row expression).
    """
    from wimbd_spark.session import resolve_text_engine

    engine = resolve_text_engine(df, engine)
    if engine == "arrow":
        return _shingle_table_arrow(df, id_col, text_col, shingle_n)
    toks = tokenize(F.col(text_col))
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(ngram_strings(toks, shingle_n))
            ).alias("_g"),
        )
        .select(F.col(id_col), hash32(F.col("_g")).alias("_h"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("_h")).alias("hs"))
    )


#: Default LSH bucket cap. A bucket of n members emits C(n, 2) candidate
#: pairs, so an uncapped degenerate bucket (boilerplate text hashing
#: identically across millions of docs at corpus scale) is quadratic
#: work concentrated on one key. 1000 members → ≤499,500 pairs per
#: bucket, streamed out of a bounded explode — safe, and far above any
#: genuine near-dup cluster a curation run wants enumerated pair-wise.
DEFAULT_MAX_BUCKET_SIZE = 1000

#: Recommended ``max_shingle_freq`` for ngram_jaccard_pairs at corpus
#: scale. A shingle present in F documents contributes C(F, 2)
#: candidate pairs; boilerplate (license headers, navigation chrome)
#: routinely reaches millions of documents, which is quadratic
#: candidate blowup carrying zero near-dup signal — any pair whose
#: EVERY shared shingle is that common is boilerplate overlap, not
#: duplication. 256 caps any single shingle's contribution at ~32k
#: candidate pairs while leaving genuine template clusters (usually
#: ≪100 docs) untouched. Applying it restricts the Jaccard to the
#: sub-boilerplate shingle space — a semantic choice, so the "auto"
#: default engages it only when the df-sketch says the uncapped join
#: would explode (and says so loudly); pass an explicit None to force
#: exact semantics regardless.
RECOMMENDED_MAX_SHINGLE_FREQ = 256

#: "auto" mode caps the inverted-index join when the estimated
#: candidate volume Σ_h df_h·(df_h−1)/2 (the number of join rows the
#: self-join on shingle hashes produces) exceeds this. 25M rows is
#: ~seconds of join work on a small cluster — comfortably above any
#: healthy corpus at test scale, far below the quadratic blowups the
#: skew fixture measures (500× candidate inflation from 300
#: boilerplate docs). SCALE.md finding 1 records a 13.9× runtime
#: hit from one shared-shingle pathology; this is the guard for it.
AUTO_CANDIDATE_LIMIT = 25_000_000

#: Deterministic doc-sample fraction for the auto sketch. Sampling
#: docs at rate p scales each shingle's df by ~p, so the sampled
#: Σ df·(df−1)/2 is ~p² of the true volume — dividing by p² gives an
#: asymptotically unbiased estimate whose error concentrates on the
#: LARGE-df shingles that dominate the sum (a shingle in 1k of 1M
#: docs still lands ~250 sampled copies at p=0.25), exactly the ones
#: the guard exists to catch. Rare df=2 shingles are under-sampled
#: but contribute one candidate pair each — noise, not blowup. This
#: keeps the sketch at ~p of a full shingle pass (measured: the
#: full-table sketch cost ~40% of the query at sf0.1; sampled ~10%).
AUTO_SKETCH_SAMPLE = 0.25


def lsh_bucket_sizes(
    sigs: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(band, bh, size) per LSH bucket — skew diagnostics.

    Run this (e.g. ``.orderBy(F.desc("size")).show()``) to see how many
    buckets a given ``max_bucket_size`` would drop before committing to
    a pair enumeration over a new corpus.
    """
    return _banded_buckets(sigs, id_col, num_hashes, bands).groupBy(
        "band", "bh"
    ).agg(F.count(F.lit(1)).alias("size"))


def _banded_buckets(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    with_vector: bool = False,
) -> DataFrame:
    """(id, band, bh[, _bhs]) — one row per (doc, band). With
    ``with_vector`` each row also carries the doc's FULL band-hash
    vector (bands × 8 B), which lets the pair enumeration emit each
    pair only from its first agreeing band instead of paying a
    distinct() exchange over the whole pair set."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be a multiple of bands")
    rows_per_band = num_hashes // bands

    def band_hash(b: int):
        parts = [
            F.col(f"mh{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        return hash32(F.concat_ws(":", *parts))

    vec = F.array(*[band_hash(b) for b in range(bands)])
    out = sigs.select(F.col(id_col), vec.alias("_bhs")).select(
        F.col(id_col),
        "_bhs",
        F.posexplode("_bhs").alias("band", "bh"),
    )
    cols = [id_col, "band", "bh"] + (["_bhs"] if with_vector else [])
    return out.select(*cols)


def _pairs_from_sigs(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    # Uncapped: each member row carries its full band-hash vector
    # (bands × 8 B) so a pair found in several bands is emitted ONLY
    # from its first agreeing band — a map-side filter after the pair
    # explode instead of a distinct() exchange over the whole pair set
    # (the first-agreeing-combination trick simhash_pairs uses; bands
    # ≤ num_hashes, so the WHEN chain is a few comparisons per
    # candidate). With a bucket cap this filter would be WRONG: a
    # pair's first agreeing band can be a bucket the cap dropped while
    # a later band kept the pair — survival of another band's bucket
    # is not knowable map-side, so the capped branch keeps distinct().
    dedup_mapside = max_bucket_size is None
    buckets = _banded_buckets(
        sigs, id_col, num_hashes, bands, with_vector=dedup_mapside
    )
    # ONE exchange on (band, bh): count → filter → gather → pair-explode
    # all share the same hash partitioning. Dropping degenerate buckets
    # BEFORE collect_set bounds the agg buffer at max_bucket_size ids —
    # an over-cap bucket never materializes anywhere, not even as an
    # array. Dropped buckets are boilerplate, not near-dup signal;
    # members usually still pair via their other bands (use
    # lsh_bucket_sizes to audit). Pass max_bucket_size=None to disable.
    if max_bucket_size is not None:
        from pyspark.sql.window import Window

        buckets = (
            buckets.withColumn(
                "_sz",
                F.count(F.lit(1)).over(Window.partitionBy("band", "bh")),
            )
            .filter(F.col("_sz") <= max_bucket_size)
            .drop("_sz")
        )
    if not dedup_mapside:
        grouped = (
            buckets.groupBy("band", "bh")
            .agg(F.array_sort(F.collect_set(F.col(id_col))).alias("_ids"))
            .filter(F.size("_ids") >= 2)
        )
        # Two-step explode bounds per-row memory at O(bucket), not
        # O(bucket²): posexplode hands each member its own row, then a
        # second explode streams that member's partners from the array
        # tail — no row ever holds the full C(n, 2) pair list.
        member = grouped.select(
            "_ids", F.posexplode("_ids").alias("_i", "id_a")
        )
        return (
            member.select(
                "id_a",
                F.explode(
                    F.slice(
                        F.col("_ids"),
                        F.col("_i") + F.lit(2),
                        F.size("_ids"),
                    )
                ).alias("id_b"),
            )
            .distinct()
        )
    grouped = (
        buckets.groupBy("band", "bh")
        .agg(
            F.array_sort(
                F.collect_set(
                    F.struct(F.col(id_col).alias("id"), F.col("_bhs"))
                )
            ).alias("_ms")
        )
        .filter(F.size("_ms") >= 2)
    )
    member = grouped.select(
        "band", "_ms", F.posexplode("_ms").alias("_i", "_a")
    )
    paired = member.select(
        "band",
        F.col("_a.id").alias("id_a"),
        F.col("_a._bhs").alias("_ba"),
        F.explode(
            F.slice(F.col("_ms"), F.col("_i") + F.lit(2), F.size("_ms"))
        ).alias("_b"),
    )
    first_band = None
    for j in range(bands):
        agree = F.element_at(F.col("_ba"), j + 1) == F.element_at(
            F.col("_b._bhs"), j + 1
        )
        first_band = (
            F.when(agree, F.lit(j))
            if first_band is None
            else first_band.when(agree, F.lit(j))
        )
    return paired.filter(F.col("band") == first_band).select(
        "id_a", F.col("_b.id").alias("id_b")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band.

    Band hash = hash32 of ':'-joined minhashes in the band. Docs are
    exploded to (band_idx, band_hash) rows — `bands` rows per doc —
    then paired within buckets. Bucket-size skew is the classic LSH
    risk; `bands`/`rows` tune the candidate volume, and
    ``max_bucket_size`` (finite by default) hard-caps degenerate
    buckets before they are ever gathered (see _pairs_from_sigs;
    audit with lsh_bucket_sizes; None disables).
    """
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    return _pairs_from_sigs(sigs, id_col, num_hashes, bands, max_bucket_size)


def _jaccard_from_shingle_table(
    sh: DataFrame, pairs: DataFrame, threshold: float
) -> DataFrame:
    out = (
        pairs.join(
            sh.select(F.col(sh.columns[0]).alias("id_a"), F.col("hs").alias("hs_a")),
            "id_a",
        )
        .join(
            sh.select(F.col(sh.columns[0]).alias("id_b"), F.col("hs").alias("hs_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("hs_a", "hs_b"))
                / F.size(F.array_union("hs_a", "hs_b"))
            ).alias("jaccard"),
        )
    )
    if threshold > 0.0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact shingle-set Jaccard for given (id_a, id_b) pairs →
    (id_a, id_b, jaccard). Operates on hashed shingle sets (see
    shingle_hashes) and joins them only for the candidate pairs."""
    sh = _shingle_table(df, id_col, text_col, shingle_n)
    return _jaccard_from_shingle_table(sh, pairs, threshold)


def estimate_candidate_volume(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> int:
    """Estimated inverted-index self-join candidate volume
    Σ_h df_h·(df_h−1)/2 for this corpus's ``shingle_n``-gram space,
    from a deterministic AUTO_SKETCH_SAMPLE doc sample taken STRAIGHT
    off the corpus (the sample filter runs before tokenization, so the
    sketch scans ~p of the text and never pays the shingle table's
    per-doc shuffle — it is one map-side shingle projection + a
    vocab-sized groupBy(hash) count with map-side combine). The p²
    scaling is unbiased for the large-df shingles that dominate the
    sum (see AUTO_SKETCH_SAMPLE).

    PUBLIC so pipelines that call ``ngram_jaccard_pairs`` repeatedly
    on the same corpus (threshold sweeps, per-shard passes) can pay
    the sketch ONCE and pass the result via ``candidate_estimate=``
    instead of re-sketching per call (VERDICT r6 item 7)."""
    p = AUTO_SKETCH_SAMPLE
    denom = max(round(1.0 / p), 1)
    toks = tokenize(F.col(text_col))
    est = (
        df.filter(
            F.pmod(
                F.xxhash64(F.col(id_col).cast("string")), F.lit(denom)
            )
            == 0
        )
        .select(
            F.explode(
                F.array_distinct(ngram_strings(toks, shingle_n))
            ).alias("_g")
        )
        .select(hash32(F.col("_g")).alias("_h"))
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .agg(
            F.sum(
                F.col("_df").cast("long")
                * (F.col("_df").cast("long") - 1)
                / 2
            ).alias("_cand")
        )
        .collect()[0]["_cand"]
    )
    return 0 if est is None else int(est * denom * denom)


def _cap_from_estimate(est: int, stacklevel: int = 3) -> int | None:
    """Policy half of the auto guard: below AUTO_CANDIDATE_LIMIT run
    uncapped (exact semantics over the full shingle space); above it,
    warn loudly — surfacing the estimate so the caller can judge —
    and return RECOMMENDED_MAX_SHINGLE_FREQ. ``stacklevel`` points the
    warning at the USER'S call site: 3 when reached directly from
    ngram_jaccard_pairs (caller → njp → here), 4 via _auto_shingle_cap
    (one frame deeper)."""
    import warnings

    if est <= AUTO_CANDIDATE_LIMIT:
        return None
    warnings.warn(
        f"ngram_jaccard_pairs: estimated candidate volume "
        f"{int(est):,} join rows exceeds AUTO_CANDIDATE_LIMIT "
        f"({AUTO_CANDIDATE_LIMIT:,}) — ubiquitous shingles "
        f"(boilerplate) would blow up the inverted-index self-join "
        f"quadratically. Applying "
        f"max_shingle_freq={RECOMMENDED_MAX_SHINGLE_FREQ} (Jaccard "
        f"restricted to sub-boilerplate shingles). Pass "
        f"max_shingle_freq=None to force the uncapped exact join, or "
        f"an explicit int to choose the cap.",
        RuntimeWarning,
        stacklevel=stacklevel,
    )
    return RECOMMENDED_MAX_SHINGLE_FREQ


def _auto_shingle_cap(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> int | None:
    """Sketch + policy in one step (the no-precomputed-estimate path)."""
    return _cap_from_estimate(
        estimate_candidate_volume(df, id_col, text_col, shingle_n),
        stacklevel=4,
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.2,
    max_shingle_freq: int | None | str = "auto",
    prefix_filter: bool | None = None,
    candidate_estimate: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs, self-contained: every pair
    with shingle-set Jaccard ≥ ``threshold`` → (id_a, id_b, jaccard).

    Candidates come from an inverted-index self-join on shingle hashes
    (pairs sharing ≥1 shingle) — complete recall for any threshold > 0,
    no minhash approximation, no all-pairs cross join. Scale shape: one
    shuffle of (id, shingle-hash) pairs keyed on the hash; ubiquitous
    shingles ("of the X") create quadratic bucket blowup, so
    ``max_shingle_freq`` drops shingles appearing in more than that
    many docs before the join — a pair is then missed ONLY if every
    shared shingle is that common, which at sane thresholds means
    boilerplate, not duplication (same tradeoff as the LSH bucket cap
    in _pairs_from_sigs).

    ``max_shingle_freq`` default ``"auto"`` disarms the quadratic
    hazard (r5 VERDICT item 4) without silently changing semantics:
    a deterministic AUTO_SKETCH_SAMPLE doc sample estimates the
    candidate volume Σ_h df_h·(df_h−1)/2 the uncapped join would
    produce (unbiased for the boilerplate shingles that dominate —
    see AUTO_SKETCH_SAMPLE); below AUTO_CANDIDATE_LIMIT the join runs
    uncapped (exact Jaccard over the full shingle space —
    bit-identical to the old default on healthy corpora), above it a
    loud RuntimeWarning fires and RECOMMENDED_MAX_SHINGLE_FREQ
    engages. Pass ``None`` to force the uncapped join regardless (the
    old default), or an int to cap unconditionally. The sketch costs
    one groupBy(hash) count over ~¼ of the corpus — map-side
    combined, vocab-sized shuffle, small next to the join it sizes.
    Pipelines that call this repeatedly on the SAME corpus should
    sketch once with :func:`estimate_candidate_volume` and pass the
    result as ``candidate_estimate=`` — the auto guard then applies
    its policy (same warning, same cap) with zero extra jobs;
    ``candidate_estimate`` is ignored unless
    ``max_shingle_freq="auto"``.

    ``prefix_filter`` enables the AllPairs/PPJoin prefix optimization
    (exact, complete recall — a classic set-similarity-join result):
    a pair with Jaccard ≥ τ must share a shingle in each side's first
    |x| − ⌈τ|x|⌉ + 1 sorted shingles, so the candidate self-join
    explodes only that prefix (join volume shrinks ~(1−τ)² plus a
    size-ratio cut) and exact Jaccard verifies just the candidates.
    Default OFF (None/False): the sf1 rehearsal measured the prefix
    path 4-5× SLOWER on this workload (τ=0.5: 11.1 s vs 2.5 s plain at
    sf1) — the candidate cut didn't pay for the extra shingle-set
    verification joins, which ship array columns the counting path
    never shuffles. Opt in (True) only for workloads where the
    inverted-index join volume Σ df² actually explodes — boilerplate-
    heavy corpora without a ``max_shingle_freq`` cap, or very high
    thresholds (τ ≥ 0.8, prefix ≈ 0.2·|x|) — and MEASURE; both paths
    return identical rows (equivalence-tested).
    """
    sh = _shingle_table(df, id_col, text_col, shingle_n)
    if prefix_filter is None:
        prefix_filter = False
    if prefix_filter:
        if max_shingle_freq not in (None, "auto"):
            raise ValueError(
                "prefix_filter composes with the full shingle space; "
                "use max_shingle_freq with prefix_filter=False"
            )
        max_shingle_freq = None
    elif max_shingle_freq == "auto":
        if candidate_estimate is not None:
            max_shingle_freq = _cap_from_estimate(candidate_estimate)
        else:
            max_shingle_freq = _auto_shingle_cap(
                df, id_col, text_col, shingle_n
            )
    elif isinstance(max_shingle_freq, str):
        raise ValueError(
            f"max_shingle_freq must be an int, None, or 'auto'; "
            f"got {max_shingle_freq!r}"
        )
    if prefix_filter:
        if threshold <= 0:
            raise ValueError("prefix_filter requires threshold > 0")
        from pyspark import StorageLevel

        from wimbd_spark.session import scoped_persist

        # sh feeds candidate generation AND both verification sides
        sh = scoped_persist(sh, StorageLevel.MEMORY_AND_DISK)
        # ⌈τn⌉ with a downward epsilon so float error can only LENGTHEN
        # the prefix (shortening it would break complete recall)
        pref = sh.select(
            F.col(id_col).alias("_id"),
            F.size("hs").alias("_n"),
            F.posexplode("hs").alias("_pos", "_h"),
        ).filter(
            F.col("_pos")
            < F.col("_n")
            - F.ceil(F.lit(threshold) * F.col("_n") - F.lit(1e-9))
            + 1
        )
        a = pref.select(
            F.col("_id").alias("id_a"), F.col("_n").alias("_na"), "_h"
        )
        b = pref.select(
            F.col("_id").alias("id_b"), F.col("_n").alias("_nb"), "_h"
        )
        # size-ratio filter: J ≥ τ forces τ·|B| ≤ |A| ≤ |B|/τ
        # (epsilon keeps boundary-ratio pairs in)
        cand = (
            a.join(b, "_h")
            .filter(
                (F.col("id_a") < F.col("id_b"))
                & (F.col("_nb") * threshold <= F.col("_na") + F.lit(1e-9))
                & (F.col("_na") * threshold <= F.col("_nb") + F.lit(1e-9))
            )
            .select("id_a", "id_b")
            .distinct()
        )
        return _jaccard_from_shingle_table(sh, cand, threshold)
    ex = sh.select(
        F.col(id_col).alias("_id"),
        F.size("hs").alias("_n"),
        F.explode("hs").alias("_h"),
    )
    if max_shingle_freq is not None:
        # drop ubiquitous shingles, then recompute sizes over the
        # surviving shingle space so intersection and union measure the
        # same sets (Jaccard restricted to sub-boilerplate shingles)
        from pyspark.sql.window import Window

        ex = (
            ex.drop("_n")
            .withColumn(
                "_f", F.count(F.lit(1)).over(Window.partitionBy("_h"))
            )
            .filter(F.col("_f") <= max_shingle_freq)
            .withColumn(
                "_n", F.count(F.lit(1)).over(Window.partitionBy("_id"))
            )
            .drop("_f")
        )
    a = ex.select(
        F.col("_id").alias("id_a"), F.col("_n").alias("_na"), "_h"
    )
    b = ex.select(
        F.col("_id").alias("id_b"), F.col("_n").alias("_nb"), "_h"
    )
    # each shared shingle contributes exactly one join row, so the
    # per-pair row count IS |A∩B| — sets and sizes ride along, no
    # array columns ever cross a shuffle and no second pass over sh
    return (
        a.join(b, "_h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "_na", "_nb")
        .agg(F.count(F.lit(1)).alias("_i"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("_i")
                / (F.col("_na") + F.col("_nb") - F.col("_i"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def cross_jaccard_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    right_id_col: str | None = None,
    right_text_col: str | None = None,
    shingle_n: int = 3,
    threshold: float = 0.5,
    broadcast_right: bool = True,
) -> DataFrame:
    """EXACT shingle-set Jaccard pairs BETWEEN two corpora → (id_a,
    id_b, jaccard): every (left doc, right doc) pair whose hashed
    ``shingle_n``-gram sets overlap with Jaccard ≥ ``threshold``.
    The bipartite twin of ngram_jaccard_pairs (complete recall for any
    threshold > 0); feeds fuzzy_decontaminate.

    100 TB plan shape: both sides build the (id, sorted shingle-hash
    set) table (one shuffle each, keyed on id); the candidate join is
    counting-form — each side explodes back to (id, size, hash) rows
    and joins on the hash, so the per-pair row count IS |A∩B| and no
    array column ever crosses a shuffle. With ``broadcast_right``
    (default — the right side is an eval set, thousands of docs) the
    exploded right table broadcasts, the join is map-side against the
    streamed left corpus, and the only exchange after the left shingle
    build is the groupBy on (id_a, id_b) over MATCHING rows only.
    Pass ``broadcast_right=False`` for corpus-scale right sides and
    AQE sizes the join. Docs with fewer than ``shingle_n`` tokens have
    empty shingle sets and appear in no pair (Jaccard undefined).
    """
    rid = right_id_col or id_col
    rtext = right_text_col or text_col
    sha = _shingle_table(left, id_col, text_col, shingle_n)
    shb = _shingle_table(right, rid, rtext, shingle_n)
    a = sha.select(
        F.col(id_col).alias("id_a"),
        F.size("hs").alias("_na"),
        F.explode("hs").alias("_h"),
    )
    b = shb.select(
        F.col(rid).alias("id_b"),
        F.size("hs").alias("_nb"),
        F.explode("hs").alias("_h"),
    )
    if broadcast_right:
        b = F.broadcast(b)
    out = (
        a.join(b, "_h")
        .groupBy("id_a", "id_b", "_na", "_nb")
        .agg(F.count(F.lit(1)).alias("_i"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("_i")
                / (F.col("_na") + F.col("_nb") - F.col("_i"))
            ).alias("jaccard"),
        )
    )
    if threshold > 0.0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def fuzzy_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    shingle_n: int = 3,
    threshold: float = 0.8,
    mode: str = "drop",
    flag_col: str = "contaminated",
    broadcast_eval: bool = True,
) -> DataFrame:
    """FUZZY decontamination: remove (``mode='drop'``) or flag
    (``mode='flag'``) every train doc whose shingle-set Jaccard
    against ANY eval doc reaches ``threshold`` — the near-duplicate
    analogue of the exact-hash `decontaminate` and the n-gram
    `decontaminate_by_ngrams`, catching eval documents that leaked
    into training data with light edits (the standard doc-level fuzzy
    decontamination stage of LLM data pipelines; same Jaccard
    construction as the published MinHash-dedup recipe, run
    bipartite against the eval side, exact instead of approximate).

    Plan shape: cross_jaccard_pairs with the eval side broadcast
    (default — eval sets are small), distinct contaminated train ids,
    ONE id-probe anti/left join back onto the full-width train rows.
    The train corpus is shuffled only as (id, shingle-hash) pairs;
    full rows move only through the final id-keyed join. Train docs
    shorter than ``shingle_n`` tokens have no shingles and are never
    flagged — screen those with `decontaminate` (exact hash) if they
    matter.
    """
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    hits = (
        cross_jaccard_pairs(
            train.select(F.col(id_col), F.col(text_col)),
            eval_df,
            id_col=id_col,
            text_col=text_col,
            right_id_col=eval_id_col,
            right_text_col=eval_text_col,
            shingle_n=shingle_n,
            threshold=threshold,
            broadcast_right=broadcast_eval,
        )
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    if mode == "drop":
        return train.join(hits, id_col, "left_anti")
    return (
        train.join(
            hits.withColumn("_hit", F.lit(True)), id_col, "left"
        )
        .withColumn(flag_col, F.coalesce(F.col("_hit"), F.lit(False)))
        .drop("_hit")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signature → banded buckets →
    candidate pairs → exact-Jaccard verification ≥ threshold.

    The per-doc shingle-hash table is computed ONCE and persisted
    (memory-and-disk) — it feeds both the signature pass and the two
    sides of the verification join; without the persist, Spark would
    re-tokenize + re-hash the corpus three times. At cluster scale,
    materializing this table (parquet) instead of caching gives the
    same reuse across repeated runs.
    """
    from pyspark import StorageLevel

    from wimbd_spark.session import scoped_persist

    sh = scoped_persist(
        _shingle_table(df, id_col, text_col, shingle_n),
        StorageLevel.MEMORY_AND_DISK,
    )
    sigs = sh.select(
        F.col(id_col), *_minhash_from_hashes(F.col("hs"), num_hashes)
    )
    cand = _pairs_from_sigs(sigs, id_col, num_hashes, bands, max_bucket_size)
    return _jaccard_from_shingle_table(sh, cand, threshold)


#: Edge-count threshold below which neardup_components resolves the
#: graph on the driver (union-find) instead of iterating distributed
#: jobs — the broadcast-join analogue for graphs. Sized like a
#: broadcast threshold: 500k collected Rows plus the union-find dicts
#: cost on the order of 100 MB of PYTHON driver heap (Rows are ~10×
#: the raw edge bytes), safe on any reasonable driver, and still far
#: above the pair volume a sane near-dup threshold yields on fixture-
#: to-mid corpora. Raise it deliberately on big drivers; the
#: distributed iteration is the default above it either way. Deciding
#: costs one count() of the (persisted) pairs — work every consumer
#: of the labels pays anyway.
DEFAULT_LOCAL_EDGE_LIMIT = 500_000


def _local_union_find(edges: list) -> list[tuple]:
    """Driver-side union-find with path compression; returns
    (id, min-reachable-id) rows — identical semantics to the
    distributed iteration."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    nodes = set()
    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
    comp_min: dict = {}
    for n in nodes:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return [(n, comp_min[find(n)]) for n in sorted(nodes)]


def neardup_components(
    pairs: DataFrame,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    check_every: int = 2,
    stats: dict | None = None,
    local_edge_limit: int | None = DEFAULT_LOCAL_EDGE_LIMIT,
) -> DataFrame:
    """Resolve near-dup PAIRS into clusters: (id, component) where
    component = the smallest id reachable through the pair graph.

    Min-label propagation WITH POINTER DOUBLING (path compression):
    every node starts labeled with its own id; each round (a) takes
    the min of its label and its neighbors' labels — the propagate
    step — then (b) replaces its label with its label's label — the
    compress step, the alternating-min/star-contraction idea. The
    reachable-min horizon roughly doubles per round, so a chain of
    diameter d converges in O(log d) rounds instead of the O(d) of
    plain propagation (verified by the chain fixture in test_neardup).
    Labels only ever decrease toward the component minimum and always
    hold a member id, so the fixpoint is exactly min-reachable-id;
    ``max_iter`` bounds adversarial graphs.

    Scale/reliability controls (the 100 TB knobs):
    - ``checkpoint_dir``: when set, per-round lineage truncation uses
      RELIABLE ``checkpoint()`` into that directory (HDFS/object store
      on a cluster) instead of ``localCheckpoint()``. Local checkpoint
      blocks live on executors and die with them — a known failure
      trap for iterative jobs on real clusters; pass a durable path
      for any cluster run. Default (None) keeps the cheap local mode
      for single-node/interactive use.
    - ``check_every``: the convergence test (a count() action) runs
      every this-many rounds rather than every round, halving-or-
      better the driver-action count; the final round always checks.

    Size-adaptive execution (``local_edge_limit``): near-dup pair sets
    are usually SMALL relative to the corpus (that is the point of
    near-dup thresholds), so when the edge count is at or below the
    limit the graph is collected and resolved with driver union-find —
    milliseconds instead of several shuffle rounds, exactly the
    broadcast-small-side rule applied to graphs. Above the limit (or
    with ``local_edge_limit=None``/0) the distributed iteration runs;
    a 10⁹-edge graph never touches the driver. Both modes produce
    identical labels.

    Deterministic (min over an id total order) → SQL-oracle-able via a
    recursive CTE.
    """
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    if check_every < 1:
        raise ValueError("check_every must be >= 1")
    spark = pairs.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    id_type = pairs.schema["id_a"].dataType
    if local_edge_limit:
        from pyspark import StorageLevel
        from pyspark.sql.types import StructField, StructType

        p2 = pairs.select("id_a", "id_b")
        # ONE bounded action decides the mode AND delivers the edges:
        # limit(N+1).collect() returns the complete edge set when it
        # fits (collect order does not matter to union-find) — the
        # previous persist + count() + collect() shape materialized
        # the pair pipeline once and then read it back twice (r15,
        # ~0.3 s per call at sf0.1). Oversized graphs discard the
        # probe rows and iterate from a cached copy as before.
        head = p2.limit(local_edge_limit + 1).collect()
        if len(head) <= local_edge_limit:
            rows = _local_union_find([(r[0], r[1]) for r in head])
            if stats is not None:
                stats["rounds"] = 0
                stats["converged"] = True
                stats["mode"] = "local-union-find"
            schema = StructType(
                [
                    StructField("id", id_type, False),
                    StructField("comp", id_type, False),
                ]
            )
            return spark.createDataFrame(rows, schema)
        # big graph: iterate from the cached pairs
        pairs = p2.persist(StorageLevel.MEMORY_AND_DISK)
    if stats is not None:
        stats["mode"] = "distributed"

    def _truncate(df: DataFrame) -> DataFrame:
        # Lineage truncation each round is mandatory either way: labels
        # is referenced several times per iteration, so without it the
        # logical plan doubles every round (exponential analysis cost,
        # driver OOM by ~iteration 8 even on tiny graphs).
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    und = (
        edges.union(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    rounds = 0
    converged = False
    while rounds < max_iter:
        rounds += 1
        # (a) propagate: comp'(u) = min(comp(u), min over nbrs comp(v))
        nbr_min = (
            und.join(
                labels.select(
                    F.col("id").alias("b"), F.col("comp").alias("_nc")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("_nc").alias("_m"))
            .select(F.col("a").alias("id"), "_m")
        )
        prop = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce("_m", F.col("comp"))).alias(
                "_p"
            ),
            F.col("comp").alias("_old"),
        )
        # (b) compress: comp''(u) = comp'(comp'(u)) — labels always
        # hold member ids, so the mapping join is total (left+coalesce
        # is belt and braces)
        mapping = prop.select(
            F.col("id").alias("_p"), F.col("_p").alias("_pp")
        )
        new = _truncate(
            prop.join(mapping, "_p", "left").select(
                "id", F.coalesce("_pp", "_p").alias("_new"), "_old"
            )
        )
        labels = new.select("id", F.col("_new").alias("comp"))
        if rounds % check_every == 0 or rounds == max_iter:
            if new.filter(F.col("_new") != F.col("_old")).count() == 0:
                converged = True
                break
    if not converged and rounds >= max_iter:
        # Silent non-convergence would leak duplicates: several nodes
        # of one chain-shaped cluster would keep comp == id and all be
        # kept as "representatives" by drop_near_duplicates.
        import warnings

        warnings.warn(
            f"neardup_components may not have converged in {max_iter} "
            "rounds — component labels could be an under-merged "
            "approximation; raise max_iter (rounds needed ≈ "
            "log2(graph diameter) + a small constant)",
            RuntimeWarning,
            stacklevel=2,
        )
    und.unpersist()
    if local_edge_limit:
        pairs.unpersist()  # the cached p2 of the big-graph branch
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    return labels


def drop_near_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    local_edge_limit: int | None = DEFAULT_LOCAL_EDGE_LIMIT,
) -> DataFrame:
    """Keep one representative per near-dup cluster (the smallest id)
    plus every unpaired document — the decision step after
    lsh_candidate_pairs/ngram_jaccard_pairs verification. Pass
    ``checkpoint_dir`` (durable path) on cluster runs — see
    neardup_components (also for ``local_edge_limit``)."""
    comps = neardup_components(
        pairs,
        max_iter,
        checkpoint_dir=checkpoint_dir,
        local_edge_limit=local_edge_limit,
    )
    losers = comps.filter(F.col("comp") != F.col("id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def simhash16(text: Column | str, shingle_n: int = 1) -> Column:
    """16-bit SimHash over distinct token shingles → BIGINT in [0, 65535].

    bit_i = 1 iff Σ over shingles of (bit_i(hash32(s)) ? +1 : -1) > 0.
    Pure per-row expression (no shuffle); reproducible in SQL.
    """
    c = F.col(text) if isinstance(text, str) else text
    sh = (
        F.array_sort(F.array_distinct(tokenize(c)))
        if shingle_n == 1
        else shingle_set(c, shingle_n)
    )
    hashes = F.transform(sh, lambda s: hash32(s))
    # Single pass over the hash array: the accumulator is the 16-slot
    # vote vector (vs. 16 separate aggregates — ~3× faster, same bits).
    # Bit tests via bitwiseAND against a powers-of-two literal array
    # (shiftright/shiftleft take only Python-int bit counts).
    powers = F.array(*[F.lit(2**i).cast("long") for i in range(16)])
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 16),
        lambda acc, h: F.zip_with(
            acc,
            powers,
            lambda a, p: a + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


#: Per-process memo of (token, nh) → packed salted hash32 halves for
#: the Arrow simhash engine: md5 is a pure function of the token,
#: worker processes are reused across tasks, and web-corpus vocabulary
#: is Zipfian — the cache turns ~per-token-instance md5 cost into
#: ~per-vocabulary-word cost. Bounded; cleared wholesale at the cap.
#: The key CARRIES nh (= ceil(nbits/32)): the packed value depends on
#: how many 32-bit halves were filled, so a token-only key served an
#: nbits<=32 entry (high half zero) to an nbits>32 caller whenever the
#: dict is genuinely shared across UDF instances (ADVICE r15).
_SIMHASH_HASH_CACHE: dict = {}
_SIMHASH_HASH_CACHE_MAX = 1 << 20


def _simhash_bits_arrow(
    raw_split: Column, nbits: int, shingle_n: int
) -> Column:
    """Vectorized (Arrow + numpy) evaluation of the simhash_bits
    vote, bit-for-bit identical to the expression form (parity-
    pinned): per shingle s and half k, bit j of
    hash32(s, f"sh64{k}") votes ±1 on signature bit k*32 + j mod 32.

    The expression form allocates ~2 arrays + nbits structs per
    shingle in interpreted higher-order functions (~90 CPU-seconds
    per 280k tokens measured r15, and the garbage presses on the GC
    for the rest of the job); here each Arrow batch is one numpy
    bit-matrix + one segmented reduce. md5 values are memoized per
    process (see _SIMHASH_HASH_CACHE), so repeated vocabulary costs
    one hash ever.

    ``raw_split`` must be the LAMBDA-FREE ``split(trim(text), '\\s+')``
    — empty-token filtering and shingle assembly happen in Python
    (identical strings by construction: same slice bounds, same
    single-space join as functions.text.ngram_strings). A pandas_udf
    whose argument embeds a higher-order-function lambda is NOT
    reliably extracted into ArrowEvalPython (whether extraction
    happens depends on JVM expression-id alignment; when it does not,
    execution dies with INTERNAL_ERROR "Cannot evaluate expression" —
    reproduced deterministically r15), so no HOF may appear in the
    argument."""

    nh = (nbits + 31) // 32

    @F.pandas_udf("long")
    def _sig(tok_s: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        cache = _SIMHASH_HASH_CACHE
        salts = [f"sh64{k}:".encode() for k in range(nh)]

        def packed(tok: str) -> int:
            key = (tok, nh)
            h = cache.get(key)
            if h is None:
                if len(cache) >= _SIMHASH_HASH_CACHE_MAX:
                    cache.clear()
                b = tok.encode()
                h = 0
                for k in range(nh):
                    h |= int.from_bytes(
                        hashlib.md5(salts[k] + b).digest()[:4], "big"
                    ) << (32 * k)
                cache[key] = h
            return h

        # flatten the batch: one hash row per (doc, distinct shingle),
        # then one bit matrix + segmented reduce for the whole batch
        per_doc: list = []
        flat: list = []
        for arr in tok_s:
            if arr is None:
                # expression-form NULL semantics differ by width:
                # shingle_n == 1 propagates NULL (aggregate over a
                # NULL array), shingle_n > 1 goes through
                # ngram_strings, whose WHEN/OTHERWISE maps a NULL
                # token array to the EMPTY gram array → signature 0
                per_doc.append(None if shingle_n == 1 else 0)
                continue
            toks = [t for t in arr if t != ""]
            if shingle_n == 1:
                uniq = set(toks)
            elif len(toks) >= shingle_n:
                uniq = {
                    " ".join(toks[i : i + shingle_n])
                    for i in range(len(toks) - shingle_n + 1)
                }
            else:
                uniq = set()
            per_doc.append(len(uniq))
            flat.extend(packed(t) for t in uniq)
        if not flat:
            return pd.Series(
                [None if k is None else 0 for k in per_doc],
                dtype="object",
            ).astype("Int64")
        hs = np.array(flat, dtype=np.uint64)
        shift = np.arange(nbits, dtype=np.uint64)
        bits = ((hs[:, None] >> shift) & 1).astype(np.int64)
        counts = [k for k in per_doc if k is not None and k > 0]
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(
            np.int64
        )
        ones = np.add.reduceat(bits, offsets, axis=0)
        pow2 = (1 << np.arange(nbits, dtype=np.uint64)).astype(
            np.uint64
        )
        ks = np.array(counts, dtype=np.int64)[:, None]
        sigs = ((2 * ones - ks) > 0).astype(np.uint64) @ pow2
        out: list = []
        i = 0
        for k in per_doc:
            if k is None:
                out.append(None)
            elif k == 0:
                out.append(0)
            else:
                out.append(int(sigs[i]))
                i += 1
        return pd.Series(out, dtype="object").astype("Int64")

    return _sig(raw_split)


def simhash_bits(
    text: Column | str,
    nbits: int = 62,
    shingle_n: int = 1,
    engine: str = "arrow",
) -> Column:
    """WIDE SimHash over distinct token shingles → BIGINT with
    ``nbits`` (≤ 62) signature bits — the corpus-scale variant of
    simhash16.

    16 bits saturate at scale: 2^16 distinct signatures means that on
    a 10⁹-doc corpus every bucket holds ~15k docs and Hamming blocking
    degenerates to quadratic comparisons. 62 bits (the default; the
    cap keeps the value a POSITIVE BIGINT on both engines) give 4e18
    signatures — collisions only from genuine similarity.

    Bit j votes with bit (j mod 32) of the SALTED portable hash
    hash32(shingle, "sh64" + chr(j // 32)), so the construction stays
    md5-reproducible in a SQL oracle exactly like simhash16. Per-row
    in both engines — no shuffle.

    ``engine``: "arrow" (default) evaluates the vote vectorized in
    numpy over Arrow batches (_simhash_bits_arrow — the expression
    form's interpreted higher-order functions allocate ~nbits structs
    per shingle and were measured at ~90 CPU-seconds / 280k tokens,
    r15); "expr" keeps the pure-Catalyst expression (no Python
    workers — e.g. for streaming plans). Both engines are
    bit-identical (parity-pinned in tests)."""
    if not (1 <= nbits <= 62):
        raise ValueError("nbits must be in [1, 62]")
    if engine not in ("arrow", "expr"):
        raise ValueError(f"unknown engine {engine!r}")
    c = F.col(text) if isinstance(text, str) else text
    if engine == "arrow":
        # lambda-free argument (see _simhash_bits_arrow): the JVM does
        # trim+split, Python drops empties / builds shingles / dedups
        return _simhash_bits_arrow(
            F.split(F.trim(c), r"\s+"), nbits, shingle_n
        )
    sh = (
        F.array_sort(F.array_distinct(tokenize(c)))
        if shingle_n == 1
        else shingle_set(c, shingle_n)
    )
    nh = (nbits + 31) // 32
    hs = F.transform(
        sh,
        lambda s: F.array(
            *[hash32(s, f"sh64{k}") for k in range(nh)]
        ),
    )
    # per-bit (source-hash index, probe mask) spec, zipped against the
    # 62-slot vote vector — one pass over the shingle hashes
    specs = [(j // 32, 2 ** (j % 32)) for j in range(nbits)]
    probe = F.array(*[F.lit(p).cast("long") for _, p in specs])
    which = F.array(*[F.lit(k) for k, _ in specs])
    votes = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), nbits),
        lambda acc, hh: F.zip_with(
            F.zip_with(acc, which, lambda a, k: F.struct(a.alias("a"), F.element_at(hh, k + 1).alias("h"))),
            probe,
            lambda ak, p: ak["a"]
            + F.when(ak["h"].bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    outpow = F.array(*[F.lit(2**j).cast("long") for j in range(nbits)])
    return F.aggregate(
        F.zip_with(
            votes,
            outpow,
            lambda v, q: F.when(v > 0, q).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


MAX_PIGEONHOLE_COMBINATIONS = 512
"""Cap on C(nseg, max_hamming) composite blockings in simhash_pairs —
each combination is one more explode row per doc, and past a few
hundred the explode volume costs more than the narrower blocks save."""


def auto_nseg(n_rows: int, nbits: int, max_hamming: int) -> int:
    """Segment count minimizing the modeled simhash_pairs cost at
    ``n_rows`` docs: within-block pair work N²·C(nseg,h)/2^w (composite
    key width w = (nseg−h)·nbits/nseg, uniform-signature model) plus
    explode volume N·C(nseg,h). Tiny corpora resolve to the classic
    h+1 split (the explode term dominates); growing corpora widen the
    keys until the quadratic term is paid off — e.g. nbits=62, h=6
    picks 7 at 10³ docs, 9 at 10⁶, 11 at 10⁹ (the cap keeps
    C(nseg,6) ≤ MAX_PIGEONHOLE_COMBINATIONS). The uniform-signature
    model is more eager than the measured wall-clock crossover
    (SCALE.md: nseg=8 beats classic from ~2-4M docs) because it
    ignores constant factors — harmless either way, since every nseg
    is pair-set-identical (parity-pinned) and the asymptotic ranking
    is what matters. Deterministic in (n_rows, nbits, max_hamming)."""
    from math import comb

    h = max_hamming
    best, best_cost = h + 1, None
    for nseg in range(h + 1, min(nbits, h + 24) + 1):
        c = comb(nseg, h)
        if c > MAX_PIGEONHOLE_COMBINATIONS:
            break
        w = (nseg - h) * nbits / nseg
        cost = n_rows * n_rows * c / (2.0 ** w) + n_rows * c
        if best_cost is None or cost < best_cost:
            best, best_cost = nseg, cost
    return best


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 2,
    sig_col: str | None = None,
    nbits: int = 16,
    nseg: int | str | None = "auto",
) -> DataFrame:
    """ALL pairs at SimHash Hamming distance ≤ max_hamming — complete,
    not a lossy candidate generator.

    Generalized pigeonhole blocking: the ``nbits`` signature bits
    split into ``nseg`` contiguous segments; a pair with
    ≤ max_hamming differing bits dirties at most max_hamming
    segments, so at least nseg − max_hamming segments agree — hence
    the pair collides on at least one of the C(nseg, max_hamming)
    composite keys formed by every (nseg − max_hamming)-segment
    subset. Blocking on the union of those composite-key equalities
    has perfect recall; all-pairs comparison happens only inside
    (combination, composite value) blocks — never globally —
    and `distinct` folds pairs found via several combinations.

    ``nseg`` DEFAULTS TO "auto" (r12 VERDICT): auto_nseg fits the
    segment count to the corpus size with one count() job, so a
    caller on 10⁹ docs gets the scale-safe wide-key blocking without
    opting in; below the crossover auto resolves to the classic
    max_hamming + 1 split (C(h+1, h) = h+1 blockings keyed on one
    segment each), which ``nseg=None`` also selects explicitly —
    count-free, but NOT production-safe at wide radii: within-block
    join cost is ~N²·C/2^w for composite width w and C combinations,
    so at nbits=62, max_hamming=6 the classic split leaves w ≈ 9-bit
    keys — N²·7/512 is quadratic on a 10⁹-doc corpus. Raising nseg
    trades explode volume for key width: nseg=8 gives C(8,6→2)=28
    composite ~15.5-bit keys (N²·28/46341, ~23× less join work, and
    every extra segment buys another ~7.75 bits). Every nseg returns
    the identical pair set (parity-pinned), so the choice is pure
    cost; C(nseg, max_hamming) is capped at
    MAX_PIGEONHOLE_COMBINATIONS.

    ``nbits`` selects the signature width: 16 (simhash16, oracle-
    familiar) or up to 62 (simhash_bits — the corpus-scale width).
    Pass ``sig_col`` to block on a precomputed signature column
    instead of hashing ``text_col``.
    """
    from math import comb

    if nseg == "auto":
        # one count() job buys the size-fitted split — worth it on any
        # corpus where this operator is worth running
        nseg = auto_nseg(df.count(), nbits, max_hamming)
    if nseg is None:
        nseg = max_hamming + 1
    if nseg < max_hamming + 1:
        raise ValueError("nseg must be >= max_hamming + 1")
    if nseg > nbits:
        raise ValueError("nseg must be <= nbits")
    ncomb = comb(nseg, max_hamming)
    if ncomb > MAX_PIGEONHOLE_COMBINATIONS:
        raise ValueError(
            f"C({nseg}, {max_hamming}) = {ncomb} composite blockings "
            f"exceeds MAX_PIGEONHOLE_COMBINATIONS "
            f"({MAX_PIGEONHOLE_COMBINATIONS}) — lower nseg"
        )
    base, rem = divmod(nbits, nseg)
    widths = [base + (1 if i < rem else 0) for i in range(nseg)]
    shifts = [sum(widths[:i]) for i in range(nseg)]

    sig = (
        F.col(sig_col).cast("long")
        if sig_col
        else (
            simhash16(F.col(text_col))
            if nbits == 16
            else simhash_bits(F.col(text_col), nbits)
        )
    )
    # materialize the tiny (id, sh) table so the self-join's two
    # branches read it instead of re-running the signature pipeline
    # (the physical plan otherwise computes every signature TWICE —
    # once on the stream side, once inside the join's build side;
    # measured as ~half the operator's cost, r15). persist() keeps
    # lineage (fault-tolerant recompute); the cache entry is released
    # by the scoped_persist FIFO (session.py).
    #
    # The sh-isNotNull filter is applied ABOVE the persist, not below:
    # filtering on the UDF-computed column inside the cached plan made
    # the optimizer push an extra isnotnull probe BELOW the load
    # rebalance and re-evaluate the Arrow signature UDF a second time
    # above it (two ArrowEvalPython nodes per union branch, guide
    # §4.4 shape; the exchange also carried full text instead of the
    # 8-byte signature). Filtered rows are the same either way — the
    # cache just stores the (rare) null-signature rows too.
    from wimbd_spark.session import scoped_persist

    s = scoped_persist(df.select(F.col(id_col), sig.alias("sh")))
    s = s.filter(F.col("sh").isNotNull())
    from itertools import combinations

    def _segval(i):
        return F.shiftright(F.col("sh"), shifts[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1)
        )

    # One blocking per (nseg − max_hamming)-segment subset; the
    # composite key packs the subset's segment values into one BIGINT
    # (total ≤ nbits ≤ 62 bits). With nseg = max_hamming + 1 each
    # subset is a single segment — the classic pigeonhole unchanged.
    structs = []
    masks = []
    for ci, combo in enumerate(
        combinations(range(nseg), nseg - max_hamming)
    ):
        off, val = 0, F.lit(0).cast("long")
        mask = 0
        for i in combo:
            val = val + F.shiftleft(_segval(i), off)
            off += widths[i]
            mask |= ((1 << widths[i]) - 1) << shifts[i]
        masks.append(mask)
        structs.append(
            F.struct(
                F.lit(ci).alias("seg"), val.cast("long").alias("sv")
            )
        )
    segs = F.array(*structs)
    blocks = s.select(F.col(id_col), "sh", F.explode(segs).alias("b")).select(
        id_col, "sh", "b.seg", "b.sv"
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    joined = a.join(
        b,
        (F.col("a.seg") == F.col("b.seg"))
        & (F.col("a.sv") == F.col("b.sv"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    xor = F.col("a.sh").bitwiseXOR(F.col("b.sh"))
    pairs = joined.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.bit_count(xor).cast("long").alias("hamming"),
        xor.alias("_x"),
        F.col("a.seg").alias("_seg"),
    ).filter(F.col("hamming") <= max_hamming)
    if ncomb <= 128:
        # A pair found via several agreeing combinations used to be
        # folded by a full distinct() — an extra shuffle of the whole
        # pair set. Instead emit it ONLY from its FIRST agreeing
        # combination: combination ci agrees iff the xor of the two
        # signatures has no bit inside ci's segment mask — a pure
        # map-side WHEN chain of ncomb bitwise tests (ids are unique
        # per row, the operator's existing contract). Identical pair
        # set, one less exchange. Past 128 combinations the WHEN
        # chain outgrows codegen budgets — keep distinct() there.
        first_ci = None
        for ci, m in enumerate(masks):
            cond = F.col("_x").bitwiseAND(F.lit(m)) == 0
            first_ci = (
                F.when(cond, F.lit(ci))
                if first_ci is None
                else first_ci.when(cond, F.lit(ci))
            )
        return pairs.filter(F.col("_seg") == first_ci).select(
            "id_a", "id_b", "hamming"
        )
    return pairs.select("id_a", "id_b", "hamming").distinct()
