"""SparkSession factory + catalog helpers.

Parity: wimbd/es/__init__.py:20-86 (`es_init` session setup, `get_indices`
listing) — our "cluster connection" is a SparkSession and our "indices"
are catalog tables/views.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Tables whose per-row work is CPU-bound interpreted compute (text
#: tokenization / n-gram explodes, vector higher-order functions) —
#: these run at ~1-10 MB/s/core, so a sub-core-count scan partition
#: serializes minutes of work and the rebalance shuffle always pays.
#: Relational/event tables run through whole-stage-codegen'd
#: filters/aggs at ~GB/s/core: for them a full-row rebalance shuffle
#: costs MORE than just processing the small partition in place
#: (measured r15: lineitem agg 0.31 s unrebalanced vs 1.21 s
#: rebalanced at sf0.1), and at real scale the scan splits large
#: files itself — so they are no longer rebalanced on load. The hash
#: key avoids keyless repartition's sort-before-shuffle tax.
REBALANCE_KEYS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def get_spark(
    app_name: str = "wimbd-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for corpus analytics.

    Scale-minded defaults:
    - AQE on (runtime shuffle-partition coalescing, skew-join splitting,
      broadcast conversion) — replaces the reference's hand-tuned worker
      counts (src/cmd/util.rs:127-134).
    - Arrow enabled for the pandas_udf slow path.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions if shuffle_partitions is not None else int(cpus)
        ),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Generated-code cache (static conf, default 100 entries):
        # an analytics session runs MANY distinct query shapes (the
        # ES-parity usage: one long-lived session, ad-hoc queries),
        # each producing several codegen units — at >100 live units
        # the LRU thrashes and every re-run pays full janino
        # compilation again. Sized to hold a working set of ~hundreds
        # of query shapes; cost is class metadata (MBs). Same effect
        # on any cluster (driver and executors each hold this cache).
        "spark.sql.codegen.cache.maxEntries": os.environ.get(
            "WIMBD_CODEGEN_CACHE_ENTRIES", "4096"
        ),
        # pandas-written parquet uses TIMESTAMP(NANOS); read as long and
        # rebuild timestamps in load_tables (Spark has no ns timestamps).
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.session.timeZone": "UTC",
        # local-mode quality of life; harmless on a cluster
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def rebalance_small_input(df: DataFrame, key: str | None = None) -> DataFrame:
    """Spread a tiny input (fewer partitions than cores) across the
    cluster. CPU-bound text operators (tokenize/ngram explode) are
    otherwise serialized on one core when the source is a single small
    file. At real scale (many files / large row groups) the scan
    already yields >= defaultParallelism partitions and this is a
    no-op — no shuffle is added on the 100 TB path.

    ``key``: hash-partition on this column instead of round-robin.
    Keyless ``repartition(n)`` locally SORTS its whole input first
    (spark.sql.execution.sortBeforeRepartition, on by default since
    SPARK-23207, so retried tasks reproduce the same row placement) —
    measured at ~40% of the repartition cost on a 600k-row table
    (r15). Hashing a unique id column spreads just as evenly, needs
    no sort, and is deterministic under retries by construction
    (guide: derive synthetic keys from data, not from rand()).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        if key is not None:
            from pyspark.sql import functions as F

            return df.repartition(target, F.col(key))
        return df.repartition(target)
    return df


#: Per-process memo of lazily-planned parquet reads (the PLAN, never
#: results): spark.read.parquet costs ~70-150 ms of driver time per
#: call (footer/schema read, partition discovery), and index-backed
#: operators issue 2-4 such reads per query. The DataFrame is
#: immutable and unexecuted — every action still computes from the
#: files. The key carries the Spark applicationId (a new session never
#: reuses a dead session's plan) and a freshness stamp of the path
#: plus its children TWO levels deep (mtime+size), which catches every
#: write pattern Spark producers have: new/removed part files change
#: the directory, partition-dir writes change that child's listing,
#: and a same-epoch rewrite INSIDE a partition dir changes the
#: grandchild entries (ADVICE r15). Deeper partition trees are not
#: memoized (a bounded stamp cannot prove their freshness). Only
#: local paths are memoized; other filesystems read fresh every call.
_PARQUET_PLAN_MEMO: dict = {}


def parquet_plan(spark: SparkSession, path: str) -> DataFrame:
    import os

    try:
        st = os.stat(path)
        entries = []
        deep_dirs = False
        for e in sorted(os.scandir(path), key=lambda e: e.name):
            est = e.stat()
            entries.append((e.name, est.st_mtime_ns, est.st_size))
            if e.is_dir():
                # partitioned layout: a same-epoch rewrite INSIDE a
                # partition dir can leave the parent mtimes unchanged
                # (ADVICE r15) — stamp one level of grandchildren too,
                # and refuse to memoize past that depth (nested
                # partition trees read fresh every call).
                for g in sorted(os.scandir(e.path), key=lambda g: g.name):
                    gst = g.stat()
                    entries.append(
                        (e.name + "/" + g.name, gst.st_mtime_ns, gst.st_size)
                    )
                    if g.is_dir():
                        deep_dirs = True
        if deep_dirs:
            return spark.read.parquet(path)
        stamp = (st.st_mtime_ns, st.st_size, tuple(entries))
    except OSError:
        return spark.read.parquet(path)
    key = (spark.sparkContext.applicationId, path)
    hit = _PARQUET_PLAN_MEMO.get(key)
    if hit is not None and hit[0] == stamp:
        return hit[1]
    df = spark.read.parquet(path)
    # One entry per (app, path): a rewrite REPLACES the stale plan
    # instead of accumulating one memo entry per historical stamp.
    _PARQUET_PLAN_MEMO[key] = (stamp, df)
    return df


#: Dataset-level ``persist()`` entries live in the JVM CacheManager
#: until an EXPLICIT ``unpersist()`` — the ContextCleaner never
#: reclaims them (it cleans unreferenced RDDs; the CacheManager holds
#: each InMemoryRelation strongly, which in turn pins the cached RDD).
#: Operators that return a LAZY plan reading a persisted intermediate
#: therefore can't release it in-call, and across a long session those
#: entries accumulate: every later query's planner compares its plan
#: tree against every live cache entry, and the stale blocks squat in
#: the block manager (measured r15: ~+8 s over a 102-query bench run,
#: with plan-heavy phrase/AC queries reading +0.3-1.2 s each).
#: ``scoped_persist`` bounds the leak: persists are registered FIFO
#: and the oldest is released once more than _SCOPED_PERSIST_CAP are
#: live. The cap (4) exceeds the largest number of concurrently-needed
#: persists in any single operator (3, neardup_components), so the
#: CURRENT query's caches always survive its own execution; entries
#: from PREVIOUS queries are evicted as new ones register. Re-running
#: an old lazy result after its cache was evicted recomputes the
#: subtree — correct, just no longer cache-accelerated.
_SCOPED_PERSIST_CAP = 4
_SCOPED_PERSISTS: list = []
# The registry is a module global shared by all driver threads;
# unsynchronized list mutation is racy and concurrent queries could
# evict each other's live entries mid-build (ADVICE r15). A lock makes
# the mutation safe; eviction of a *sibling thread's* entry remains
# possible by design (results stay correct via recompute) — callers
# running concurrent queries should size _SCOPED_PERSIST_CAP to the
# sum of their concurrent needs.
_SCOPED_PERSISTS_LOCK = threading.Lock()


def scoped_persist(df: DataFrame, level=None) -> DataFrame:
    df = df.persist() if level is None else df.persist(level)
    evicted: list = []
    with _SCOPED_PERSISTS_LOCK:
        _SCOPED_PERSISTS.append(df)
        while len(_SCOPED_PERSISTS) > _SCOPED_PERSIST_CAP:
            evicted.append(_SCOPED_PERSISTS.pop(0))
    for old in evicted:
        try:
            old.unpersist()
        except Exception:
            # a stopped/replaced SparkContext can no longer unpersist —
            # dropping the reference is all that's left to do
            pass
    return df


#: Plan-stats byte threshold above which text operators with an Arrow
#: engine (winnow fingerprint selection, shingle-set building) pick it
#: over the pure-expression plan. The Arrow stage costs ~0.5 s of fixed
#: Python-worker overhead per query locally and wins only once the
#: per-token interpreted-HOF savings exceed that; parquet text
#: compresses ~5-10×, so 2 MiB on-disk ≈ 10-20 MB of raw text ≈ the
#: measured local crossover (sf0.1 regressed 0.4-0.7 s/query on
#: arrow-always; sf1 won 2.5-3.5×). Results are engine-independent
#: (parity-pinned), so the gate is pure cost routing; tune per
#: deployment via WIMBD_ARROW_TEXT_MIN_BYTES.
ARROW_TEXT_MIN_BYTES = int(
    os.environ.get("WIMBD_ARROW_TEXT_MIN_BYTES", str(2 * 1024 * 1024))
)


def plan_size_bytes(df: DataFrame) -> int:
    """Optimizer size estimate of a DataFrame — driver-side plan
    statistics, NO Spark job (file-size-derived for parquet-backed
    plans). The job-free signal for engine auto-gates; 0 on failure
    (callers treat 0 as small)."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return 0


def resolve_text_engine(df: DataFrame, engine: str) -> str:
    """Resolve ``engine="auto"`` for text operators with an Arrow fast
    path: "arrow" past ARROW_TEXT_MIN_BYTES of estimated input, else
    "expr". Explicit "arrow"/"expr" pass through; anything else
    raises."""
    if engine == "auto":
        return (
            "arrow"
            if plan_size_bytes(df) >= ARROW_TEXT_MIN_BYTES
            else "expr"
        )
    if engine not in ("arrow", "expr"):
        raise ValueError(f"unknown engine {engine!r}")
    return engine


def release_scoped_persists() -> int:
    """Unpersist EVERY live scoped persist and empty the registry;
    returns how many were released.

    The FIFO cap bounds the leak, but bounded is not free: stale
    cached tables from completed queries keep occupying executor
    storage memory (the unified memory manager protects cached blocks
    down to spark.memory.storageFraction, so concurrent execution
    spills instead of evicting them) — measured r15: with 4 stale
    entries live, unrelated queries ran 3-5x slower and recovered the
    moment the entries were dropped. Call this at natural QUERY
    BOUNDARIES (a new top-level query can never reuse a previous
    query's intra-query caches — every plan is rebuilt from the
    files): the entry registry wraps every declared query with it.
    Lazy results returned by earlier operator calls stay CORRECT
    afterwards — they simply recompute when re-executed."""
    with _SCOPED_PERSISTS_LOCK:
        drained, _SCOPED_PERSISTS[:] = _SCOPED_PERSISTS[:], []
    n = 0
    for old in drained:
        try:
            old.unpersist()
            n += 1
        except Exception:
            pass
    return n


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    register_views: bool = True,
    rebalance: bool = True,
) -> dict[str, DataFrame]:
    """Load the driver's parquet tables from ``sf_dir``; optionally
    register them as temp views so ``spark.sql`` works on them.
    """
    # Defensive: callers may pass a session built elsewhere (the
    # driver's) without our builder conf; nanos parquet reads fail
    # without this and it is runtime-settable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if rebalance and name in REBALANCE_KEYS:
            df = rebalance_small_input(df, key=REBALANCE_KEYS[name])
        if name == "events":
            # Normalize the TIMESTAMP(NANOS) column to a microsecond
            # TIMESTAMP (ltz) whose epoch equals the file's wall-clock
            # value, independent of Spark version and session timezone:
            # - pyspark ≤4.0 + nanosAsLong: read as raw nanos BIGINT
            # - pyspark ≥4.1: read natively as TIMESTAMP_NTZ (micros)
            # DuckDB keeps ns precision, so oracle-checked queries must
            # not emit raw ts values — emit date_trunc'ed buckets or
            # epoch seconds instead.
            from pyspark.sql import functions as F

            ts_t = dict(df.dtypes).get("ts")
            if ts_t == "bigint":
                df = df.withColumn(
                    "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
                )
            elif ts_t == "timestamp_ntz":
                # Interpret the naive wall time AS UTC so the epoch
                # matches the bigint path REGARDLESS of session
                # timezone: rebuild the epoch from tz-free wall-clock
                # components (unix_date + hour/minute + fractional
                # SECOND). No NTZ→LTZ coercion is involved anywhere,
                # so there is no session-tz dependence and no DST-gap
                # edge (a from_utc_timestamp round trip shifts by an
                # hour for wall times inside the session timezone's
                # DST transitions; this construct is verified
                # identical across UTC/LA/Tokyo sessions including
                # the 2026-03-08 02:30 nonexistent-time case).
                ts = F.col("ts")
                us = (
                    F.unix_date(ts.cast("date")).cast("long")
                    * 86_400_000_000
                    + F.hour(ts).cast("long") * 3_600_000_000
                    + F.minute(ts).cast("long") * 60_000_000
                    + (F.date_part(F.lit("SECOND"), ts) * 1_000_000)
                    .cast("long")
                )
                df = df.withColumn("ts", F.timestamp_micros(us))
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def union_tables(spark: SparkSession, pattern: str) -> DataFrame:
    """UNION ALL view over catalog tables matching a glob pattern
    (≙ E8 multi-index queries like `re_laion2b-en-*`,
    wimbd/es/README.md). Schemas are aligned by name (missing columns
    null-filled) so heterogeneous shards union cleanly."""
    import fnmatch

    names = [
        t.name
        for t in spark.catalog.listTables()
        if fnmatch.fnmatch(t.name, pattern)
    ]
    if not names:
        raise ValueError(f"no tables match {pattern!r}")
    dfs = [spark.table(n) for n in names]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def table_summary(spark: SparkSession) -> list[dict]:
    """List catalog tables with row counts + schemas.

    Parity: wimbd/es/__init__.py:55-86 (`get_indices`).
    """
    rows = []
    for t in spark.catalog.listTables():
        df = spark.table(t.name)
        rows.append(
            {
                "name": t.name,
                "count": df.count(),
                "columns": {f.name: f.dataType.simpleString() for f in df.schema},
            }
        )
    return rows
