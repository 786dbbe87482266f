#!/usr/bin/env python
"""Build a local sf1 rehearsal dataset (10× sf0.1) at /tmp/sf1.

Purpose: catch nonlinearities the sf0.1 bench can't (candidate-pair
growth in near-dup joins, LSH bucket skew, session-window state) by
running bench.py once at 10× volume:

    python tools/make_sf1.py
    SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py

Construction: fact tables are 10 key-shifted copies of sf0.1 (offset
1e9·copy); dimension tables stay as-is (facts grow, dims stable — the
realistic shape). Two copies must not introduce artificial cross-copy
duplicate structure that would change the WORKLOAD's complexity class
rather than its volume, so:
- documents: every TOKEN in copy i>0 gets suffix i — shingle spaces
  are fully disjoint across copies, so exact/near-dup structure is
  preserved within a copy and never leaks across (a mere text prefix
  is NOT enough: the shared tail shingles multiply every shingle's
  document frequency by the copy count, inflating inverted-index
  candidate volume ×copies² — measured 13.9× runtime at 10× data
  before this fix, the boilerplate hazard max_shingle_freq guards).
  Phrase-count queries consequently only match copy 0 — their scan
  volume still grows 10×, which is what the rehearsal measures;
- embeddings: each copy's vector is circularly rotated by copy index —
  within-copy cosine structure is exactly preserved (rotation is an
  orthogonal transform applied to both sides), cross-copy similarities
  decorrelate;
- events: user_id/event_id shift — per-user session structure is
  identical per copy (10× users, same sessions each).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SF1_DIR", "/tmp/sf1")
COPIES = 10
OFF = 1_000_000_000

DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    from pyspark.sql import functions as F

    from wimbd_spark.session import get_spark

    spark = get_spark(app_name="make-sf1")
    os.makedirs(DST, exist_ok=True)

    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")
        print(f"copied dim {t}")

    def replicate(name: str, shift_cols: list[str], extra=None):
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(COPIES):
            df = base
            for c in shift_cols:
                df = df.withColumn(c, F.col(c) + F.lit(i * OFF))
            if extra is not None:
                df = extra(df, i)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )
        print(f"replicated {name} ×{COPIES}")

    replicate("orders", ["o_orderkey"])
    replicate("lineitem", ["l_orderkey"])
    replicate("events", ["event_id", "user_id"])
    replicate(
        "documents",
        ["doc_id"],
        extra=lambda df, i: (
            df
            if i == 0
            else df.withColumn(
                "text",
                F.regexp_replace(F.col("text"), r"(\S+)", "$1" + str(i)),
            )
        ),
    )

    dim = len(
        spark.read.parquet(f"{SRC}/embeddings.parquet")
        .select("embedding")
        .head()[0]
    )
    replicate(
        "embeddings",
        ["vec_id"],
        extra=lambda df, i: df.withColumn(
            "embedding",
            F.concat(
                F.slice("embedding", (i % dim) + 1, dim - (i % dim)),
                F.slice("embedding", 1, i % dim),
            )
            if i
            else F.col("embedding"),
        ),
    )
    spark.stop()
    print(f"done → {DST}")


# --- production-dim ANN rehearsal data (r13 VERDICT item 4) --------
HD_DIM = int(os.environ.get("SF1_HD_DIM", "256"))
HD_ROWS = int(os.environ.get("SF1_HD_ROWS", "200000"))
HD_CLUSTERS = 64


def make_hd_embeddings() -> None:
    """Write ``embeddings_hd.parquet``: HD_ROWS vectors at HD_DIM dims
    (default 200k × 256) with real cluster structure — the shape the
    PQ story's crossover claim needs (SCALE.md r13: at 64 dims exact
    beats PQ; codes-only reads should win when uvec IO is 8·dim
    bytes/row). Deterministic (fixed seed), cluster = centroid +
    Gaussian noise, labels kept so filtered-ANN queries work. Pure
    driver-side numpy (≈200 MB), written via one createDataFrame of
    arrow batches per chunk to keep peak memory flat."""
    import numpy as np
    import pandas as pd

    from wimbd_spark.session import get_spark

    spark = get_spark(app_name="make-sf1-hd")
    rng = np.random.default_rng(20260816)
    cents = rng.standard_normal((HD_CLUSTERS, HD_DIM)).astype(np.float32)
    out = f"{DST}/embeddings_hd.parquet"
    os.makedirs(DST, exist_ok=True)
    chunk = 20000
    mode = "overwrite"
    for lo in range(0, HD_ROWS, chunk):
        n = min(chunk, HD_ROWS - lo)
        labels = rng.integers(0, HD_CLUSTERS, size=n)
        vecs = cents[labels] + 0.35 * rng.standard_normal(
            (n, HD_DIM)
        ).astype(np.float32)
        pdf = pd.DataFrame(
            {
                "vec_id": np.arange(lo, lo + n, dtype=np.int64),
                "embedding": list(vecs),
                "label": labels.astype(np.int32),
            }
        )
        spark.createDataFrame(pdf).repartition(8).write.mode(
            mode
        ).parquet(out)
        mode = "append"
        print(f"hd embeddings: {lo + n}/{HD_ROWS}")
    spark.stop()
    print(f"done → {out} ({HD_ROWS} × {HD_DIM})")


if __name__ == "__main__":
    if "--hd" in sys.argv:
        make_hd_embeddings()
    else:
        main()
