"""parquet_plan (session.py): memoizes the UNEXECUTED plan per
(applicationId, path) with a freshness stamp — never results. A
rewrite of the path must invalidate (actions always reflect the files
on disk), and the memo must hold at most one entry per path."""

import os

from wimbd_spark.session import _PARQUET_PLAN_MEMO, parquet_plan


def _write(spark, path, rows):
    spark.createDataFrame(rows, schema="doc_id string, n int").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def test_memo_hit_same_plan_object(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    _write(spark, path, [("a", 1), ("b", 2)])
    df1 = parquet_plan(spark, path)
    df2 = parquet_plan(spark, path)
    assert df1 is df2
    assert sorted(r.doc_id for r in df2.collect()) == ["a", "b"]


def test_rewrite_invalidates_and_reads_new_data(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    _write(spark, path, [("a", 1)])
    df1 = parquet_plan(spark, path)
    assert [r.doc_id for r in df1.collect()] == ["a"]
    _write(spark, path, [("x", 9), ("y", 8), ("z", 7)])
    df2 = parquet_plan(spark, path)
    assert df2 is not df1
    assert sorted(r.doc_id for r in df2.collect()) == ["x", "y", "z"]


def test_memo_holds_one_entry_per_path(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    app = spark.sparkContext.applicationId
    for i in range(3):
        _write(spark, path, [(f"v{i}", i)])
        parquet_plan(spark, path)
    keys = [k for k in _PARQUET_PLAN_MEMO if k == (app, path)]
    assert len(keys) == 1


def test_missing_path_not_memoized(spark, tmp_path):
    path = str(tmp_path / "nope.parquet")
    app = spark.sparkContext.applicationId
    try:
        parquet_plan(spark, path)
    except Exception:
        pass
    assert (app, path) not in _PARQUET_PLAN_MEMO
    # and the path becoming available later is picked up
    _write(spark, path, [("late", 1)])
    assert [r.doc_id for r in parquet_plan(spark, path).collect()] == [
        "late"
    ]


def test_subdir_child_mutation_invalidates(spark, tmp_path):
    # partition-dir append pattern: only a CHILD of the root changes
    path = str(tmp_path / "t.parquet")
    _write(spark, path, [("a", 1)])
    df1 = parquet_plan(spark, path)
    part = [
        f for f in os.listdir(path) if f.endswith(".parquet")
    ][0]
    full = os.path.join(path, part)
    os.utime(full, ns=(os.stat(full).st_mtime_ns + 10**9,) * 2)
    df2 = parquet_plan(spark, path)
    assert df2 is not df1
