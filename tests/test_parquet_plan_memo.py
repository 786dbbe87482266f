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


def test_grandchild_mutation_invalidates(spark, tmp_path):
    # same-epoch rewrite INSIDE a partition dir: the root's direct
    # children keep their (name, mtime, size) while a grandchild
    # part file changes — the r15 stamp missed this (ADVICE r15)
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("a", 1), ("b", 2)], schema="doc_id string, n int"
    ).write.mode("overwrite").partitionBy("n").parquet(path)
    df1 = parquet_plan(spark, path)
    assert df1 is parquet_plan(spark, path)  # memo hit while unchanged
    part_dir = os.path.join(path, "n=1")
    grand = [
        f for f in os.listdir(part_dir) if f.endswith(".parquet")
    ][0]
    full = os.path.join(part_dir, grand)
    os.utime(full, ns=(os.stat(full).st_mtime_ns + 10**9,) * 2)
    os.utime(part_dir, ns=(os.stat(part_dir).st_mtime_ns,) * 2)
    os.utime(path, ns=(os.stat(path).st_mtime_ns,) * 2)
    assert parquet_plan(spark, path) is not df1


def test_deep_partition_tree_not_memoized(spark, tmp_path):
    # stamps are bounded at two levels: a dir-of-dirs-of-dirs layout
    # reads fresh every call instead of trusting an unprovable stamp
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("a", 1, 2)], schema="doc_id string, n int, m int"
    ).write.mode("overwrite").partitionBy("n", "m").parquet(path)
    app = spark.sparkContext.applicationId
    df1 = parquet_plan(spark, path)
    assert (app, path) not in _PARQUET_PLAN_MEMO
    assert parquet_plan(spark, path) is not df1


def test_phrase_index_memo_invalidates_on_rebuild(spark, tmp_path):
    """VERDICT r15 item 7: the entry-level `_phrase_index` must serve
    a FRESH plan after an in-process index rebuild (it delegates to
    parquet_plan's stamped memo; the r15 form kept a second stampless
    memo layer that could reference dead part files)."""
    import __spark_entry__ as entrymod

    sf_dir = str(tmp_path / "sfx")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")],
        ["doc_id", "text"],
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    idx1 = entrymod._phrase_index(spark, sf_dir)
    assert idx1 is entrymod._phrase_index(spark, sf_dir)  # memo hit
    # in-process rebuild (same path): e.g. the corpus was re-indexed
    path = entrymod._index_path(sf_dir, "phrase")
    from wimbd_spark.index import build_phrase_index

    build_phrase_index(
        spark.createDataFrame([(9, "zeta eta")], ["doc_id", "text"]),
        path,
    )
    idx2 = entrymod._phrase_index(spark, sf_dir)
    assert idx2 is not idx1
    toks = {r["token"] for r in idx2.select("token").collect()}
    assert "zeta" in toks and "alpha" not in toks
