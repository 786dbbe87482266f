"""Sequence packing: contiguous-fill pack assignment invariants."""

from pyspark.sql import functions as F

from wimbd_spark.operators.packing import pack_documents, pack_stats


def _packed(spark, counts, budget):
    rows = [
        (i, " ".join(["w"] * c), "s0") for i, c in enumerate(counts)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    return pack_documents(df, budget_tokens=budget)


def test_contiguous_fill_assignment(spark):
    # budget 10, counts 4,4,4,4 → token starts 0,4,8,12 → packs 0,0,0,1
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_pos"])
        for r in _packed(spark, [4, 4, 4, 4], 10).collect()
    }
    assert got == {0: (0, 0), 1: (0, 1), 2: (0, 2), 3: (1, 0)}


def test_oversized_doc_gets_own_pack_start(spark):
    # 15-token doc exceeds budget 10: starts at 0 (pack 0); next doc
    # starts at token 15 → pack 1
    got = {
        r["doc_id"]: r["pack_id"]
        for r in _packed(spark, [15, 2], 10).collect()
    }
    assert got == {0: 0, 1: 1}


def test_groups_pack_independently(spark):
    rows = [
        (1, "a b c", "s0"),
        (2, "d e f", "s1"),  # different group → its own pack 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        (r["source"], r["pack_id"])
        for r in pack_documents(df, budget_tokens=100).collect()
    }
    assert got == {("s0", 0), ("s1", 0)}


def test_pack_stats_conserves_tokens(spark, documents):
    docs = documents.filter(F.col("text").isNotNull())
    packed = pack_documents(docs, budget_tokens=512)
    stats = pack_stats(packed)
    total = stats.agg(F.sum("total_tokens")).collect()[0][0]
    direct = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert total == direct
    # no pack except a group's last may end below the budget unless it
    # contains a straddling doc; weak invariant: every pack with a
    # successor pack in its group reaches the budget OR ends with a doc
    # that straddles the boundary
    joined = (
        stats.alias("s")
        .join(
            stats.select(
                "source", (F.col("pack_id") - 1).alias("pack_id")
            ).alias("nxt"),
            ["source", "pack_id"],
            "left_semi",
        )
    )
    short = joined.filter(F.col("total_tokens") < 512).count()
    # straddlers make short packs legitimate; just require MOST packs full
    assert short <= stats.count() * 0.5


def test_custom_token_column(spark):
    rows = [(1, "ignored", "s0", 7), (2, "ignored", "s0", 5)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source", "bpe"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["pack_id"])
        for r in pack_documents(
            df, budget_tokens=8, n_tokens=F.col("bpe")
        ).collect()
    }
    assert got == {1: (7, 0), 2: (5, 0)}  # starts 0 and 7 → both pack 0


def test_packed_sequences_order_and_content(spark):
    from wimbd_spark.operators.packing import packed_sequences

    rows = [
        (3, "third", "s0"),
        (1, "first first", "s0"),
        (2, "second", "s0"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    packed = pack_documents(df, budget_tokens=100)
    out = packed_sequences(packed, sep=" | ").collect()
    assert len(out) == 1
    r = out[0]
    # concatenation follows doc_id (packing) order, not arrival order
    assert r["text"] == "first first | second | third"
    assert r["n_docs"] == 3 and r["n_tokens"] == 4


def test_packed_sequences_against_duckdb(spark, documents):
    import duckdb

    from pyspark.sql import functions as F

    from wimbd_spark.operators.packing import packed_sequences

    docs = documents.filter(F.col("text").isNotNull())
    packed = pack_documents(docs, budget_tokens=512)
    got = {
        (r["source"], r["pack_id"]): r["text"]
        for r in packed_sequences(packed).collect()
    }
    pdf = packed.select("source", "pack_id", "pack_pos", "text").toPandas()
    con = duckdb.connect()
    con.register("p", pdf)
    expect = {
        (r[0], r[1]): r[2]
        for r in con.sql(
            "SELECT source, pack_id, "
            "string_agg(text, chr(10)||chr(10) ORDER BY pack_pos) "
            "FROM p GROUP BY source, pack_id"
        ).fetchall()
    }
    assert got == expect


def test_tied_order_values_pack_correctly(spark):
    # RANGE-frame regression: ordering by a tied column must not sum
    # peer rows into each doc's cumulative total (ROWS frame + id
    # tie-break). Three 5-token docs tied on ts, budget 10 → first two
    # fill pack 0, third starts pack 1.
    rows = [
        (1, "a a a a a", "s0", 100),
        (2, "b b b b b", "s0", 100),
        (3, "c c c c c", "s0", 100),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source", "ts"])
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_pos"])
        for r in pack_documents(
            df, budget_tokens=10, order_col="ts"
        ).collect()
    }
    assert got == {1: (0, 0), 2: (0, 1), 3: (1, 0)}


def test_order_col_without_doc_id_column(spark):
    # order_col-only DataFrames (no doc_id) must keep working
    rows = [("a a a", "s0", 2), ("b b b", "s0", 1)]
    df = spark.createDataFrame(rows, ["text", "source", "seq"])
    got = [
        (r["seq"], r["pack_pos"])
        for r in pack_documents(df, budget_tokens=10, order_col="seq")
        .orderBy("seq")
        .collect()
    ]
    assert got == [(1, 0), (2, 1)]  # ordered by seq, one pack


def test_null_text_counts_zero_tokens(spark):
    rows = [(1, None, "s0"), (2, "a b c", "s0")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["pack_id"])
        for r in pack_documents(df, budget_tokens=10).collect()
    }
    assert got == {1: (0, 0), 2: (3, 0)}
