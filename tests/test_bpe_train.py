"""Distributed BPE training (functions/bpe_train.py)."""

import pytest
from pyspark.sql import functions as F

from wimbd_spark.functions.bpe import (
    _PRETOK,
    _bytes_to_unicode,
    load_bpe_assets,
    make_encoder,
)
from wimbd_spark.functions.bpe_train import (
    _merge_word,
    save_bpe_assets,
    train_bpe,
    word_counts,
)


def _naive_train(texts, vocab_size, min_frequency=2):
    """O(V * merges) reference trainer — same determinism contract."""
    b2u = _bytes_to_unicode()
    wc = {}
    for t in texts:
        for w in _PRETOK.findall(t):
            mapped = "".join(b2u[b] for b in w.encode("utf-8"))
            wc[mapped] = wc.get(mapped, 0) + 1
    words = {
        tuple(w): c for w, c in wc.items() if c >= min_frequency
    }
    alphabet = sorted({s for w in words for s in w})
    vocab = {s: i for i, s in enumerate(alphabet)}
    ranks = {}
    while len(vocab) < vocab_size:
        pc = {}
        for syms, c in words.items():
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < min_frequency:
            break
        words = {
            _merge_word(syms, *best): c for syms, c in words.items()
        }
        ranks[best] = len(ranks)
        vocab[best[0] + best[1]] = len(vocab)
    return ranks, vocab


TEXTS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "low lower lowest",
    "low lower newer newest",
    "the the the",
] * 3


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )


def test_merge_word_overlap():
    assert _merge_word(("a", "a", "a"), "a", "a") == ("aa", "a")
    assert _merge_word(("a", "b", "a", "b"), "a", "b") == ("ab", "ab")
    assert _merge_word(("x",), "a", "b") == ("x",)


def test_word_counts_min_frequency_and_cap(spark):
    df = _df(spark)
    rows = {r.word: r["count"] for r in word_counts(df, min_frequency=3).collect()}
    b2u = _bytes_to_unicode()
    the = "".join(b2u[b] for b in b"the")
    sp_the = "".join(b2u[b] for b in b" the")
    assert rows.get(the, 0) + rows.get(sp_the, 0) >= 15
    capped = word_counts(df, min_frequency=1, max_words=3).collect()
    assert len(capped) == 3
    # cap keeps the most frequent
    assert min(r["count"] for r in capped) >= 3


def test_train_matches_naive_reference(spark):
    ranks, vocab = train_bpe(
        _df(spark), vocab_size=40, min_frequency=2, max_words=None
    )
    ref_ranks, ref_vocab = _naive_train(TEXTS, 40, 2)
    assert ranks == ref_ranks
    assert vocab == ref_vocab
    assert len(vocab) <= 40


def test_train_deterministic_across_partitioning(spark):
    df = _df(spark)
    a = train_bpe(df.repartition(1), vocab_size=40, min_frequency=2)
    b = train_bpe(df.repartition(13), vocab_size=40, min_frequency=2)
    assert a == b


def test_trained_assets_roundtrip_and_encode(spark, tmp_path):
    ranks, vocab = train_bpe(_df(spark), vocab_size=60, min_frequency=2)
    save_bpe_assets(str(tmp_path), ranks, vocab)
    r2, v2 = load_bpe_assets(str(tmp_path))
    assert r2 == ranks
    assert v2 == vocab
    toks, ids = make_encoder(ranks, vocab)("the cat sat")
    # reversible byte-level: concatenating tokens reproduces the text
    b2u = _bytes_to_unicode()
    u2b = {v: k for k, v in b2u.items()}
    assert bytes(u2b[c] for c in "".join(toks)).decode() == "the cat sat"
    assert all(i is not None for i in ids)
    # merged multi-byte tokens actually formed
    assert any(len(t) > 1 for t in toks)


def test_train_empty_and_tiny(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    ranks, vocab = train_bpe(empty, vocab_size=10)
    assert ranks == {} and vocab == {}
    # "ab ab ab" -> words ["ab", " ab", " ab"]; only " ab" (count 2)
    # survives min_frequency=2, and its (a,b) pair merges first
    one = spark.createDataFrame([(0, "ab ab ab")], ["doc_id", "text"])
    ranks, vocab = train_bpe(one, vocab_size=10, min_frequency=2)
    assert ("a", "b") in ranks


def test_train_on_corpus_sample(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(100)
    ranks, vocab = train_bpe(docs, vocab_size=300, min_frequency=2)
    assert 256 >= len(vocab) - len(ranks) > 0  # base alphabet sane
    assert len(ranks) > 0
    toks, _ = make_encoder(ranks, vocab)("the quick brown fox")
    assert toks


def test_distributed_roundtrip_column(spark):
    """bpe_tokenize_with ∘ bpe_detokenize is byte-exact over a
    DataFrame — unicode, emoji, empty, and None texts included."""
    from wimbd_spark.functions.bpe import bpe_detokenize, bpe_tokenize_with

    texts = [
        (0, "the cat sat on the mat"),
        (1, "naïve café — résumé 🚀 日本語"),
        (2, ""),
        (3, None),
        (4, "  leading and   irregular\tspacing\n"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    ranks, vocab = train_bpe(_df(spark), vocab_size=60, min_frequency=2)
    toks = bpe_tokenize_with(F.col("text"), ranks, vocab)
    got = (
        df.select(
            "doc_id",
            F.when(F.col("text").isNull(), F.lit(None).cast("string"))
            .otherwise(bpe_detokenize(toks))
            .alias("rt"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.doc_id, r.rt) for r in got] == texts


def test_tokenize_with_ids_match_asset_path(spark, tmp_path):
    """bpe_tokenize_with (in-memory model) emits the same ids as the
    asset-file path bpe_tokenize reads back from disk."""
    from wimbd_spark.functions.bpe import bpe_tokenize, bpe_tokenize_with

    ranks, vocab = train_bpe(_df(spark), vocab_size=60, min_frequency=2)
    save_bpe_assets(str(tmp_path), ranks, vocab)
    df = _df(spark)
    a = df.select(
        "doc_id", bpe_tokenize_with(F.col("text"), ranks, vocab, emit="ids")
        .alias("ids")
    ).orderBy("doc_id").collect()
    b = df.select(
        "doc_id", bpe_tokenize(F.col("text"), str(tmp_path), emit="ids")
        .alias("ids")
    ).orderBy("doc_id").collect()
    assert [(r.doc_id, r.ids) for r in a] == [(r.doc_id, r.ids) for r in b]
