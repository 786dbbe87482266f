"""Byte-level BPE from local assets (P13) — no `tokenizers` package."""

import json

import pytest
from pyspark.sql import functions as F

from wimbd_spark.functions.bpe import (
    bpe_tokenize,
    load_bpe_assets,
    make_encoder,
)


@pytest.fixture
def tok_dir(tmp_path):
    """Tiny GPT-2-style asset pair: merges build "hello" and "Ġhello"
    ("Ġ" is byte-level BPE's marker for a leading space)."""
    merges = [
        "#version: 0.2",
        "h e",
        "he l",
        "hel l",
        "hell o",
        "Ġ hello",
    ]
    vocab = {
        "hello": 1, "Ġhello": 2, "hel": 3, "d": 4, "!": 5, "Ġ": 6,
        "h": 7, "e": 8, "l": 9, "o": 10,
    }
    (tmp_path / "merges.txt").write_text("\n".join(merges), encoding="utf-8")
    (tmp_path / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    return str(tmp_path)


def test_encoder_merges_and_ids(tok_dir):
    encode = make_encoder(*load_bpe_assets(tok_dir))
    toks, ids = encode("hello hello!")
    assert toks == ["hello", "Ġhello", "!"]
    assert ids == [1, 2, 5]
    # partial merge path: "held" → hel + d (no "hel d" merge rule)
    toks, ids = encode("held")
    assert toks == ["hel", "d"]
    assert ids == [3, 4]


def test_bpe_tokenize_column(spark, tok_dir):
    df = spark.createDataFrame(
        [("hello hello",), (None,), ("",)], ["text"]
    )
    out = df.select(
        bpe_tokenize(F.col("text"), tok_dir).alias("toks"),
        bpe_tokenize(F.col("text"), tok_dir, emit="ids").alias("ids"),
    ).collect()
    assert out[0]["toks"] == ["hello", "Ġhello"]
    assert out[0]["ids"] == [1, 2]
    assert out[1]["toks"] == [] and out[2]["ids"] == []


def test_hf_tokenize_local_dir_ungated(spark, tok_dir):
    """P13's operator entrypoint runs for real with local assets."""
    from wimbd_spark.operators.models import hf_tokenize

    df = spark.createDataFrame([("hello",)], ["text"])
    assert df.select(
        hf_tokenize(F.col("text"), tok_dir).alias("t")
    ).collect()[0]["t"] == ["hello"]


def test_tokenizer_json_assets(spark, tmp_path):
    """HF single-file tokenizer.json layout (merges as pair lists)."""
    blob = {
        "model": {
            "vocab": {"a": 0, "b": 1, "ab": 2},
            "merges": [["a", "b"]],
        }
    }
    (tmp_path / "tokenizer.json").write_text(json.dumps(blob))
    encode = make_encoder(*load_bpe_assets(str(tmp_path)))
    toks, ids = encode("ab")
    assert toks == ["ab"] and ids == [2]


def test_missing_assets_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_bpe_assets(str(tmp_path))
