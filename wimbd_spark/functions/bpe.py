"""Byte-level BPE tokenization from local tokenizer assets (P13).

Parity: the reference tokenizes with pretrained HF tokenizers
(wimbd/es/decontamination.py and url_per_tok_counts use `tokenizers`).
That package isn't in this container, so this module implements the
GPT-2 byte-level BPE algorithm (Radford et al. 2019; the openly
published `encoder.py` algorithm) in pure Python against the standard
asset pair every HF BPE tokenizer ships: ``vocab.json`` (token → id)
and ``merges.txt`` (ranked merge pairs).

Execution shape: assets are parsed ONCE on the driver and closed over
by an Arrow-batched pandas_udf — each executor gets the ranks/vocab via
task serialization (a few MB), no executor-side file access needed, no
per-row Python beyond the UDF batch loop. Divergence from the exact
GPT-2 pre-tokenizer: Python `re` lacks \\p classes, so letters/digits
use the equivalent `[^\\W\\d_]` / `\\d` unicode classes; contractions
and whitespace handling match.
"""

from __future__ import annotations

import json
import os
import re
from functools import lru_cache
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

# GPT-2 contractions, space-prefixed letter/digit/punct runs, then
# whitespace (keeping the final space attached to the next token).
_PRETOK = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+"
)


@lru_cache(maxsize=1)
def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte → printable-unicode map."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def load_bpe_assets(path: str) -> tuple[dict, dict]:
    """Parse (merge ranks, vocab) from a tokenizer directory holding
    ``merges.txt`` + ``vocab.json``, or from an HF ``tokenizer.json``."""
    tok_json = os.path.join(path, "tokenizer.json")
    merges_txt = os.path.join(path, "merges.txt")
    vocab_json = os.path.join(path, "vocab.json")
    if os.path.exists(merges_txt):
        with open(merges_txt, encoding="utf-8") as f:
            lines = [
                ln.rstrip("\n")
                for ln in f
                if ln.strip() and not ln.startswith("#version")
            ]
        ranks = {tuple(ln.split()): i for i, ln in enumerate(lines)}
        vocab = {}
        if os.path.exists(vocab_json):
            with open(vocab_json, encoding="utf-8") as f:
                vocab = json.load(f)
        return ranks, vocab
    if os.path.exists(tok_json):
        with open(tok_json, encoding="utf-8") as f:
            model = json.load(f)["model"]
        merges = model["merges"]
        ranks = {
            tuple(m.split() if isinstance(m, str) else m): i
            for i, m in enumerate(merges)
        }
        return ranks, model.get("vocab", {})
    raise FileNotFoundError(
        f"no merges.txt or tokenizer.json under {path!r}"
    )


def _bpe_word(word: tuple[str, ...], ranks: dict) -> list[str]:
    parts = list(word)
    while len(parts) > 1:
        best, best_rank = None, None
        for pair in zip(parts, parts[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = pair, r
        if best is None:
            break
        merged, i = [], 0
        while i < len(parts):
            if (
                i < len(parts) - 1
                and (parts[i], parts[i + 1]) == best
            ):
                merged.append(parts[i] + parts[i + 1])
                i += 2
            else:
                merged.append(parts[i])
                i += 1
        parts = merged
    return parts


def make_encoder(ranks: dict, vocab: dict):
    """Return encode(text) -> (tokens, ids); ids None-pad when the
    vocab lacks a token (tiny fixture vocabs)."""
    b2u = _bytes_to_unicode()
    cache: dict[str, list[str]] = {}

    def encode(text: str) -> tuple[list[str], list[int | None]]:
        tokens: list[str] = []
        for m in _PRETOK.finditer(text):
            piece = m.group()
            mapped = "".join(b2u[b] for b in piece.encode("utf-8"))
            out = cache.get(mapped)
            if out is None:
                out = _bpe_word(tuple(mapped), ranks)
                cache[mapped] = out
            tokens.extend(out)
        return tokens, [vocab.get(t) for t in tokens]

    return encode


def bpe_tokenize(
    text: Column, tokenizer_path: str, emit: str = "tokens"
) -> Column:
    """Column of BPE ``tokens`` (array<string>) or ``ids``
    (array<bigint>) from local tokenizer assets."""
    ranks, vocab = load_bpe_assets(tokenizer_path)
    return bpe_tokenize_with(text, ranks, vocab, emit=emit)


def bpe_tokenize_with(
    text: Column, ranks: dict, vocab: dict, emit: str = "tokens"
) -> Column:
    """`bpe_tokenize` over in-memory (ranks, vocab) — the shape
    `bpe_train.train_bpe` returns — skipping the asset files (train →
    tokenize in one session). The tables travel in the UDF closure
    (broadcast once per executor, the model-UDF convention)."""
    want_ids = emit == "ids"

    @pandas_udf("array<bigint>" if want_ids else "array<string>")
    def _tok(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        encode = make_encoder(ranks, vocab)

        def one(t):
            if not t:
                return []
            toks, ids = encode(t)
            return ids if want_ids else toks

        for s in it:
            yield s.map(one)

    return _tok(text)


def bpe_detokenize(tokens: Column) -> Column:
    """Inverse of ``bpe_tokenize(emit='tokens')``: concatenate the
    token strings, invert the byte→unicode map, decode UTF-8. For any
    token sequence a byte-level BPE produced from valid UTF-8 this is
    a BYTE-EXACT round-trip (the GPT-2 losslessness property — every
    input byte maps to exactly one printable unicode char and merges
    only concatenate), so decode(encode(text)) == text identically.
    NULL stays NULL; an empty array decodes to the empty string."""
    u2b = {u: b for b, u in _bytes_to_unicode().items()}

    @pandas_udf("string")
    def _detok(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        def one(toks):
            if toks is None:
                return None
            joined = "".join(toks)
            return bytes(u2b[ch] for ch in joined).decode(
                "utf-8", errors="strict"
            )

        for s in it:
            yield s.map(one)

    return _detok(tokens)
