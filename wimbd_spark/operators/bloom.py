"""Bloom-filter decontamination gate — zero-shuffle membership filter.

Scale rationale (the 100 TB posture): the exact n-gram decontaminate
(dedup.decontaminate_by_ngrams, reference semantics wimbd/es usage of
eval-set overlap) broadcasts the distinct eval grams and pays one
id-probe anti-join. When the eval battery grows to hundreds of
millions of grams, broadcasting the strings themselves stops fitting;
a Bloom filter compresses the broadcast to a FIXED m-bit bitmap at the
cost of a bounded, deterministic false-positive rate (docs wrongly
dropped — always conservative for decontamination: nothing
contaminated is ever kept). The train side becomes a PURE MAP filter:
no join, no shuffle, no driver collect of corpus data.

Determinism contract: the k hash probes are hash32 (md5-slice) with
integer salts, so the full filter — bit positions, membership, kept
set — is reproducible in ANSI SQL and oracle-gated bit-for-bit,
INCLUDING its false positives (same pattern as the deterministic
PQ/IVF approximations: gate the approximate semantics exactly).

Sizing: false-positive rate ~= (1 - e^(-k*n/m))^k for n distinct eval
grams. The bitmap build collects at most min(k*n, m) distinct bit
positions to the driver — bounded by m bits regardless of corpus or
eval size (m defaults to 2^16 for tests; size m ~= 10-15 bits/gram at
production n).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wimbd_spark.functions.text import hash32, ngram_strings, tokenize


def _positions(gram: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """The k salted-hash bit positions of one gram (each in [0, m))."""
    return [
        F.pmod(hash32(gram, salt=str(i)), F.lit(m_bits))
        for i in range(n_hashes)
    ]


def bloom_build(
    grams: DataFrame,
    col: str = "phrase",
    m_bits: int = 1 << 16,
    n_hashes: int = 2,
) -> bytes:
    """Build the bitmap from a grams DataFrame -> m/8 bytes (byte i
    holds bits [8i, 8i+8), LSB-first within each byte).

    Distributed hash + distinct; only the <= min(k*n, m_bits) distinct
    bit positions reach the driver.
    """
    if m_bits % 8 != 0:
        raise ValueError("m_bits must be a multiple of 8")
    g = F.col(col)
    pos_rows = (
        grams.where(g.isNotNull())
        .select(
            F.explode(F.array(*_positions(g, m_bits, n_hashes))).alias(
                "pos"
            )
        )
        .distinct()
        .collect()
    )
    bitmap = bytearray(m_bits // 8)
    for r in pos_rows:
        p = r.pos
        bitmap[p // 8] |= 1 << (p % 8)
    return bytes(bitmap)


def bloom_contains(
    gram: Column, bitmap: bytes, m_bits: int, n_hashes: int = 2
) -> Column:
    """JVM-side membership test: all k bits set in the literal bitmap.

    The bitmap rides the plan as ONE binary literal (m/8 bytes — a
    single Catalyst node; an array<bigint> literal of the same bitmap
    costs seconds of py4j transfer/analysis at m=2^20). Each probe is
    substr -> hex -> conv to read one byte, then a variable-shift bit
    test — no Python, no join.
    """
    blit = F.lit(bytearray(bitmap))
    checks = []
    for p in _positions(gram, m_bits, n_hashes):
        byte = F.conv(
            F.hex(F.substring(blit, (F.floor(p / 8) + 1).cast("int"), 1)),
            16,
            10,
        ).cast("int")
        bit = F.call_function(
            "shiftright", byte, F.pmod(p, F.lit(8)).cast("int")
        ).bitwiseAND(F.lit(1))
        checks.append(bit == 1)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_decontaminate(
    train: DataFrame,
    eval_grams: DataFrame,
    gram_col: str = "phrase",
    text_col: str = "text",
    n: int = 4,
    m_bits: int = 1 << 16,
    n_hashes: int = 2,
) -> DataFrame:
    """Drop every train doc whose token stream contains any n-gram the
    Bloom filter reports as an eval gram (conservative: supersets the
    exact decontaminate drop set by the deterministic FP set).

    Train-side plan: map-only — tokenize, gram, F.exists membership
    over the literal bitmap. No shuffle, no broadcast join, nothing
    collected from the train corpus.
    """
    bitmap = bloom_build(
        eval_grams, col=gram_col, m_bits=m_bits, n_hashes=n_hashes
    )
    grams = ngram_strings(tokenize(F.col(text_col)), n)
    hit = F.exists(
        grams, lambda g: bloom_contains(g, bitmap, m_bits, n_hashes)
    )
    return train.where(~F.coalesce(hit, F.lit(False)))
