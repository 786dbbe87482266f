"""Column-level text/URL/hash functions — the engine's scalar surface.

Everything here is a pure ``Column`` expression (JVM-side, whole-stage
codegen) except ``tokenize_words``, which is a Pandas UDF for Unicode
word-boundary parity with the reference tokenizer (src/tokens.rs:8-17).

Reference parity map (file:line relative to /root/reference):
- tokenize            src/tokens.rs:8-17 (unicode words); wimbd/url_per_tok_counts/map_count.py:19-20
- ngrams              src/ngrams/mod.rs:46-112; src/cmd/topk.rs:218-236
- doc_hash (md5)      wimbd/text_and_url_overlaps/helper_scripts/get_text_hashes.py:11-17
- url_host            wimbd/url_counts/map_count.py:17-19
- url_scheme          wimbd/scheme_counts/map_count.py:17-19
- url_ext_bucket      wimbd/extension_counts/map_count.py:17-23
- year_of             wimbd/utterance_dates/map_count.py:8-24
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — needed at module scope for pandas_udf type hints

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokenize(text: Column | str) -> Column:
    """Canonical engine tokenizer: split on whitespace runs, drop empties.

    This is the fast JVM-side default; ``tokenize_words`` gives Unicode
    word-boundary behavior closer to src/tokens.rs:8-17. The reference
    itself ships three inconsistent tokenizers (unicode-segmentation,
    uniseg, nltk.wordpunct) — SURVEY.md §7.4(1) — so the engine picks
    one canonical fast path and documents the divergence.
    """
    c = _col(text)
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != F.lit(""))


def tokenize_words(text: Column | str) -> Column:
    """Unicode-ish word tokenizer (Pandas UDF, Arrow-batched).

    Approximates UAX-29 word boundaries the way src/tokens.rs:8-17 does:
    keeps "2.0", "RSS", "don't" as single tokens, drops pure whitespace
    and isolated punctuation. Slow path — prefer ``tokenize`` unless the
    workload needs word-boundary semantics.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _tok(s: pd.Series) -> pd.Series:
        import re

        pat = re.compile(r"\w+(?:[.'’\-/]\w+)*", re.UNICODE)
        return s.map(lambda t: pat.findall(t) if t is not None else None)

    return _tok(_col(text))


def ngrams(tokens: Column | str, n: int) -> Column:
    """Sliding n-token windows (full windows only) as array<array<string>>.

    Parity: src/ngrams/mod.rs:46-112 (step=1, only complete windows).
    Pure SQL — no UDF: sequence + transform + slice.
    """
    t = _col(tokens)
    empty = F.array().cast("array<array<string>>")
    windows = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
        lambda i: F.slice(t, i, n),
    )
    return F.when(F.size(t) >= n, windows).otherwise(empty)


def ngram_strings(tokens: Column | str, n: int, sep: str = " ") -> Column:
    """N-grams rendered as joined strings (the groupBy-friendly form).

    `topk` renders n-grams joined by spaces for output
    (src/cmd/topk.rs:303-309); grouping on a flat string also avoids
    array comparators in the shuffle.
    """
    t = _col(tokens)
    empty = F.array().cast("array<string>")
    windows = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(t, i, n), sep),
    )
    return F.when(F.size(t) >= n, windows).otherwise(empty)


def char_ngrams(text: Column | str, n: int) -> Column:
    """Character n-grams (src/ngrams/mod.rs:150-173 char case).

    Used as shingles for near-dup (MinHash/SimHash) too.
    """
    c = _col(text)
    empty = F.array().cast("array<string>")
    windows = F.transform(
        F.sequence(F.lit(1), F.length(c) - F.lit(n - 1)),
        lambda i: F.substring(c, i, n),
    )
    return F.when(F.length(c) >= n, windows).otherwise(empty)


def doc_hash(text: Column | str) -> Column:
    """MD5 hex digest of text; literal "None" for null text.

    Parity: helper_scripts/get_text_hashes.py:11-17 (including the
    stringified-None convention for missing text).
    """
    c = _col(text)
    return F.coalesce(F.md5(c), F.lit("None"))


def hash32(c: Column | str, salt: str | None = None) -> Column:
    """Portable deterministic 32-bit hash as BIGINT: first 8 hex chars
    of md5, parsed base-16. Chosen over xxhash64 because the DuckDB
    oracle can reproduce it exactly (('0x'||substr(md5(x),1,8))::BIGINT).
    """
    s = _col(c).cast("string")
    if salt is not None:
        s = F.concat(F.lit(salt), F.lit(":"), s)
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def hash64(c: Column | str) -> Column:
    """Fast non-portable 64-bit hash (xxhash64) for internal bucketing
    where no oracle needs to reproduce it."""
    return F.xxhash64(_col(c))


def url_host(url: Column | str) -> Column:
    """Host component of a URL (urlparse().netloc parity,
    wimbd/url_counts/map_count.py:17-19)."""
    return F.try_parse_url(_col(url), F.lit("HOST"))


def url_scheme(url: Column | str) -> Column:
    """Scheme component (wimbd/scheme_counts/map_count.py:17-19).

    Spark's parse_url has no PROTOCOL part; regexp is exact and stays
    codegen'd.
    """
    return F.regexp_extract(_col(url), r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1)


# Compact public-suffix subset (full PSL is ~9k entries; swap in the
# complete list as a broadcast table for production parity with
# tldextract). Multi-label suffixes must precede their single-label
# parents in match priority — handled by longest-match below.
PUBLIC_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com", "org", "net", "edu", "gov", "mil", "int",
    "io", "ai", "dev", "app", "uk", "de", "fr", "jp", "cn", "ru", "br",
    "in", "au", "ca", "us", "es", "it", "nl", "se", "no", "ch", "at",
]


def url_suffix(url: Column | str) -> Column:
    """Public-suffix (TLD+) of the URL host, longest match wins; empty
    host/no match → NULL.

    Parity: wimbd/high_level_domain_counts/map_count.py:17-21
    (tldextract.extract(url).suffix, empty dropped). Pure expression:
    candidate label-suffixes of the host intersected with the PSL
    subset, longest taken.
    """
    host = F.lower(F.try_parse_url(_col(url), F.lit("HOST")))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # last 1..3 labels joined back = candidate suffixes
    cands = F.array(
        *[
            F.when(n >= k, F.array_join(F.slice(labels, n - k + 1, k), "."))
            for k in (3, 2, 1)
        ]
    )
    matches = F.filter(
        cands, lambda c: c.isin(*[F.lit(s) for s in PUBLIC_SUFFIXES])
    )
    # F.get is null-safe out-of-bounds (element_at throws under ANSI)
    return F.get(
        F.sort_array(
            F.transform(matches, lambda m: F.struct(F.length(m).alias("l"), m.alias("s"))),
            asc=False,
        ),
        0,
    )["s"]


def url_ext_bucket(url: Column | str) -> Column:
    """File-extension bucket jpg/png/jpeg/other of the URL path
    (wimbd/extension_counts/map_count.py:17-23)."""
    path = F.try_parse_url(_col(url), F.lit("PATH"))
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))
    return F.when(ext.isin("jpg", "png", "jpeg"), ext).otherwise(F.lit("other"))


def year_of(*date_cols: Column | str) -> Column:
    """Year from the first parseable of several date-ish columns.

    Parity: wimbd/utterance_dates/map_count.py:8-24 (probes keys
    date/timestamp/created, dateutil-parses, falls back to the leading
    4-digit fast path).
    """
    cands = [F.year(F.to_timestamp(_col(c).cast("string"))) for c in date_cols]
    fast = [
        F.when(
            _col(c).cast("string").rlike(r"^\d{4}-"),
            F.substring(_col(c).cast("string"), 1, 4).cast("int"),
        )
        for c in date_cols
    ]
    return F.coalesce(*cands, *fast)
