"""PII detection with context rules, profanity taxonomy counts, and
demographic-sentiment scaffolding.

Parity map (file:line relative to /root/reference):
- P15 PII regexes + context postprocess  wimbd/pii/map_count.py:123-127
      (patterns), 29-66 (context rules), 82-101 (extract loop)
- P3/P4 doc filters (long docs, garbage) wimbd/pii/map_count.py:129-144
- P18 word-list taxonomy counts          wimbd/profanity/map_count.py:46-86
- P20 demographic co-occurrence          wimbd/sentiment_coocurrence/map_count.py:17-55

Spark-first: regex extraction + window checks are pure column
expressions (codegen); the word-list is a broadcast-built alternation
regex. Model-backed variants (spaCy/TextBlob/alt-profanity-check) are
Pandas-UDF slots in wimbd_spark.operators.models.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reference patterns (wimbd/pii/map_count.py:123-127), re-expressed in
# Java/RE2-compatible syntax.
PII_PATTERNS = {
    "email": r"[\w.+-]+@[\w-]+\.[\w.-]+",
    "phone": r"\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

MAX_PII_DOC_CHARS = 500_000  # wimbd/pii/map_count.py:129

# The reference's pathological-repeat garbage literals
# (wimbd/pii/map_count.py:137-142), reproduced as data constants.
GARBAGE_SUBSTRINGS = (
    "." * 45,
    "!" * 99,
    "# # # # # # #",
    "???????",
    "," * 76,
    ":)" * 52,
    ";" * 121,
)
GARBAGE_COUNTED = (  # (regex-escaped pattern, max allowed occurrences)
    (r"\.{11}", 50),  # input.count("...........") > 50
    (r"/ / / / /", 50),  # input.count("/ / / / /") > 50
)
GARBAGE_PERCENT_MAX = 1000  # input.count("%") > 1000


def pii_doc_filter(text: Column) -> Column:
    """Docs eligible for PII scanning: non-null, not huge, not
    pathological-repeat garbage (P3/P4, wimbd/pii/map_count.py:129-142).
    All nine reference garbage patterns are enforced."""
    ok = (
        text.isNotNull()
        & (F.trim(text) != "")
        & (F.length(text) <= MAX_PII_DOC_CHARS)
    )
    for lit in GARBAGE_SUBSTRINGS:
        ok = ok & ~text.contains(lit)
    for pat, cap in GARBAGE_COUNTED:
        ok = ok & (F.regexp_count(text, F.lit(pat)) <= cap)
    ok = ok & (
        F.length(text) - F.length(F.regexp_replace(text, r"%", ""))
        <= GARBAGE_PERCENT_MAX
    )
    return ok


# Lookahead-free equivalent of the reference's contains_url regex
# (wimbd/pii/map_count.py:13-24): the four alternation branches reduce,
# for match-exists purposes, to scheme-or-www followed by an
# alnum-starting label and a dotted suffix. (Divergence: the reference's
# (?!www) lookahead rejects e.g. "https://wwwfoo.com"; we accept it.
# RE2 — the oracle engine — has no lookahead, so both sides use this.)
URL_CONTEXT_REGEX = r"(https?://|www\.)[a-zA-Z0-9]+\.[^\s]{2,}"


def _context_window(match: Column, text: Column, pos: Column) -> Column:
    """Lowercased window of 50 chars each side of the match span —
    text[max(0, start-50) : end+50], wimbd/pii/map_count.py:49,61."""
    start = F.greatest(pos - 50, F.lit(1))
    length = pos + F.length(match) + 50 - start
    return F.lower(text.substr(start.cast("int"), length.cast("int")))


def _context_ok(kind: str, match: Column, text: Column, pos: Column) -> Column:
    """Reference context rules (wimbd/pii/map_count.py:29-66):

    - email: addressee must not be '(' and domain must contain '.' —
      both already enforced by PII_PATTERNS['email'].
    - ip: reject if the window mentions isbn/doi/'#'.
    - phone: same as ip, plus reject if the window contains a URL.
    """
    window = _context_window(match, text, pos)
    has_marker = window.rlike("isbn|doi") | window.contains("#")
    if kind == "ip":
        return ~has_marker
    if kind == "phone":
        return ~(has_marker | window.rlike(URL_CONTEXT_REGEX))
    return F.lit(True)


def extract_pii(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    kinds: tuple[str, ...] = ("email", "phone", "ip"),
) -> DataFrame:
    """Per-match PII rows → (*id_cols, kind, match, position) after
    context filtering. position is 1-based char offset of the first
    occurrence of the matched string (text.find(match),
    wimbd/pii/map_count.py:95).

    Single scan: all kinds are extracted in one projection (an array of
    per-kind match-list structs, double-exploded) instead of one
    pass-per-kind union — one FileScan regardless of len(kinds).
    """
    eligible = df.filter(pii_doc_filter(F.col(text_col))).select(
        *id_cols, F.col(text_col).alias("_text")
    )
    per_kind = F.array(
        *[
            F.struct(
                F.lit(kind).alias("kind"),
                F.regexp_extract_all(
                    F.col("_text"), F.lit(PII_PATTERNS[kind]), 0
                ).alias("matches"),
            )
            for kind in kinds
        ]
    )
    hits = (
        eligible.select(*id_cols, "_text", F.explode(per_kind).alias("_k"))
        .select(
            *id_cols,
            F.col("_k.kind").alias("kind"),
            F.explode("_k.matches").alias("match"),
            "_text",
        )
        .withColumn("position", F.expr("locate(match, _text)"))
    )
    ctx = None
    for kind in kinds:
        rule = _context_ok(
            kind, F.col("match"), F.col("_text"), F.col("position")
        )
        branch = (F.col("kind") == kind) & rule
        ctx = branch if ctx is None else (ctx | branch)
    return hits.filter(ctx).drop("_text")


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] | None = None,
    replacement: str = "[{KIND}]",
) -> DataFrame:
    """Replace every PII regex match with a typed placeholder
    ([EMAIL], [PHONE], [IP]) — the ENFORCEMENT complement of
    extract_pii (the reference only counts/locates PII,
    wimbd/pii/map_count.py; a release pipeline also has to scrub it).
    Pure per-row JVM regexp_replace chain in PII_PATTERNS order — no
    shuffle, no UDF; NULL text passes through as NULL.

    Deliberate divergence from extract_pii: redaction applies to ALL
    regex matches, skipping the context-window demotion rules
    (pii.py:87-101) — over-redacting a URL-adjacent phone-shaped
    string is the safe direction for a data release, while the
    counting path wants the precision of the context rules.
    """
    out = F.col(text_col)
    for kind in kinds if kinds is not None else tuple(PII_PATTERNS):
        out = F.regexp_replace(
            out,
            PII_PATTERNS[kind],
            replacement.format(KIND=kind.upper()),
        )
    return df.withColumn(text_col, out)


def pii_counts(
    df: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """(kind, count) totals — the map_count.py output shape."""
    return (
        extract_pii(df, text_col, id_cols)
        .groupBy("kind")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("kind")
    )


def taxonomy_counts(
    df: DataFrame,
    wordlist: DataFrame,
    text_col: str = "text",
    word_col: str = "word",
    category_col: str = "categorization",
) -> DataFrame:
    """Occurrences per taxonomy category (P18): the word list (a small
    dim table, ≙ resources/word_based_bias_list.csv) is collected,
    compiled into one case-insensitive alternation regex per category,
    and counted JVM-side in a single scan."""
    cats = (
        wordlist.groupBy(category_col)
        .agg(F.collect_set(word_col).alias("words"))
        .collect()
    )
    text = F.col(text_col)
    aggs, names = [], []
    for i, row in enumerate(sorted(cats, key=lambda r: r[category_col])):
        words = sorted(row["words"])
        import re as _re

        alternation = "|".join(_re.escape(w) for w in words)
        pat = r"(?i)\b(?:" + alternation + r")\b"
        names.append(row[category_col])
        # outer coalesce: SUM over an empty corpus is NULL per SQL,
        # but an occurrence count is 0
        aggs.append(
            F.coalesce(
                F.sum(
                    F.coalesce(F.regexp_count(text, F.lit(pat)), F.lit(0))
                ),
                F.lit(0).cast("long"),
            ).alias(f"_c{i}")
        )
    rowdf = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("categorization"), F.col(f"_c{i}").alias("count")
            )
            for i, n in enumerate(names)
        ]
    )
    return (
        rowdf.select(F.explode(pairs).alias("p"))
        .select("p.categorization", "p.count")
        .orderBy("categorization")
    )


def sentence_split(text: Column) -> Column:
    """Regex sentence splitter (the dependency-free stand-in for the
    spaCy sentencizer of P19): split after ./!/? + whitespace."""
    return F.filter(
        F.split(text, r"(?<=[.!?])\s+"),
        lambda s: F.trim(s) != "",
    )


def demographic_cooccurrence(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    polarity: Column | None = None,
) -> DataFrame:
    """Per demographic term: sentences mentioning it + summed polarity
    (P20). Default polarity is a lexicon-free neutral 0.0 — swap in a
    model pandas_udf (operators.models.sentiment_polarity) for TextBlob
    parity. Unigram terms match token-wise; multi-word by substring —
    both per the reference (map_count.py:24-33)."""
    sentences = df.select(
        F.explode(sentence_split(F.col(text_col))).alias("sentence")
    )
    pol = polarity if polarity is not None else F.lit(0.0)
    sentences = sentences.select(
        "sentence", pol.alias("_pol"),
        F.split(F.lower(F.col("sentence")), r"\s+").alias("_toks"),
    )
    aggs = []
    for i, term in enumerate(terms):
        if " " in term:
            hit = F.lower(F.col("sentence")).contains(term.lower())
        else:
            hit = F.array_contains(F.col("_toks"), term.lower())
        aggs.append(F.count_if(hit).alias(f"_n{i}"))
        # decimal-sum: double addition is order-dependent across
        # partitions; summing 1e-6-quantized decimals is exact, so the
        # result is engine- and partitioning-independent
        aggs.append(
            F.sum(F.when(hit, F.col("_pol")).cast("decimal(18,6)"))
            .cast("double")
            .alias(f"_s{i}")
        )
    row = sentences.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"),
                F.col(f"_n{i}").cast("long").alias("count"),
                F.coalesce(F.col(f"_s{i}"), F.lit(0.0)).alias("polarity_sum"),
            )
            for i, t in enumerate(terms)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("p"))
        .select(
            "p.term",
            "p.count",
            "p.polarity_sum",
            F.when(
                F.col("p.count") > 0, F.col("p.polarity_sum") / F.col("p.count")
            ).alias("mean_polarity"),
        )
        .orderBy("term")
    )
