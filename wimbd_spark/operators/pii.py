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
GARBAGE_PERCENT_MAX = 1000  # wimbd/pii/map_count.py:140-142


def pii_doc_filter(text: Column) -> Column:
    """Docs eligible for PII scanning: non-null, not huge, not
    pathological-repeat garbage (P3/P4)."""
    not_garbage = (
        ~F.coalesce(text.contains("." * 20), F.lit(False))
    ) & (
        F.coalesce(
            F.length(text) - F.length(F.regexp_replace(text, r"%", "")),
            F.lit(0),
        )
        <= GARBAGE_PERCENT_MAX
    )
    return (
        text.isNotNull()
        & (F.trim(text) != "")
        & (F.length(text) <= MAX_PII_DOC_CHARS)
        & not_garbage
    )


def _context_ok(kind: str, match: Column, text: Column, pos: Column) -> Column:
    """Reference context rules (wimbd/pii/map_count.py:29-66):

    - email: domain part must contain a '.' (pattern enforces).
    - ip: reject if a 50-char window around the match mentions
      ISBN/DOI — version-number look-alikes.
    - phone: reject if the window contains ISBN/DOI/'#' or the match
      sits inside a URL-ish token.
    """
    window = F.substring(
        text, F.greatest(pos - 25, F.lit(1)).cast("int"), 50 + 25
    )
    has_isbn_doi = F.upper(window).rlike("ISBN|DOI")
    if kind == "ip":
        return ~has_isbn_doi
    if kind == "phone":
        return ~(has_isbn_doi | window.contains("#"))
    return F.lit(True)


def extract_pii(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    kinds: tuple[str, ...] = ("email", "phone", "ip"),
) -> DataFrame:
    """Per-match PII rows → (*id_cols, kind, match, position) after
    context filtering. position is 1-based char offset of the first
    occurrence of the matched string."""
    eligible = df.filter(pii_doc_filter(F.col(text_col))).select(
        *id_cols, F.col(text_col).alias("_text")
    )
    parts = []
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        p = (
            eligible.select(
                *id_cols,
                F.lit(kind).alias("kind"),
                F.explode(
                    F.regexp_extract_all(F.col("_text"), F.lit(pat), 0)
                ).alias("match"),
                F.col("_text"),
            )
            .withColumn("position", F.expr("locate(match, _text)"))
            .filter(
                _context_ok(kind, F.col("match"), F.col("_text"), F.col("position"))
            )
            .drop("_text")
        )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


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
        aggs.append(
            F.sum(
                F.coalesce(F.regexp_count(text, F.lit(pat)), F.lit(0))
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
        aggs.append(F.sum(F.when(hit, F.col("_pol"))).alias(f"_s{i}"))
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
