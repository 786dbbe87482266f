"""Exact sequence counting and regex search.

Parity targets:
- count  src/cmd/count.rs:66-208 — total occurrences of each search
  token-sequence across the corpus (token-aligned sliding window,
  overlapping matches counted).
- search src/cmd/search.rs:74-330 — per-pattern regex match counts,
  optionally with match locations (text, provenance, span).

Spark-first: needles are a tiny dimension → independent aggregate
columns over ONE corpus scan (no per-needle passes); per-document
occurrence counting is a pure SQL expression over the token array
(no UDF), so the whole plan is scan → project → partial agg → final agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wimbd_spark.functions.text import ngram_strings, tokenize


def _unpivot_counts(row: DataFrame, patterns: list[str]) -> DataFrame:
    pairs = F.array(
        *[
            F.struct(F.lit(p).alias("pattern"), F.col(f"_c{i}").alias("count"))
            for i, p in enumerate(patterns)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("p"))
        .select("p.pattern", "p.count")
        .orderBy("pattern")
    )


def count_sequences(
    df: DataFrame, needles: list[str], text_col: str = "text"
) -> DataFrame:
    """Total occurrences of each needle (a token sequence given as a
    space-joined string) → (pattern, count), ordered by pattern.

    Token-aligned and overlapping, like count_occurences
    (src/cmd/count.rs:191-208): occurrences of a needle = number of
    n-gram windows (n = needle token length) equal to the needle.
    """
    if not needles:
        raise ValueError("count_sequences: needles must be non-empty")

    def _eq(needle):
        # NB: F.filter introspects lambda arity (2 args = element,index),
        # so bind the needle via closure, single-arg lambda only.
        return lambda g: g == F.lit(needle)

    # Materialize tokens once, then each distinct needle length's
    # n-gram array once — Catalyst does not CSE across higher-order
    # function lambdas, so without this every needle re-tokenizes.
    lengths = sorted({len(n.split()) for n in needles})
    grams = df.select(tokenize(F.col(text_col)).alias("_t")).select(
        *[ngram_strings(F.col("_t"), n).alias(f"_g{n}") for n in lengths]
    )
    # outer coalesce: SUM over an EMPTY corpus is NULL per SQL, but an
    # occurrence count is 0 — degenerate-corpus parity with the oracle
    aggs = [
        F.coalesce(
            F.sum(
                F.coalesce(
                    F.size(
                        F.filter(
                            F.col(f"_g{len(needle.split())}"), _eq(needle)
                        )
                    ),
                    F.lit(0),
                )
            ),
            F.lit(0).cast("long"),
        ).alias(f"_c{i}")
        for i, needle in enumerate(needles)
    ]
    return _unpivot_counts(grams.agg(*aggs), needles)


def search_regex_counts(
    df: DataFrame, patterns: list[str], text_col: str = "text"
) -> DataFrame:
    """Total regex match count per pattern → (pattern, count).

    Parity: src/cmd/search.rs:180-218 (find_iter count per pattern).
    `regexp_count` stays inside whole-stage codegen.
    """
    if not patterns:
        raise ValueError("search_regex_counts: patterns must be non-empty")
    # outer coalesce: a match count over an empty corpus is 0, not the
    # SQL NULL that SUM-of-no-rows yields
    aggs = [
        F.coalesce(
            F.sum(
                F.coalesce(
                    F.regexp_count(F.col(text_col), F.lit(p)), F.lit(0)
                )
            ),
            F.lit(0).cast("long"),
        ).alias(f"_c{i}")
        for i, p in enumerate(patterns)
    ]
    return _unpivot_counts(df.agg(*aggs), patterns)


def _match_spans(ms, segs):
    """Per-occurrence (match, start_col) structs from the match array and
    the between-match segments of ``split(text, pattern, -1)``.

    Exact positions without re-searching the text: the k-th
    non-overlapping match starts at 1 + Σ len(seg_j, j≤k) +
    Σ len(match_j, j<k). A single left fold carries the running
    position — O(n) in the number of matches, pure JVM expressions.
    (A locate()-chain would mis-position matches whose string also
    occurs at a non-match site, e.g. word-boundary patterns.)
    """
    pairs = F.zip_with(
        F.slice(segs, 1, F.size(ms)),
        ms,
        lambda s, m: F.struct(s.alias("s"), m.alias("m")),
    )
    zero = F.struct(
        F.lit(1).cast("int").alias("pos"),
        F.array().cast("array<struct<match:string,start_col:int>>").alias(
            "acc"
        ),
    )
    return F.aggregate(
        pairs,
        zero,
        lambda acc, p: F.struct(
            (acc["pos"] + F.length(p["s"]) + F.length(p["m"])).alias("pos"),
            F.array_append(
                acc["acc"],
                F.struct(
                    p["m"].alias("match"),
                    (acc["pos"] + F.length(p["s"]))
                    .cast("int")
                    .alias("start_col"),
                ),
            ).alias("acc"),
        ),
        lambda acc: acc["acc"],
    )


def search_regex_locations(
    df: DataFrame,
    patterns: list[str],
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    limit_per_pattern: int | None = None,
) -> DataFrame:
    """Match locations per pattern → (pattern, *id_cols, match,
    start_col, end_col), one row PER OCCURRENCE with its exact span.

    Parity: src/cmd/search.rs:248-330 (MatchLocation [start, end) and a
    global per-pattern cap). Spans here are 1-based character offsets
    (end exclusive: end_col = start_col + len(match)); the reference
    reports 0-based byte offsets — same occurrences, shifted units.

    PRECONDITION: patterns must not produce zero-length matches (e.g.
    ``a*`` or a bare lookaround). Span arithmetic aligns the matches of
    regexp_extract_all with the between-match segments of split(); the
    two disagree on empty matches, which would silently corrupt every
    offset — so empty-matchable patterns are rejected up front.
    """
    if not patterns:
        raise ValueError("search_regex_locations: patterns must be non-empty")
    try:
        from re import _parser as _sre_parse  # py311+
    except ImportError:  # pragma: no cover
        import sre_parse as _sre_parse

    for p in patterns:
        try:
            # parser-computed minimum match width: 0 ⇔ some position can
            # yield a zero-length match (catches 'a*', lookarounds, '')
            min_width = _sre_parse.parse(p).getwidth()[0]
        except Exception:
            min_width = 1  # unparseable here — let Spark surface its error
        if min_width == 0:
            raise ValueError(
                f"search_regex_locations: pattern {p!r} can match the "
                "empty string; zero-length matches break span alignment "
                "(see docstring). Anchor or quantify the pattern so every "
                "match is non-empty (e.g. 'a+' instead of 'a*')."
            )
    base = df.select(*id_cols, F.col(text_col).alias("_text"))
    # ONE scan for all patterns: regexps must be foldable, so build a
    # per-pattern struct of (pattern, match spans) in a single
    # projection, then explode twice. A per-pattern union would
    # re-scan the source k times.
    per_pattern = F.array(
        *[
            F.struct(
                F.lit(p).alias("pattern"),
                _match_spans(
                    F.regexp_extract_all(F.col("_text"), F.lit(p), 0),
                    F.split(F.col("_text"), p, -1),
                ).alias("spans"),
            )
            for p in patterns
        ]
    )
    exploded = (
        base.select(*id_cols, F.explode(per_pattern).alias("pm"))
        .select(
            F.col("pm.pattern").alias("pattern"),
            *id_cols,
            F.explode("pm.spans").alias("sp"),
        )
        .select(
            "pattern",
            *id_cols,
            F.col("sp.match").alias("match"),
            F.col("sp.start_col").alias("start_col"),
            (F.col("sp.start_col") + F.length("sp.match")).alias("end_col"),
        )
    )
    if limit_per_pattern is not None:
        w = Window.partitionBy("pattern").orderBy(*[F.col(c) for c in id_cols])
        exploded = (
            exploded.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= limit_per_pattern)
            .drop("_rn")
        )
    return exploded


def search_snippets(
    df: DataFrame,
    patterns: list[str],
    window: int = 30,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    limit_per_pattern: int | None = None,
) -> DataFrame:
    """Keyword-in-context view: every regex occurrence with up to
    ``window`` characters of context on each side → (pattern,
    *id_cols, match, start_col, end_col, snippet) — the audit surface
    a human reads after `search_regex_locations` finds the spans
    (the reference's search workflow prints matched lines;
    src/cmd/search.rs:248-330).

    Plan shape: the locations op's single multi-pattern scan, then
    ONE id-keyed join back to the text and a per-row substr — the
    text column never fans out per occurrence until the final
    projection, and snippets are bounded at len(match) + 2·window
    chars regardless of document size (the property that makes the
    output safe to collect/export at corpus scale).
    """
    if window < 0:
        raise ValueError("window must be >= 0")
    locs = search_regex_locations(
        df, patterns, text_col, id_cols, limit_per_pattern
    )
    txt = df.select(*id_cols, F.col(text_col).alias("_snip_text"))
    snip_start = F.greatest(F.col("start_col") - window, F.lit(1))
    snip_len = F.col("end_col") + window - snip_start
    return (
        locs.join(txt, list(id_cols))
        .withColumn(
            "snippet", F.col("_snip_text").substr(snip_start, snip_len)
        )
        .drop("_snip_text")
    )
