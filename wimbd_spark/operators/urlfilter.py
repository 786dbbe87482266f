"""URL / domain blocklist filtering — the web-curation gate.

Every public web-corpus pipeline (C4, RefinedWeb, Dolma — all
published) filters pages whose URL host falls under a blocked domain,
where a blocklist entry covers the domain itself AND every subdomain
(the UT1-blacklist convention: "example.com" blocks
"ads.example.com"). The reference engine counts URL hosts/suffixes
(wimbd/url_counts/map_count.py:17-19) but has no blocklist gate; this
module adds it as a first-class operator.

100 TB plan shape: the host explodes map-side into its ≤ ~6 dot-suffix
chains, which broadcast-join the blocklist (even the multi-million-
entry UT1 lists are tens of MB) — no corpus shuffle for matching; the
only exchanges are the distinct on matched ids and the id-probe
anti/left join that restores full-width rows. Pass
``broadcast_blocklist=False`` for a corpus-scale blocklist and AQE
sizes the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_suffixes(host: Column | str) -> Column:
    """All dot-suffix chains of a host, most-specific first:
    'a.b.com' → ['a.b.com', 'b.com', 'com']. NULL host → NULL."""
    c = F.col(host) if isinstance(host, str) else host
    parts = F.split(c, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
    )


def filter_by_domain_blocklist(
    df: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    domain_col: str = "domain",
    mode: str = "drop",
    flag_col: str = "blocked",
    broadcast_blocklist: bool = True,
) -> DataFrame:
    """Remove (``mode='drop'``) or flag (``mode='flag'``) every row
    whose URL host equals a blocklist domain or is a subdomain of one.

    ``blocklist`` is a DataFrame with ``domain_col`` holding bare
    registrable domains (no scheme, no leading dot). Matching is
    fully case-insensitive: BOTH sides are lowercased here (hosts via
    `url_host`, blocklist entries on load — a mixed-case entry like
    'Example.COM' matches example.com and its subdomains); rows whose
    URL has no parseable host never match — screen those separately
    if unparseable URLs should be dropped too.
    """
    from wimbd_spark.functions.text import url_host

    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    dom = blocklist.select(
        F.lower(F.col(domain_col)).alias("_dom")
    ).distinct()
    if broadcast_blocklist:
        dom = F.broadcast(dom)
    hits = (
        df.select(
            F.col(id_col),
            F.explode(
                host_suffixes(F.lower(url_host(F.col(url_col))))
            ).alias("_suf"),
        )
        .join(dom, on=F.col("_suf") == F.col("_dom"), how="inner")
        .select(id_col)
        .distinct()
    )
    if mode == "drop":
        return df.join(hits, id_col, "left_anti")
    return (
        df.join(hits.withColumn("_hit", F.lit(True)), id_col, "left")
        .withColumn(flag_col, F.coalesce(F.col("_hit"), F.lit(False)))
        .drop("_hit")
    )
