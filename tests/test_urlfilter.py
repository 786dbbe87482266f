"""Domain-blocklist URL filtering tests."""

import pytest
from pyspark.sql import functions as F

from wimbd_spark.operators.urlfilter import (
    filter_by_domain_blocklist,
    host_suffixes,
)


def test_host_suffixes(spark):
    got = (
        spark.range(1)
        .select(host_suffixes(F.lit("a.b.co.uk")).alias("s"))
        .collect()[0]["s"]
    )
    assert got == ["a.b.co.uk", "b.co.uk", "co.uk", "uk"]


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame(
        [
            (1, "https://ads.example.com/banner.gif"),
            (2, "https://example.com/index.html"),
            (3, "https://example.com.evil.org/phish"),  # NOT example.com
            (4, "https://good.org/page"),
            (5, "not a url"),
            (6, "https://EXAMPLE.com/upper"),
        ],
        ["doc_id", "url"],
    )


def test_blocklist_drop_covers_subdomains_only(spark, urls):
    blocked = spark.createDataFrame([("example.com",)], ["domain"])
    kept = filter_by_domain_blocklist(urls, blocked)
    # 1 (subdomain), 2 (exact), 6 (case) drop; 3 is a different
    # registrable domain that merely embeds the string; 5 has no host
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4, 5]
    assert kept.columns == urls.columns


def test_blocklist_flag_mode(spark, urls):
    blocked = spark.createDataFrame([("example.com",)], ["domain"])
    flagged = {
        r["doc_id"]: r["blocked"]
        for r in filter_by_domain_blocklist(
            urls, blocked, mode="flag"
        ).collect()
    }
    assert flagged == {1: True, 2: True, 3: False, 4: False,
                       5: False, 6: True}
    with pytest.raises(ValueError):
        filter_by_domain_blocklist(urls, blocked, mode="nope")


def test_blocklist_mixed_case_entries_match(spark, urls):
    """ADVICE r5: blocklist entries are lowercased on load — a
    mixed-case entry ('Example.COM') must match example.com and its
    subdomains, in the batch operator AND the streaming map table."""
    blocked = spark.createDataFrame([("Example.COM",)], ["domain"])
    kept = filter_by_domain_blocklist(urls, blocked)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4, 5]

    from wimbd_spark.streaming import blocked_domain_table

    m = blocked_domain_table(blocked).collect()[0]["blocked"]
    assert m == {"example.com": True}
