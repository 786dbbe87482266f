"""CLI verb tests (in-process main(), shared SparkSession not reused —
the CLI owns its session lifecycle, so these run it for real)."""

import gzip
import json
import os

import pytest

from wimbd_spark.cli import main

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    with gzip.open(d / "s0.json.gz", "wt") as f:
        for i in range(20):
            f.write(json.dumps({"text": f"a b c {'d' if i % 2 else 'e'}"}) + "\n")
    return str(d)


def _run(capsys, argv):
    rc = main(argv)
    assert rc == 0
    return [json.loads(line) for line in capsys.readouterr().out.splitlines()]


def test_cli_topk(capsys):
    rows = _run(capsys, ["topk", DOCS, "-n", "3", "-k", "2"])
    assert rows[0]["rank"] == 1 and rows[0]["count"] >= rows[1]["count"]


def test_cli_stats_jsonl(capsys, shard_dir):
    rows = _run(capsys, ["stats", shard_dir])
    assert rows[0]["total_documents"] == 20
    assert rows[0]["total_tokens"] == 80


def test_cli_count_and_unique(capsys, shard_dir):
    rows = _run(capsys, ["count", shard_dir, "-s", "a b", "-s", "zz"])
    assert {r["pattern"]: r["count"] for r in rows} == {"a b": 20, "zz": 0}
    rows = _run(capsys, ["unique", shard_dir, "-n", "1"])
    assert rows[0]["unique_count"] == 5


def test_cli_dedup_and_decontaminate(capsys, tmp_path, shard_dir):
    out = str(tmp_path / "deduped")
    rows = _run(capsys, ["dedup", shard_dir, "--out", out])
    # 20 docs, only 2 distinct texts ("a b c d" / "a b c e")
    assert rows[0] == {"input": 20, "kept": 2, "dropped": 18}
    out2 = str(tmp_path / "clean")
    rows = _run(
        capsys,
        ["decontaminate", shard_dir, "--blocklist", out, "--out", out2],
    )
    assert rows[0]["kept"] == 0  # blocklist covers every text


def test_cli_decontaminate_by_ngrams(capsys, tmp_path):
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha beta gamma", "clean words only", "beta gamma end"],
        }
    ).to_parquet(tmp_path / "train.parquet")
    pd.DataFrame({"text": ["beta gamma"]}).to_parquet(
        tmp_path / "bl.parquet"
    )
    out = str(tmp_path / "clean_ng")
    rows = _run(
        capsys,
        ["decontaminate", str(tmp_path / "train.parquet"),
         "--blocklist", str(tmp_path / "bl.parquet"),
         "--out", out, "--by-ngrams"],
    )
    # hash mode would keep all 3 (no exact text match); containment
    # drops docs 1 and 3
    assert rows[0] == {"input": 3, "kept": 1, "removed": 2}
    # --method ac: same survivors via the automaton pass
    out2 = str(tmp_path / "clean_ng_ac")
    rows = _run(
        capsys,
        ["decontaminate", str(tmp_path / "train.parquet"),
         "--blocklist", str(tmp_path / "bl.parquet"),
         "--out", out2, "--by-ngrams", "--method", "ac"],
    )
    assert rows[0] == {"input": 3, "kept": 1, "removed": 2}


def test_cli_despan(capsys, tmp_path):
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "p q r s t u alpha beta gamma delta",
                "zeta p q r s t u omega",
                "entirely different words in here now",
            ],
        }
    ).to_parquet(tmp_path / "docs.parquet")
    out = str(tmp_path / "despanned")
    rows = _run(
        capsys,
        ["despan", str(tmp_path / "docs.parquet"), "--out", out],
    )
    assert rows[0]["input"] == 3 and rows[0]["modified"] == 2
    # keep='first': only the non-first copy (doc 2) is modified
    out2 = str(tmp_path / "despanned_kf")
    rows = _run(
        capsys,
        ["despan", str(tmp_path / "docs.parquet"), "--out", out2,
         "--keep", "first"],
    )
    assert rows[0]["modified"] == 1


def test_cli_output_file(tmp_path, shard_dir):
    out = str(tmp_path / "res.jsonl")
    assert main(["search", shard_dir, "-p", "[de]$", "-o", out]) == 0
    rows = [json.loads(line) for line in open(out)]
    assert rows[0]["count"] == 20


def test_cli_parquet_limit_is_per_file(capsys, tmp_path, spark):
    # --limit on parquet inputs caps rows PER FILE (S4), not globally
    d = tmp_path / "pq"
    for name, n in [("a", 10), ("b", 10)]:
        spark.createDataFrame(
            [(i, f"{name} doc {i}") for i in range(n)], ["doc_id", "text"]
        ).coalesce(1).write.parquet(str(d / name))
    rows = _run(capsys, ["stats", str(d / "a"), str(d / "b"), "--limit", "3"])
    assert rows[0]["total_documents"] == 6  # 3 from each file


def test_cli_neardup_jaccard(spark, tmp_path, capsys):
    from wimbd_spark.cli import main

    import pandas as pd
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy cat",
                "something entirely different in this row",
            ],
        }
    ).to_parquet(tmp_path / "docs.parquet")
    rc = main(
        [
            "neardup",
            str(tmp_path / "docs.parquet"),
            "--method",
            "jaccard",
            "--threshold",
            "0.4",
            "--id-col",
            "doc_id",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert '"id_a": 1' in out and '"id_b": 2' in out
    assert '"id_b": 3' not in out


def test_cli_neardup_keep_out_resolves_clusters(spark, tmp_path, capsys):
    # --keep-out runs the full dedup story in one command: pairs →
    # components → keep the SMALLEST id per cluster + unpaired docs
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [5, 2, 9, 3],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy cat",
                "the quick brown fox jumps over the lazy cow",
                "something entirely different in this row",
            ],
        }
    ).to_parquet(tmp_path / "docs.parquet")
    out = str(tmp_path / "kept")
    rows = _run(
        capsys,
        [
            "neardup", str(tmp_path / "docs.parquet"),
            "--method", "jaccard", "--threshold", "0.4",
            "--id-col", "doc_id", "--keep-out", out,
        ],
    )
    assert rows[0]["kept"] == 2 and rows[0]["dropped"] == 2
    kept_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    )
    # cluster {5, 2, 9} keeps exactly its smallest id (2); 3 unpaired
    assert kept_ids == [2, 3]


def test_cli_search_locations_id_col(capsys, tmp_path, spark):
    # --id-col keys occurrence rows by the given unique column even
    # when a non-unique column comes first in the schema
    spark.createDataFrame(
        [("src", 10, "x y"), ("src", 11, "x z")],
        ["source", "doc_id", "text"],
    ).coalesce(1).write.parquet(str(tmp_path / "d"))
    rows = _run(
        capsys,
        ["search", str(tmp_path / "d"), "-p", "x",
         "--locations", "--id-col", "doc_id"],
    )
    assert sorted(r["doc_id"] for r in rows) == [10, 11]


def test_cli_contamination(spark, tmp_path, capsys):
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["alpha beta gamma delta", "other corpus words here"],
        }
    ).to_parquet(tmp_path / "corpus.parquet")
    pd.DataFrame(
        {"text": ["beta gamma", "not present anywhere", "corpus words"]}
    ).to_parquet(tmp_path / "eval.parquet")
    # substring scan path
    rows = _run(
        capsys,
        ["contamination", str(tmp_path / "corpus.parquet"),
         "--eval", str(tmp_path / "eval.parquet")],
    )
    assert rows[0]["contaminated"] == 2 and rows[0]["total"] == 3
    # token-aligned indexed path agrees for these token-clean phrases
    idx = str(tmp_path / "idx")
    assert main(["index-build", str(tmp_path / "corpus.parquet"),
                 "--out", idx, "--id-col", "doc_id"]) == 0
    capsys.readouterr()
    rows = _run(
        capsys,
        ["contamination", str(tmp_path / "corpus.parquet"),
         "--eval", str(tmp_path / "eval.parquet"), "--index", idx],
    )
    assert rows[0]["contaminated"] == 2 and rows[0]["total"] == 3
    # third route: slop>0 + index → the batched slot-join fallback;
    # "beta delta" matches "beta gamma delta" only with slop>=1
    import pandas as pd

    pd.DataFrame({"text": ["beta delta"]}).to_parquet(
        tmp_path / "eval2.parquet"
    )
    rows = _run(
        capsys,
        ["contamination", str(tmp_path / "corpus.parquet"),
         "--eval", str(tmp_path / "eval2.parquet"), "--index", idx,
         "--slop", "1"],
    )
    assert rows[0]["contaminated"] == 1 and rows[0]["total"] == 1
    # r8: slop without an index rides the token-aligned gram scan when
    # asked for explicitly…
    rows = _run(
        capsys,
        ["contamination", str(tmp_path / "corpus.parquet"),
         "--eval", str(tmp_path / "eval2.parquet"),
         "--token-aligned", "--slop", "1"],
    )
    assert rows[0]["contaminated"] == 1 and rows[0]["total"] == 1
    # …but the substring scan still cannot honor token windows → hard
    # error, not a silent wrong answer
    with pytest.raises(ValueError, match="substring"):
        main(["contamination", str(tmp_path / "corpus.parquet"),
              "--eval", str(tmp_path / "eval2.parquet"), "--slop", "1"])


def test_cli_pack(spark, tmp_path, capsys):
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "source": ["s0", "s0", "s0", "s1"],
            "text": ["a b c", "d e", "f g h i", "x y z"],
        }
    ).to_parquet(tmp_path / "docs.parquet")
    out = str(tmp_path / "packed")
    rows = _run(
        capsys,
        ["pack", str(tmp_path / "docs.parquet"),
         "--budget", "5", "--out", out],
    )
    # s0: 3+2 fill pack 0, 4 → pack 1; s1: 3 → pack 0 ⇒ 3 packs, 12 toks
    assert rows[0]["packs"] == 3 and rows[0]["total_tokens"] == 12
    seqs = spark.read.parquet(out)
    got = {
        (r["source"], r["pack_id"]): r["text"] for r in seqs.collect()
    }
    assert got[("s0", 0)] == "a b c\n\nd e"
    assert got[("s0", 1)] == "f g h i"
    assert got[("s1", 0)] == "x y z"


def test_cli_mix(spark, tmp_path, capsys):
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": list(range(40)),
            "source": ["s0"] * 20 + ["s1"] * 20,
            "text": ["doc"] * 40,
        }
    ).to_parquet(tmp_path / "docs.parquet")
    out = str(tmp_path / "mixed")
    rows = _run(
        capsys,
        ["mix", str(tmp_path / "docs.parquet"),
         "-w", "s0=2.0", "-w", "s1=0.5", "--out", out],
    )
    by_src = {r["source"]: r["rows"] for r in rows if "source" in r}
    assert by_src["s0"] == 40  # exactly 2 epochs of 20
    assert 0 < by_src["s1"] < 20  # ~half, hash-gated
    mix = spark.read.parquet(out)
    assert "mix_epoch" in mix.columns


def test_cli_ingest_tfrecord(spark, tmp_path, capsys):
    from wimbd_spark.cli import main
    from wimbd_spark.sources.tfrecord import write_tfrecord

    write_tfrecord(
        str(tmp_path / "a.tfrecord"),
        [{"text": "one doc", "doc_id": "d1"}],
    )
    out_dir = tmp_path / "corpus"
    rc = main(
        [
            "ingest",
            str(tmp_path / "a.tfrecord"),
            "--format",
            "tfrecord",
            "--id-field",
            "doc_id",
            "--out",
            str(out_dir),
        ]
    )
    assert rc == 0
    got = spark.read.parquet(str(out_dir))
    assert got.columns == ["id", "text", "lang", "source", "metadata"]
    assert got.collect()[0]["text"] == "one doc"


def test_cli_quality_filter(spark, tmp_path, capsys):
    from wimbd_spark.cli import main

    import pandas as pd
    keeper = " ".join(f"the item{i} of value{i}" for i in range(30))
    pd.DataFrame(
        {"doc_id": [1, 2], "text": [keeper, "too short"]}
    ).to_parquet(tmp_path / "in.parquet")
    out = tmp_path / "kept"
    rc = main(
        ["quality-filter", str(tmp_path / "in.parquet"), "--out", str(out)]
    )
    assert rc == 0
    assert spark.read.parquet(str(out)).count() == 1
    printed = capsys.readouterr().out
    assert '"kept": 1' in printed and "too_short" in printed


def test_cli_index_build_and_phrases(spark, tmp_path, capsys):
    idx = str(tmp_path / "idx")
    rows = _run(capsys, ["index-build", DOCS, "--out", idx])
    assert rows[0]["postings"] > 0 and rows[0]["out"] == idx
    # indexed counts == scan-path counts
    scan = _run(capsys, ["phrases", DOCS, "-s", "table scan", "-s", "join"])
    fast = _run(
        capsys,
        ["phrases", DOCS, "-s", "table scan", "-s", "join", "--index", idx],
    )
    by = lambda rows: {r["phrase"]: r["count"] for r in rows}
    assert by(fast) == by(scan)
    assert by(fast)["table scan"] > 0


def test_cli_search_locations(capsys, shard_dir):
    rows = _run(capsys, ["search", shard_dir, "-p", "[de]$", "--locations"])
    # 20 docs "a b c d|e": every doc ends in d or e at col 7
    assert len(rows) == 20
    assert all(r["start_col"] == 7 and r["end_col"] == 8 for r in rows)
    capped = _run(
        capsys,
        ["search", shard_dir, "-p", "[de]$", "--locations",
         "--limit-per-pattern", "5"],
    )
    assert len(capped) == 5


def test_cli_stats_extremes(capsys):
    rows = _run(capsys, ["stats", DOCS, "--extremes"])
    assert rows[0]["total_documents"] == 500
    which = {r.get("which") for r in rows[1:]}
    assert which == {"min", "max"}
    mins = [r for r in rows[1:] if r["which"] == "min"]
    maxs = [r for r in rows[1:] if r["which"] == "max"]
    assert all(m["num_tokens"] == rows[0]["document_min_tokens"] for m in mins)
    assert all(m["num_tokens"] == rows[0]["document_max_tokens"] for m in maxs)


def test_cli_decontaminate_fuzzy(spark, tmp_path, capsys):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely unrelated here"),
        ],
        ["doc_id", "text"],
    )
    tp, bp = str(tmp_path / "train"), str(tmp_path / "bl")
    train.write.parquet(tp)
    spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], ["text"]
    ).write.parquet(bp)
    out = str(tmp_path / "kept")
    rows = _run(capsys, [
        "decontaminate", tp, "--blocklist", bp,
        "--fuzzy", "0.5", "--out", out,
    ])
    assert rows[0] == {"input": 3, "kept": 1, "removed": 2}
    kept = spark.read.parquet(out)
    assert [r["doc_id"] for r in kept.collect()] == [3]
    # --fuzzy and --by-ngrams are mutually exclusive semantics
    with pytest.raises(SystemExit):
        main(["decontaminate", tp, "--blocklist", bp,
              "--fuzzy", "0.5", "--by-ngrams", "--out", out])


def test_cli_ppl_filter(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat again") for i in range(8)]
        + [(99, "xq zv jk wp qm nb vc")],
        ["doc_id", "text"],
    )
    tp = str(tmp_path / "docs")
    docs.write.parquet(tp)
    out, lm_out = str(tmp_path / "kept"), str(tmp_path / "lm")
    rows = _run(capsys, [
        "ppl-filter", tp, "--max-ppl", "20",
        "--save-lm", lm_out, "--out", out,
    ])
    assert rows[0]["input"] == 9 and rows[0]["kept"] == 8
    assert 99 not in {
        r["doc_id"] for r in spark.read.parquet(out).collect()
    }
    # saved model reloads and reproduces the gate
    rows = _run(capsys, [
        "ppl-filter", tp, "--max-ppl", "20",
        "--lm", lm_out, "--out", str(tmp_path / "kept2"),
    ])
    assert rows[0]["kept"] == 8


def test_cli_ppl_filter_bigram(spark, tmp_path, capsys):
    """--order 2 routes to the interpolated bigram gate; --save-lm
    writes the unigram/ + bigram/ layout and --lm reloads it."""
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat again") for i in range(8)]
        + [(99, "xq zv jk wp qm nb vc")],
        ["doc_id", "text"],
    )
    tp = str(tmp_path / "docs")
    docs.write.parquet(tp)
    out, lm_out = str(tmp_path / "kept"), str(tmp_path / "lm2")
    # self-trained bigram: the 8 repeated docs score ppl 1.909, the
    # gibberish doc 2.332 (its singleton bigrams interpolate high but
    # the rare unigram mass still separates it) — 2.1 splits them
    rows = _run(capsys, [
        "ppl-filter", tp, "--max-ppl", "2.1", "--order", "2",
        "--save-lm", lm_out, "--out", out,
    ])
    assert rows[0]["input"] == 9 and rows[0]["kept"] == 8
    assert rows[0]["order"] == 2
    assert 99 not in {
        r["doc_id"] for r in spark.read.parquet(out).collect()
    }
    import os

    assert os.path.exists(f"{lm_out}/unigram")
    assert os.path.exists(f"{lm_out}/bigram")
    rows = _run(capsys, [
        "ppl-filter", tp, "--max-ppl", "2.1", "--order", "2",
        "--lm", lm_out, "--out", str(tmp_path / "kept2"),
    ])
    assert rows[0]["kept"] == 8


def test_cli_url_filter(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [
            (1, "https://ads.example.com/banner"),
            (2, "https://keep.org/page"),
        ],
        ["doc_id", "url"],
    )
    tp = str(tmp_path / "docs")
    docs.write.parquet(tp)
    bl = tmp_path / "blocked.txt"
    bl.write_text("example.com\n\n")
    out = str(tmp_path / "kept")
    rows = _run(capsys, [
        "url-filter", tp, "--blocklist", str(bl), "--out", out,
    ])
    assert rows[0] == {"input": 2, "kept": 1, "removed": 1}
    assert [r["doc_id"] for r in spark.read.parquet(out).collect()] == [2]


def test_cli_search_snippets(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(1, "before the needle after"), (2, "no match here")],
        ["doc_id", "text"],
    )
    tp = str(tmp_path / "docs")
    docs.write.parquet(tp)
    rows = _run(capsys, [
        "search-snippets", tp, "-p", "needle", "--window", "7",
    ])
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 1 and rows[0]["match"] == "needle"
    assert rows[0]["snippet"] == "re the needle after"


def test_cli_stratified_sample(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(i, f"src{i % 3}", f"text {i}") for i in range(30)],
        ["doc_id", "source", "text"],
    )
    tp = str(tmp_path / "docs")
    docs.write.parquet(tp)
    out = str(tmp_path / "sampled")
    rows = _run(capsys, [
        "stratified-sample", tp, "-k", "2", "--out", out,
    ])
    by_src = {r["source"]: r["rows"] for r in rows if "source" in r}
    assert by_src == {"src0": 2, "src1": 2, "src2": 2}
    assert spark.read.parquet(out).count() == 6


def test_cli_script_profile(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "一二三"), (3, "12345")],
        ["doc_id", "text"],
    )
    tp = str(tmp_path / "docs")
    docs.write.parquet(tp)
    out = str(tmp_path / "prof")
    rows = _run(capsys, ["script-profile", tp, "--out", out])
    counts = {
        r["main_script"]: r["documents"] for r in rows if "main_script" in r
    }
    assert counts == {"latin": 1, "cjk": 1, "digit": 1}
    assert spark.read.parquet(out).count() == 3


def test_cli_gram_novelty(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),          # exact dup of 1 -> novelty 0
            (3, "p q r s t u v w x"),  # unique -> novelty 1
        ],
        ["doc_id", "text"],
    )
    tp = str(tmp_path / "docs")
    docs.write.parquet(tp)
    rows = _run(capsys, [
        "gram-novelty", tp, "-n", "3", "--max-novelty", "0.0",
    ])
    assert rows[0]["documents"] == 3
    assert rows[0]["at_or_below_max"] == 2  # both halves of the dup pair
    assert rows[0]["min_novelty"] == 0.0


def test_cli_tfidf(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry cherry")],
        ["doc_id", "text"],
    )
    tp = str(tmp_path / "docs")
    docs.write.parquet(tp)
    rows = _run(capsys, ["tfidf", tp, "-k", "1"])
    top = {r["doc_id"]: r["term"] for r in rows}
    assert top == {1: "apple", 2: "cherry"}
    out = str(tmp_path / "terms")
    rows = _run(capsys, ["tfidf", tp, "-k", "2", "--out", out])
    assert rows[0]["rows"] == 4 and rows[0]["out"] == out


def test_cli_pii(spark, tmp_path, capsys):
    src = str(tmp_path / "piisrc")
    spark.createDataFrame(
        [
            (1, "contact me at alice@example.com for details"),
            (2, "call 555-867-5309 or visit the office"),
            (3, "nothing sensitive here at all today"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    matches_out = str(tmp_path / "pii_matches")
    redact_out = str(tmp_path / "pii_redacted")
    rows = _run(
        capsys,
        ["pii", src, "--out", matches_out, "--redact-out", redact_out],
    )
    counts = {r["kind"]: r["count"] for r in rows if "kind" in r}
    assert counts.get("email") == 1 and counts.get("phone") == 1
    red = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(redact_out).collect()
    }
    assert "[EMAIL]" in red[1] and "alice@" not in red[1]
    assert "[PHONE]" in red[2]
    assert red[3] == "nothing sensitive here at all today"


def test_cli_semdedup(spark, tmp_path, capsys):
    src = str(tmp_path / "semsrc")
    spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 1
            (3, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    ).write.parquet(src)
    rows = _run(
        capsys,
        ["semdedup", src, "--threshold", "0.9", "--n-centroids", "1"],
    )
    assert [r["vec_id"] for r in rows] == [2]
    assert rows[0]["dup_of"] == 1
    keep_out = str(tmp_path / "semkeep")
    rows = _run(
        capsys,
        ["semdedup", src, "--threshold", "0.9", "--n-centroids", "1",
         "--keep-out", keep_out],
    )
    assert rows[0]["kept"] == 2 and rows[0]["dropped"] == 1


def test_cli_ann_methods(spark, tmp_path, capsys):
    src = str(tmp_path / "annsrc")
    spark.createDataFrame(
        [
            (i, [float(i == j) for j in range(4)])
            for i in range(4)
        ]
        + [(10, [0.9, 0.1, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    ).write.parquet(src)
    q = str(tmp_path / "annq")
    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    ).write.parquet(q)
    rows = _run(
        capsys, ["ann", src, "--queries", q, "-k", "1", "--method", "exact"]
    )
    # nearest non-self neighbor of e0 is vec 10 (cos ≈ 0.994)
    assert rows == [{"query_id": 0, "neighbor_id": 10, "rank": 1}]
    # ivf with every vector probed agrees with exact on this set
    rows = _run(
        capsys, ["ann", src, "--queries", q, "-k", "1", "--method", "ivf"]
    )
    assert rows[0]["neighbor_id"] == 10
    # lsh infers dim from the 4-dim vectors (a hard-coded 64 would
    # collapse all buckets); auto nbits on 5 vectors = 1 bit
    rows = _run(
        capsys, ["ann", src, "--queries", q, "-k", "1", "--method", "lsh"]
    )
    assert rows[0]["neighbor_id"] == 10
    # pq (r8): m=4 one-dim subspaces over 5 sample codes reconstruct
    # this tiny set exactly, so the asymmetric scorer agrees too
    rows = _run(
        capsys,
        ["ann", src, "--queries", q, "-k", "1", "--method", "pq",
         "--pq-m", "4"],
    )
    assert rows[0]["neighbor_id"] == 10
    # persisted IVF index: built on first use, reused on the second
    idx = str(tmp_path / "annidx")
    rows = _run(
        capsys,
        ["ann", src, "--queries", q, "-k", "1", "--method", "ivf",
         "--index", idx, "--n-centroids", "1"],
    )
    assert rows[0]["neighbor_id"] == 10
    # second run must REUSE, not rebuild (r8: existence probed via the
    # Hadoop FileSystem API so non-local URIs behave the same): a
    # rebuild would clobber an index concurrent readers may be using
    import wimbd_spark.operators.similarity as sim

    orig_build = sim.build_ivf_index

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("existing index must not be rebuilt")

    sim.build_ivf_index = boom
    try:
        rows = _run(
            capsys,
            ["ann", src, "--queries", q, "-k", "1", "--method", "ivf",
             "--index", idx, "--n-centroids", "1"],
        )
        assert rows[0]["neighbor_id"] == 10
    finally:
        sim.build_ivf_index = orig_build
    with pytest.raises(SystemExit, match="--index requires"):
        main(["ann", src, "--method", "exact", "--index", idx])
    # filtered ANN: vec 10 excluded -> nearest allowed neighbor changes
    rows = _run(
        capsys,
        ["ann", src, "--queries", q, "-k", "1", "--method", "exact",
         "--filter", "vec_id < 10"],
    )
    assert rows[0]["neighbor_id"] != 10 and rows[0]["neighbor_id"] < 10
    # same allowlist through the persisted index (all lists probed)
    rows = _run(
        capsys,
        ["ann", src, "--queries", q, "-k", "1", "--method", "ivf",
         "--index", idx, "--n-centroids", "1",
         "--filter", "vec_id < 10"],
    )
    assert rows[0]["neighbor_id"] != 10 and rows[0]["neighbor_id"] < 10


def test_cli_topk_two_pass(capsys):
    exact = _run(capsys, ["topk", DOCS, "-n", "2", "-k", "5"])
    two = _run(
        capsys,
        ["topk", DOCS, "-n", "2", "-k", "5", "--two-pass",
         "--capacity", "50000"],
    )
    assert two == exact


def test_cli_funnel(capsys):
    rows = _run(
        capsys, ["funnel", DOCS, "--min-tokens", "1", "--max-tokens", "9999"]
    )
    assert [r["stage_name"] for r in rows] == [
        "ingest", "nonempty", "token_length", "langid", "dedup_exact"
    ]
    survivors = [r["survivors"] for r in rows]
    assert survivors[0] == 500
    assert survivors == sorted(survivors, reverse=True)


def test_cli_dsir(capsys, tmp_path):
    import duckdb

    tgt = str(tmp_path / "target.parquet")
    duckdb.sql(
        f"COPY (SELECT * FROM '{DOCS}' WHERE source = 'src0') TO '{tgt}' (FORMAT PARQUET)"
    )
    rows = _run(
        capsys,
        ["dsir", DOCS, "--target", tgt, "--buckets", "512", "--show", "5"],
    )
    assert len(rows) == 5
    assert rows[0]["log_weight"] >= rows[-1]["log_weight"]
    out = str(tmp_path / "selected")
    rows = _run(
        capsys,
        ["dsir", DOCS, "--target", tgt, "--buckets", "512",
         "--select", "0.1", "--out", out],
    )
    assert rows[-1]["selected"] == 50


def test_cli_unimax(capsys):
    rows = _run(capsys, ["unimax", DOCS, "--budget", "10000",
                         "--epochs", "2.0"])
    assert len(rows) == 20
    total = sum(r["alloc"] for r in rows)
    assert abs(total - 10000) < 1e-3


def test_cli_funnel_by_source(capsys):
    rows = _run(
        capsys,
        ["funnel", DOCS, "--min-tokens", "1", "--max-tokens", "9999",
         "--by", "source"],
    )
    assert len(rows) == 5 * 20  # 20 sources x 5 stages
    ingest = sum(r["survivors"] for r in rows if r["stage_name"] == "ingest")
    assert ingest == 500


def test_cli_weighted_sample(capsys, tmp_path):
    rows = _run(
        capsys,
        ["weighted-sample", DOCS, "-k", "5", "--weight-col", "n_chars"],
    )
    assert len(rows) == 5
    assert all(r["sample_key"] >= 0 for r in rows)
    assert sorted(r["sample_rank"] for r in rows) == [1, 2, 3, 4, 5]
    # per-group form
    rows = _run(
        capsys,
        ["weighted-sample", DOCS, "-k", "2", "--weight-col", "n_chars",
         "--group-col", "source"],
    )
    per = {}
    for r in rows:
        per[r["source"]] = per.get(r["source"], 0) + 1
    assert per and all(v == 2 for v in per.values())
    # --out writes parquet and reports count
    out = str(tmp_path / "ws")
    rows = _run(
        capsys,
        ["weighted-sample", DOCS, "-k", "7", "--weight-col", "n_chars",
         "--out", out],
    )
    assert rows[0]["rows"] == 7


def test_cli_kmeans(capsys, tmp_path):
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    out = str(tmp_path / "km")
    rows = _run(
        capsys,
        ["kmeans", emb, "-k", "4", "--iters", "1", "--out", out],
    )
    sizes = [r for r in rows if "cluster" in r]
    assert len(sizes) == 4
    assert sum(r["n_members"] for r in sizes) == 500
    assert rows[-1]["out"] == out


def test_cli_train_bpe(capsys, tmp_path):
    out = str(tmp_path / "tok")
    rows = _run(
        capsys,
        ["train-bpe", DOCS, "--vocab-size", "300",
         "--min-frequency", "2", "--out", out],
    )
    assert rows[0]["n_merges"] > 0
    assert os.path.exists(os.path.join(out, "merges.txt"))
    assert os.path.exists(os.path.join(out, "vocab.json"))


def test_cli_bm25_scan_and_indexed(capsys, tmp_path):
    rows = _run(capsys, ["bm25", DOCS, "-q", "table scan", "-k", "5"])
    assert len(rows) == 5
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    assert rows[0]["score"] >= rows[-1]["score"]
    idx = str(tmp_path / "bidx")
    _run(capsys, ["index-build", DOCS, "--out", idx])
    rows_idx = _run(capsys, ["bm25", DOCS, "-q", "table scan", "-k", "5",
                             "--index", idx])
    assert rows_idx == rows


def test_cli_nb_classify(capsys, tmp_path):
    # score mode: top rows by classifier score
    rows = _run(capsys, ["nb-classify", DOCS, "--pos", DOCS, "--show", "5"])
    assert len(rows) == 5 and "score" in rows[0]
    # filter mode writes kept docs
    out = str(tmp_path / "kept")
    rows = _run(capsys, ["nb-classify", DOCS, "--pos", DOCS,
                         "--threshold", "-1000000", "--out", out])
    assert rows[0]["kept"] == 500 and rows[0]["out"] == out


def test_cli_bm25_like(capsys):
    rows = _run(capsys, ["bm25", DOCS, "--like", "42", "-k", "3"])
    assert len(rows) == 3 and 42 not in {r["doc_id"] for r in rows}
    with pytest.raises(SystemExit):
        main(["bm25", DOCS])  # neither -q nor --like
    with pytest.raises(SystemExit):
        main(["bm25", DOCS, "-q", "x", "--like", "1"])  # both


def test_cli_hybrid_and_doclens_flag(capsys, tmp_path):
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    rows = _run(capsys, ["hybrid", DOCS, "-q", "table scan",
                         "--embeddings", emb, "--vec-id", "0", "-k", "3"])
    assert len(rows) == 3 and rows[0]["rank"] == 1
    idx = str(tmp_path / "didx")
    _run(capsys, ["index-build", DOCS, "--out", idx, "--doclens"])
    assert os.path.isdir(os.path.join(idx, "_doclens"))


def test_cli_bm25_filter_and_indexed_like(capsys, tmp_path):
    # ES bool.filter on the scan path: all hits from src0, scores are
    # the unfiltered scores (index-wide stats) for those docs
    base = _run(capsys, ["bm25", DOCS, "-q", "table scan", "-k", "50"])
    rows = _run(capsys, ["bm25", DOCS, "-q", "table scan", "-k", "5",
                         "--filter", "source = 'src0'"])
    assert 1 <= len(rows) <= 5
    by_id = {r["doc_id"]: r["score"] for r in base}
    assert all(r["score"] == by_id[r["doc_id"]] for r in rows
               if r["doc_id"] in by_id)
    # indexed candidates form agrees with the scan filter
    idx = str(tmp_path / "fcidx")
    _run(capsys, ["index-build", DOCS, "--out", idx])
    rows_idx = _run(capsys, ["bm25", DOCS, "-q", "table scan", "-k", "5",
                             "--filter", "source = 'src0'",
                             "--index", idx])
    assert rows_idx == rows
    # indexed --like now runs corpus-free
    like_scan = _run(capsys, ["bm25", DOCS, "--like", "42", "-k", "3"])
    like_idx = _run(capsys, ["bm25", DOCS, "--like", "42", "-k", "3",
                             "--index", idx])
    assert like_idx == like_scan
    with pytest.raises(SystemExit):
        main(["bm25", DOCS, "--like", "42", "--filter", "source='src0'"])


def test_cli_ann_rerank(capsys, tmp_path):
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    idx = str(tmp_path / "rrankidx")
    rows = _run(capsys, ["ann", emb, "--method", "ivf", "--index", idx,
                         "--rerank", "20", "-k", "3", "--queries", emb])
    assert rows and all(r["rank"] <= 3 for r in rows)
    with pytest.raises(SystemExit):
        main(["ann", emb, "--rerank", "20"])  # no index


def test_cli_dedup_by_url(capsys, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "urldocs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": [1, 2, 3, 4],
            "text": ["a", "b", "c", "d"],
            "url": [
                "https://h.com/p",
                "https://h.com/p?utm_source=x",   # dup of 1 after norm
                "HTTPS://H.COM:443/p#frag",       # dup of 1 after norm
                "https://h.com/q",
            ],
        }),
        src,
    )
    out = str(tmp_path / "kept")
    rows = _run(capsys, ["dedup", src, "--out", out,
                         "--by-url", "url", "--order-col", "doc_id"])
    assert rows[0] == {"input": 4, "kept": 2, "dropped": 2}


def test_cli_spectrum_and_pmi(capsys, shard_dir):
    # shards: 20 docs of "a b c d|e" -> unigrams a,b,c x20; d,e x10
    rows = _run(capsys, ["spectrum", shard_dir, "-n", "1"])
    assert {r["occurrences"]: r["n_ngrams"] for r in rows} == {20: 3, 10: 2}
    rows = _run(capsys, ["pmi", shard_dir, "-k", "3", "--min-count", "5"])
    assert rows and rows[0]["rank"] == 1 and "pmi" in rows[0]
    assert "npmi" in rows[0] and rows[0]["npmi"] is not None
    rows = _run(
        capsys,
        ["pmi", shard_dir, "-k", "3", "--min-count", "5",
         "--rank-by", "npmi"],
    )
    # ranked on npmi: non-increasing down the list
    vals = [r["npmi"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_cli_zipf(capsys, shard_dir):
    rows = _run(capsys, ["zipf", shard_dir, "-n", "1", "--top", "5"])
    assert len(rows) == 1
    r = rows[0]
    assert set(r) == {"slope", "intercept", "n_points"}
    assert r["n_points"] == 5 and r["slope"] <= 0


def test_cli_despan_report(capsys, tmp_path):
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "p q r s t u alpha beta gamma delta",
                "zeta p q r s t u omega",
                "entirely different words in here now",
            ],
        }
    ).to_parquet(tmp_path / "docs.parquet")
    rows = _run(
        capsys,
        ["despan", str(tmp_path / "docs.parquet"), "--out", "/dev/null",
         "--report", "5"],
    )
    assert rows and all(
        set(r) == {"fp", "n_docs", "example_doc", "snippet"} for r in rows
    )
    assert rows[0]["n_docs"] == 2
    assert rows[0]["snippet"] in "p q r s t u"


def test_cli_indices(capsys):
    # E2 parity verb: table name + row count + schema per catalog table
    rows = _run(capsys, ["indices", "/root/testdata/sf0.001"])
    by_name = {r["name"]: r for r in rows}
    assert {"documents", "events", "lineitem"} <= set(by_name)
    assert by_name["documents"]["count"] == 500
    assert by_name["documents"]["columns"]["text"] == "string"


def test_cli_ivf_maintain(capsys, tmp_path):
    import pandas as pd

    pd.DataFrame(
        {
            "vec_id": list(range(12)),
            "embedding": [
                [1.0, 0.01 * i, 0.0, 0.0] if i < 6
                else [0.0, 0.0, 1.0, 0.01 * i]
                for i in range(12)
            ],
        }
    ).to_parquet(tmp_path / "vecs.parquet")
    idx = str(tmp_path / "ivfidx")
    # build via the ann verb's first-use path
    _run(capsys, ["ann", str(tmp_path / "vecs.parquet"), "--method", "ivf",
                  "--index", idx, "-k", "2"])
    rows = _run(capsys, ["ivf-maintain", idx])
    assert rows[0]["n_vectors"] == 12
    assert rows[0]["needs_recluster"] is False  # under min_rows
    fresh = str(tmp_path / "ivfidx2")
    rows = _run(capsys, ["ivf-maintain", idx, "--recluster-to", fresh,
                         "--n-centroids", "2"])
    assert rows[0]["reclustered_to"] == fresh
    rows = _run(capsys, ["ivf-maintain", fresh])
    assert rows[0]["n_vectors"] == 12 and rows[0]["n_lists"] >= 1


def test_cli_quality_filter_c4_and_both(spark, tmp_path, capsys):
    from wimbd_spark.cli import main

    import pandas as pd

    good_line = "This sentence has more than five words in it."
    # passes BOTH gates: >= 50 tokens, no repeated 2-grams, 3+ kept lines
    # every bigram contains an indexed word → no repeated 2-grams
    keeper = "\n".join(
        f"The alpha{i} of bravo{i} gives charlie{i} and delta{i} more."
        for i in range(10)
    )
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                keeper,
                keeper + "\nfunction f() { return 1; }",  # c4: curly brace
                # 3 kept lines (passes c4) but 27 tokens (gopher: short)
                "\n".join([good_line] * 3),
            ],
        }
    ).to_parquet(tmp_path / "in.parquet")

    out = tmp_path / "kept_c4"
    rc = main(["quality-filter", str(tmp_path / "in.parquet"),
               "--out", str(out), "--rules", "c4"])
    assert rc == 0
    kept = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert kept == {1, 3}  # c4 alone doesn't mind short docs
    assert "curly_brace" in capsys.readouterr().out

    out = tmp_path / "kept_both"
    rc = main(["quality-filter", str(tmp_path / "in.parquet"),
               "--out", str(out), "--rules", "both"])
    assert rc == 0
    kept = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert kept == {1}
    printed = capsys.readouterr().out
    assert "curly_brace" in printed and "too_short" in printed


def test_cli_datasheet(capsys, shard_dir):
    rows = _run(capsys, ["datasheet", shard_dir,
                         "--sections", "overview,languages"])
    secs = {r["section"] for r in rows}
    assert secs == {"overview", "languages"}
    ov = [r for r in rows if r["section"] == "overview"][0]
    assert ov["n_docs"] > 0 and "total_tokens" in ov


def test_cli_span_dedup(spark, capsys, tmp_path):
    import pandas as pd

    s = [f"Sentence number {i} stands right here." for i in range(5)]
    pd.DataFrame(
        {"doc_id": [1, 2], "text": [" ".join(s), " ".join(s[:3]) + " A closer."]}
    ).to_parquet(tmp_path / "docs.parquet")
    out = tmp_path / "deduped"
    rows = _run(capsys, ["span-dedup", str(tmp_path / "docs.parquet"),
                         "--out", str(out)])
    assert rows[0]["docs"] == 2
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(str(out)).collect()}
    assert got[1] == " ".join(s)
    assert got[2] == "A closer."


def test_cli_report_datasheet(capsys):
    """The one-command datasheet (r12 VERDICT #6): every section row
    arrives as a JSON line tagged with its section, and the overview
    totals match the corpus."""
    rows = _run(
        capsys,
        ["report", "/root/testdata/sf0.001/documents.parquet"],
    )
    by_section = {}
    for r in rows:
        by_section.setdefault(r["section"], []).append(r)
    # pii is absent here: sf0.001 holds no PII occurrences, so its
    # section emits zero rows (covered with hits in test_report.py)
    assert {
        "overview", "sources", "languages", "quality",
        "quality_rules", "lengths",
    } <= set(by_section)
    ov = by_section["overview"][0]
    assert ov["n_docs"] == 500
    assert ov["total_tokens"] > 0
    assert len(by_section["lengths"]) == 5  # one row per percentile
    # the CCNet-fidelity number is visible in the one-command report
    q = by_section["quality"][0]
    assert q["uni_ppl_median"] > 0 and q["bi_ppl_median"] > 0


def test_cli_report_sections_subset(capsys):
    rows = _run(
        capsys,
        [
            "report", "/root/testdata/sf0.001/documents.parquet",
            "--sections", "overview,sources",
        ],
    )
    assert {r["section"] for r in rows} == {"overview", "sources"}


def test_cli_report_unknown_section():
    import pytest

    with pytest.raises(ValueError, match="unknown datasheet sections"):
        main(
            [
                "report", "/root/testdata/sf0.001/documents.parquet",
                "--sections", "nope",
            ]
        )


def test_cli_ivf_maintain_absorb_without_delta_is_clean_error(tmp_path):
    """--absorb-to on an index with no delta tier exits with a usage
    error instead of a raw ValueError traceback (r12 ADVICE)."""
    import pandas as pd
    import pytest

    pd.DataFrame(
        {
            "vec_id": list(range(8)),
            "embedding": [[1.0, 0.01 * i, 0.0, 0.0] for i in range(8)],
        }
    ).to_parquet(tmp_path / "emb.parquet")
    from wimbd_spark.operators.similarity import build_ivf_index
    from wimbd_spark.session import get_spark

    spark = get_spark(app_name="t", master="local[2]")
    idx = str(tmp_path / "idx")
    build_ivf_index(
        spark.read.parquet(str(tmp_path / "emb.parquet")),
        idx,
        n_centroids=2,
    )
    with pytest.raises(SystemExit, match="nothing to absorb"):
        main(["ivf-maintain", idx, "--absorb-to", str(tmp_path / "g2")])


def _vec_parquet(tmp_path, name="emb.parquet", n=48):
    import pandas as pd

    rows = []
    for c in range(4):
        for i in range(n // 4):
            v = [0.05] * 4
            v[c] = 1.0
            v[(c + 1) % 4] += 0.03 * i
            rows.append((c * 100 + i, v))
    pd.DataFrame(
        {"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}
    ).to_parquet(tmp_path / name)
    return str(tmp_path / name)


def test_cli_ann_bulk(capsys, tmp_path):
    """`ann --bulk`: the corpus-as-queries knn_join path — builds the
    index on first use, returns per-query ranked neighbors for EVERY
    corpus row; --min-cosine thins the pairs."""
    emb = _vec_parquet(tmp_path)
    idx = str(tmp_path / "bulkidx")
    rows = _run(
        capsys,
        ["ann", emb, "--method", "ivf", "--index", idx, "--bulk",
         "-k", "2", "--n-probe", "2", "--n-centroids", "4"],
    )
    qids = {r["query_id"] for r in rows}
    assert len(qids) == 48 and all(r["rank"] <= 2 for r in rows)
    rows2 = _run(
        capsys,
        ["ann", emb, "--method", "ivf", "--index", idx, "--bulk",
         "-k", "2", "--n-probe", "2", "--min-cosine", "0.999"],
    )
    assert 0 < len(rows2) < len(rows)
    with pytest.raises(SystemExit, match="--bulk requires --index"):
        main(["ann", emb, "--bulk"])
    with pytest.raises(SystemExit, match="composes with neither"):
        main(["ann", emb, "--index", idx, "--method", "ivf", "--bulk",
              "--k-fill"])


def test_cli_semdedup_index(capsys, tmp_path):
    """`semdedup --index`: the bulk IVF SemDeDup path — drop rows
    carry (id, dup_of); --keep-out writes the survivors."""
    emb = _vec_parquet(tmp_path)
    idx = str(tmp_path / "sdidx")
    rows = _run(
        capsys,
        ["semdedup", emb, "--index", idx, "--threshold", "0.999",
         "--n-probe", "4", "--n-centroids-index", "4"],
    )
    assert rows and all(r["dup_of"] < r["vec_id"] for r in rows)
    out = str(tmp_path / "sdkept")
    rep = _run(
        capsys,
        ["semdedup", emb, "--index", idx, "--threshold", "0.999",
         "--keep-out", out],
    )
    assert rep[0]["kept"] + rep[0]["dropped"] == 48
    assert rep[0]["dropped"] == len(rows)


def test_cli_ann_bulk_rerank(capsys, tmp_path):
    """`ann --bulk --rerank N`: the codes-only two-stage bulk path
    (knn_join_pq) — builds a PQ index on first use via --rerank's
    pq_m wiring, returns ranked exact-rerank neighbors for every
    corpus row."""
    emb = _vec_parquet(tmp_path)
    idx = str(tmp_path / "bulkpqidx")
    rows = _run(
        capsys,
        ["ann", emb, "--method", "ivf", "--index", idx, "--bulk",
         "--rerank", "6", "-k", "2", "--n-probe", "2",
         "--n-centroids", "4", "--pq-m", "2", "--pq-codes", "4"],
    )
    assert len({r["query_id"] for r in rows}) == 48
    assert all(r["rank"] <= 2 for r in rows)
    with pytest.raises(SystemExit, match="min-cosine applies"):
        main(["ann", emb, "--method", "ivf", "--index", idx, "--bulk",
              "--rerank", "6", "--min-cosine", "0.5"])
