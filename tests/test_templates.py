"""Promptsource contamination-template ingest (reference
wimbd/contamination/promptsource_parse.py:30-43): yaml parse, field
extraction parity, tree loader, eval-phrase table, CLI."""

import json
import subprocess
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from wimbd_spark.sources.templates import (
    load_template_fields,
    parse_templates_yaml,
    template_eval_phrases,
    template_fields,
)

FIXTURE = str(Path(__file__).parent / "fixtures" / "templates")


def test_field_extraction_reference_parity():
    """Exactly the reference regex semantics
    (promptsource_parse.py:37-39): spaces stripped first, then only
    simple {{var}} names — attribute access, filters, and indexing
    are NOT fields; duplicates are kept in order."""
    assert template_fields("{{premise}} implies {{ hypothesis }}?") == [
        "premise",
        "hypothesis",
    ]
    # not simple vars → excluded (the reference's behavior)
    assert template_fields("{{answers.text}} {{x | trim}} {{a[0]}}") == []
    assert template_fields("{{a}} and {{a}} again") == ["a", "a"]
    assert template_fields("no fields at all") == []
    assert template_fields("{{snake_case-name9}}") == ["snake_case-name9"]


def test_parse_templates_yaml_custom_tags():
    text = Path(FIXTURE, "anli", "templates.yaml").read_text()
    parsed = parse_templates_yaml(text)
    assert [t["template_name"] for t in parsed] == [
        "can we infer",
        "second template (not taken in first-only mode)",
    ]
    # {{answer_choices[label]}} and {{summary | trim}} are not fields
    assert parsed[0]["fields"] == ["premise", "hypothesis"]
    assert parsed[1]["fields"] == ["premise"]
    with pytest.raises(ValueError, match="mapping"):
        parse_templates_yaml("- just\n- a\n- list\n")


def test_load_template_fields_tree(spark):
    df = load_template_fields(spark, FIXTURE)
    rows = {
        (r.dataset, r.subset): (r.template_name, list(r.fields))
        for r in df.collect()
    }
    # first template only (reference takes templates.values()[0])
    assert rows == {
        ("anli", ""): ("can we infer", ["premise", "hypothesis"]),
        ("glue", "mrpc"): ("paraphrase", ["sentence1", "sentence2"]),
    }
    all_t = load_template_fields(spark, FIXTURE, first_template_only=False)
    assert all_t.count() == 3
    with pytest.raises(ValueError, match="not a directory"):
        load_template_fields(spark, FIXTURE + "/nope")


def test_template_eval_phrases(spark):
    ex = spark.createDataFrame(
        [
            (1, "a known premise", "its hypothesis", 7),
            (2, None, "  ", 8),  # null + blank dropped
        ],
        ["ex_id", "premise", "hypothesis", "label"],
    )
    fields_df = load_template_fields(spark, FIXTURE)
    # DataFrame form: glue's sentence1/2 are absent from ex → ignored
    got = sorted(
        (r.field, r.phrase)
        for r in template_eval_phrases(ex, fields_df).collect()
    )
    assert got == [
        ("hypothesis", "its hypothesis"),
        ("premise", "a known premise"),
    ]
    # list form + keep_cols
    keep = template_eval_phrases(
        ex, ["premise"], keep_cols=["ex_id"]
    ).collect()
    assert [(r.ex_id, r.field, r.phrase) for r in keep] == [
        (1, "premise", "a known premise")
    ]
    with pytest.raises(ValueError, match="none of the template fields"):
        template_eval_phrases(ex, ["absent_col"])


def test_templates_cli(tmp_path):
    env_cmd = [sys.executable, "-m", "wimbd_spark.cli"]
    out = subprocess.run(
        env_cmd + ["templates", FIXTURE],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert {r["dataset"] for r in rows} == {"anli", "glue"}
    assert rows[0]["fields"] == ["premise", "hypothesis"]


def test_templates_cli_phrase_table(spark, tmp_path):
    ex_path = str(tmp_path / "examples.parquet")
    spark.createDataFrame(
        [("p one", "h one"), ("p two", None)],
        ["premise", "hypothesis"],
    ).write.parquet(ex_path)
    out_path = str(tmp_path / "phrases.parquet")
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "wimbd_spark.cli",
            "templates",
            FIXTURE,
            "--examples",
            ex_path,
            "--out",
            out_path,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    got = sorted(
        (r.field, r.phrase)
        for r in spark.read.parquet(out_path).collect()
    )
    assert got == [
        ("hypothesis", "h one"),
        ("premise", "p one"),
        ("premise", "p two"),
    ]


def test_indices_cli():
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "wimbd_spark.cli",
            "indices",
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = {json.loads(l)["name"]: json.loads(l) for l in out.stdout.strip().splitlines()}
    assert rows["documents"]["count"] == 500
    assert rows["documents"]["columns"]["text"] == "string"
    assert "lineitem" in rows and "events" in rows
