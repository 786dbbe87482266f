"""Execute the import-gated MODEL branches of operators.models with
API-faithful stand-in modules shipped to executors via addPyFile.

The container has none of the optional model packages (pycld2,
TextBlob, alt-profanity-check), so the model halves of P16/P17/P19
could never run — COVERAGE.md's parity matrix tracked them as fully
untested. These tests close the PLUMBING half of that gap: the real
branch code (driver-side gate, pandas_udf iterator batching,
import-once-per-task, null handling, output contract) executes against
a stub that implements the same public API with a tiny deterministic
model. Value-level parity with the real models remains untested —
container-inherent — and the stubs are intentionally independent
implementations, not copies of the fallback twins, so the
branch-vs-fallback agreement measured here is a real (if weak) signal.

The stub gates are DRIVER-side (`models._have`), so removing the stub
dir from the driver's sys.path at teardown restores fallback behavior
for every later test; executors may cache the stub modules but never
import them again once the driver gate is False.
"""

import sys
import textwrap

import pytest
from pyspark.sql import functions as F

STUBS = {
    "textblob": """
        class _Sentiment:
            def __init__(self, polarity, subjectivity=0.0):
                self.polarity = polarity
                self.subjectivity = subjectivity

        class TextBlob:
            _POS = {"good", "great", "excellent", "happy", "love"}
            _NEG = {"bad", "terrible", "awful", "sad", "hate"}

            def __init__(self, text):
                self._w = [w.strip(".,!?;:").lower() for w in text.split()]

            @property
            def sentiment(self):
                p = sum(w in self._POS for w in self._w)
                n = sum(w in self._NEG for w in self._w)
                return _Sentiment((p - n) / max(len(self._w), 1))
    """,
    "pycld2": """
        _PROFILES = {
            ("en", "ENGLISH"): {"the", "and", "of", "to", "is", "in"},
            ("fr", "FRENCH"): {"le", "la", "et", "les", "des", "est"},
            ("de", "GERMAN"): {"der", "die", "und", "das", "ist", "ein"},
        }

        def detect(text):
            words = set(text.lower().split())
            best, hits = ("un", "Unknown"), 0
            for (code, name), prof in sorted(_PROFILES.items()):
                h = len(words & prof)
                if h > hits:
                    best, hits = (code, name), h
            reliable = hits >= 1
            details = ((best[1], best[0], 99, float(hits)),)
            return (reliable, len(text), details)
    """,
    "profanity_check": """
        import numpy as np

        _BAD = {"damn", "hell", "crap"}

        def predict_prob(texts):
            return np.array([
                min(1.0, sum(w in _BAD for w in t.lower().split()) / 2.0)
                for t in texts
            ])

        def predict(texts):
            return (predict_prob(texts) >= 0.5).astype(int)
    """,
}


@pytest.fixture(scope="module")
def model_stubs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("model_stubs")
    for name, src in STUBS.items():
        (d / f"{name}.py").write_text(textwrap.dedent(src))
        spark.sparkContext.addPyFile(str(d / f"{name}.py"))
    sys.path.insert(0, str(d))
    try:
        yield str(d)
    finally:
        sys.path.remove(str(d))
        for name in STUBS:
            sys.modules.pop(name, None)


def test_sentiment_model_branch(spark, model_stubs):
    from wimbd_spark.operators import models
    from wimbd_spark.operators.textqc import lexicon_polarity

    assert models._have("textblob")  # the gate must pick the branch
    df = spark.createDataFrame(
        [
            (1, "this is a good and great day"),
            (2, "a terrible awful bad outcome"),
            (3, "the cat sat on the mat"),
            (4, None),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["pol"]
        for r in df.select(
            "doc_id", models.sentiment_polarity(F.col("text")).alias("pol")
        ).collect()
    }
    assert got[1] > 0 and got[2] < 0 and got[3] == 0.0 and got[4] == 0.0
    # branch-vs-fallback SIGN agreement on clearly-polar texts
    fb = {
        r["doc_id"]: r["pol"]
        for r in df.filter("doc_id < 3").select(
            "doc_id", lexicon_polarity(F.col("text")).alias("pol")
        ).collect()
    }
    for k in fb:
        assert (got[k] > 0) == (fb[k] > 0), (k, got[k], fb[k])


def test_language_id_model_branch(spark, model_stubs):
    from wimbd_spark.operators import models

    assert models._have("pycld2")
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is in the house"),
            (2, "le chat et la maison est belle"),
            (3, "zzz qqq xxx"),
            (4, None),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", models.language_id(F.col("text")).alias("lang")
        ).collect()
    }
    assert got == {1: "en", 2: "fr", 3: "un", 4: "un"}


def test_profanity_model_branch(spark, model_stubs):
    from wimbd_spark.operators import models

    assert models._have("profanity_check")
    df = spark.createDataFrame(
        [(1, "damn hell this is bad"), (2, "a perfectly clean sentence"),
         (3, None)],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["p"]
        for r in df.select(
            "doc_id", models.profanity_prob(F.col("text")).alias("p")
        ).collect()
    }
    assert 0.0 <= got[2] < got[1] <= 1.0
    assert got[3] == 0.0  # nulls are filled, never crash the model


def test_gates_restored_after_stub_teardown(spark, tmp_path_factory):
    # runs AFTER the stub module's last use in this file; the fixture
    # teardown runs at module end, so here we only assert the cleanup
    # logic itself: removing the dir from sys.path flips the gate
    import textwrap as tw

    from wimbd_spark.operators import models

    d = tmp_path_factory.mktemp("gate_probe")
    (d / "fakegatepkg.py").write_text(tw.dedent("x = 1"))
    sys.path.insert(0, str(d))
    assert models._have("fakegatepkg")
    sys.path.remove(str(d))
    sys.modules.pop("fakegatepkg", None)
    import importlib

    importlib.invalidate_caches()
    assert not models._have("fakegatepkg")
