"""Property-style tests: Spark operators vs pure-Python reference
implementations over seeded random inputs, evaluated in ONE Spark job
per property (per-example round-trips would be prohibitively slow).

Alphabet stays ASCII: Java's \\s is ASCII-only while Python's
str.split() handles Unicode whitespace — a documented divergence, not
a bug (the canonical tokenizer is defined by the Spark semantics).
"""

import random

import pytest
from pyspark.sql import functions as F

from wimbd_spark.functions.text import ngram_strings, tokenize
from wimbd_spark.search import _phrase_window_match

SEED = 20260813
WORDS = ["a", "bb", "ccc", "the", "scan", "x1", "zz"]
WS = [" ", "  ", "\t", "\n"]


def _random_texts(n, max_tokens=12):
    rng = random.Random(SEED)
    out = []
    for _ in range(n):
        k = rng.randint(0, max_tokens)
        toks = [rng.choice(WORDS) for _ in range(k)]
        text = rng.choice(["", " "]) + rng.choice(WS).join(toks) + rng.choice(["", " "])
        out.append((text, toks))
    return out


def test_tokenize_matches_python_split(spark):
    cases = _random_texts(300)
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], ["i", "text"]
    )
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", tokenize(F.col("text")).alias("toks")).collect()
    }
    for i, (text, _) in enumerate(cases):
        assert got[i] == text.split(), repr(text)


def test_uax29_ascii_fast_path_matches_char_loop():
    # the compiled-regex ASCII fast path must segment identically to
    # the reference char loop (which stays authoritative for unicode)
    import string

    from wimbd_spark.functions.text import _ASCII_TOKEN, _uax29_words_loop

    rng = random.Random(SEED)
    alphabet = (
        string.ascii_letters + string.digits + " _.,;:'!?-()[]\"/\\\n\t#%&*"
    )
    for _ in range(5000):
        s = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 60))
        )
        assert _ASCII_TOKEN.findall(s) == _uax29_words_loop(s), repr(s)


def test_ngrams_match_python_windows(spark):
    cases = _random_texts(200)
    for n in (1, 2, 3):
        df = spark.createDataFrame(
            [(i, t) for i, (t, _) in enumerate(cases)], ["i", "text"]
        )
        got = {
            r["i"]: r["g"]
            for r in df.select(
                "i", ngram_strings(tokenize(F.col("text")), n).alias("g")
            ).collect()
        }
        for i, (text, _) in enumerate(cases):
            toks = text.split()
            expect = [
                " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            ]
            assert got[i] == expect, (n, text)


def _py_slop_match(tokens, phrase, slop):
    ptoks = phrase.split()
    L, W = len(ptoks), len(ptoks) + slop
    for i in range(len(tokens)):
        window = tokens[i : i + W]
        it = iter(window)
        if all(any(w == p for w in it) for p in ptoks):
            return True
    return False


def test_phrase_slop_matches_python(spark):
    cases = _random_texts(300, max_tokens=8)
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], ["i", "text"]
    )
    for phrase in ["the scan", "a bb ccc", "zz"]:
        for slop in (0, 1, 2):
            got = {
                r["i"]: r["m"]
                for r in df.select(
                    "i",
                    F.coalesce(
                        _phrase_window_match(
                            tokenize(F.col("text")), phrase, slop
                        ),
                        F.lit(False),
                    ).alias("m"),
                ).collect()
            }
            for i, (text, _) in enumerate(cases):
                expect = _py_slop_match(text.split(), phrase, slop)
                assert got[i] == expect, (text, phrase, slop)


def test_indexed_batch_matches_scan_property(spark, tmp_path):
    # Random small corpus, random phrase batch (duplicate tokens,
    # duplicate phrases, absent tokens, slop): the one-pass batched
    # postings matcher must agree with the scan-path count for every
    # phrase. This is the parity contract of the msearch-batching twin.
    from wimbd_spark.index import (
        build_phrase_index,
        count_documents_for_each_phrase_indexed,
        load_phrase_index,
    )
    from wimbd_spark.search import count_documents_for_each_phrase

    rng = random.Random(SEED + 1)
    docs = []
    for i in range(120):
        k = rng.randint(1, 10)
        docs.append((i, " ".join(rng.choice(WORDS) for _ in range(k))))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    path = str(tmp_path / "propidx")
    build_phrase_index(df, path, num_files=2)
    idx = load_phrase_index(spark, path)

    phrases = []
    for _ in range(25):
        L = rng.randint(1, 4)
        phrases.append(
            " ".join(rng.choice(WORDS + ["qq"]) for _ in range(L))
        )
    phrases.append(phrases[0])  # duplicate phrase entry
    for slop in (0, 2):
        scan = {
            r["phrase"]: r["count"]
            for r in count_documents_for_each_phrase(
                df, phrases, slop=slop
            ).collect()
        }
        idxed = {
            r["phrase"]: r["count"]
            for r in count_documents_for_each_phrase_indexed(
                idx, phrases, slop=slop
            ).collect()
        }
        assert idxed == scan, slop


def test_sessionize_properties(spark):
    rng = random.Random(SEED)
    import datetime as dt

    rows = []
    eid = 0
    for user in range(20):
        t = dt.datetime(2024, 1, 1)
        for _ in range(rng.randint(0, 30)):
            t += dt.timedelta(seconds=rng.choice([10, 100, 1000, 5000]))
            rows.append((eid, t, user))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    from wimbd_spark.operators.windows import sessionize

    out = sessionize(df, gap_s=1800).collect()
    by_user = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["ts"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rs in by_user.items():
        prev = None
        for r in rs:
            if prev is not None:
                gap = (r["ts"] - prev["ts"]).total_seconds()
                if gap > 1800:
                    assert r["session_id"] == prev["session_id"] + 1
                else:
                    assert r["session_id"] == prev["session_id"]
            else:
                assert r["session_id"] == 1
            prev = r


def test_minhash_jaccard_unbiased(spark):
    """MinHash collision rate ≈ true Jaccard (within generous CI)."""
    base = [f"tok{i}" for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[:30] + [f"other{i}" for i in range(10)])
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    from wimbd_spark.operators.neardup import (
        jaccard_pairs,
        minhash_signatures,
    )

    K = 64
    sigs = {r["doc_id"]: [r[f"mh{j}"] for j in range(K)]
            for r in minhash_signatures(df, num_hashes=K, shingle_n=2).collect()}
    est = sum(x == y for x, y in zip(sigs[1], sigs[2])) / K
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    true_j = jaccard_pairs(df, pairs, shingle_n=2).collect()[0]["jaccard"]
    assert abs(est - true_j) < 0.2  # 64 hashes → σ ≈ 0.06


def test_tfrecord_roundtrip_property(tmp_path):
    """Writer→reader round-trip over randomized feature dicts: every
    kind (bytes/str incl. non-ASCII, int64 full range, float lists),
    scalar and list shapes, CRC-verified framing. No Spark needed —
    this pins the codec pair itself."""
    from wimbd_spark.sources.tfrecord import (
        decode_example,
        iter_tfrecord_payloads,
        write_tfrecord,
    )

    rng = random.Random(SEED)
    words = ["", "a", "héllo", "日本語", "x" * 300]
    examples = []
    for _ in range(50):
        ex = {}
        for f in range(rng.randint(1, 5)):
            kind = rng.choice(["s", "i", "f", "ls", "li", "lf", "b"])
            name = f"f{f}_{kind}"
            if kind == "s":
                ex[name] = rng.choice(words)
            elif kind == "b":
                ex[name] = bytes(rng.randrange(256) for _ in range(rng.randint(0, 20)))
            elif kind == "i":
                ex[name] = rng.randint(-(2**63), 2**63 - 1)
            elif kind == "f":
                ex[name] = rng.uniform(-1e6, 1e6)
            elif kind == "ls":
                ex[name] = [rng.choice(words) for _ in range(rng.randint(1, 4))]
            elif kind == "li":
                ex[name] = [rng.randint(-(2**31), 2**31) for _ in range(rng.randint(1, 6))]
            else:
                ex[name] = [rng.uniform(-10, 10) for _ in range(rng.randint(1, 6))]
        examples.append(ex)

    p = str(tmp_path / "prop.tfrecord")
    write_tfrecord(p, examples)
    payloads = list(iter_tfrecord_payloads(p, verify_crc=True))
    assert len(payloads) == len(examples)
    import struct as _s

    for ex, payload in zip(examples, payloads):
        feats = decode_example(payload)
        assert set(feats) == set(ex)
        for name, want in ex.items():
            kind, got = feats[name]
            wants = want if isinstance(want, list) else [want]
            if kind == "bytes":
                got = [
                    g.decode("utf-8") if isinstance(wants[0], str) else g
                    for g in got
                ]
                assert got == wants
            elif kind == "int64":
                assert got == wants
            else:  # float32 round-trips through single precision
                assert got == [
                    _s.unpack("<f", _s.pack("<f", w))[0] for w in wants
                ]


def test_bpe_cache_and_determinism(tmp_path):
    """Encoding is deterministic, cache-independent, and concatenation
    of pre-token pieces reconstructs the original bytes."""
    import json as _json

    from wimbd_spark.functions.bpe import (
        _bytes_to_unicode,
        load_bpe_assets,
        make_encoder,
    )

    (tmp_path / "merges.txt").write_text("#version: 0.2\nh e\nhe l\nl o")
    (tmp_path / "vocab.json").write_text(_json.dumps({}))
    ranks, vocab = load_bpe_assets(str(tmp_path))
    rng = random.Random(SEED)
    alphabet = "helo hxy!\t日"
    u2b = {v: k for k, v in _bytes_to_unicode().items()}
    for _ in range(100):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        t1, _ = make_encoder(ranks, vocab)(text)   # fresh cache
        enc = make_encoder(ranks, vocab)
        t2, t3 = enc(text)[0], enc(text)[0]        # warm cache
        assert t1 == t2 == t3
        rebuilt = bytes(u2b[ch] for tok in t1 for ch in tok)
        assert rebuilt == text.encode("utf-8")


def test_fix_mojibake_never_corrupts_clean_ascii():
    from wimbd_spark.operators.models import fix_mojibake

    rng = random.Random(SEED)
    chars = "abc XYZ 0123 .,!?-_'\"\n\t"
    for _ in range(200):
        s = "".join(rng.choice(chars) for _ in range(rng.randint(0, 40)))
        assert fix_mojibake(s) == s


def test_misra_gries_guarantees_property(spark):
    """Over seeded random Zipf-ish streams: (a) recounted candidate
    counts are EXACT; (b) any gram with true frequency > N/capacity is
    returned when k covers it; (c) capacity >= distinct ==> identical
    to the exact operator. One Spark job per check."""
    from collections import Counter

    from wimbd_spark.operators.heavyhitters import topk_ngrams_2pass
    from wimbd_spark.operators.topk import topk_ngrams

    rng = random.Random(SEED + 7)
    vocab = [f"w{i}" for i in range(200)]
    # Zipf-ish: token i drawn with weight 1/(i+1)
    weights = [1.0 / (i + 1) for i in range(len(vocab))]
    texts = []
    for _ in range(40):
        k = rng.randint(5, 120)
        texts.append(" ".join(rng.choices(vocab, weights=weights, k=k)))
    truth = Counter()
    for t in texts:
        truth.update(t.split())
    n_total = sum(truth.values())

    df = spark.createDataFrame([(t,) for t in texts], ["text"]).repartition(5)

    capacity = 32
    k = 20
    got = topk_ngrams_2pass(df, n=1, k=k, capacity=capacity).collect()
    # (a) exactness of returned counts
    for r in got:
        assert r["count"] == truth[r["ngram"]], r
    # (b) guaranteed-heavy grams present (threshold is the MERGED
    # bound N/capacity; returned set is top-k so only check grams
    # that rank within k by true count)
    ranked_truth = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    got_set = {r["ngram"] for r in got}
    for g, c in ranked_truth:
        if c > n_total / capacity:
            assert g in got_set, (g, c, n_total / capacity)
    # (c) big capacity == exact operator, any layout
    exact = [tuple(r) for r in topk_ngrams(df, 1, k).collect()]
    two = [
        tuple(r)
        for r in topk_ngrams_2pass(
            df.repartition(3), 1, k, capacity=10_000
        ).collect()
    ]
    assert two == exact


def test_unimax_waterfilling_properties(spark):
    """Over seeded random source sizes: Σalloc == min(budget, Σcap),
    no alloc exceeds its cap, every UNCAPPED source gets the same
    share, and no capped source's cap exceeds an uncapped share
    (the waterfilling optimality conditions). One Spark job per case."""
    from wimbd_spark.operators.mixture import unimax_allocation
    from pyspark.sql import Row

    rng = random.Random(SEED + 11)
    for case in range(6):
        n_sources = rng.randint(1, 9)
        sizes = {f"s{i}": rng.randint(1, 400) for i in range(n_sources)}
        budget = rng.randint(1, sum(sizes.values()) * 3)
        epochs = rng.choice([0.5, 1.0, 2.0])
        df = spark.createDataFrame(
            [
                Row(doc_id=i, source=s, text=" ".join(["w"] * k))
                for i, (s, k) in enumerate(sizes.items())
            ]
        )
        rows = unimax_allocation(
            df, budget_tokens=budget, max_epochs=epochs
        ).collect()
        caps = {r["source"]: r["cap"] for r in rows}
        allocs = {r["source"]: r["alloc"] for r in rows}
        total_cap = sum(caps.values())
        assert sum(allocs.values()) == pytest.approx(
            min(budget, total_cap), abs=1e-3
        ), (case, sizes, budget, epochs)
        uncapped = [a for s, a in allocs.items() if a < caps[s] - 1e-9]
        for s, a in allocs.items():
            assert a <= caps[s] + 1e-9
        if uncapped:
            share = uncapped[0]
            assert all(abs(a - share) < 1e-6 for a in uncapped)
            # optimality: every fully-allocated (capped) source has
            # cap <= the uncapped share (else budget should flow there)
            for s, a in allocs.items():
                if a >= caps[s] - 1e-9:
                    assert caps[s] <= share + 1e-6


def test_funnel_matches_python_reimplementation(spark):
    """Random texts through the funnel vs an independent pure-Python
    computation of every stage (nonempty, length, stopword-profile
    langid with the engine's tie-break, md5 keep-first dedup)."""
    import hashlib

    from wimbd_spark.operators.funnel import quality_funnel
    from wimbd_spark.operators.textqc import STOPWORDS

    rng = random.Random(SEED + 13)
    en = STOPWORDS["en"][:6]
    es = STOPWORDS["es"][:6]
    pool = en + es + ["xq1", "xq2", "xq3"]
    rows = []
    for i in range(120):
        k = rng.randint(0, 14)
        text = " ".join(rng.choice(pool) for _ in range(k))
        if i % 17 == 0:
            text = None
        elif i % 19 == 0:
            text = "   "
        rows.append((i, text))
    # force duplicates
    rows += [(1000 + i, rows[i][1]) for i in range(0, 40, 5)]

    def py_funnel(min_t, max_t, lang):
        s = [0, 0, 0, 0, 0]
        seen = set()
        for _, text in sorted(rows):
            s[0] += 1
            if text is None or text.strip() == "":
                continue
            s[1] += 1
            toks = text.split()
            if not (min_t <= len(toks) <= max_t):
                continue
            s[2] += 1
            scores = {
                lg: sum(1 for t in toks if t.lower() in ws)
                for lg, ws in STOPWORDS.items()
            }
            mx = max(scores.values())
            pred = "un"
            if mx > 0:
                for lg in STOPWORDS:  # engine tie-break: profile order
                    if scores[lg] == mx:
                        pred = lg
                        break
            if pred != lang:
                continue
            s[3] += 1
            h = hashlib.md5(text.encode()).hexdigest()
            if h not in seen:
                seen.add(h)
                s[4] += 1
        return s

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        r["survivors"]
        for r in quality_funnel(df, min_tokens=2, max_tokens=10, lang="en")
        .orderBy("stage")
        .collect()
    ]
    assert got == py_funnel(2, 10, "en")


def test_slop_combos_cover_all_window_assignments():
    # r8: the anchored combo enumeration (_slop_combos) must agree with
    # a brute-force matcher — "phrase occurs as an in-order subsequence
    # within a window of L+slop tokens" — on random token streams.
    # Pure-Python property: the enumeration IS the semantics every
    # slop path (indexed, scan, decontaminate, streaming) compiles to.
    import math

    from wimbd_spark.index import _slop_combos

    rng = random.Random(42)
    voc = ["a", "b", "c", "d"]
    for trial in range(300):
        L = rng.randint(1, 4)
        slop = rng.randint(0, 3)
        toks = [rng.choice(voc) for _ in range(rng.randint(0, 12))]
        phrase = [rng.choice(voc) for _ in range(L)]
        combos = _slop_combos(L, slop)
        # structural invariants
        assert len(combos) == math.comb(L + slop - 1, L - 1)
        for c in combos:
            assert c[0] == 1 and list(c) == sorted(set(c))
            assert c[-1] <= L + slop

        # brute force: any strictly-increasing position assignment
        # with span <= L + slop - 1
        def brute():
            n = len(toks)

            def rec(slot, prev, first):
                if slot == L:
                    return True
                for p in range(prev + 1, n):
                    if toks[p] == phrase[slot] and (
                        first is None or p - first <= L + slop - 1
                    ):
                        if rec(slot + 1, p, first if first is not None else p):
                            return True
                return False

            return rec(0, -1, None)

        # combo evaluation: anchored at every position (mirrors the
        # per-anchor Column expression: token at anchor+c_j-1)
        def via_combos():
            n = len(toks)
            for i in range(n):
                for c in combos:
                    if i + c[-1] - 1 < n and all(
                        toks[i + cj - 1] == phrase[j]
                        for j, cj in enumerate(c)
                    ):
                        return True
            return False

        assert via_combos() == brute(), (
            f"trial {trial}: L={L} slop={slop} toks={toks} "
            f"phrase={phrase}"
        )


def test_c4_span_dedup_matches_python_reference(spark):
    """c4_span_dedup vs a sequential pure-Python oracle over seeded
    random corpora built from a small sentence pool (guaranteeing
    duplicate spans): identical rebuilt text for every doc."""
    import re

    from wimbd_spark.operators.textqc import C4_SENT_SPLIT_RE, c4_span_dedup

    rng = random.Random(SEED + 7)
    pool = [f"Pool sentence {i} ends with meaning." for i in range(9)]
    docs = []
    for d in range(40):
        k = rng.randint(0, 7)
        docs.append((d, " ".join(rng.choice(pool) for _ in range(k))))

    SPAN = 3

    def py_oracle(rows):
        # global min-(id, start) survivor per distinct span
        occ = {}
        for did, text in rows:
            sents = re.split(C4_SENT_SPLIT_RE, text) if text else [""]
            for s in range(max(len(sents) - SPAN + 1, 0)):
                h = "\x00".join(sents[s : s + SPAN])
                cur = occ.get(h)
                if cur is None or (did, s) < cur:
                    occ[h] = (did, s)
        out = {}
        for did, text in rows:
            sents = re.split(C4_SENT_SPLIT_RE, text) if text else [""]
            kill = set()
            for s in range(max(len(sents) - SPAN + 1, 0)):
                h = "\x00".join(sents[s : s + SPAN])
                if occ[h] != (did, s):
                    kill.update(range(s, s + SPAN))
            out[did] = " ".join(
                x for i, x in enumerate(sents) if i not in kill
            )
        return out

    expect = py_oracle(docs)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["text"] for r in c4_span_dedup(df).collect()
    }
    assert got == expect
