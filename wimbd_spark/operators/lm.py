"""N-gram language-model scoring — the CCNet-style perplexity filter.

The published CCNet pipeline (Wenzek et al. 2020, "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data" — public) scores
every web document with a language model trained on a trusted corpus
(Wikipedia) and buckets/filters by perplexity. The reference engine has
no LM stage; this module supplies the dependency-free Spark-first
equivalent: an add-alpha-smoothed UNIGRAM model trained as one
DataFrame aggregation, applied as one join — the same workflow shape
(train on corpus A, score corpus B, gate on perplexity) with fully
reproducible, oracle-able math. A KenLM-backed 5-gram scorer would
drop into `lm_score` as an alternative `lm` table without changing the
plan; the container has no kenlm, so the unigram model is the real,
tested path.

100 TB plan shape:
- Training is one explode + ONE groupBy(token) with map-side combine
  (the same cost class as a unigram count), plus a single-row total
  aggregate joined back by broadcast — the vocabulary table never
  gathers to the driver.
- Scoring explodes doc tokens and hash-joins the vocabulary; pass
  ``broadcast_lm=True`` when the model fits the broadcast threshold
  (typical: a few million tokens) to make the join map-side, else the
  shuffle is (id, token) pairs only — full rows never move.
- The unseen-token fallback rides IN the model table as one
  token-IS-NULL row, so applying a model is driver-state-free and a
  saved model parquet is self-contained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    tokenizer=None,
) -> DataFrame:
    """Train an add-alpha-smoothed unigram LM → (token, logp) with
    log2 probabilities, plus ONE ``token IS NULL`` row holding the
    unseen-token fallback.

    p(t) = (count(t) + alpha) / (N + alpha * (V + 1)); the "+1"
    reserves one pseudo-type of smoothing mass for unseen tokens,
    whose probability is alpha / (N + alpha * (V + 1)). All mass
    sums to ≤ 1 with equality over V seen types + the unseen type.
    """
    from wimbd_spark.functions.text import tokenize

    if alpha <= 0:
        raise ValueError("alpha must be > 0 (zero breaks unseen mass)")
    tok = tokenizer if tokenizer is not None else tokenize
    counts = (
        corpus.filter(F.col(text_col).isNotNull())
        .select(F.explode(tok(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    totals = counts.agg(
        F.sum("_c").alias("_N"), F.count(F.lit(1)).alias("_V")
    )
    denom = F.col("_N") + F.lit(alpha) * (F.col("_V") + F.lit(1))
    seen = counts.join(F.broadcast(totals)).select(
        "token",
        F.log2((F.col("_c") + F.lit(alpha)) / denom).alias("logp"),
    )
    unseen = totals.select(
        F.lit(None).cast("string").alias("token"),
        F.log2(F.lit(alpha) / denom).alias("logp"),
    )
    return seen.unionByName(unseen)


def lm_score(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer=None,
    broadcast_lm: bool = False,
    validate_lm: bool = True,
) -> DataFrame:
    """Score every doc under a unigram LM → (id_col, n_tokens,
    bits_per_token, ppl) where bits_per_token is the average negative
    log2 probability and ppl = 2^bits_per_token (perplexity).

    ``lm`` is a (token, logp) table from `unigram_lm` (or any
    compatible scorer); its ``token IS NULL`` row supplies the
    unseen-token fallback and is VALIDATED here: a caller-supplied
    model (e.g. CLI --lm pointing at a hand-built parquet) missing the
    NULL-token row would otherwise cross-join zero rows and silently
    score the ENTIRE corpus as empty, while >1 NULL rows would
    duplicate every token row and corrupt n_tokens — both now raise.
    Docs with NULL text or zero tokens get n_tokens = 0 and NULL
    scores (kept, not dropped — gating is the caller's policy, see
    `perplexity_filter`).
    """
    from wimbd_spark.functions.text import tokenize

    tok = tokenizer if tokenizer is not None else tokenize
    vocab = lm.filter(F.col("token").isNotNull())
    if broadcast_lm:
        vocab = F.broadcast(vocab)
    # For a MATERIALIZED caller-supplied model (a parquet read) this
    # count is one cheap model-sized job; callers who just built the
    # table with unigram_lm (which emits exactly one NULL row by
    # construction — see perplexity_filter) pass validate_lm=False,
    # because counting a LAZY lm plan would re-run the whole LM build
    # as a separate job.
    if validate_lm:
        n_unseen = lm.filter(F.col("token").isNull()).count()
        if n_unseen != 1:
            raise ValueError(
                f"lm_score: the LM table must contain exactly one "
                f"'token IS NULL' fallback row (the unseen-token "
                f"logp); found {n_unseen}. A missing row would "
                f"silently score every document as empty; extra rows "
                f"would duplicate token rows. Build the table with "
                f"unigram_lm, or append a (NULL, floor_logp) row to "
                f"a hand-built model."
            )
    unseen = F.broadcast(
        lm.filter(F.col("token").isNull()).select(
            F.col("logp").alias("_unseen")
        )
    )
    toks = df.select(
        F.col(id_col),
        F.explode(tok(F.col(text_col))).alias("token"),
    )
    scored = (
        toks.join(vocab, "token", "left")
        .join(unseen)  # 1-row broadcast: a constant column, no shuffle
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(-F.coalesce(F.col("logp"), F.col("_unseen"))).alias(
                "bits_per_token"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.col("bits_per_token"),
            F.pow(F.lit(2.0), F.col("bits_per_token")).alias("ppl"),
        )
    )


def perplexity_filter(
    df: DataFrame,
    max_ppl: float,
    lm: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    tokenizer=None,
    broadcast_lm: bool = False,
) -> DataFrame:
    """CCNet-style quality gate: keep docs whose perplexity under the
    LM is ≤ ``max_ppl``. With ``lm=None`` the model is trained on
    ``df`` itself (self-perplexity — flags statistically unusual docs:
    gibberish, non-language blobs, wrong-language text). Docs with
    zero tokens score NULL and are dropped (no evidence of language).
    One id-probe semi-join restores full rows; the corpus is never
    shuffled at full width.
    """
    self_trained = lm is None
    if self_trained:
        lm = unigram_lm(df, text_col=text_col, alpha=alpha, tokenizer=tokenizer)
    keep = (
        lm_score(
            df.select(id_col, text_col),
            lm,
            id_col=id_col,
            text_col=text_col,
            tokenizer=tokenizer,
            broadcast_lm=broadcast_lm,
            # unigram_lm emits exactly one NULL row by construction;
            # counting its LAZY plan would re-run the full LM build
            validate_lm=not self_trained,
        )
        .filter(F.col("ppl") <= max_ppl)
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def bigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    tokenizer=None,
) -> DataFrame:
    """Train the bigram half of an interpolated bigram LM →
    (prev, token, pml) where pml = c(prev, token) / c(prev ·) is the
    maximum-likelihood conditional probability of ``token`` following
    ``prev``. Unseen contexts/continuations carry NO row — the
    interpolation in `bigram_score` supplies their mass from the
    unigram model, so the table stays bounded by the corpus's
    observed-bigram count (CCNet's KenLM models are n-gram count
    tables of exactly this shape).

    Plan: pairs are built INSIDE the token array (transform over
    indices — no self-join, no window), then ONE explode + ONE
    groupBy(prev, token); the context totals are a reaggregation of
    those bigram counts joined back on ``prev``. Two narrow shuffles
    over (string, string) pairs; document rows never shuffle.
    """
    from wimbd_spark.functions.text import tokenize

    tok = tokenizer if tokenizer is not None else tokenize
    pairs = (
        corpus.filter(F.col(text_col).isNotNull())
        .select(tok(F.col(text_col)).alias("_toks"))
        .select(
            F.explode(
                F.filter(
                    F.transform(
                        F.col("_toks"),
                        # element_at is 1-based, i is 0-based: index i
                        # IS the previous token. ANSI element_at
                        # rejects index 0 EAGERLY (the filter below
                        # runs after the transform), so clamp the
                        # index total and discard the i=0 struct.
                        lambda t, i: F.struct(
                            F.element_at(
                                F.col("_toks"), F.greatest(i, F.lit(1))
                            ).alias("prev"),
                            t.alias("token"),
                            i.alias("_i"),
                        ),
                    ),
                    lambda p: p["_i"] > F.lit(0),
                )
            ).alias("p")
        )
        .select("p.prev", "p.token")
    )
    bcounts = pairs.groupBy("prev", "token").agg(
        F.count(F.lit(1)).alias("_c")
    )
    ctotals = bcounts.groupBy("prev").agg(F.sum("_c").alias("_cc"))
    return bcounts.join(ctotals, "prev").select(
        "prev",
        "token",
        (F.col("_c").cast("double") / F.col("_cc").cast("double")).alias(
            "pml"
        ),
    )


def bigram_score(
    df: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer=None,
    broadcast_lm: bool = False,
    validate_lm: bool = True,
) -> DataFrame:
    """Score every doc under an INTERPOLATED bigram LM → (id_col,
    n_tokens, bits_per_token, ppl).

    Per-position probability:
      - first token:  p = p_uni(t)           (no context exists)
      - later tokens: p = lam * pml(t|prev) + (1-lam) * p_uni(t)
    where pml comes from `bigram_lm` (0 when the bigram is unseen —
    pure backoff to the unigram) and p_uni from `unigram_lm`, whose
    add-alpha NULL-token row guarantees p > 0 for every token. This is
    the Jelinek-Mercer fixed-weight interpolation CCNet-class filters
    use; ``lam`` in [0, 1) (lam = 1 would zero unseen-bigram mass and
    produce infinite bits).

    Plan: pairs are built inside the token array (no window), exploded
    once, then TWO hash joins — (prev, token) against the bigram table
    and token against the unigram vocabulary — and one groupBy(doc).
    Pass ``broadcast_lm=True`` when both model tables fit the
    broadcast threshold to make both joins map-side; otherwise the
    shuffle carries (id, prev, token) triples only, never full rows.
    Docs with NULL text or zero tokens get n_tokens = 0 and NULL
    scores (kept — gating is the caller's policy).

    Like `lm_score`, caller-supplied models are VALIDATED by default:
    ``uni`` must carry exactly one ``token IS NULL`` fallback row (a
    missing row would make the 1-row ``unseen`` cross-join empty and
    silently score the ENTIRE corpus as n_tokens = 0 / NULL — the gate
    in `bigram_perplexity_filter` would then drop everything with no
    error), and ``bi`` must have no duplicate (prev, token) rows
    (duplicates multiply the matching pair rows through the left join
    and corrupt n_tokens). Self-trained LAZY builds pass
    ``validate_lm=False`` — counting a lazy plan would re-run the full
    LM build as a separate job; `unigram_lm`/`bigram_lm` satisfy both
    invariants by construction.
    """
    from wimbd_spark.functions.text import tokenize

    if not (0.0 <= lam < 1.0):
        raise ValueError(
            f"lam must be in [0, 1): lam={lam} (1 zeroes unseen-bigram "
            f"mass -> infinite bits; interpolation needs unigram mass)"
        )
    if validate_lm:
        n_unseen = uni.filter(F.col("token").isNull()).count()
        if n_unseen != 1:
            raise ValueError(
                f"bigram_score: the unigram table must contain exactly "
                f"one 'token IS NULL' fallback row (the unseen-token "
                f"logp); found {n_unseen}. A missing row would "
                f"silently score every document as empty; extra rows "
                f"would duplicate token rows. Build the table with "
                f"unigram_lm, or append a (NULL, floor_logp) row to a "
                f"hand-built model."
            )
        # groupBy treats NULL keys as equal, so duplicate NULL-bearing
        # rows are caught too; one model-sized job.
        n_dup = (
            bi.groupBy("prev", "token")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .count()
        )
        if n_dup:
            raise ValueError(
                f"bigram_score: the bigram table has {n_dup} duplicate "
                f"(prev, token) groups — each duplicate multiplies the "
                f"matching token rows through the join and corrupts "
                f"n_tokens. Build the table with bigram_lm, or dedup a "
                f"hand-built model on (prev, token) first."
            )
    tok = tokenizer if tokenizer is not None else tokenize
    vocab = uni.filter(F.col("token").isNotNull()).select(
        "token", F.col("logp").alias("_logp_u")
    )
    bitab = bi.select("prev", "token", "pml")
    if broadcast_lm:
        vocab = F.broadcast(vocab)
        bitab = F.broadcast(bitab)
    unseen = F.broadcast(
        uni.filter(F.col("token").isNull()).select(
            F.col("logp").alias("_unseen")
        )
    )
    pairs = (
        df.select(F.col(id_col), tok(F.col(text_col)).alias("_toks"))
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.col("_toks"),
                    # element_at is 1-based, i is 0-based: index i is
                    # the PREVIOUS token. ANSI element_at rejects
                    # index 0 and a CASE's untaken branch may still
                    # evaluate under codegen, so clamp the index total
                    # (greatest(i, 1)) and NULL the context at i = 0.
                    lambda t, i: F.struct(
                        F.when(
                            i > F.lit(0),
                            F.element_at(
                                F.col("_toks"), F.greatest(i, F.lit(1))
                            ),
                        ).alias("prev"),
                        t.alias("token"),
                    ),
                )
            ).alias("_pos", "p"),
        )
        .select(F.col(id_col), "_pos", "p.prev", "p.token")
    )
    p_uni = F.pow(
        F.lit(2.0), F.coalesce(F.col("_logp_u"), F.col("_unseen"))
    )
    p = F.when(F.col("prev").isNull(), p_uni).otherwise(
        F.lit(lam) * F.coalesce(F.col("pml"), F.lit(0.0))
        + F.lit(1.0 - lam) * p_uni
    )
    scored = (
        pairs.join(bitab, ["prev", "token"], "left")
        .join(vocab, "token", "left")
        .join(unseen)  # 1-row broadcast: a constant column, no shuffle
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(-F.log2(p)).alias("bits_per_token"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.col("bits_per_token"),
            F.pow(F.lit(2.0), F.col("bits_per_token")).alias("ppl"),
        )
    )


def bigram_perplexity_filter(
    df: DataFrame,
    max_ppl: float,
    uni: DataFrame | None = None,
    bi: DataFrame | None = None,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    tokenizer=None,
    broadcast_lm: bool = False,
) -> DataFrame:
    """CCNet-fidelity quality gate: keep docs whose perplexity under
    the interpolated bigram LM is ≤ ``max_ppl``. With no model given,
    both halves train on ``df`` itself (self-perplexity). Supply
    ``uni``/``bi`` together (a bigram table is meaningless without the
    unigram that carries its backoff mass). Zero-token docs score NULL
    and are dropped, matching `perplexity_filter`.
    """
    if (uni is None) != (bi is None):
        raise ValueError(
            "bigram_perplexity_filter: pass BOTH uni and bi (the "
            "interpolation needs the unigram's backoff mass) or "
            "neither (self-train on df)"
        )
    self_trained = uni is None
    if self_trained:
        uni = unigram_lm(df, text_col=text_col, alpha=alpha, tokenizer=tokenizer)
        bi = bigram_lm(df, text_col=text_col, tokenizer=tokenizer)
    keep = (
        bigram_score(
            df.select(id_col, text_col),
            uni,
            bi,
            lam=lam,
            id_col=id_col,
            text_col=text_col,
            tokenizer=tokenizer,
            broadcast_lm=broadcast_lm,
            # unigram_lm/bigram_lm satisfy the model invariants by
            # construction; counting their LAZY plans would re-run the
            # full LM builds. Caller-supplied (materialized) models ARE
            # validated — a NULL-row-less uni or duplicate-keyed bi
            # would otherwise silently gate out the entire corpus.
            validate_lm=not self_trained,
        )
        .filter(F.col("ppl") <= max_ppl)
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")
