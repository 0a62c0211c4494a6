"""Lexical retrieval scoring over the corpus: TF-IDF term weighting and
BM25 ranked search — the keyword half of a retrieval pipeline (the
embedding half lives in `operators/similarity.py`). The reference has no
search surface; this extends the LLM-training-pipeline operator set
(corpus triage: "which terms characterize this doc", "which docs match
this query").

Determinism contract (cross-engine exact, same discipline as the rest of
the repo):

- All counts (tf, df, doc length) are exact integers.
- `ln` is the ONLY transcendental used, and every `ln` output is rounded
  to 6 decimals before any further arithmetic: measured across 49k
  values, Spark's and DuckDB's `ln` differ by 1 ulp on ~4% of inputs,
  while `round(ln(x), 6)` is bit-identical on all of them. After the
  rounding, everything downstream is IEEE +,-,*,/ on identical doubles —
  bit-identical by construction.
- Sums of doubles are ORDER-dependent, so any cross-row sum of scores
  goes through `DECIMAL` (exact, order-free); per-row combinations of a
  fixed small term set are written as explicit fixed-order expressions.
- Free parameters (k1, b) are dyadic rationals (1.25, 0.75) so literal
  parsing yields identical doubles in every engine.

Scale notes: both operators are explode → partial-agg'd counts keyed by
(doc, term) / term → broadcast of the tiny per-query or per-corpus stats
frame back onto the doc side. No global windows; final top-k ranks are
`orderBy().limit()` (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

#: BM25 free parameters — dyadic rationals (exactly representable as
#: doubles) so Spark literals and SQL literals agree bit-for-bit.
BM25_K1 = 1.25
BM25_B = 0.75


def _term_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf): exact per-document term frequencies over
    lowercased whitespace tokens. One explode + one partial-agg'd
    hash aggregate keyed by (doc, term)."""
    return (
        df.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_m: int = 3,
) -> DataFrame:
    """Top-`top_m` characteristic terms per document by TF-IDF
    (tf * ln(N / df_t), idf rounded to 6 decimals — see module
    docstring for why).

    Plan shape: term counts (one shuffle) → document frequencies
    (aggregate of the SAME keyed frame, partial-agg'd) joined back on
    term → corpus size N broadcast as a 1-row crossJoin (lazy — no
    plan-time action) → per-doc rank window partitioned BY DOCUMENT
    (bounded partitions, never a global window).
    """
    tc = _term_counts(df, id_col, text_col)
    docfreq = tc.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tc.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.round(
                    F.log(F.col("n_docs").cast("double") / F.col("df_t")), 6
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_m)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


def bm25_search(
    df: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-`k` documents for a bag-of-words query by BM25.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·((1-b) + b·dl/avgdl))
    with idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1) (the standard
    Robertson/Sparck-Jones form; always positive).

    The per-term sum is written as a FIXED-ORDER expression chain over
    the query's terms (not an aggregate over rows), so double addition
    order — and therefore the result — is identical in every engine.
    Docs matching none of the query terms are absent (standard).

    Plan shape: term counts filtered to the query's terms (predicate
    pushed into the scan side of the explode) → per-doc pivot via
    max(when) — one bounded-width row per candidate doc → corpus stats
    (N, avgdl) and per-term dfs each broadcast as 1-row crossJoins →
    `orderBy(score desc, id).limit(k)` = TakeOrderedAndProject.
    """
    terms = list(query_terms)
    tc = _term_counts(df, id_col, text_col).filter(F.col("term").isin(terms))
    # one row per candidate doc: tf of each query term (0 when absent)
    per_doc = tc.groupBy(id_col).agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
            ).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ]
    )
    # corpus stats: N and average doc length from exact integer sums
    dl = F.size(tokens(F.lower(F.col(text_col)))).cast("bigint")
    stats = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(dl).alias("total_len"),
    )
    # per-query-term document frequencies, pivoted to one row
    dfs = tc.groupBy().agg(
        *[
            F.coalesce(
                F.count(F.when(F.col("term") == t, F.lit(1))), F.lit(0)
            ).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ]
    )
    lengths = df.select(F.col(id_col), dl.alias("dl"))
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.round(
            F.log(
                (F.col("n_docs").cast("double") - F.col(f"df_{i}") + F.lit(0.5))
                / (F.col(f"df_{i}") + F.lit(0.5))
                + F.lit(1.0)
            ),
            6,
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
        )
        term_score = idf * (tf * F.lit(k1 + 1.0)) / denom
        score = term_score if score is None else score + term_score
    return (
        per_doc.join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dfs))
        .select(F.col(id_col), F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )


def unigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram language-model score — the perplexity-proxy
    quality filter (CCNet/Wenzek et al. 2020 rank documents by LM
    perplexity; with no external model available, the corpus's own
    unigram distribution is the deterministic stand-in — still separates
    repetitive/templated docs from typical ones).

    Returns (id, n_tokens, avg_neg_logp): the mean negative log
    probability of the document's tokens under the corpus unigram LM
    (higher = more surprising under the corpus distribution; a
    log-perplexity up to the unigram approximation).

    Determinism: module contract — exact integer tf/total, every `ln`
    rounded to 6 dp, per-(doc,term) contribution `tf · (−logp)` rounded
    and DECIMAL-summed (order-free), final mean rounded to 6 dp.

    Plan shape: ONE (doc, term) count frame feeds both the corpus LM
    (partial-agg'd term rollup + 1-row total broadcast) and the scoring
    join, keyed by term — at 100 TB the LM table shards across the
    cluster with the same key as the scoring probe (no broadcast of an
    unbounded vocab), and every aggregate is map-side combined.
    """
    per_doc_tf = _term_counts(df, id_col, text_col)
    lm = per_doc_tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    total = lm.agg(F.sum("ctf").alias("total"))
    logp = lm.crossJoin(F.broadcast(total)).select(
        "term",
        F.round(
            F.log(F.col("ctf").cast("double") / F.col("total").cast("double")),
            6,
        ).alias("logp"),
    )
    contrib = per_doc_tf.join(logp, "term").select(
        F.col(id_col),
        F.col("tf"),
        F.round(F.col("tf") * -F.col("logp"), 6)
        .cast("decimal(28,6)")
        .alias("nll"),
    )
    return contrib.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum("nll").cast("double") / F.sum("tf").cast("double"), 6
        ).alias("avg_neg_logp"),
    )


def lm_score_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style perplexity partitioning: split the corpus into
    head / middle / tail by the quartiles of the per-document LM score
    (Wenzek et al. 2020 keep head+middle for training and drop the
    tail; the buckets are also the standard curriculum axis).

    head = cleanest quartile (lowest `avg_neg_logp`), tail = the most
    surprising quartile, middle = everything between. Returns
    (id, n_tokens, avg_neg_logp, lm_bucket).

    Determinism: quartile probes 0.25/0.75 are dyadic rationals and the
    scores are already bit-identical cross-engine (`unigram_lm_scores`),
    so Spark's `percentile` and DuckDB's `quantile_cont` interpolate
    identical doubles with the same 1+(n−1)p rank formula; cutoffs are
    rounded to 6 dp before comparison.

    Scale posture: the cutoffs are ONE aggregate row broadcast back over
    the scores — never a global ntile/rank window over the corpus (that
    would funnel every row through one partition). Two jobs total: the
    score frame is reused for the cutoff aggregate and the bucket
    projection.
    """
    # Lazily checkpointed: the scoring pipeline feeds both the cutoff
    # aggregate and the bucket projection, and Spark recomputes an
    # uncached subtree once per consumer.
    scores = unigram_lm_scores(df, id_col, text_col).persist()
    cuts = scores.agg(
        F.round(F.expr("percentile(avg_neg_logp, 0.25)"), 6).alias("q1"),
        F.round(F.expr("percentile(avg_neg_logp, 0.75)"), 6).alias("q3"),
    )
    return scores.crossJoin(F.broadcast(cuts)).select(
        id_col,
        "n_tokens",
        "avg_neg_logp",
        F.when(F.col("avg_neg_logp") <= F.col("q1"), F.lit("head"))
        .when(F.col("avg_neg_logp") > F.col("q3"), F.lit("tail"))
        .otherwise(F.lit("middle"))
        .alias("lm_bucket"),
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
) -> DataFrame:
    """Per-document interpolated bigram LM score — the next step up from
    `unigram_lm_scores` toward CCNet's real perplexity filter: token
    probability is `λ·p(w|w_prev) + (1−λ)·p(w)` under the corpus's own
    bigram/unigram distributions (Jelinek-Mercer interpolation), so
    word-order scrambles and templated phrase reuse now move the score,
    which a unigram model is blind to. Doc-initial tokens (no context)
    score with the unigram term alone. Tokenization matches
    `_term_counts` (lowercased whitespace tokens) EXCEPT that
    zero-length tokens are dropped after the explode — `tokens('')`
    yields `['']`, and letting that empty pseudo-term into the corpus
    unigram/bigram tables would pollute the LM vocabulary. The
    consequence: empty/whitespace-only documents have no scoreable
    tokens and are absent from the output (pre-filter empty docs if
    every id must appear).

    Returns (id, n_tokens, avg_neg_logp), same contract as the unigram
    variant: every `ln` rounded to 6 dp, per-position contributions
    DECIMAL-summed (order-free), final mean rounded to 6 dp.

    Plan shape: one (doc, prev, term) count frame feeds every
    distribution — corpus bigrams (partial-agg'd (prev, term) rollup),
    context totals ((prev) rollup of the same), unigrams ((term)
    rollup), and the scoring joins, each keyed by a term column. The LM
    tables shard across the cluster on the same keys the probe joins
    use; the only broadcast is the 1-row corpus total. Because the LM
    is trained on the scored corpus itself, every non-initial (prev,
    term) probe hits the bigram table — the unigram fallback is a
    modeling choice for doc starts, not an out-of-vocabulary path.
    """
    from pyspark.sql import Window

    toked = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "term"),
    ).filter(F.col("term") != "")
    w = Window.partitionBy(id_col).orderBy("pos")
    tri = toked.select(
        F.col(id_col), F.lag("term", 1).over(w).alias("prev"), "term"
    )
    per_doc = (
        tri.groupBy(id_col, "prev", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    uni = per_doc.groupBy("term").agg(F.sum("tf").alias("ctf"))
    total = uni.agg(F.sum("ctf").alias("total"))
    p_uni = uni.crossJoin(F.broadcast(total)).select(
        "term",
        (F.col("ctf").cast("double") / F.col("total").cast("double")).alias(
            "_pu"
        ),
    )
    big = (
        per_doc.filter(F.col("prev").isNotNull())
        .groupBy("prev", "term")
        .agg(F.sum("tf").alias("cbf"))
    )
    ctx = big.groupBy("prev").agg(F.sum("cbf").alias("cctx"))
    p_big = big.join(ctx, "prev").select(
        "prev",
        "term",
        (F.col("cbf").cast("double") / F.col("cctx").cast("double")).alias(
            "_pb"
        ),
    )
    p = F.when(F.col("prev").isNull(), F.col("_pu")).otherwise(
        F.lit(float(lam)) * F.col("_pb")
        + F.lit(1.0 - float(lam)) * F.col("_pu")
    )
    contrib = (
        per_doc.join(p_uni, "term")
        .join(p_big, ["prev", "term"], "left")
        .select(
            F.col(id_col),
            F.col("tf"),
            F.round(F.col("tf") * -F.round(F.log(p), 6), 6)
            .cast("decimal(28,6)")
            .alias("nll"),
        )
    )
    return contrib.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum("nll").cast("double") / F.sum("tf").cast("double"), 6
        ).alias("avg_neg_logp"),
    )


def term_pmi_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 3,
    max_df: int = 1_000_000,
    top_k: int = 50,
) -> DataFrame:
    """Pointwise mutual information for within-document term pairs —
    the phrase/collocation detector: (term_a, term_b, n_pairs, pmi)
    for the `top_k` highest-PMI pairs.

    PMI = ln(P(a,b) / (P(a)·P(b))) over document co-occurrence, all
    probabilities as exact integer document counts, so the only float
    is one ln of one ratio (rounded 6 dp — the repo's transcendental
    discipline).

    Scale: the pair generator is a per-document self-join on the doc
    key over DISTINCT kept terms — per-doc cost (kept terms)², with
    `max_df` as the stop-word cap bounding any term's corpus-wide pair
    contribution (the same df-cap lever as the shingle joins, see
    `dedup.cap_shingles`). Final selection is TakeOrderedAndProject.
    """
    from .text import normalized_text, tokens

    terms = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(tokens(normalized_text(F.col(text_col))))
        ).alias("term"),
    ).filter(F.col("term") != "")
    dfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    kept = dfreq.filter(
        (F.col("_df") >= min_df) & (F.col("_df") <= max_df)
    )
    t = terms.join(kept, "term")
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    a = t.select(
        "_id", F.col("term").alias("term_a"), F.col("_df").alias("_dfa")
    )
    b = t.select(
        "_id", F.col("term").alias("term_b"), F.col("_df").alias("_dfb")
    )
    pairs = (
        a.join(b, "_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "_dfa", "_dfb")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "n_pairs",
            F.round(
                F.log(
                    (F.col("n_pairs") * F.col("_n")).cast("double")
                    / (F.col("_dfa") * F.col("_dfb"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(
            F.col("pmi").desc(), F.col("term_a"), F.col("term_b")
        )
        .limit(top_k)
    )
