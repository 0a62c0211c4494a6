"""DSIR-style importance resampling over the document corpus.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) selects raw-corpus documents that "look like" a target
domain: featurize every document as hashed n-gram counts, fit unigram
bucket distributions over the target and the raw corpus, weight each raw
document by the log-likelihood ratio of its buckets, and sample
documents with probability proportional to their importance weight
(Gumbel top-k — an exact, order-free formulation of sampling without
replacement from the softmax of the log-weights).

Beyond the reference's operator set — this is part of the
training-data-pipeline surface (domain-targeted corpus selection before
pretraining).

Determinism contract (cross-engine exact, shared with
`operators/retrieval.py`):

- Features are exact integer counts of md5-hashed uni+bigram buckets
  (md5 is engine-portable; bucket count is a power of two but the modulo
  is plain `%` on a 60-bit non-negative integer in both engines).
- Every `ln` is rounded to 6 decimals before further arithmetic; bucket
  log-ratios combine per-document through `DECIMAL(28,6)` sums
  (exact, order-free).
- The Gumbel draw's uniform is `(md5_60bit % 2^16 + 0.5) / 2^16` — the
  2^16 granularity keeps u ∈ [7.6e-6, 1 − 7.6e-6], so `round(ln(u), 6)`
  can never collapse to 0 and both `ln(u)` and `ln(−ln(u))` stay finite.

Plan shape / 100 TB posture:

- ONE hashed-gram count frame `(doc, bucket, cnt)` (posexplode tokens →
  a single `lead()` window for bigrams → one md5 per gram → partial-agg'd
  groupBy) feeds BOTH distributions and the scoring join.
- The bucket tables are bounded by `buckets` (default 512 rows) — they
  broadcast; the only data-sized shuffles are the (doc, bucket) count
  and the per-doc rollup, both map-side combined.
- Selection is `orderBy().limit(k)` → TakeOrderedAndProject: per-partition
  local top-k, k-row merge — never a global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import normalized_text, tokens

#: Hashed-feature bucket count (Xie et al. use 10^4 buckets at web scale;
#: 512 keeps the synthetic corpus's buckets well-populated).
DSIR_BUCKETS = 512
#: Salt for the gram hash (keeps the feature space independent of the
#: sampling hash below).
DSIR_SALT = "dsir-gram"
#: Salt for the Gumbel draw — referenced by the SQL oracle too, so the
#: two sides can never silently diverge.
DSIR_DRAW_SALT = "dsir-draw"
#: Uniform-draw granularity: 2^16 buckets of the md5 hash. Coarse enough
#: that the extreme draws (±0.5/2^16 from the ends) survive 6-decimal
#: `ln` rounding without hitting 0, fine enough for sampling.
_U_SPACE = 1 << 16


def _md5_60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hashed_gram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *carry, bucket, cnt): exact hashed uni+bigram occurrence
    counts per document.

    Same scale-path as `dedup.shingles`: posexplode tokens, ONE `lead()`
    window for the bigram partner, one md5 per gram — every per-token
    expression stays inside whole-stage codegen; higher-order array
    lambdas (which re-evaluate their parent tree interpreted) never
    appear. `carry` columns ride along the group key (functionally
    dependent on the id — no extra shuffle width that matters).
    """
    toked = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.posexplode(tokens(normalized_text(F.col(text_col)))).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    nxt = F.lead("tok", 1).over(w)
    paired = toked.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col("tok"),
        F.when(nxt.isNotNull(), F.concat(F.col("tok"), F.lit(" "), nxt)).alias(
            "bigram"
        ),
    )
    return (
        paired.select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            F.explode(F.array(F.col("tok"), F.col("bigram"))).alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
        .select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            (_md5_60(F.concat(F.lit(DSIR_SALT), F.col("gram"))) % buckets).alias(
                "bucket"
            ),
        )
        .groupBy(id_col, *carry, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_weights(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(id, n_grams, log_weight): per-document DSIR importance
    log-weight  Σ_b cnt_b · [ln p̂_target(b) − ln p̂_raw(b)]  with add-one
    smoothing on both bucket distributions.

    `is_target` is a boolean Column over `df`'s rows defining the target
    domain (e.g. ``F.col("lang") == "en"``). Documents scoring high look
    more like the target than like the raw corpus average.
    """
    gc = hashed_gram_counts(
        df.withColumn("_tgt", is_target), id_col, text_col, buckets, ("_tgt",)
    ).persist()
    # persisted: the gram frame (explode + bigram window) feeds
    # both the distribution aggregate and the scoring join, and Spark
    # recomputes an uncached subtree once per consumer.
    # BOTH bucket distributions in one aggregation pass over the gram
    # frame (sum + conditional sum), so the expensive explode+window
    # subtree is evaluated once for the distributions and once for the
    # scoring join — not three times.
    dists = gc.groupBy("bucket").agg(
        F.sum("cnt").alias("raw_cnt"),
        F.sum(F.when(F.col("_tgt"), F.col("cnt")).otherwise(0)).alias(
            "tgt_cnt"
        ),
    )
    totals = dists.agg(
        F.sum("raw_cnt").alias("raw_total"),
        F.sum("tgt_cnt").alias("tgt_total"),
    )
    ratios = dists.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.round(
                F.log(
                    (F.col("tgt_cnt") + 1).cast("double")
                    / (F.col("tgt_total") + buckets).cast("double")
                ),
                6,
            )
            - F.round(
                F.log(
                    (F.col("raw_cnt") + 1).cast("double")
                    / (F.col("raw_total") + buckets).cast("double")
                ),
                6,
            )
        ).alias("log_ratio"),
    )
    contrib = gc.join(F.broadcast(ratios), "bucket").select(
        F.col(id_col),
        F.col("cnt"),
        F.round(F.col("cnt") * F.col("log_ratio"), 6)
        .cast("decimal(28,6)")
        .alias("contrib"),
    )
    return contrib.groupBy(id_col).agg(
        F.sum("cnt").alias("n_grams"),
        F.sum("contrib").cast("double").alias("log_weight"),
    )


def gumbel_topk_sample(
    weights: DataFrame,
    k: int,
    salt: str = DSIR_DRAW_SALT,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
) -> DataFrame:
    """Sample `k` rows without replacement with P(row) ∝ exp(weight):
    key = weight + Gumbel(0,1) noise, keep the k largest keys (the
    Gumbel-top-k trick — exactly equivalent to softmax sampling without
    replacement, but expressible as a deterministic per-row projection
    plus a TakeOrderedAndProject).

    The Gumbel noise is −ln(−ln(u)) with u = (md5_60(salt‖id) % 2^16
    + 0.5)/2^16 — replayable, partition-independent, and strictly inside
    (0,1) by a margin that survives the 6-decimal `ln` rounding.
    """
    u = (
        _md5_60(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % _U_SPACE
        + 0.5
    ) / F.lit(float(_U_SPACE))
    g = -F.round(F.log(-F.round(F.log(u), 6)), 6)
    keyed = weights.withColumn(
        "draw_key", F.round(F.col(weight_col) + g, 6)
    )
    return keyed.orderBy(F.desc("draw_key"), F.col(id_col)).limit(k)
