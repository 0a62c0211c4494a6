"""Streaming drift monitoring — windowed per-source PSI against a
static curated baseline (the online half of `operators/drift.py`).

Production shape: the baseline histogram comes from the CURATED corpus
(a batch frame, collected once — `n_buckets` numbers) and rides the
streaming plan as literals; the stream needs ONE windowed aggregation
producing per-(window, group) bucket counts as pivoted columns, and PSI
is a stateless projection over those counts. That keeps the whole
monitor inside a single stateful operator — no chained aggregations, so
it runs in plain append mode with watermark-driven state eviction, and
the identical plan executes on batch frames for stream==batch testing.

State size: one row per (window, group) with `n_buckets` longs —
independent of event volume. The alert semantics (psi > 0.25 → act)
match the batch monitor bucket-for-bucket: same clamping, same additive
smoothing, same rounded-ln fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.drift import bucket_of


def baseline_probs(
    corpus: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    smooth: float = 0.5,
) -> list[float]:
    """Smoothed baseline bucket probabilities q_b from the curated
    corpus — `n_buckets` floats, collected once at plan build (the
    bounded-collect class: output size is the bucket count).
    Computed exactly like the batch monitor's corpus side."""
    cells = (
        corpus.select(
            bucket_of(F.col(value_col), lo, hi, n_buckets).alias("_b")
        )
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    counts = {r["_b"]: r["_c"] for r in cells}
    total = sum(counts.values())
    sb = float(smooth) * n_buckets
    return [
        (counts.get(b, 0) + float(smooth)) / (float(total) + sb)
        for b in range(n_buckets)
    ]


def psi_stream(
    events: DataFrame,
    baseline: list[float],
    group_col: str,
    value_col: str,
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    watermark_delay: str = "10 minutes",
    lo: float = 0.0,
    hi: float = 400.0,
    n_buckets: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """(window_start, window_end, group, n_rows, psi) per tumbling
    window: each group's in-window value distribution scored against
    the static `baseline` (from `baseline_probs`).

    The bucket histogram is pivoted into `n_buckets` conditional-sum
    columns inside the ONE windowed aggregation; the PSI fold over the
    baseline literals is a pure post-aggregation projection (valid on
    an aggregated stream — it is stateless)."""
    if len(baseline) != n_buckets:
        raise ValueError(
            f"baseline has {len(baseline)} buckets, expected {n_buckets}"
        )
    b = bucket_of(F.col(value_col), lo, hi, n_buckets)
    src = events.select(
        F.col(ts_col), F.col(group_col), b.alias("_b")
    )
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark_delay)
    counts = src.groupBy(
        F.window(F.col(ts_col), window_duration).alias("_w"),
        F.col(group_col),
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum((F.col("_b") == k).cast("long")).alias(f"_c{k}")
            for k in range(n_buckets)
        ],
    )
    sb = float(smooth) * n_buckets
    psi: Column = F.lit(0.0)
    terms = []
    for k in range(n_buckets):
        p = (F.col(f"_c{k}") + F.lit(float(smooth))) / (
            F.col("_n") + F.lit(sb)
        )
        q = F.lit(float(baseline[k]))
        terms.append(
            F.round((p - q) * F.log(p / q), 9).cast("decimal(28,9)")
        )
    for t in terms:
        psi = psi + t.cast("double")
    # ordered fold of 9-dp-rounded terms — matches the batch monitor's
    # decimal-sum discipline (n_buckets grid values sum exactly)
    return counts.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        F.col(group_col),
        F.col("_n").alias("n_rows"),
        F.round(psi, 6).alias("psi"),
    )


# ---------------------------------------------------------------------------
# Tokenizer-fertility drift: windowed chars-per-piece vs a STATIC merge
# table, scored as PSI against the curated-corpus baseline. The canary
# for "the incoming text no longer matches the tokenizer's training
# distribution" (new language/script/boilerplate → segmentation
# fragments → chars-per-piece shifts).
# ---------------------------------------------------------------------------
def fertility_values(
    docs: DataFrame,
    merges: DataFrame,
    n_merges: int,
    ts_col: str = "ts",
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(ts, group, fertility) at WORD granularity: each word instance's
    chars-per-piece after applying the static merge table
    (`bpe.apply_merge_ranks` — rank-chained broadcast replaces,
    stream-static-join safe). Deliberately word-level, not per-doc: the
    segmentation is a pure map chain with NO aggregation, so the whole
    monitor keeps exactly ONE (windowed) aggregation downstream — legal
    in append mode, state = one row per (window, group).

    fertility = length(word) / n_pieces — one division of exact ints,
    bit-identical across engines and across the stream/batch twins."""
    from ..operators.bpe import apply_merge_ranks, piece_count
    from ..operators.text import normalized_text, tokens

    words = docs.select(
        F.col(ts_col),
        F.col(group_col),
        F.explode(tokens(normalized_text(F.col(text_col)))).alias("word"),
    ).select(
        F.col(ts_col),
        F.col(group_col),
        F.length("word").alias("_chars"),
        F.regexp_replace(F.col("word"), "(.)", r"($1)").alias("seq"),
    )
    segmented = apply_merge_ranks(words, merges, n_merges, "seq")
    return segmented.select(
        F.col(ts_col),
        F.col(group_col),
        (
            F.col("_chars").cast("double")
            / piece_count(F.col("seq")).cast("double")
        ).alias("fertility"),
    )


def fertility_psi_stream(
    docs: DataFrame,
    merges: DataFrame,
    n_merges: int,
    baseline: list[float],
    ts_col: str = "ts",
    group_col: str = "source",
    text_col: str = "text",
    window_duration: str = "10 minutes",
    watermark_delay: str = "10 minutes",
    lo: float = 0.0,
    hi: float = 4.0,
    n_buckets: int = 8,
    smooth: float = 0.5,
) -> DataFrame:
    """(window_start, window_end, group, n_rows, psi) per tumbling
    window: the in-window chars-per-piece distribution against the
    static `baseline` (compute it once with `baseline_probs` over
    `fertility_values` of the CURATED corpus). Pure composition of
    `fertility_values` (map-only) and `psi_stream` (one windowed agg) —
    the identical plan runs on a batch frame for the stream==batch
    twin."""
    vals = fertility_values(
        docs, merges, n_merges, ts_col, group_col, text_col
    )
    return psi_stream(
        vals,
        baseline,
        group_col,
        "fertility",
        ts_col=ts_col,
        window_duration=window_duration,
        watermark_delay=watermark_delay,
        lo=lo,
        hi=hi,
        n_buckets=n_buckets,
        smooth=smooth,
    )
