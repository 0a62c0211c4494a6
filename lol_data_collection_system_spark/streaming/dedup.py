"""Streaming exact deduplication — the online half of the corpus dedup
family (`operators/dedup.exact_dup_groups` is the batch half).

Reference analog: the collector's per-row get-or-create guards
(`utils.py` add-if-absent upserts) are a row-at-a-time dedup against the
database; the stream-native form keeps the seen-set as watermarked
operator state instead of a DB round-trip per row.

Scale posture: state is keyed by the 16-byte content fingerprint, so the
store holds one small row per distinct document seen within the
watermark horizon; eviction is watermark-driven (without a horizon the
seen-set grows unboundedly — exact forever-dedup at 100 TB belongs to
the batch pass, this operator dedups the live window). Works identically
on batch frames (no watermark, plain dropDuplicates) so tests can
cross-check stream vs batch output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import fingerprint


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Keep the first arrival of each distinct (normalized) content
    fingerprint within the watermark horizon; later copies are dropped.

    Streaming frames use `dropDuplicatesWithinWatermark` — state for a
    fingerprint is evictable once the watermark passes its first-seen
    event time, which bounds the store while still catching every
    duplicate whose arrival skew is within `watermark_delay`. Batch
    frames take the plain `dropDuplicates` path (same keep-first-by-
    fingerprint semantics, no horizon).
    """
    fp = docs.withColumn("fp", fingerprint(F.col(text_col)))
    if fp.isStreaming:
        return fp.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(["fp"])
    return fp.dropDuplicates(["fp"])


def minhash_bands_local(
    text_col: str, k: int = 3, n_hashes: int = 16, band_size: int = 4
):
    """Row-local MinHash band hashes: array of `n_hashes // band_size`
    (band_idx, band_hash) structs, computed entirely with array
    higher-order functions — no explode, no shuffle, no stateful
    aggregation ahead of the dedup state. Permutations come from the
    batch path's `minhash_perm` and the band digest mirrors
    `dedup._band_hashes`' md5-over-"|"-joined-slice geometry, so stream
    buckets live in the SAME space as `lsh_candidate_pairs` buckets.

    Row-local vs the batch explode + partial-agg shape is the right
    trade for per-event latency; interpreted HOFs cost more CPU per row
    than the codegen'd batch shape (see `minhash_signatures`' history).
    """
    from ..operators.dedup import MINHASH_PRIME, minhash_perm
    from ..operators.text import normalized_text, tokens

    toks = tokens(normalized_text(F.col(text_col)))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )
    hashes = F.transform(
        sh,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
        % MINHASH_PRIME,
    )

    def perm_fn(a: int, b: int):
        return lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_PRIME

    mins = []
    for i in range(n_hashes):
        a, b = minhash_perm(i)
        mins.append(F.array_min(F.transform(hashes, perm_fn(a, b))))
    n_bands = n_hashes // band_size
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            mins[b * band_size + r].cast("string")
                            for r in range(band_size)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )


def _all_bands_won(
    rows: DataFrame,
    n_bands: int,
    id_col: str,
    ts_col: str,
    text_col: str,
    emit_window: str,
    collect_bands: bool,
) -> DataFrame:
    """Shared emit stage: windowed per-doc count over surviving
    (doc, band) rows, keeping only docs that won/missed ALL `n_bands`
    buckets. One definition for the streaming guard, its batch twin,
    and the corpus guard — the semantics live in exactly one place."""
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.first(ts_col).alias(ts_col),
        F.first(text_col).alias(text_col),
    ]
    if collect_bands:
        aggs.append(F.sort_array(F.collect_list("band_hash")).alias("bands"))
    return (
        rows.groupBy(F.window(ts_col, emit_window), F.col(id_col))
        .agg(*aggs)
        .filter(F.col("_n") == n_bands)
        .drop("_n")
    )


def near_dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
    k: int = 3,
    n_hashes: int = 16,
    band_size: int = 4,
    emit_window: str = "1 minute",
) -> DataFrame:
    """Streaming NEAR-duplicate guard with the batch banding scheme: a
    document is kept iff it is the FIRST arrival in EVERY one of its
    `n_hashes / band_size` MinHash band buckets — i.e. it agrees with no
    earlier document on any band, the same "matches on ≥1 band ⇒
    candidate duplicate" rule `lsh_candidate_pairs` applies offline.
    Recall for a pair with Jaccard s is the full banded 1-(1-s^r)^b
    curve, not the single-band s^r this operator shipped with first.

    Plan shape (streaming): explode the row-local band structs →
    `dropDuplicatesWithinWatermark([band_idx, band_hash])` (per-BUCKET
    state, one small row per bucket within the horizon) → windowed
    per-doc count with `count == n_bands` keeping only all-bucket
    winners. That second stage is a watermarked streaming aggregation —
    chained stateful operators in append mode — so kept rows emit when
    the watermark passes their `emit_window`; size it to the latency the
    guard is allowed, and note the batch twin uses event-time (min ts)
    bucket winners where the stream uses arrival order: identical
    whenever arrival respects event time, which the parity test pins.

    Batch frames run the same explode → per-bucket first (rank over ts,
    id) → all-winner filter, so stream==batch checks compare doc sets.
    Output: (window, id, ts, text, bands sorted) — one row per kept doc.
    """
    n_bands = n_hashes // band_size
    bands = minhash_bands_local(text_col, k, n_hashes, band_size)
    exploded = docs.select(
        F.col(id_col), F.col(ts_col), F.col(text_col),
        F.explode(bands).alias("_b"),
    ).select(
        id_col, ts_col, text_col, "_b.band_idx", "_b.band_hash"
    )
    if docs.isStreaming:
        winners = exploded.withWatermark(
            ts_col, watermark_delay
        ).dropDuplicatesWithinWatermark(["band_idx", "band_hash"])
        return _all_bands_won(
            winners, n_bands, id_col, ts_col, text_col, emit_window, True
        )
    from pyspark.sql import Window

    w = Window.partitionBy("band_idx", "band_hash").orderBy(ts_col, id_col)
    winners = (
        exploded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return _all_bands_won(
        winners, n_bands, id_col, ts_col, text_col, emit_window, True
    )


def corpus_guard_stream(
    docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
    k: int = 3,
    n_hashes: int = 16,
    band_size: int = 4,
    emit_window: str = "1 minute",
) -> DataFrame:
    """Guard an incoming stream against a STATIC indexed corpus: drop
    documents that exact-duplicate (fingerprint) or near-duplicate (any
    shared MinHash band bucket) something already in the corpus; pass
    everything else through. The online companion of
    `operators/dedup.incremental_dedup` — same fingerprint space, same
    signature scheme, same banding geometry, so a doc this guard drops is
    exactly a doc that pipeline would mark `exact_dup` or produce as an
    LSH candidate (kept stream ⊆ its `novel` set; candidates are a
    superset of the Jaccard-verified matches, which is the conservative
    direction for a guard).

    Plan shape: the corpus index (distinct fingerprints + distinct band
    buckets — at scale precomputed and stored, here derived in-plan) sits
    on the static side of two stream-static LEFT ANTI joins, which are
    STATELESS in Structured Streaming — no per-key store, no watermark
    eviction problem, unbounded corpus age. The only stateful operator is
    the final windowed all-bands-survived count (a doc is kept iff every
    one of its bands missed the corpus), identical to
    `near_dedup_stream`'s emit stage. Batch frames take the same plan
    minus the watermark, so stream==batch parity is testable.
    """
    from ..operators.dedup import (
        _band_hashes,
        minhash_signatures,
    )

    n_bands = n_hashes // band_size
    corpus_fp = corpus.select(
        fingerprint(F.col(text_col)).alias("fp")
    ).distinct()
    corpus_bands = (
        minhash_signatures(corpus, id_col, text_col, k, n_hashes)
        .select(
            F.posexplode(_band_hashes(n_hashes, band_size)).alias(
                "band_idx", "band_hash"
            )
        )
        .distinct()
    )

    fresh = docs.withColumn("fp", fingerprint(F.col(text_col))).join(
        corpus_fp, "fp", "left_anti"
    )
    bands = minhash_bands_local(text_col, k, n_hashes, band_size)
    exploded = fresh.select(
        F.col(id_col), F.col(ts_col), F.col(text_col),
        F.explode(bands).alias("_b"),
    ).select(id_col, ts_col, text_col, "_b.band_idx", "_b.band_hash")
    survived = exploded.join(
        corpus_bands, ["band_idx", "band_hash"], "left_anti"
    )
    if docs.isStreaming:
        survived = survived.withWatermark(ts_col, watermark_delay)
    return _all_bands_won(
        survived, n_bands, id_col, ts_col, text_col, emit_window, False
    )
