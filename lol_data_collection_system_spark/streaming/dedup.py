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


def near_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
    k: int = 3,
    band_hashes: int = 4,
) -> DataFrame:
    """Streaming NEAR-duplicate guard: keep the first arrival per MinHash
    LSH band bucket (one band of `band_hashes` permutations over word
    `k`-gram shingles), within the watermark horizon.

    The online counterpart of `operators/dedup.lsh_candidate_pairs`:
    a pair with Jaccard similarity s lands in the same bucket with
    probability s^band_hashes, so high-similarity rewrites are dropped
    in-stream with that recall while dissimilar docs collide with
    negligible probability — an intentional single-band approximation
    (the full multi-band LSH + verification + clustering pass stays a
    batch job; this guard just keeps the live window mostly clean).

    The signature here is computed ROW-LOCALLY with array higher-order
    functions rather than the batch path's explode + partial-agg: a
    stateful streaming aggregation per doc would be a second stateful
    operator ahead of the dedup state, while the row-local form needs no
    shuffle at all — the right trade for per-event latency even though
    interpreted HOFs cost more CPU per row than the codegen'd batch
    shape (see `minhash_signatures`' history). State is keyed by the
    band hash string: one small row per bucket within the horizon.

    Batch frames take plain `dropDuplicates` on the same key so tests
    can cross-check stream vs batch output.
    """
    from ..operators.dedup import MINHASH_PRIME, minhash_perm
    from ..operators.text import normalized_text, tokens

    toks = tokens(normalized_text(F.col(text_col)))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))

    def shingle_fn(kk: int):
        return lambda i: F.concat_ws(" ", F.slice(toks, i + 1, kk))

    sh = F.array_distinct(F.transform(idx, shingle_fn(k)))
    hashes = F.transform(
        sh,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
        % MINHASH_PRIME,
    )

    def perm_fn(a: int, b: int):
        return lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_PRIME

    mins = []
    for i in range(band_hashes):
        a, b = minhash_perm(i)
        mins.append(F.array_min(F.transform(hashes, perm_fn(a, b))))
    banded = docs.withColumn(
        "band", F.concat_ws(",", *[m.cast("string") for m in mins])
    )
    if banded.isStreaming:
        return banded.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["band"]
        )
    return banded.dropDuplicates(["band"])
