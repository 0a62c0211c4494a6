"""Distributed Bloom filter build + approximate-membership filtering.

At 100 TB, "filter this corpus against that blocklist" is usually an
anti-join whose small side is still too big to broadcast as rows (10^9
fingerprints) but tiny as a Bloom filter (m bits ≈ 1.2 GB at 10^10
bits). This module builds the filter AS A DATAFRAME AGGREGATE — k md5
hash positions per key, `bit_or` of one-hot 32-bit words grouped by word
index — so the build is one partial-agg'd shuffle over at most
``m_bits/32`` groups, and the probe side is a broadcast join against the
word table (bounded by m_bits/32 rows regardless of blocklist row
count).

This is the engine-level analogue of Spark's own runtime-filter
pushdown (InjectRuntimeFilter builds a BloomFilterAggregate on the small
join side); expressed here as first-class DataFrame ops so the filter
is persistable, reusable across queries, and oracle-checkable.

Determinism: positions are md5-derived (engine-portable); the bit math
is 32-bit-word shifts on non-negative integers — identical in Spark and
the DuckDB oracle. False positives are therefore REPRODUCIBLE: the same
key set and parameters yield the same filter bit-for-bit in both
engines.

Scale posture: build = explode k positions (k rows/key, map-side) →
groupBy word index (≤ m_bits/32 groups, partial bit_or'd). Probe =
explode k positions → broadcast join on word index → per-key AND of bit
tests (groupBy key, min(hit)). No data-sized shuffle ever carries the
blocklist; the probe's only shuffle is keyed by the candidate id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default filter geometry: 2^16 bits / 4 hashes ≈ 0.2% FP at 4k keys.
BLOOM_BITS = 1 << 16
BLOOM_HASHES = 4
_WORD = 32


def _position(key: Column, j: int, m_bits: int) -> Column:
    """j-th hash position of `key` in [0, m_bits): 60-bit md5 prefix of
    the salted key, modulo the bit-space."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"bloom{j}:"), key)), 1, 15), 16, 10
    ).cast("bigint")
    return h % m_bits


def build_bloom(
    keys: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Aggregate a key column into Bloom-filter words: (word_idx, bits)
    with ``bits = bit_or(1 << (pos % 32))`` over every hash position
    landing in that 32-bit word. At most ``m_bits/32`` rows — broadcastable
    at any blocklist size."""
    key = F.col(key_col).cast("string")
    pos = F.explode(
        F.array(*[_position(key, j, m_bits) for j in range(n_hashes)])
    ).alias("pos")
    return (
        keys.select(pos)
        .select(
            (F.col("pos") / _WORD).cast("int").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD} AS INT))"
            ).alias("one_hot"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("one_hot").alias("bits"))
    )


def might_contain(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """`candidates` plus a boolean `might_match`: true iff every hash
    position of the row's key has its bit set in `bloom` (the standard
    no-false-negative, bounded-false-positive Bloom test).

    Probe plan: explode the k positions, LEFT join the broadcast word
    table (missing word ⇒ bit unset), AND the k tests back together with
    a ``min(hit)`` groupBy on the candidate id — one shuffle, keyed by
    the candidate, partial-agg'd."""
    key = F.col(key_col).cast("string")
    pos = F.explode(
        F.array(*[_position(key, j, m_bits) for j in range(n_hashes)])
    ).alias("pos")
    probes = (
        candidates.select(F.col(key_col), pos)
        .select(
            F.col(key_col),
            (F.col("pos") / _WORD).cast("int").alias("word_idx"),
            (F.col("pos") % _WORD).cast("int").alias("bit"),
        )
        .join(F.broadcast(bloom), "word_idx", "left")
        .select(
            F.col(key_col),
            F.expr(
                "CASE WHEN (shiftright(coalesce(bits, 0), bit) & 1) = 1"
                " THEN 1 ELSE 0 END"
            ).alias("hit"),
        )
        .groupBy(key_col)
        .agg((F.min("hit") == 1).alias("might_match"))
    )
    return candidates.join(probes, key_col)
