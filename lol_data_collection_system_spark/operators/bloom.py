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
    out_col: str = "might_match",
) -> DataFrame:
    """`candidates` plus a boolean `out_col` (default ``might_match``):
    true iff every hash position of the row's key has its bit set in
    `bloom` (the standard no-false-negative, bounded-false-positive Bloom
    test). Raises if `candidates` already carries `out_col` or any
    reserved ``__bloom_*`` scratch column.

    Probe plan: k successive LEFT joins against the broadcast word table
    (one per hash, missing word ⇒ bit unset), each a BroadcastHashJoin,
    and a codegen'd AND of the k bit tests — ZERO shuffles and no
    stateful aggregation, so the same operator gates a STREAMING frame
    (stream-static broadcast joins are supported; a groupBy-based probe
    would force watermarked state). An earlier formulation exploded the
    k positions and min()-aggregated them back — one candidate-keyed
    shuffle per probe that this shape deletes.
    """
    clash = [
        c
        for c in candidates.columns
        if c == out_col or c.startswith("__bloom_")
    ]
    if clash:
        raise ValueError(
            f"might_contain: candidate columns {clash} collide with the "
            f"output column {out_col!r} / reserved '__bloom_*' scratch "
            "names; rename them or pass a different out_col"
        )
    key = F.col(key_col).cast("string")
    # Lazily checkpointed: each of the k broadcast joins embeds its own
    # copy of the word-table subtree — without the checkpoint the
    # blocklist aggregate (a full scan of the blocklist!) runs k times.
    bloom = bloom.persist()
    out = candidates
    hits = []
    for j in range(n_hashes):
        pos = _position(key, j, m_bits)
        wj, bj, hj = f"__bloom_w{j}", f"__bloom_b{j}", f"__bloom_hit{j}"
        out = (
            out.withColumn(wj, (pos / _WORD).cast("int"))
            .withColumn(bj, (pos % _WORD).cast("int"))
            .join(
                F.broadcast(
                    bloom.select(
                        F.col("word_idx").alias(wj),
                        F.col("bits").alias(f"__bloom_bits{j}"),
                    )
                ),
                wj,
                "left",
            )
            .withColumn(
                hj,
                F.expr(
                    f"(shiftright(coalesce(__bloom_bits{j}, 0), {bj}) & 1) = 1"
                ),
            )
            .drop(wj, bj, f"__bloom_bits{j}")
        )
        hits.append(F.col(hj))
    might = hits[0]
    for h in hits[1:]:
        might = might & h
    # A NULL key makes every bit test NULL; coalesce to false so the
    # probe matches the oracle's CASE/min formulation (a NULL key is
    # definitionally not a member) and NOT-filters don't drop the row
    # from both branches.
    return out.withColumn(
        out_col, F.coalesce(might, F.lit(False))
    ).drop(*[f"__bloom_hit{j}" for j in range(n_hashes)])


def dense_words(bloom: DataFrame, m_bits: int) -> list[int]:
    """Collect a `build_bloom` word table into a dense Python list of
    ``m_bits / 32`` longs (missing words = 0), for embedding as a plan
    literal via `member_expr`. The collect is bounded by the FILTER
    GEOMETRY (m_bits/32 rows), never by the key-set size — that is the
    whole point of probing a Bloom instead of collecting the keys."""
    out = [0] * (m_bits // _WORD)
    for r in bloom.collect():
        out[r["word_idx"]] = r["bits"]
    return out


def member_expr(
    key: Column,
    words: list[int],
    m_bits: int,
    n_hashes: int = BLOOM_HASHES,
) -> Column:
    """ROW-LOCAL Bloom membership test over a dense word-table literal —
    the form usable inside array higher-order functions (`F.filter` /
    `F.transform` lambdas), where `might_contain`'s join-based probe
    cannot reach. Bit-for-bit the same md5 position math as
    `build_bloom`/`might_contain`, so `member_expr(k, dense_words(b, m),
    m, h)` ≡ the `might_contain` column for the same filter.

    Plan cost (r8 rework, SCALING.md "Bloom word-table literal" probe):
    the word table enters the plan as ONE JSON string literal that a
    constant-foldable `from_json` turns into a single array value — not
    an element-wise array literal, whose m_bits/32-node expression tree
    (duplicated per hash probe) made Catalyst analysis QUADRATIC-feeling
    in the geometry: 78.8 s cold compile at the 2^22-bit clamp, vs
    2.0 s cold / 0.5 s warm for this form, bit-identical results. The
    n_hashes probes run as one `forall` over a positions array so the
    (folded) table is referenced ONCE in the tree. Each probe is
    n_hashes md5s + array indexes, zero joins, zero shuffles, zero
    state — streaming-safe at any point in a plan, including inside
    array higher-order lambdas. NULL keys test false (non-members),
    matching `might_contain`."""
    import json as _json

    if n_hashes < 1:
        # forall over an empty positions array is vacuously TRUE —
        # every key would silently test as a member (r8 review finding)
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    arr = F.from_json(F.lit(_json.dumps(words)), "array<bigint>")
    positions = F.array(
        *[_position(key, j, m_bits) for j in range(n_hashes)]
    )
    # one_hot = 2^(pos % 32) via pow (exact in double for exp < 53);
    # the pyspark shift wrappers only take Python-int shift amounts,
    # which a per-element lambda variable cannot be.
    return F.coalesce(
        F.forall(
            positions,
            lambda pos: F.element_at(arr, (pos / _WORD).cast("int") + 1)
            .bitwiseAND(F.pow(F.lit(2.0), pos % _WORD).cast("bigint"))
            != 0,
        ),
        F.lit(False),
    )
