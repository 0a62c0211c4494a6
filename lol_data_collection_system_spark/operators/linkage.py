"""Fuzzy record linkage: q-gram-blocked edit-distance matching.

The missing family next to the token/shingle-set dedup operators: those
measure SET overlap (Jaccard, containment, MinHash), while record linkage
asks for CHARACTER-level closeness (typos, OCR damage, inconsistent entry)
— `levenshtein` — which has no set decomposition. The classic scalable
shape (Gravano et al. 2001, "Approximate string joins in a database") is:

1. **Dedupe before linking.** Collapse each side to its DISTINCT
   normalized strings + a record count. Real entity columns are heavily
   repeated (names, addresses, titles); the candidate join must run on
   the string vocabulary, never on records — linking records directly
   squares the duplication factor into the pair space.
2. **q-gram blocking.** Two strings within edit distance d share at
   least ``max(len) - q + 1 - q*d`` positional q-grams (the q-gram
   lemma) — so for short-enough strings any true match shares ≥1 gram,
   and the candidate set is an equi-join on gram, not a cross join.
3. **Master-side frequency cap.** Grams carried by more than
   ``max_gram_freq`` master strings are dropped from blocking (the same
   skew lever as the shingle ``max_doc_freq``): stop-grams (" th",
   "er ") otherwise recreate the cross join. The cap trades recall for
   a hard bound on candidate fan-out — the lever a 100 TB run tunes.
4. **Verify.** `F.levenshtein` (JVM codegen) on the candidate pairs
   only.

Every stage is built-in expressions — no Python UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_name(c: Column) -> Column:
    """Canonical linkage form: lowercase, trimmed, inner runs of
    whitespace collapsed — the standard pre-linkage normalization."""
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def qgrams(c: Column, q: int = 3) -> Column:
    """Array of the string's q-grams (strings shorter than q contribute
    themselves as a single gram) — pure codegen, no explode yet."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (q - 1), F.lit(1))),
        lambda i: F.substr(c, i, F.lit(q)),
    )


def fuzzy_link_names(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_col: str,
    clean_col: str,
    q: int = 3,
    max_dist: int = 2,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """Link a dirty feed's name column against a clean master's name
    column: returns one row per (dirty_name, clean_name) string pair
    within ``max_dist`` edits that shares a blocking q-gram, with the
    record counts behind each string —
    ``(dirty_name, clean_name, edit_dist, n_dirty, n_clean)``.

    Record-level pairs are a join away (`dirty ⋈ out ⋈ clean` on the
    normalized names) and deliberately NOT materialized here: their
    cardinality is ``n_dirty × n_clean`` per string pair, which is the
    consumer's decision to pay, not the linker's.

    ``max_gram_freq`` bounds the blocking fan-out per gram on the master
    side (None = uncapped). Recall contract: exact within-``max_dist``
    matches are found whenever the pair shares ≥1 surviving q-gram; the
    q-gram lemma guarantees sharing for ``len ≥ q·(d+1)`` before the
    cap, and the cap's recall cost is measurable by diffing against the
    uncapped run at a sampled SF.
    """
    d = (
        dirty.select(normalize_name(F.col(dirty_col)).alias("dirty_name"))
        .groupBy("dirty_name")
        .agg(F.count(F.lit(1)).alias("n_dirty"))
    )
    c = (
        clean.select(normalize_name(F.col(clean_col)).alias("clean_name"))
        .groupBy("clean_name")
        .agg(F.count(F.lit(1)).alias("n_clean"))
    )
    dg = d.select(
        "dirty_name", F.explode(F.array_distinct(qgrams(F.col("dirty_name"), q))).alias("gram")
    )
    cg = c.select(
        "clean_name", F.explode(F.array_distinct(qgrams(F.col("clean_name"), q))).alias("gram")
    )
    if max_gram_freq is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("gram")
        cg = cg.withColumn("gram_df", F.count(F.lit(1)).over(w)).filter(
            F.col("gram_df") <= max_gram_freq
        ).drop("gram_df")
    cand = dg.join(cg, "gram").select("dirty_name", "clean_name").distinct()
    verified = cand.filter(
        F.levenshtein(F.col("dirty_name"), F.col("clean_name")) <= max_dist
    ).select(
        "dirty_name",
        "clean_name",
        F.levenshtein(F.col("dirty_name"), F.col("clean_name")).alias(
            "edit_dist"
        ),
    )
    return (
        verified.join(d, "dirty_name")
        .join(c, "clean_name")
        .select("dirty_name", "clean_name", "edit_dist", "n_dirty", "n_clean")
    )
