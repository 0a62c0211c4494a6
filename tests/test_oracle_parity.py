"""Local twin of the driver's t2 gate: every ``queries()`` entry with an
``oracle_sql()`` entry must match DuckDB on the same parquet — row count,
column names, and order-insensitive values.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _canon(df_pandas):
    """Sort columns by name, rows by all values — order-insensitive form."""
    cols = sorted(df_pandas.columns)
    out = df_pandas[cols].copy()
    for c in cols:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(by=cols, kind="mergesort").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a.shape != b.shape:
        return False
    for c in a.columns:
        for x, y in zip(a[c].tolist(), b[c].tolist()):
            xn = isinstance(x, float) and math.isnan(x)
            yn = isinstance(y, float) and math.isnan(y)
            if xn or yn:
                if not (xn and yn):
                    return False
                continue
            if x is None or y is None:
                if not (x is None and y is None):
                    return False
                continue
            if isinstance(x, float) or isinstance(y, float):
                if float(x) != float(y):  # exact: mirrors the driver's hash
                    return False
            elif str(x) != str(y):
                return False
    return True


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    spark_df = q(spark, SF_DIR).toPandas()
    if name not in oracles:
        assert spark_df.shape[0] >= 0  # rows-only check (driver's weak mode)
        return
    duck_df = _duck(oracles[name])
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"duck={sorted(duck_df.columns)}"
    )
    a, b = _canon(spark_df), _canon(duck_df)
    assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
    for c in a.columns:
        assert a[c].dtype.kind == b[c].dtype.kind, (
            f"{name}.{c}: dtype kind {a[c].dtype} vs {b[c].dtype} — the "
            "driver's value hash distinguishes 1 from 1.0"
        )
    assert _values_equal(a, b), (
        f"{name}: value mismatch\nspark:\n{a.head(20)}\nduck:\n{b.head(20)}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_jaccard_doc_freq_cap(spark):
    """Skew lever: capping ultra-common shingles removes pairs that share
    only stop-phrases; surviving pairs score over the capped space."""
    from pyspark.sql import functions as F

    from lol_data_collection_system_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rows = [
        (1, "the quick brown fox jumps high today"),
        (2, "the quick brown cat sleeps low today"),
        (3, "a completely different document entirely here now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    full = ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.0)
    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.0, max_doc_freq=1
    )
    full_pairs = {(r.id_a, r.id_b) for r in full.collect()}
    capped_pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (1, 2) in full_pairs          # share 'the quick brown'
    assert capped_pairs <= full_pairs    # cap only removes pairs
    assert (1, 2) not in capped_pairs    # their only shared shingle is common
