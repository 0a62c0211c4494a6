"""PSI drift monitoring: zero/ordering/clamping semantics."""

from __future__ import annotations

from lol_data_collection_system_spark.operators import drift as drift_ops


def _psi(spark, rows):
    df = spark.createDataFrame(rows, "src string, v long")
    out = drift_ops.psi_by_group(df, "src", "v", lo=0.0, hi=100.0, n_buckets=10)
    return {r["src"]: r for r in out.collect()}


def test_identical_groups_near_zero(spark):
    """Two groups drawn from the same values → both ≈ corpus → psi ~ 0
    (exactly 0 up to smoothing asymmetry from unequal group sizes)."""
    vals = [5, 15, 25, 35, 45, 55, 65, 75, 85, 95] * 5
    rows = [("a", v) for v in vals] + [("b", v) for v in vals]
    out = _psi(spark, rows)
    assert abs(out["a"]["psi"]) < 1e-6
    assert abs(out["b"]["psi"]) < 1e-6
    assert out["a"]["n_rows"] == 50


def test_shifted_group_scores_higher(spark):
    """A group concentrated in buckets the rest of the corpus never
    hits must score far above an in-distribution group — the ordering
    that makes PSI usable as an alerting metric."""
    base = [("a", v) for v in [5, 15, 25, 35, 45] * 20]
    drifted = [("b", v) for v in [85, 95] * 10]
    out = _psi(spark, base + drifted)
    assert out["b"]["psi"] > 0.25  # "act" threshold
    assert out["b"]["psi"] > out["a"]["psi"] * 2


def test_out_of_range_values_clamp_into_edge_buckets(spark):
    """Values beyond [lo, hi) land in the edge buckets instead of
    vanishing — otherwise a source drifting OUT of the expected range
    (the loudest drift there is) would be invisible."""
    rows = [("a", v) for v in [5, 15, 25] * 10] + [
        ("b", v) for v in [-50, 5000] * 10
    ]
    out = _psi(spark, rows)
    assert out["b"]["n_rows"] == 20  # nothing dropped
    assert out["b"]["psi"] > 0.25


def test_single_group_is_its_own_baseline(spark):
    out = _psi(spark, [("only", v) for v in range(0, 100, 7)])
    assert abs(out["only"]["psi"]) < 1e-9
