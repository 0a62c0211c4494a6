"""Match-flatten tests (U2): the dense mix-expr path and the sparse
vector scale path must agree feature-for-feature."""

from __future__ import annotations

from pyspark.sql import functions as F

from lol_data_collection_system_spark.operators.features import (
    match_feature_vectors,
    match_mix_exprs,
    mix_vocabulary,
)

SIDES = ["topnexus", "bottomnexus"]
CHAMPS = [1, 2]
ATTRS = {"lane": ["TOP", "MID"], "role": ["SOLO", "DUO"]}


def _attr_rows(spark):
    # match 10: champ 1 topnexus TOP/SOLO, champ 2 bottomnexus MID/DUO
    # match 20: champ 2 topnexus MID/SOLO
    rows = [
        (10, "topnexus", 1, "lane", "TOP"),
        (10, "topnexus", 1, "role", "SOLO"),
        (10, "bottomnexus", 2, "lane", "MID"),
        (10, "bottomnexus", 2, "role", "DUO"),
        (20, "topnexus", 2, "lane", "MID"),
        (20, "topnexus", 2, "role", "SOLO"),
    ]
    return spark.createDataFrame(
        rows, ["match_id", "side", "champion_id", "attr_key", "attr_value"]
    )


def test_dense_and_sparse_paths_agree(spark):
    attr_rows = _attr_rows(spark)
    vocab = mix_vocabulary(spark, SIDES, CHAMPS, ATTRS)
    n = vocab.count()
    assert n == 2 * 2 * 4  # sides × champs × (2 lanes + 2 roles)

    dense = attr_rows.groupBy("match_id").agg(
        *match_mix_exprs(SIDES, CHAMPS, ATTRS)
    )
    dense_rows = {r["match_id"]: r.asDict() for r in dense.collect()}
    assert dense_rows[10]["topnexus_1_has_lane_TOP"] == 1
    assert dense_rows[10]["topnexus_1_has_lane_MID"] == 0
    assert dense_rows[10]["bottomnexus_2_has_role_DUO"] == 1
    assert dense_rows[20]["topnexus_2_has_lane_MID"] == 1
    assert dense_rows[20]["bottomnexus_2_has_lane_MID"] == 0

    sparse = {
        r.match_id: r.features
        for r in match_feature_vectors(attr_rows, vocab, n).collect()
    }
    vocab_rows = vocab.collect()
    name_of = {
        v.feature_idx: f"{v.side}_{v.champion_id}_has_{v.attr_key}_{v.attr_value}"
        for v in vocab_rows
    }
    for match_id, vec in sparse.items():
        dense_dict = dense_rows[match_id]
        for idx in range(n):
            want = dense_dict[name_of[idx]]
            assert vec[idx] == float(want), (match_id, name_of[idx])


def test_normalize_columns_lazy_and_correct(spark):
    """(x−μ)/2σ with σ=0 → 0; and NO Spark job runs at plan-build time
    (the μ/σ aggregate is broadcast-joined, not collected)."""
    from lol_data_collection_system_spark.operators.features import (
        normalize_columns,
    )

    df = spark.createDataFrame(
        [(1, 10.0, 7.0), (2, 20.0, 7.0), (3, 30.0, 7.0)], ["id", "x", "c"]
    )
    spark.sparkContext.setJobGroup("norm_lazy_probe", "plan-build probe")
    try:
        out = normalize_columns(df, ["x", "c"])
        out.schema  # forces analysis, still no job
        jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(
            "norm_lazy_probe"
        )
        assert list(jobs) == [], "normalize_columns ran a job at plan time"
    finally:
        spark.sparkContext.setJobGroup(None, None)
    rows = {r.id: r for r in out.collect()}
    # x: mu=20, sample sd=10 -> (10-20)/20 = -0.5
    assert rows[1].x == -0.5 and rows[2].x == 0.0 and rows[3].x == 0.5
    # constant column: sd=0 -> 0.0
    assert all(rows[i].c == 0.0 for i in (1, 2, 3))
    assert rows[1]["id"] == 1  # non-normalized columns pass through


def test_mlp_score_udf_is_a_real_network(spark):
    """The MLP scorer must behave like a network, not a re-skinned
    linear model: probabilities in (0,1), sensitive to each feature, and
    NON-ADDITIVE (f(x1+x2 together) != independent contributions), which
    no linear-sigmoid reparametrization could fake across these points."""
    from lol_data_collection_system_spark.operators.features import (
        mlp_score_udf,
    )
    from lol_data_collection_system_spark.plans.pipeline_queries import (
        MLP_B1,
        MLP_B2,
        MLP_W1,
        MLP_W2,
    )

    rows = [
        (1, 0.0, 0.0, 0.0),
        (2, 1.0, 0.0, 0.0),
        (3, 0.0, 1.0, 0.0),
        (4, 1.0, 1.0, 0.0),
        (5, -2.5, 0.0, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "id long, x1 double, x2 double, x3 double"
    )
    scorer = mlp_score_udf(MLP_W1, MLP_B1, MLP_W2, MLP_B2)
    got = {
        r.id: r.mlp_score
        for r in scorer(df, ["x1", "x2", "x3"]).collect()
    }
    assert all(0.0 < v < 1.0 for v in got.values()), got
    assert len(set(got.values())) == len(got)  # every input moves it
    # non-additivity in logit space: logit(f(1,1)) != logit(f(1,0)) +
    # logit(f(0,1)) - logit(f(0,0)) — a pure linear-sigmoid model would
    # satisfy this exactly
    import math

    logit = lambda p: math.log(p / (1.0 - p))  # noqa: E731
    lhs = logit(got[4])
    rhs = logit(got[2]) + logit(got[3]) - logit(got[1])
    assert abs(lhs - rhs) > 1e-3, (lhs, rhs)
